"""Value-level golden test for the BigVGAN log-mel extractor.

The reference pipeline (valle/data/fbank.py:62-129) is torch.stft with a
Hann window, center=False, end-padding to the lhotse frame count,
sqrt(re^2+im^2+1e-9) magnitude, a librosa slaney mel basis, and
log(clamp(x, 1e-5)). librosa is not installed here, so:

- the STFT/window/pad/magnitude/log path is pinned against torch.stft run
  with the reference's exact arguments (value-level);
- the mel filterbank is validated against an independent direct
  construction of the slaney triangles + slaney normalization.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from valle_tpu.data.fbank import (  # noqa: E402
    BigVGANFbank,
    BigVGANFbankConfig,
    mel_filterbank,
)
from valle_tpu.data.tokenizer import compute_num_frames  # noqa: E402


def _reference_feature_fn(samples: np.ndarray, mel_basis: np.ndarray):
    """Reference _feature_fn (valle/data/fbank.py:80-129) verbatim in
    torch, with the mel basis injected (librosa absent)."""
    win_length = n_fft = 1024
    hop_size = 256
    sampling_rate = 24000
    y = torch.from_numpy(samples)[None, None, :]
    duration = round(y.shape[-1] / sampling_rate, ndigits=12)
    expected = compute_num_frames(duration, 256 / 24000.0, sampling_rate)
    pad_size = (expected - 1) * hop_size + win_length - y.shape[-1]
    assert pad_size >= 0
    y = torch.nn.functional.pad(y, (0, pad_size), mode="constant")
    y = y.squeeze(1)
    spec = torch.stft(
        y, n_fft, hop_length=hop_size, win_length=win_length,
        window=torch.hann_window(1024), center=False, pad_mode="reflect",
        normalized=False, onesided=True, return_complex=True)
    spec = torch.view_as_real(spec)
    spec = torch.sqrt(spec.pow(2).sum(-1) + 1e-9)
    spec = torch.matmul(torch.from_numpy(mel_basis), spec)
    spec = torch.log(torch.clamp(spec, min=1e-5))
    return spec.transpose(2, 1).squeeze(0).numpy()


@pytest.mark.parametrize("n_samples", [24000, 23987, 7321])
def test_fbank_matches_reference_stft_pipeline(n_samples):
    rng = np.random.RandomState(0)
    t = np.arange(n_samples) / 24000.0
    wav = (0.5 * np.sin(2 * np.pi * 440 * t)
           + 0.1 * rng.randn(n_samples)).astype(np.float32)

    fb = BigVGANFbank(BigVGANFbankConfig())
    ours = fb.extract(wav, 24000)
    ref = _reference_feature_fn(wav, fb.mel_basis)

    assert ours.shape == ref.shape
    assert ours.shape[1] == 100
    assert ours.shape[0] == compute_num_frames(
        round(n_samples / 24000.0, ndigits=12), 256 / 24000.0, 24000)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_mel_filterbank_slaney_properties():
    """Independent validation of the librosa-equivalent mel basis: slaney
    triangles peak at the interior mel points and carry 2/bandwidth
    normalization (librosa.filters.mel semantics)."""
    sr, n_fft, n_mels, fmin, fmax = 24000, 1024, 100, 0.0, 12000.0
    fb = mel_filterbank(sr, n_fft, n_mels, fmin, fmax)
    assert fb.shape == (n_mels, n_fft // 2 + 1)
    assert np.all(fb >= 0)

    # direct slaney construction: linear below 1 kHz (200/3 Hz per mel),
    # log above with step log(6.4)/27
    def hz2mel(f):
        f = np.asarray(f, float)
        lin = f / (200.0 / 3)
        brk = 1000.0 / (200.0 / 3)
        log = brk + np.log(np.maximum(f, 1000.0) / 1000.0) / (
            np.log(6.4) / 27.0)
        return np.where(f >= 1000.0, log, lin)

    def mel2hz(m):
        m = np.asarray(m, float)
        lin = m * (200.0 / 3)
        brk = 1000.0 / (200.0 / 3)
        log = 1000.0 * np.exp(
            (np.log(6.4) / 27.0) * (np.maximum(m, brk) - brk))
        return np.where(m >= brk, log, lin)

    pts = mel2hz(np.linspace(hz2mel(fmin), hz2mel(fmax), n_mels + 2))
    freqs = np.linspace(0, sr / 2, n_fft // 2 + 1)
    direct = np.zeros_like(fb, dtype=np.float64)
    for i in range(n_mels):
        lo, ctr, hi = pts[i], pts[i + 1], pts[i + 2]
        up = (freqs - lo) / (ctr - lo)
        down = (hi - freqs) / (hi - ctr)
        tri = np.maximum(0.0, np.minimum(up, down))
        direct[i] = tri * 2.0 / (hi - lo)
    np.testing.assert_allclose(fb, direct, rtol=1e-5, atol=1e-7)
