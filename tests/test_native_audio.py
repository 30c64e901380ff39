"""Native C++ audio library tests: wav round-trips, mixdown, resampling
quality (sine-preservation, anti-aliasing) against scipy-free references.
"""

import numpy as np
import pytest

native = pytest.importorskip("valle_tpu.native")


def test_wav_roundtrip_pcm16(tmp_path):
    sr = 24_000
    t = np.arange(sr) / sr
    x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    p = tmp_path / "a.wav"
    native.write_wav(p, x, sr, bits=16)
    y, sr2 = native.read_wav(p)
    assert sr2 == sr and y.shape == (sr, 1)
    assert np.abs(y[:, 0] - x).max() < 1.0 / 32000


def test_wav_roundtrip_float32_stereo(tmp_path):
    sr = 16_000
    x = np.random.RandomState(0).randn(1000, 2).astype(np.float32) * 0.3
    p = tmp_path / "b.wav"
    native.write_wav(p, x, sr, bits=32)
    y, sr2 = native.read_wav(p)
    assert sr2 == sr
    np.testing.assert_allclose(y, x, atol=0)


def test_to_mono():
    x = np.stack([np.ones(10), 3 * np.ones(10)], axis=1).astype(np.float32)
    m = native.to_mono(x)
    np.testing.assert_allclose(m, 2.0)


def test_resample_preserves_tone():
    """A 440 Hz tone resampled 16k->24k must stay a 440 Hz tone."""
    sr_in, sr_out, f0 = 16_000, 24_000, 440.0
    n = sr_in  # 1 s
    t = np.arange(n) / sr_in
    x = np.sin(2 * np.pi * f0 * t).astype(np.float32)
    y = native.resample(x, sr_in, sr_out)
    assert abs(len(y) - sr_out) <= 1
    t2 = np.arange(len(y)) / sr_out
    ref = np.sin(2 * np.pi * f0 * t2)
    # ignore filter edges
    sl = slice(1000, len(y) - 1000)
    err = np.abs(y[sl] - ref[sl]).max()
    assert err < 5e-3, err


def test_resample_antialiases():
    """Downsampling 48k->24k must suppress content above 12 kHz."""
    sr_in, sr_out = 48_000, 24_000
    n = sr_in
    t = np.arange(n) / sr_in
    x = np.sin(2 * np.pi * 20_000 * t).astype(np.float32)  # above target nyq
    y = native.resample(x, sr_in, sr_out)
    rms = np.sqrt(np.mean(y[2000:-2000] ** 2))
    assert rms < 0.01, rms


def test_resample_identity():
    x = np.random.RandomState(1).randn(500).astype(np.float32)
    y = native.resample(x, 24_000, 24_000)
    np.testing.assert_array_equal(x, y)


def test_convert_audio_pipeline(tmp_path):
    sr = 44_100
    x = np.random.RandomState(2).randn(sr // 2, 2).astype(np.float32) * 0.1
    out = native.convert_audio(x, sr, 24_000, channels_out=1)
    assert out.ndim == 1
    assert abs(len(out) - 24_000 // 2) <= 2
