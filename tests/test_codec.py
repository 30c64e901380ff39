"""EnCodec-JAX structural tests: frame math, causality, RVQ exactness,
round-trips, and the torch-state-dict importer.

Numerical parity with the public pretrained weights cannot be tested in
this environment (no encodec package / no weights); these tests pin the
properties that make a causal streaming codec correct, and the importer is
validated against a synthetic state_dict with the package's exact naming.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from valle_tpu.codec import (
    EncodecConfig,
    encodec_decode,
    encodec_encode,
    import_encodec_state_dict,
    init_encodec,
    init_rvq,
    rvq_decode,
    rvq_encode,
)

CFG = EncodecConfig()


@pytest.fixture(scope="module")
def params():
    return init_encodec(jax.random.PRNGKey(0), CFG)


def test_frame_math(params):
    for T in (320, 321, 1600, 2049):
        wav = jax.random.normal(jax.random.PRNGKey(1), (1, T, 1)) * 0.1
        codes = encodec_encode(params, wav, cfg=CFG, n_q=8)
        assert codes.shape == (1, math.ceil(T / 320), 8), T
        assert codes.dtype == jnp.int32
        assert bool(jnp.all((codes >= 0) & (codes < 1024)))


def test_decode_length(params):
    codes = jax.random.randint(jax.random.PRNGKey(2), (2, 30, 8), 0, 1024)
    wav = encodec_decode(params, codes, cfg=CFG)
    assert wav.shape == (2, 30 * 320, 1)


def test_encoder_causality(params):
    """Causal codec: changing FUTURE samples must not change past codes.

    Note: EnCodec's left-edge REFLECT padding mirrors early frames, so the
    first few frames legitimately depend on later input (the torch package
    behaves the same); we therefore test away from the left edge.
    """
    T = 24_000  # 75 frames
    k = jax.random.PRNGKey(3)
    wav = jax.random.normal(k, (1, T, 1)) * 0.1
    edit = 16_000  # frame 50
    wav2 = wav.at[:, edit:, :].set(
        jax.random.normal(jax.random.PRNGKey(4), (1, T - edit, 1)))
    c1 = encodec_encode(params, wav, cfg=CFG, n_q=8)
    c2 = encodec_encode(params, wav2, cfg=CFG, n_q=8)
    np.testing.assert_array_equal(np.asarray(c1[:, :50]),
                                  np.asarray(c2[:, :50]))
    assert not np.array_equal(np.asarray(c1[:, 50:]),
                              np.asarray(c2[:, 50:]))


def test_rvq_exact_on_codebook_entries():
    p = init_rvq(jax.random.PRNGKey(5), num_quantizers=4, bins=16, dim=8)
    ids = jnp.array([[3, 7, 0, 15, 9]])
    x = jnp.take(p["embed"][0], ids, axis=0)  # exactly codebook-0 entries
    codes = rvq_encode(p, x, n_q=1)
    np.testing.assert_array_equal(np.asarray(codes[..., 0]), np.asarray(ids))


def test_rvq_residual_improves():
    p = init_rvq(jax.random.PRNGKey(6), num_quantizers=8, bins=64, dim=16)
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 10, 16))
    errs = []
    for n_q in (1, 4, 8):
        codes = rvq_encode(p, x, n_q=n_q)
        xq = rvq_decode(p, codes)
        errs.append(float(jnp.mean((x - xq) ** 2)))
    assert errs[0] > errs[1] > errs[2]


def _synthetic_encodec_state_dict():
    """Random state_dict with the public encodec naming + weight norm."""
    torch = pytest.importorskip("torch")
    sd = {}

    def conv(prefix, cin, cout, k):
        v = torch.randn(cout, cin, k)
        g = torch.rand(cout, 1, 1) + 0.5
        sd[f"{prefix}.conv.conv.weight_g"] = g
        sd[f"{prefix}.conv.conv.weight_v"] = v
        sd[f"{prefix}.conv.conv.bias"] = torch.randn(cout)

    def convtr(prefix, cin, cout, k):
        v = torch.randn(cin, cout, k)
        g = torch.rand(cin, 1, 1) + 0.5
        sd[f"{prefix}.convtr.convtr.weight_g"] = g
        sd[f"{prefix}.convtr.convtr.weight_v"] = v
        sd[f"{prefix}.convtr.convtr.bias"] = torch.randn(cout)

    def res(prefix, dim):
        conv(f"{prefix}.block.1", dim, dim // 2, 3)
        conv(f"{prefix}.block.3", dim // 2, dim, 1)
        conv(f"{prefix}.shortcut", dim, dim, 1)

    def lstm(prefix, dim):
        for i in range(2):
            sd[f"{prefix}.lstm.weight_ih_l{i}"] = torch.randn(4 * dim, dim)
            sd[f"{prefix}.lstm.weight_hh_l{i}"] = torch.randn(4 * dim, dim)
            sd[f"{prefix}.lstm.bias_ih_l{i}"] = torch.randn(4 * dim)
            sd[f"{prefix}.lstm.bias_hh_l{i}"] = torch.randn(4 * dim)

    nf = 32
    conv("encoder.model.0", 1, nf, 7)
    mult, idx = 1, 1
    for ratio in (2, 4, 5, 8):  # reversed ratios
        res(f"encoder.model.{idx}", mult * nf)
        conv(f"encoder.model.{idx + 2}", mult * nf, mult * 2 * nf, 2 * ratio)
        mult *= 2
        idx += 3
    lstm(f"encoder.model.{idx}", mult * nf)
    conv(f"encoder.model.{idx + 2}", mult * nf, 128, 7)

    conv("decoder.model.0", 128, mult * nf, 7)
    lstm("decoder.model.1", mult * nf)
    idx = 3
    for ratio in (8, 5, 4, 2):
        convtr(f"decoder.model.{idx}", mult * nf, mult * nf // 2, 2 * ratio)
        res(f"decoder.model.{idx + 1}", mult * nf // 2)
        mult //= 2
        idx += 3
    conv(f"decoder.model.{idx}", nf, 1, 7)

    for q in range(32):
        sd[f"quantizer.vq.layers.{q}._codebook.embed"] = torch.randn(1024, 128)
    return sd


def test_state_dict_import_runs_end_to_end():
    sd = _synthetic_encodec_state_dict()
    params = import_encodec_state_dict(sd)
    # shapes identical to our random init
    ref = init_encodec(jax.random.PRNGKey(0), CFG)
    ref_shapes = jax.tree_util.tree_map(lambda x: x.shape, ref)
    got_shapes = jax.tree_util.tree_map(lambda x: x.shape, params)
    assert ref_shapes == got_shapes
    # imported model runs encode->decode
    wav = jax.random.normal(jax.random.PRNGKey(8), (1, 960, 1)) * 0.1
    codes = encodec_encode(params, wav, cfg=CFG, n_q=8)
    out = encodec_decode(params, codes, cfg=CFG)
    assert codes.shape == (1, 3, 8)
    assert out.shape == (1, 960, 1)


def test_weight_norm_folding_matches_torch():
    torch = pytest.importorskip("torch")
    from valle_tpu.codec.convert import _fold_weight_norm

    conv = torch.nn.Conv1d(4, 8, 3)
    wn = torch.nn.utils.weight_norm(conv)
    sd = {"c.weight_g": wn.weight_g.detach(),
          "c.weight_v": wn.weight_v.detach()}
    folded = _fold_weight_norm(sd, "c")
    np.testing.assert_allclose(folded, conv.weight.detach().numpy(),
                               rtol=1e-6, atol=1e-7)


def test_decode_bf16_close_to_fp32(params):
    """bf16 decoder path: same length, ~40 dB SNR vs the fp32 reference.

    The threshold is far below EnCodec's own quantization noise; a wrong
    cast (e.g. accumulating in bf16 or skipping the fp32 output cast)
    drops SNR well under 30 dB.
    """
    codes = jax.random.randint(jax.random.PRNGKey(3), (2, 50, 8), 0, 1024)
    ref = np.asarray(encodec_decode(params, codes, cfg=CFG))
    out = encodec_decode(params, codes, cfg=CFG, dtype=jnp.bfloat16)
    assert out.dtype == jnp.float32
    out = np.asarray(out)
    assert out.shape == ref.shape
    err = np.mean((out - ref) ** 2)
    snr_db = 10 * np.log10(np.mean(ref ** 2) / (err + 1e-30))
    assert snr_db > 30.0, snr_db


def test_verify_encodec_kit_runs_end_to_end(tmp_path):
    """The real-weights readiness kit (bin/verify_encodec.py) must run its
    whole pipeline TODAY so it works the day real weights exist: import a
    torch state dict, encode the fixture, golden write + exact re-match,
    decode + SNR gate. The mirror's random weights exercise every path;
    with them the run must be deterministic (golden matches itself)."""
    import subprocess
    import sys

    import torch

    sys.path.insert(0, "tests")
    from encodec_torch_mirror import MirrorEncodec

    torch.manual_seed(0)
    mirror = MirrorEncodec().eval()
    wpath = tmp_path / "mirror_weights.pt"
    torch.save(mirror.state_dict(), wpath)
    golden = tmp_path / "golden.npz"

    from valle_tpu.bin import verify_encodec

    # first run pins the golden (SNR gate disabled: random weights)
    rc = verify_encodec.main(["--weights", str(wpath),
                              "--golden", str(golden),
                              "--write-golden", "--min-snr-db", "-1000"])
    assert rc == 0 and golden.exists()
    # second run must match the golden exactly (deterministic pipeline)
    rc = verify_encodec.main(["--weights", str(wpath),
                              "--golden", str(golden),
                              "--min-snr-db", "-1000"])
    assert rc == 0


def test_audio_tokenizer_pcm16_transfer_matches_float32():
    """transfer="pcm16" moves int16 PCM over the device->host link (half
    the bytes of f32 — the dominant batched-decode cost over the tunnel)
    and must agree with the f32 path to 16-bit quantization precision,
    i.e. below what a written wav file can represent anyway."""
    from valle_tpu.data.tokenizer import AudioTokenizer

    tok = AudioTokenizer()  # random codec weights: numerics-only test
    codes = np.asarray(
        jax.random.randint(jax.random.PRNGKey(3), (2, 12, 8), 0, 1024))
    w32 = tok.decode(codes)
    w16 = tok.decode(codes, transfer="pcm16")
    assert w16.shape == w32.shape and w16.dtype == np.float32
    assert np.max(np.abs(w16 - np.clip(w32, -1.0, 1.0))) <= 1.0 / 32767
    with pytest.raises(ValueError):
        tok.decode(codes, transfer="pcm8")
