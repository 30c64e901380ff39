"""Greedy-decode token parity: our KV-cache lax.while_loop AR decode + NAR
passes must produce the same token sequences as the reference's full-sequence
recompute loop (top_k=1 makes both deterministic).

This is the north-star check from BASELINE.md: "AR token outputs match the
PyTorch reference at fp32 under greedy decoding".
"""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from test_torch_parity import build_pair  # noqa: E402

from valle_tpu.models import valle_continual, valle_inference  # noqa: E402

S, P, Q = 8, 6, 8


def _inputs(seed):
    g = torch.Generator().manual_seed(seed)
    x = torch.randint(0, 100, (1, S), generator=g)
    x_lens = torch.tensor([S])
    prompts = torch.randint(0, 1024, (1, P, Q), generator=g)
    return x, x_lens, prompts


@pytest.mark.parametrize("prefix_mode", [0, 1])
def test_greedy_decode_token_parity(prefix_mode):
    ref, cfg, params, _ = build_pair(model_name="valle",
                                     prefix_mode=prefix_mode)
    x, x_lens, prompts = _inputs(seed=11)

    torch.manual_seed(0)
    with torch.no_grad():
        ref_codes = ref.inference(x, x_lens, prompts,
                                  enroll_x_lens=x_lens, top_k=1,
                                  temperature=1.0)
    ref_codes = ref_codes.numpy()[0]  # (Tgen, Q)

    max_gen = 16 * S + 8
    codes, gen_lens = valle_inference(
        params, cfg,
        jnp.asarray(x.numpy()), jnp.asarray(x_lens.numpy()),
        jnp.asarray(prompts.numpy()), jnp.asarray([P]),
        top_k=1, temperature=1.0, rng=jax.random.PRNGKey(0),
        max_gen_len=max_gen)
    gl = int(gen_lens[0])

    assert gl == ref_codes.shape[0], (gl, ref_codes.shape)
    ours = np.asarray(codes[0, :gl])  # (Tgen, Q)
    # quantizer 0 must match exactly
    np.testing.assert_array_equal(ours[:, 0], ref_codes[:, 0])
    # NAR stages are pure argmax -> exact match too
    np.testing.assert_array_equal(ours, ref_codes)


@pytest.mark.parametrize("model_name", ["valle", "vallf"])
@pytest.mark.parametrize("prepend_bos", [False, True])
@pytest.mark.parametrize("prefix_mode", [2, 4])
def test_greedy_decode_parity_prefix_24(model_name, prefix_mode,
                                        prepend_bos):
    """Prefix modes 2/4 with a REAL enrolled-text cut (enroll < full text).

    Exercises ``trim_enrolled_text`` (reference valle.py:1068-1079 removes
    the enrolled phonemes from the NAR text input: keep BOS, drop
    text[1:enroll_len-1]) and the mode-2/4 NAR prompt handling, crossed
    with prepend_bos. The earlier mode-0/1 tests pass enroll == full text
    so the trim was never checked for exact-token effect.
    """
    ref, cfg, params, _ = build_pair(model_name=model_name,
                                     prefix_mode=prefix_mode,
                                     prepend_bos=prepend_bos)
    g = torch.Generator().manual_seed(23)
    S_full = 14
    enroll_len = 6  # bos + 4 enrolled phonemes + eos
    x = torch.randint(0, 100, (1, S_full), generator=g)
    x_lens = torch.tensor([S_full])
    enroll_x_lens = torch.tensor([enroll_len])
    prompts = torch.randint(0, 1024, (1, P, Q), generator=g)

    torch.manual_seed(0)
    with torch.no_grad():
        ref_codes = ref.inference(x, x_lens, prompts,
                                  enroll_x_lens=enroll_x_lens, top_k=1,
                                  temperature=1.0)
    ref_codes = ref_codes.numpy()[0]

    codes, gen_lens = valle_inference(
        params, cfg,
        jnp.asarray(x.numpy()), jnp.asarray(x_lens.numpy()),
        jnp.asarray(prompts.numpy()), jnp.asarray([P]),
        enroll_x_lens=jnp.asarray(enroll_x_lens.numpy()),
        top_k=1, temperature=1.0, rng=jax.random.PRNGKey(0),
        max_gen_len=16 * S_full + 8)
    gl = int(gen_lens[0])
    assert gl == ref_codes.shape[0], (gl, ref_codes.shape)
    np.testing.assert_array_equal(np.asarray(codes[0, :gl]), ref_codes)


def test_trim_enrolled_text_values():
    """trim_enrolled_text == the reference's concat formula, per row."""
    from valle_tpu.models.inference import trim_enrolled_text

    rng = np.random.RandomState(5)
    S_full = 11
    text = rng.randint(1, 90, size=(3, S_full)).astype(np.int32)
    text_lens = np.array([11, 9, 8], np.int32)
    enroll = np.array([5, 2, 4], np.int32)  # row 1: empty prompt identity

    out, new_lens = trim_enrolled_text(
        jnp.asarray(text), jnp.asarray(text_lens), jnp.asarray(enroll))
    out = np.asarray(out)
    new_lens = np.asarray(new_lens)
    for b in range(3):
        e = int(enroll[b])
        ref_row = np.concatenate([text[b, :1], text[b, e - 1:]])
        exp_len = int(text_lens[b]) - (e - 2)
        assert new_lens[b] == exp_len
        np.testing.assert_array_equal(out[b, :exp_len], ref_row[:exp_len])


def test_continual_token_parity():
    ref, cfg, params, _ = build_pair(model_name="valle", prefix_mode=0)
    x, x_lens, _ = _inputs(seed=13)
    g = torch.Generator().manual_seed(14)
    T = 24
    y = torch.randint(0, 1024, (1, T, Q), generator=g)

    with torch.no_grad():
        ref_codes = ref.continual(x, x_lens, y).numpy()[0]  # (T-prefix, Q)

    codes, out_lens = valle_continual(
        params, cfg, jnp.asarray(x.numpy()), jnp.asarray(x_lens.numpy()),
        jnp.asarray(y.numpy()), jnp.asarray([T]))
    gl = int(out_lens[0])
    assert gl == ref_codes.shape[0]
    ours = np.asarray(codes[0, :gl])
    np.testing.assert_array_equal(ours, ref_codes)


@pytest.mark.parametrize("prefix_mode", [0, 1])
def test_vallf_greedy_decode_token_parity(prefix_mode):
    """VALL-F: cached cross-attention decode must match the reference."""
    ref, cfg, params, _ = build_pair(model_name="vallf",
                                     prefix_mode=prefix_mode)
    x, x_lens, prompts = _inputs(seed=17)

    torch.manual_seed(0)
    with torch.no_grad():
        ref_codes = ref.inference(x, x_lens, prompts,
                                  enroll_x_lens=x_lens, top_k=1,
                                  temperature=1.0)
    ref_codes = ref_codes.numpy()[0]

    codes, gen_lens = valle_inference(
        params, cfg,
        jnp.asarray(x.numpy()), jnp.asarray(x_lens.numpy()),
        jnp.asarray(prompts.numpy()), jnp.asarray([P]),
        top_k=1, temperature=1.0, rng=jax.random.PRNGKey(0),
        max_gen_len=16 * S + 8)
    gl = int(gen_lens[0])
    assert gl == ref_codes.shape[0], (gl, ref_codes.shape)
    np.testing.assert_array_equal(np.asarray(codes[0, :gl]), ref_codes)


def test_greedy_decode_token_parity_add_prenet():
    """add_prenet checkpoints: the text conv-prenet (BN running stats) and
    pointwise audio prenets must apply at inference exactly as the
    reference applies them (they were previously skipped entirely)."""
    ref, cfg, params, state = build_pair(model_name="valle", prefix_mode=1,
                                         add_prenet=True)
    x, x_lens, prompts = _inputs(seed=19)

    torch.manual_seed(0)
    with torch.no_grad():
        ref_codes = ref.inference(x, x_lens, prompts,
                                  enroll_x_lens=x_lens, top_k=1,
                                  temperature=1.0)
    ref_codes = ref_codes.numpy()[0]

    codes, gen_lens = valle_inference(
        params, cfg,
        jnp.asarray(x.numpy()), jnp.asarray(x_lens.numpy()),
        jnp.asarray(prompts.numpy()), jnp.asarray([P]),
        top_k=1, temperature=1.0, rng=jax.random.PRNGKey(0),
        max_gen_len=16 * S + 8, state=state)
    gl = int(gen_lens[0])
    assert gl == ref_codes.shape[0], (gl, ref_codes.shape)
    np.testing.assert_array_equal(np.asarray(codes[0, :gl]), ref_codes)
