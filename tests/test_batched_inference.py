"""Batched ragged decode == per-sample decode, token for token.

The reference only supports batch size 1 (valle.py:989). Our batched decode
with per-sample text/prompt lengths must produce, for every sample, exactly
the tokens that a single-sample call produces (greedy decoding is
deterministic up to the rng; we pin rng per sample by folding lane index —
so instead we compare argmax-only decoding, which is rng-independent).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from valle_tpu.models import ValleConfig, init_valle, valle_inference


@pytest.mark.parametrize("model_name", ["valle", "vallf"])
def test_batched_equals_single(model_name):
    cfg = ValleConfig(model_name=model_name, d_model=32, nhead=2,
                      num_layers=2, prefix_mode=1, num_quantizers=8,
                      max_len=512, max_prefix_len=8)
    params, _ = init_valle(jax.random.PRNGKey(0), cfg)

    B, S, P, G = 3, 10, 6, 24
    ks = jax.random.split(jax.random.PRNGKey(7), 3)
    text = jax.random.randint(ks[0], (B, S), 0, 90)
    text_lens = jnp.array([10, 7, 5])
    prompts = jax.random.randint(ks[1], (B, P, 8), 0, 1024)
    prompt_lens = jnp.array([6, 4, 3])

    # zero out padding so single-sample slices see identical values
    text = text * (jnp.arange(S)[None, :] < text_lens[:, None])
    prompts = prompts * (
        jnp.arange(P)[None, :, None] < prompt_lens[:, None, None])

    batched_codes, batched_lens = valle_inference(
        params, cfg, text, text_lens, prompts, prompt_lens,
        top_k=1, temperature=1.0, rng=jax.random.PRNGKey(0), max_gen_len=G)

    for b in range(B):
        sl, pl = int(text_lens[b]), int(prompt_lens[b])
        codes_b, lens_b = valle_inference(
            params, cfg, text[b:b + 1, :sl], text_lens[b:b + 1],
            prompts[b:b + 1, :pl], prompt_lens[b:b + 1],
            top_k=1, temperature=1.0, rng=jax.random.PRNGKey(0),
            max_gen_len=G)
        gb, gs = int(batched_lens[b]), int(lens_b[0])
        assert gb == gs, (b, gb, gs)
        np.testing.assert_array_equal(
            np.asarray(batched_codes[b, :gb]),
            np.asarray(codes_b[0, :gs]),
            err_msg=f"sample {b} diverged between batched and single decode")
