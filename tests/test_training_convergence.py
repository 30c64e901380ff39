"""Training actually learns: a tiny VALL-E overfits a fixed batch with
ScaledAdam+Eden at the reference's aggressive base-lr. This guards the whole
loss -> grad -> optimizer -> schedule chain (plain Adam at lr 0.05 diverges
on this model family; ScaledAdam must not)."""

import functools

import jax
import jax.numpy as jnp

from valle_tpu.models import ValleConfig, init_valle
from valle_tpu.training import (
    TrainState,
    init_train_state,
    make_optimizer,
    make_train_step,
)


import pytest


@pytest.mark.parametrize("state_dtype", ["float32", "bfloat16"])
def test_overfit_fixed_batch(state_dtype):
    """bfloat16 arm: the convergence gate for --optim-state-dtype bf16
    (storage-quantized ScaledAdam momentum/second moments) — the variant
    must overfit exactly as well as the fp32-state reference path."""
    cfg = ValleConfig(model_name="valle", d_model=32, nhead=2, num_layers=2,
                      prefix_mode=0, num_quantizers=8, max_len=512,
                      dropout=0.0)
    params, _ = init_valle(jax.random.PRNGKey(0), cfg)
    opt, lr_fn = make_optimizer(params, base_lr=0.05, train_stage=0,
                                warmup_steps=10, state_dtype=state_dtype)
    state = init_train_state(jax.random.PRNGKey(0), cfg, opt)
    step_fn = jax.jit(make_train_step(cfg, opt, lr_fn, train_stage=0,
                                      accum_steps=1))

    B, S, T = 4, 8, 24
    ks = jax.random.split(jax.random.PRNGKey(1), 2)
    batch = {
        "text": jax.random.randint(ks[0], (B, S), 0, 50, dtype=jnp.int32),
        "text_lens": jnp.full((B,), S, jnp.int32),
        "audio": jax.random.randint(ks[1], (B, T, 8), 0, 1024,
                                    dtype=jnp.int32),
        "audio_lens": jnp.full((B,), T, jnp.int32),
    }
    rng = jax.random.PRNGKey(2)

    losses = []
    for i in range(60):
        state, metrics = step_fn(state, batch, jnp.int32(0), rng)
        losses.append(float(metrics["loss"]) / float(metrics["frames"]))

    first = sum(losses[:5]) / 5
    last = sum(losses[-5:]) / 5
    assert last < first * 0.5, (first, last)
    assert all(l == l for l in losses), "NaN loss"  # no NaNs


def test_inexact_decode_modes_agree_on_trained_weights():
    """VERDICT round-2 weak spot #3: int8/fused_w8 agreement was only ever
    measured on RANDOM weights, where near-uniform logits make any near-tie
    flip cascade. Train the tiny model to real logit margins (overfit a
    fixed batch), then require the quantized decode modes to reproduce the
    exact path's tokens near-perfectly. This is the evidence that gates
    decode_mode="auto"'s int8 arm (models/inference.py
    resolve_auto_decode_mode)."""
    import numpy as np

    from valle_tpu.models.inference import valle_ar_decode

    # d_model 128 so the fused kernels' 128-lane alignment holds
    cfg = ValleConfig(model_name="valle", d_model=128, nhead=2,
                      num_layers=2, prefix_mode=1, num_quantizers=8,
                      max_len=512, max_prefix_len=8, dropout=0.0)
    params, _ = init_valle(jax.random.PRNGKey(0), cfg)
    opt, lr_fn = make_optimizer(params, base_lr=0.05, train_stage=1,
                                warmup_steps=10)
    state = init_train_state(jax.random.PRNGKey(0), cfg, opt)
    step_fn = jax.jit(make_train_step(cfg, opt, lr_fn, train_stage=1,
                                      accum_steps=1))

    B, S, T = 8, 8, 24
    ks = jax.random.split(jax.random.PRNGKey(1), 2)
    batch = {
        "text": jax.random.randint(ks[0], (B, S), 0, 50, dtype=jnp.int32),
        "text_lens": jnp.full((B,), S, jnp.int32),
        "audio": jax.random.randint(ks[1], (B, T, 8), 0, 1024,
                                    dtype=jnp.int32),
        "audio_lens": jnp.full((B,), T, jnp.int32),
    }
    losses = []
    # 200 steps: at 150 this fixed-seed run can still sit on a plateau
    # (observed with the 8-bit dropout mask stream: 0.445x at step 150,
    # 0.003x at 200); the training is only a means to trained logit
    # margins for the agreement check below
    for _ in range(200):
        state, metrics = step_fn(state, batch, jnp.int32(0),
                                 jax.random.PRNGKey(2))
        losses.append(float(metrics["loss"]) / float(metrics["frames"]))
    assert losses[-1] < 0.35 * losses[0], (losses[0], losses[-1])

    # decode the training prompts greedily with real margins
    tparams = state.params
    text = batch["text"]
    text_lens = batch["text_lens"]
    pq0 = batch["audio"][:, :6, 0]
    p_lens = jnp.full((B,), 6, jnp.int32)
    G = 16
    common = dict(top_k=1, max_gen_len=G, force_full_length=True)
    base, _ = valle_ar_decode(tparams, cfg, text, text_lens, pq0, p_lens,
                              jax.random.PRNGKey(5), **common)
    base = np.asarray(base)

    agreements = {}
    for mode in ("int8_grouped", "fused_w8"):
        out, _ = valle_ar_decode(
            tparams, cfg, text, text_lens, pq0, p_lens,
            jax.random.PRNGKey(5), use_decode_kernel=True,
            kernel_interpret=True, decode_kernel_mode=mode,
            unroll_layers=(mode == "fused_w8"), **common)
        agreements[mode] = float((np.asarray(out) == base).mean())
    # trained margins dwarf the quantization noise: near-exact agreement
    for mode, agr in agreements.items():
        assert agr >= 0.98, (mode, agr, agreements)


def test_nar_score_bf16_agreement_on_trained_weights():
    """Serving's nar_score_bf16 policy (bf16 storage of the NAR passes'
    score matrices — serving.resolve_nar_score_bf16) is gated the same way
    as the inexact AR decode modes: train the tiny model to real logit
    margins, then require near-exact argmax-code agreement vs the
    f32-score path, and bitwise inertness at fp32 compute."""
    import numpy as np

    from valle_tpu.models.inference import valle_nar_decode

    cfg = ValleConfig(model_name="valle", d_model=64, nhead=2,
                      num_layers=2, prefix_mode=1, num_quantizers=8,
                      max_len=512, max_prefix_len=8, dropout=0.0)
    params, _ = init_valle(jax.random.PRNGKey(0), cfg)
    opt, lr_fn = make_optimizer(params, base_lr=0.05, train_stage=2,
                                warmup_steps=10)
    state = init_train_state(jax.random.PRNGKey(0), cfg, opt)
    step_fn = jax.jit(make_train_step(cfg, opt, lr_fn, train_stage=2,
                                      accum_steps=1))

    B, S, T = 8, 8, 24
    ks = jax.random.split(jax.random.PRNGKey(1), 2)
    batch = {
        "text": jax.random.randint(ks[0], (B, S), 0, 50, dtype=jnp.int32),
        "text_lens": jnp.full((B,), S, jnp.int32),
        "audio": jax.random.randint(ks[1], (B, T, 8), 0, 1024,
                                    dtype=jnp.int32),
        "audio_lens": jnp.full((B,), T, jnp.int32),
    }
    losses = []
    # 200 steps: at 150 this fixed-seed run can still sit on a plateau
    # (observed with the 8-bit dropout mask stream: 0.445x at step 150,
    # 0.003x at 200); the training is only a means to trained logit
    # margins for the agreement check below
    for _ in range(200):
        state, metrics = step_fn(state, batch, jnp.int32(0),
                                 jax.random.PRNGKey(2))
        losses.append(float(metrics["loss"]) / float(metrics["frames"]))
    assert losses[-1] < 0.35 * losses[0], (losses[0], losses[-1])

    tparams = state.params
    P, G = 6, 16
    args = (tparams, cfg, batch["text"], batch["text_lens"],
            batch["audio"][:, :P], jnp.full((B,), P, jnp.int32),
            batch["audio"][:, P: P + G, 0], jnp.full((B,), G, jnp.int32))

    f32_off = np.asarray(valle_nar_decode(
        *args, compute_dtype=jnp.float32, score_bf16=False))
    f32_on = np.asarray(valle_nar_decode(
        *args, compute_dtype=jnp.float32, score_bf16=True))
    assert np.array_equal(f32_off, f32_on)  # inert at fp32

    bf_off = np.asarray(valle_nar_decode(
        *args, compute_dtype=jnp.bfloat16, score_bf16=False))
    bf_on = np.asarray(valle_nar_decode(
        *args, compute_dtype=jnp.bfloat16, score_bf16=True))
    agr = float((bf_off == bf_on).mean())
    assert agr >= 0.98, agr

    # the flash NAR-pass path (serving resolve_nar_attn_impl picks it at
    # small batches): exact at fp32, same >=98% trained-weights gate at
    # bf16 compute (its f32 in-kernel softmax differs from the einsum
    # path only through bf16 input rounding / accumulation order)
    f32_flash = np.asarray(valle_nar_decode(
        *args, compute_dtype=jnp.float32, attn_impl="flash"))
    assert np.array_equal(f32_off, f32_flash)
    bf_flash = np.asarray(valle_nar_decode(
        *args, compute_dtype=jnp.bfloat16, attn_impl="flash"))
    agr_fl = float((bf_off == bf_flash).mean())
    assert agr_fl >= 0.98, agr_fl


def test_stage_masking_freezes_other_subtree():
    """Stage-1 training must leave every NAR parameter untouched."""
    cfg = ValleConfig(d_model=32, nhead=2, num_layers=2, num_quantizers=8,
                      max_len=512)
    params, _ = init_valle(jax.random.PRNGKey(0), cfg)
    opt, lr_fn = make_optimizer(params, base_lr=0.05, train_stage=1,
                                warmup_steps=10)
    state = init_train_state(jax.random.PRNGKey(0), cfg, opt)
    step_fn = jax.jit(make_train_step(cfg, opt, lr_fn, train_stage=1))

    ks = jax.random.split(jax.random.PRNGKey(1), 2)
    batch = {
        "text": jax.random.randint(ks[0], (2, 6, ), 0, 50, dtype=jnp.int32),
        "text_lens": jnp.full((2,), 6, jnp.int32),
        "audio": jax.random.randint(ks[1], (2, 16, 8), 0, 1024,
                                    dtype=jnp.int32),
        "audio_lens": jnp.full((2,), 16, jnp.int32),
    }
    nar_before = jax.tree_util.tree_map(lambda x: x.copy(),
                                        state.params["nar"])
    for _ in range(3):
        state, _ = step_fn(state, batch, jnp.int32(0), jax.random.PRNGKey(3))
    same = jax.tree_util.tree_map(
        lambda a, b: bool(jnp.array_equal(a, b)), nar_before,
        state.params["nar"])
    assert all(jax.tree_util.tree_leaves(same))
    # and AR params DID change
    changed = jax.tree_util.tree_map(
        lambda a, b: bool(jnp.array_equal(a, b)),
        init_valle(jax.random.PRNGKey(0), cfg)[0]["ar"], state.params["ar"])
    assert not all(jax.tree_util.tree_leaves(changed))
