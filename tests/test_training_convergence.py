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


def test_overfit_fixed_batch():
    cfg = ValleConfig(model_name="valle", d_model=32, nhead=2, num_layers=2,
                      prefix_mode=0, num_quantizers=8, max_len=512,
                      dropout=0.0)
    params, _ = init_valle(jax.random.PRNGKey(0), cfg)
    opt, lr_fn = make_optimizer(params, base_lr=0.05, train_stage=0,
                                warmup_steps=10)
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
