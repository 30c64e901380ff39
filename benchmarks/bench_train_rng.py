"""A/B the dropout PRNG implementation in the train step: threefry
(JAX default, reproducible everywhere) vs rbg (hardware RNG, much
cheaper). The train-step profile attributes ~2.4 ms/layer to threefry
bit generation for dropout masks (profile_train.py).

Same session, same batch; only the key impl differs.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

B, S, T = 12, 64, 608
ITERS = 6


def build(cfg):
    from valle_tpu.training import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )
    from valle_tpu.models.valle import init_valle

    params, _ = init_valle(jax.random.PRNGKey(0), cfg)
    opt, lr_fn = make_optimizer(params, train_stage=1)
    del params
    state = init_train_state(jax.random.PRNGKey(0), cfg, opt)
    step = jax.jit(make_train_step(cfg, opt, lr_fn, train_stage=1,
                                   accum_steps=1,
                                   compute_dtype=jnp.bfloat16))
    return state, step


def timed(step, state, batch, rng):
    st, m = step(state, batch, jnp.int32(0), rng)
    np.asarray(m["loss"])
    best = []
    for i in range(ITERS):
        b = dict(batch)
        b["audio"] = b["audio"].at[0, 0, 0].set(i % 1024)
        t0 = time.perf_counter()
        st, m = step(st, b, jnp.int32(0), jax.random.fold_in(rng, i))
        np.asarray(m["loss"])
        best.append((time.perf_counter() - t0) * 1e3)
    return min(best)


def main():
    from valle_tpu.models import ValleConfig

    cfg = ValleConfig(d_model=1024, nhead=16, num_layers=12, prefix_mode=1,
                      num_quantizers=8, max_len=4096)
    state, step = build(cfg)
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    batch = {
        "text": jax.random.randint(ks[0], (B, S), 0, 100, dtype=jnp.int32),
        "text_lens": jnp.full((B,), S, jnp.int32),
        "audio": jax.random.randint(ks[1], (B, T, 8), 0, 1024,
                                    dtype=jnp.int32),
        "audio_lens": jnp.full((B,), T, jnp.int32),
    }

    res = {}
    res["threefry_ms"] = round(timed(step, state, batch,
                                     jax.random.PRNGKey(7)), 1)
    print(f"[threefry] {res['threefry_ms']} ms/step", flush=True)
    rbg_key = jax.random.key(7, impl="rbg")
    res["rbg_ms"] = round(timed(step, state, batch, rbg_key), 1)
    print(f"[rbg] {res['rbg_ms']} ms/step", flush=True)
    res["threefry_again_ms"] = round(timed(step, state, batch,
                                           jax.random.PRNGKey(9)), 1)
    print(f"[threefry again] {res['threefry_again_ms']} ms/step", flush=True)
    res["speedup"] = round(
        min(res["threefry_ms"], res["threefry_again_ms"]) / res["rbg_ms"], 3)
    print(res, flush=True)


if __name__ == "__main__":
    main()
