#!/usr/bin/env python3
"""Kernel/bench experiments on the real chip (not the driver headline bench).

Measures:
  1. flash vs einsum full-sequence attention (NAR/prefill shape)
  2. AR decode: aligned (slice cache writes) vs scatter cache writes
Prints one line per measurement.
"""

import time

import jax
import jax.numpy as jnp


def timeit(f, *args, iters=5):
    o = f(*args)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f(*args)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / iters


def bench_attention():
    from valle_tpu.ops.attention import fused_attention, naive_attention

    B, H, S, D = 8, 16, 1536, 64
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, H, S, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, H, S, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, H, S, D), jnp.bfloat16)
    bias = jnp.zeros((B, 1, S, S), jnp.float32)

    f_flash = jax.jit(lambda q, k, v, b: fused_attention(
        q, k, v, b, use_pallas=True))
    f_naive = jax.jit(naive_attention)

    o1 = f_flash(q, k, v, bias)
    o2 = f_naive(q, k, v, bias)
    err = float(jnp.abs(o1.astype(jnp.float32)
                        - o2.astype(jnp.float32)).max())
    print(f"attention B{B} H{H} S{S}: flash-vs-naive max err {err:.2e}",
          flush=True)
    t_f = timeit(f_flash, q, k, v, bias)
    print(f"  flash: {t_f * 1e3:.2f} ms", flush=True)
    t_n = timeit(f_naive, q, k, v, bias)
    print(f"  naive: {t_n * 1e3:.2f} ms  (flash speedup {t_n / t_f:.2f}x)",
          flush=True)


def bench_decode():
    from valle_tpu.models import ValleConfig, init_valle
    from valle_tpu.models.inference import valle_ar_decode

    B, S, P, GEN = 32, 64, 225, 100
    cfg = ValleConfig(d_model=1024, nhead=16, num_layers=12, prefix_mode=1,
                      num_quantizers=8, max_len=4096)
    params, _ = init_valle(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16), params)
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    text = jax.random.randint(ks[0], (B, S), 0, 100, dtype=jnp.int32)
    text_lens = jnp.full((B,), S, jnp.int32)
    pq0 = jax.random.randint(ks[1], (B, P), 0, 1024, dtype=jnp.int32)
    p_lens = jnp.full((B,), P, jnp.int32)

    for aligned in (False, True):
        f = lambda r: valle_ar_decode(
            params, cfg, text, text_lens, pq0, p_lens, r, top_k=10,
            max_gen_len=GEN, compute_dtype=jnp.bfloat16,
            force_full_length=True, aligned_prompts=aligned)
        dt = timeit(f, ks[2], iters=3)
        fps = B * GEN / dt
        print(f"decode aligned={aligned}: {dt * 1e3:.1f} ms "
              f"({fps:.0f} frames/s)", flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    bench_attention()
    bench_decode()
