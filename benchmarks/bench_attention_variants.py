#!/usr/bin/env python3
"""Full-sequence attention variants on the chip (training/NAR shape).

Variants (the hypothesis: the mask/bias ARRAY is the hidden HBM stream —
B*S*S*4 bytes per call, as large as the score matrix flash avoids):
  xla_bias      einsum attention + prebuilt (B,1,S,S) f32 bias (default path)
  xla_inline    einsum attention, mask rebuilt from lengths inside the jit
  pallas_bias   round-1 flash kernel reading bias tiles from HBM
  pallas_lens   flash kernel, mask built in-kernel from lengths (no bias)

Methodology per benchmarks/README.md: vary inputs per iteration (fold the
rng), materialize with np.asarray, warm >= 4 runs.

Usage: benchmarks/run_tpu.sh benchmarks/bench_attention_variants.py
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from valle_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    from valle_tpu.ops import masks as M
    from valle_tpu.ops.attention import (
        flash_attention_lens,
        fused_attention,
        naive_attention,
    )

    B, H, St, Ta, D = 8, 16, 256, 1280, 64
    S = St + Ta
    variants = sys.argv[1:] or ["rng_only", "xla_bias", "xla_inline",
                                "pallas_bias", "pallas_lens"]
    base_key = jax.random.PRNGKey(0)
    x_lens = jnp.full((B,), St, jnp.int32).at[1].set(190)
    y_lens = jnp.full((B,), Ta, jnp.int32).at[1].set(1011)

    bias = M.ar_xy_attn_bias(x_lens, y_lens, St, Ta)
    INNER = 16  # attention calls per dispatch: one host->device round trip
    # over the tunnel costs ~35 ms, so per-call timing must amortize it

    def make_fn(attn):
        def run(i):
            def step(acc, j):
                ks = jax.random.split(
                    jax.random.fold_in(base_key, i * INNER + j), 3)
                q = jax.random.normal(ks[0], (B, H, S, D), jnp.bfloat16)
                k = jax.random.normal(ks[1], (B, H, S, D), jnp.bfloat16)
                v = jax.random.normal(ks[2], (B, H, S, D), jnp.bfloat16)
                return acc + attn(q, k, v).astype(jnp.float32), None
            acc, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32),
                                  jnp.arange(INNER))
            return acc
        return jax.jit(run)

    fns = {
        "rng_only": make_fn(lambda q, k, v: jnp.sum(
            q.astype(jnp.float32)) + jnp.sum(k) + jnp.sum(v)),
        "xla_bias": make_fn(lambda q, k, v: jnp.sum(
            naive_attention(q, k, v, bias))),
        "xla_inline": make_fn(lambda q, k, v: jnp.sum(
            naive_attention(q, k, v,
                            M.ar_xy_attn_bias(x_lens, y_lens, St, Ta)))),
        "pallas_bias": make_fn(lambda q, k, v: jnp.sum(
            fused_attention(q, k, v, bias,
                            use_pallas=True).astype(jnp.float32))),
        "pallas_lens": make_fn(lambda q, k, v: jnp.sum(
            flash_attention_lens(q, k, v, x_lens, y_lens,
                                 St).astype(jnp.float32))),
    }

    results = {}
    for name in variants:
        f = fns[name]
        print(f"[{name}] compiling...", flush=True)
        t0 = time.perf_counter()
        np.asarray(f(999))
        print(f"[{name}] compile+first {time.perf_counter() - t0:.1f}s",
              flush=True)
        for w in range(4):
            np.asarray(f(100 + w))
        n = 4
        t0 = time.perf_counter()
        for i in range(n):
            np.asarray(f(i))
        dt = (time.perf_counter() - t0) / (n * INNER)
        results[name] = {"ms_per_call": round(dt * 1e3, 3)}
        print(f"[{name}] {json.dumps(results[name])}", flush=True)

    # value sanity: the reduced outputs agree across variants
    ref = float(fns["xla_bias"](5))
    for name in variants:
        if name == "rng_only":
            continue
        got = float(fns[name](5))
        results[name]["sum_rel_err_vs_xla_bias"] = abs(got - ref) / abs(ref)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
