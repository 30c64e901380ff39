#!/usr/bin/env python3
"""Decode-step cost decomposition: time vs layer count.

ms_per_step(L) fits a line: slope = per-layer cost (attention + matmuls),
intercept = fixed per-step overhead (embedding/PE gathers, logits head,
top-k sampling, while_loop machinery). Tells whether to optimize layers or
the step scaffolding.

Usage: benchmarks/run_tpu.sh benchmarks/bench_decode_scaling.py
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from valle_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    from valle_tpu.models import ValleConfig, init_valle
    from valle_tpu.models.inference import valle_ar_decode

    B, S, P, GEN = 32, 64, 225, 150
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    text = jax.random.randint(ks[0], (B, S), 0, 100, dtype=jnp.int32)
    text_lens = jnp.full((B,), S, jnp.int32)
    prompt_q0 = jax.random.randint(ks[1], (B, P), 0, 1024, dtype=jnp.int32)
    prompt_lens = jnp.full((B,), P, jnp.int32)

    results = {}
    for L in (1, 4, 8, 12):
        cfg = ValleConfig(d_model=1024, nhead=16, num_layers=L,
                          prefix_mode=1, num_quantizers=8, max_len=4096)
        params, _ = init_valle(jax.random.PRNGKey(0), cfg)
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, params)

        def run(rng):
            return valle_ar_decode(
                params, cfg, text, text_lens, prompt_q0, prompt_lens, rng,
                top_k=10, max_gen_len=GEN, compute_dtype=jnp.bfloat16,
                force_full_length=True)

        np.asarray(run(jax.random.fold_in(ks[2], 999))[0])
        for w in range(4):
            np.asarray(run(jax.random.fold_in(ks[2], 100 + w))[0])
        t0 = time.perf_counter()
        n = 3
        for i in range(n):
            np.asarray(run(jax.random.fold_in(ks[2], i))[0])
        ms = (time.perf_counter() - t0) / n / GEN * 1e3
        results[L] = round(ms, 3)
        print(f"[L={L}] {ms:.3f} ms/step", flush=True)

    Ls = sorted(results)
    xs = np.array(Ls, float)
    ys = np.array([results[x] for x in Ls])
    slope, intercept = np.polyfit(xs, ys, 1)
    print(json.dumps({
        "ms_per_step_by_layers": results,
        "per_layer_ms": round(float(slope), 4),
        "fixed_overhead_ms": round(float(intercept), 4),
    }))


if __name__ == "__main__":
    main()
