#!/usr/bin/env python3
"""A/B decode variants on the real chip (one process, bench.py config).

Variants:
  base          fori_loop layers, XLA attention, bf16 cache (current default)
  unroll        static python layer loop (weight reads become static slices)
  int8_grouped  fused-dequant Pallas kernel, int8 cache, valid-prefix skip
  int8_unroll   int8_grouped kernel + unrolled layers

Methodology (benchmarks/README.md): vary rng per iteration, materialize
with np.asarray, warm up >= 4 runs, one TPU process at a time.
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
    from valle_tpu.models import ValleConfig, init_valle
    from valle_tpu.models.inference import valle_ar_decode

    args = sys.argv[1:]
    long_cfg = "long" in args  # cache 1024 instead of 512: GEN=600 (8 s)
    b128 = "b128" in args      # serving-throughput batch
    variants = [a for a in args if a not in ("long", "b128")] or [
        "base", "unroll", "int8_grouped", "int8_unroll"]

    B, S, P, GEN = (128 if b128 else 32), 64, 225, (600 if long_cfg else 150)
    cfg = ValleConfig(d_model=1024, nhead=16, num_layers=12, prefix_mode=1,
                      num_quantizers=8, max_len=4096)
    params, _ = init_valle(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params)
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    text = jax.random.randint(ks[0], (B, S), 0, 100, dtype=jnp.int32)
    text_lens = jnp.full((B,), S, jnp.int32)
    prompt_q0 = jax.random.randint(ks[1], (B, P), 0, 1024, dtype=jnp.int32)
    prompt_lens = jnp.full((B,), P, jnp.int32)

    KW = {
        "base": {},
        "unroll": {"unroll_layers": True},
        "int8_grouped": {"use_decode_kernel": True,
                         "decode_kernel_mode": "int8_grouped"},
        "int8_unroll": {"use_decode_kernel": True,
                        "decode_kernel_mode": "int8_grouped",
                        "unroll_layers": True},
        "grouped": {"use_decode_kernel": True,
                    "decode_kernel_mode": "grouped"},
        "fused": {"use_decode_kernel": True,
                  "decode_kernel_mode": "fused"},
        "fused_unroll": {"use_decode_kernel": True,
                         "decode_kernel_mode": "fused",
                         "unroll_layers": True},
        "fused_int8": {"use_decode_kernel": True,
                       "decode_kernel_mode": "fused_int8"},
        "fused_int8_unroll": {"use_decode_kernel": True,
                              "decode_kernel_mode": "fused_int8",
                              "unroll_layers": True},
        "fused_w8_unroll": {"use_decode_kernel": True,
                            "decode_kernel_mode": "fused_w8",
                            "unroll_layers": True},
        # round 3: token-exact combined-KV valid-block kernel modes
        "bf16_grouped": {"use_decode_kernel": True,
                         "decode_kernel_mode": "bf16_grouped"},
        "bf16_unroll": {"use_decode_kernel": True,
                        "decode_kernel_mode": "bf16_grouped",
                        "unroll_layers": True},
        "fused_kv": {"use_decode_kernel": True,
                     "decode_kernel_mode": "fused_kv",
                     "unroll_layers": True},
        "mega": {"use_decode_kernel": True,
                 "decode_kernel_mode": "mega",
                 "unroll_layers": True},
        "lanes": {"use_decode_kernel": True,
                  "decode_kernel_mode": "lanes_grouped",
                  "unroll_layers": True},
        "fused_lanes": {"use_decode_kernel": True,
                        "decode_kernel_mode": "fused_lanes",
                        "unroll_layers": True},
        "exact_seg": {"cache_segment": 128},
        "fused_seg": {"use_decode_kernel": True,
                      "decode_kernel_mode": "fused",
                      "unroll_layers": True, "cache_segment": 128},
    }

    results = {}
    for name in variants:
        kw = KW[name]

        def run(rng):
            return valle_ar_decode(
                params, cfg, text, text_lens, prompt_q0, prompt_lens, rng,
                top_k=10, temperature=1.0, max_gen_len=GEN,
                compute_dtype=jnp.bfloat16, force_full_length=True, **kw)

        print(f"[{name}] compiling...", flush=True)
        t0 = time.perf_counter()
        codes, lens = run(jax.random.fold_in(ks[2], 999))
        np.asarray(codes)
        print(f"[{name}] compile+first exec {time.perf_counter()-t0:.1f}s",
              flush=True)
        for w in range(4):
            codes, _ = run(jax.random.fold_in(ks[2], 100 + w))
            np.asarray(codes)
        n_iters = 3
        t0 = time.perf_counter()
        for i in range(n_iters):
            codes, _ = run(jax.random.fold_in(ks[2], i + 1))
            np.asarray(codes)
        dt = (time.perf_counter() - t0) / n_iters
        fps = B * GEN / dt
        results[name] = {"ms_per_iter": round(dt * 1e3, 1),
                         "ms_per_step": round(dt * 1e3 / GEN, 3),
                         "frames_per_sec": round(fps, 1)}
        print(f"[{name}] {json.dumps(results[name])}", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
