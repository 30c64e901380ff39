#!/usr/bin/env python3
"""AR-decode roofline: measured ms/token vs the HBM bytes-per-token floor.

Closes the round-4 verdict's "is decode actually done" question with
arithmetic instead of exhaustion: for the winning decode modes at each
(B, cache) point this measures AR decode alone (force_full_length — no
stop-rule variance on random weights) and prints, per token, the
measured ms, the modeled mandatory HBM bytes (streamed weights at their
storage width + KV-cache read at its storage width), and the implied
fraction of the v5e ~819 GB/s HBM peak. Modes whose fraction sits near
the ceiling are DONE — further kernel work can only chase the residual;
modes far from it name exactly the traffic that remains.

Bytes model (per decoded token):
  weights  = sum(actual streamed dense-stack array nbytes) + head + LN
             (counted from the real param tree; int8 arrays count 1 B)
  kv_read  = 2 * L * B * H * cache * dh * cache_bytes   (full static
             window for bf16 modes; int8_grouped additionally skips
             invalid blocks, so its full-window number is an UPPER bound
             on mandatory bytes -> its printed fraction is a lower bound)
  writes/activations/embedding gathers: negligible (<1%) and omitted.

Usage: benchmarks/run_tpu.sh benchmarks/bench_decode_roofline.py
       [b=1,8,32] [cache=512,1024]
"""

import json
import sys
import time

import numpy as np

HBM_PEAK = 819e9  # v5e HBM bandwidth, bytes/s


def main():
    import jax
    import jax.numpy as jnp

    from valle_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    from valle_tpu.models import ValleConfig, init_valle
    from valle_tpu.models.inference import valle_ar_decode

    Bs = [1, 8, 32]
    caches = [512, 1024]
    for a in sys.argv[1:]:
        if a.startswith("b="):
            Bs = [int(x) for x in a.split("=", 1)[1].split(",")]
        if a.startswith("cache="):
            caches = [int(x) for x in a.split("=", 1)[1].split(",")]

    S, P = 64, 225
    cfg = ValleConfig(d_model=1024, nhead=16, num_layers=12, prefix_mode=1,
                      num_quantizers=8, max_len=4096)
    params, _ = init_valle(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params)

    # --- streamed-weight bytes per token, from the real tree ------------
    dec = params["ar"]["decoder"]["layers"]
    dense = (dec["self_attn"]["in_w"], dec["self_attn"]["out_w"],
             dec["ffn"]["lin1"]["w"], dec["ffn"]["lin2"]["w"])
    dense_elems = sum(int(x.size) for x in dense)
    # biases/LN params are <0.1% of the dense stack; folded into "omitted"
    head_elems = int(params["ar"]["predict"]["w"].size)
    w_bytes = {
        "fused": (dense_elems + head_elems) * 2,
        "fused_w8": dense_elems * 1 + head_elems * 2,
        "int8": (dense_elems + head_elems) * 2,
    }
    kv_elem_bytes = {"fused": 2, "fused_w8": 2, "int8": 1}

    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    results = {}
    for cache in caches:
        GEN = cache - S - P - 2
        for B in Bs:
            text = jax.random.randint(ks[0], (B, S), 0, 100, jnp.int32)
            text_lens = jnp.full((B,), S, jnp.int32)
            q0 = jax.random.randint(ks[1], (B, P), 0, 1024, jnp.int32)
            p_lens = jnp.full((B,), P, jnp.int32)
            for mode in ("fused", "fused_w8", "int8"):
                if mode == "int8" and B % 8 != 0:
                    continue
                if mode == "int8":
                    kw = {"use_decode_kernel": True,
                          "decode_kernel_mode": "int8_grouped"}
                else:
                    kw = {"use_decode_kernel": True, "unroll_layers": True,
                          "decode_kernel_mode": mode}

                def run(i):
                    codes, _ = valle_ar_decode(
                        params, cfg, text, text_lens, q0, p_lens,
                        jax.random.fold_in(jax.random.PRNGKey(2), i),
                        top_k=10, max_gen_len=GEN,
                        compute_dtype=jnp.bfloat16,
                        force_full_length=True, **kw)
                    return codes

                name = f"{mode}_b{B}_c{cache}"
                try:
                    t0 = time.perf_counter()
                    np.asarray(run(0))
                    print(f"# {name} compile+first "
                          f"{time.perf_counter() - t0:.1f}s", flush=True)
                    for w in range(3):
                        np.asarray(run(1 + w))
                    ts = []
                    for i in range(4):
                        t0 = time.perf_counter()
                        np.asarray(run(10 + i))
                        ts.append(time.perf_counter() - t0)
                    wall = float(np.median(ts))
                except Exception as e:
                    results[name] = {"error": str(e)[:160]}
                    print(f"[{name}] FAILED {str(e)[:160]}", flush=True)
                    continue
                ms_tok = wall * 1e3 / GEN
                # KV window per step: the XLA attention of the fused
                # modes reads the FULL static cache window (masked);
                # int8_grouped's valid-block skip reads only the live
                # prefix, which grows S+P -> cache (use the mean)
                win = cache if mode != "int8" else (S + P + cache) / 2
                kv = (2 * cfg.num_layers * B * cfg.d_model * win
                      * kv_elem_bytes[mode])
                bytes_tok = w_bytes[mode] + kv
                floor_ms = bytes_tok / HBM_PEAK * 1e3
                results[name] = {
                    "wall_s": round(wall, 3),
                    "ms_per_token": round(ms_tok, 3),
                    "weight_MB": round(w_bytes[mode] / 1e6, 1),
                    "kv_MB": round(kv / 1e6, 1),
                    "floor_ms_per_token": round(floor_ms, 3),
                    "pct_of_hbm_roofline": round(100 * floor_ms / ms_tok, 1),
                }
                print(f"[{name}] {json.dumps(results[name])}", flush=True)
    results["config"] = {"S": S, "P": P, "caches": caches, "Bs": Bs,
                         "hbm_peak_GBs": HBM_PEAK / 1e9}
    print(json.dumps(results))


if __name__ == "__main__":
    main()
