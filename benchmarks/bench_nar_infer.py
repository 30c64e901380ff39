#!/usr/bin/env python3
"""NAR inference score-dtype A/B + e2e synthesis stage attribution.

The 7 NAR refinement passes run full-sequence attention over
[text; prompt; generated] — at serving shapes the (B, H, S, S) f32 score
matrix is the same HBM bottleneck the NAR *training* profile showed
(BASELINE.md: 2.4 GB/layer-pass; bf16 scores were the measured training
win). NAR *inference* always stored scores f32 until round 3; this bench
measures the bf16-score variant at serving shapes to decide the
`Synthesizer(nar_score_bf16=...)` default.

Also attributes end-to-end synthesis wall time (AR decode vs NAR passes
vs EnCodec decode) at the flagship serving config, so future optimization
effort goes where the time is.

Usage: benchmarks/run_tpu.sh benchmarks/bench_nar_infer.py [batches=8,32]
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
    from valle_tpu.models.inference import valle_ar_decode, valle_nar_decode

    batches = [8, 32]
    for a in sys.argv[1:]:
        if a.startswith("batches="):
            batches = [int(x) for x in a.split("=", 1)[1].split(",")]

    S, P, GEN = 64, 256, 448  # ~6 s generation, 3 s prompt (padded to 256)
    cfg = ValleConfig(d_model=1024, nhead=16, num_layers=12, prefix_mode=1,
                      num_quantizers=8, max_len=4096)
    params, _ = init_valle(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params)
    rng = np.random.RandomState(0)
    results = {}

    def timed(fn, n=5):
        # tunnel methodology: materialize with np.asarray; caller varies
        # an input per iteration to defeat the identical-input cache
        ts = []
        for i in range(n):
            t0 = time.perf_counter()
            np.asarray(fn(i))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    for B in batches:
        text = jnp.asarray(rng.randint(0, 100, (B, S)), jnp.int32)
        text_lens = jnp.full((B,), S, jnp.int32)
        prompts = jnp.asarray(rng.randint(0, 1024, (B, P, 8)), jnp.int32)
        p_lens = jnp.full((B,), 225, jnp.int32)
        g_lens = jnp.full((B,), GEN, jnp.int32)
        # pool of gen_q0 inputs: fresh tokens per iteration
        q0_pool = [jnp.asarray(rng.randint(0, 1024, (B, GEN)), jnp.int32)
                   for _ in range(12)]

        for name, sb, impl in (("nar_f32", False, "einsum"),
                               ("nar_bf16", True, "einsum"),
                               ("nar_flash", False, "flash")):
            def run(i, sb=sb, impl=impl):
                return valle_nar_decode(
                    params, cfg, text, text_lens, prompts, p_lens,
                    q0_pool[i % len(q0_pool)], g_lens,
                    compute_dtype=jnp.bfloat16, score_bf16=sb,
                    attn_impl=impl)
            t0 = time.perf_counter()
            np.asarray(run(0))
            print(f"# {name}_b{B} compile+first "
                  f"{time.perf_counter()-t0:.1f}s", flush=True)
            for w in range(3):
                np.asarray(run(1 + w))
            dt = timed(lambda i: run(4 + i))
            results[f"{name}_b{B}"] = {
                "wall_s": round(dt, 4),
                "ms_per_pass": round(dt * 1e3 / (cfg.num_quantizers - 1), 2),
                "frames_per_s": round(B * GEN / dt, 1),
            }
            print(f"[{name}_b{B}] {json.dumps(results[f'{name}_b{B}'])}",
                  flush=True)

        # AR stage at the same shapes (fused kernels, bench.py champion)
        def run_ar(i):
            codes, _ = valle_ar_decode(
                params, cfg, text, text_lens, prompts[..., 0], p_lens,
                jax.random.fold_in(jax.random.PRNGKey(1), i), top_k=10,
                temperature=1.0, max_gen_len=GEN,
                compute_dtype=jnp.bfloat16, force_full_length=True,
                use_decode_kernel=True, decode_kernel_mode="fused",
                unroll_layers=True)
            return codes
        t0 = time.perf_counter()
        np.asarray(run_ar(0))
        print(f"# ar_fused_b{B} compile+first {time.perf_counter()-t0:.1f}s",
              flush=True)
        for w in range(3):
            np.asarray(run_ar(1 + w))
        dt_ar = timed(lambda i: run_ar(4 + i))
        results[f"ar_fused_b{B}"] = {
            "wall_s": round(dt_ar, 4),
            "frames_per_s": round(B * GEN / dt_ar, 1),
        }
        print(f"[ar_fused_b{B}] {json.dumps(results[f'ar_fused_b{B}'])}",
              flush=True)

        # EnCodec decode stage (bf16, serving default)
        from valle_tpu.data.tokenizer import AudioTokenizer

        audio_tok = AudioTokenizer()
        codes_pool = [rng.randint(0, 1024, (B, GEN, 8)) for _ in range(8)]

        dt_codec = {}
        for transfer in ("float32", "pcm16"):
            def run_codec(i, transfer=transfer):
                return audio_tok.decode(codes_pool[i % len(codes_pool)],
                                        dtype="bfloat16", transfer=transfer)
            np.asarray(run_codec(0))
            for w in range(2):
                np.asarray(run_codec(1 + w))
            dt_codec[transfer] = timed(lambda i: run_codec(3 + i))
            key = f"codec_bf16_{transfer}_b{B}"
            results[key] = {"wall_s": round(dt_codec[transfer], 4)}
            print(f"[{key}] {json.dumps(results[key])}", flush=True)
        dt_cd = dt_codec["pcm16"]

        nar = results[f"nar_f32_b{B}"]["wall_s"]
        tot = dt_ar + nar + dt_cd
        results[f"attribution_b{B}"] = {
            "ar_pct": round(100 * dt_ar / tot, 1),
            "nar_f32_pct": round(100 * nar / tot, 1),
            "codec_pct": round(100 * dt_cd / tot, 1),
            "nar_bf16_speedup": round(
                nar / results[f"nar_bf16_b{B}"]["wall_s"], 3),
            "pcm16_speedup": round(
                dt_codec["float32"] / dt_codec["pcm16"], 3),
        }
        print(f"[attribution_b{B}] "
              f"{json.dumps(results[f'attribution_b{B}'])}", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
