#!/usr/bin/env python3
"""Small-batch serving latency envelope: p50 per-request wall time across
B in {1, 4, 8, 32} x decode modes (VERDICT round-2 item 7 — all prior
serving numbers were B=32 throughput; the CLI-typical case is B=1-8).

Drives the REAL Synthesizer end to end (text tokenize -> AR decode ->
7 NAR passes -> EnCodec decode -> wav) on the flagship 12L/1024d model
with ~6 s generations, and reports per-batch wall, per-utterance p50,
and aggregate real-time factor. Used to sanity-check
``resolve_auto_decode_mode``'s thresholds at serving-realistic shapes.

Usage: benchmarks/run_tpu.sh benchmarks/bench_serving_latency.py
         [modes...] [batches=1,4,8,32]
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
    from valle_tpu.data.collation import TextTokenCollater
    from valle_tpu.data.tokenizer import AudioTokenizer, TextTokenizer
    from valle_tpu.models import ValleConfig, ValleModel
    from valle_tpu.serving import SynthesisRequest, Synthesizer

    args = sys.argv[1:]
    batches = [1, 4, 8, 32]
    gens = [448]
    modes = []
    for a in args:
        if a.startswith("batches="):
            batches = [int(x) for x in a.split("=", 1)[1].split(",")]
        elif a.startswith("gen="):
            # generation budgets (frames; 75 Hz): short ~192 (2.6 s) vs
            # long ~448 (6 s) move the KV-cache length across the
            # resolve_auto_decode_mode boundary
            gens = [int(x) for x in a.split("=", 1)[1].split(",")]
        else:
            modes.append(a)
    modes = modes or ["exact", "fused", "int8", "auto"]

    cfg = ValleConfig(d_model=1024, nhead=16, num_layers=12, prefix_mode=1,
                      num_quantizers=8, max_len=4096)
    model = ValleModel(cfg)
    params, _ = model.init(jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params)
    tokenizer = TextTokenizer(backend="char")
    collater = TextTokenCollater(sorted(set("abcdefghijklmnopqrstuvwxyz_ ")))
    audio_tok = AudioTokenizer()

    texts = ["the quick brown fox jumps over the lazy dog and keeps "
             "running through the quiet forest " * 2,
             "speech synthesis on tensor processing units goes fast",
             "a rather longer sentence intended to vary the text length "
             "distribution across the batch of requests being served",
             "hello world"]
    rng = np.random.RandomState(0)

    results = {}
    for GEN in gens:
      for mode in modes:
        for B in batches:
            if mode == "int8" and B % 8 != 0:
                continue  # int8 kernel needs B % 8 == 0 (falls back)
            synth = Synthesizer(model, params, tokenizer, collater,
                                audio_tok, top_k=10, max_gen_len=GEN,
                                decode_mode=mode)
            reqs = [SynthesisRequest(
                        text=texts[i % len(texts)],
                        prompt_codes=rng.randint(0, 1024, (225, 8)))
                    for i in range(B)]
            name = (f"{mode}_b{B}" if len(gens) == 1
                    else f"{mode}_b{B}_g{GEN}")
            try:
                t0 = time.perf_counter()
                out = synth.synthesize(reqs)
                np.asarray(out[0].wav)
                print(f"[{name}] compile+first "
                      f"{time.perf_counter()-t0:.1f}s", flush=True)
            except Exception as e:
                results[name] = {"error": str(e)[:160]}
                print(f"[{name}] FAILED {str(e)[:160]}", flush=True)
                continue
            for w in range(3):
                out = synth.synthesize(reqs)
                np.asarray(out[0].wav)
            times = []
            for it in range(3):
                # vary prompts per iteration (tunnel caches identical
                # runs) but NOT the text ROTATION at B=1: rotating texts
                # there changes the padded text bucket and recompiles
                # every iteration (first run of this bench measured 27 s
                # "latency" at exact_b1 — pure compile churn). Keep each
                # lane's text fixed; prompts alone defeat the cache.
                reqs_i = [SynthesisRequest(
                              text=texts[i % len(texts)],
                              prompt_codes=rng.randint(0, 1024, (225, 8)))
                          for i in range(B)]
                t0 = time.perf_counter()
                out = synth.synthesize(reqs_i)
                for r in out:
                    np.asarray(r.wav)
                times.append(time.perf_counter() - t0)
            wall = float(np.median(times))
            audio_s = sum(r.frames for r in out) / 75.0
            results[name] = {
                "batch_wall_s": round(wall, 3),
                "p50_per_utt_s": round(wall, 3),  # batch returns together
                "audio_seconds": round(audio_s, 1),
                "rtf_aggregate": round(audio_s / wall, 1),
            }
            print(f"[{name}] {json.dumps(results[name])}", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
