#!/usr/bin/env python3
"""Continuous batching vs static batching under length variance.

Static batching (`Synthesizer`) holds every lane until the batch's
longest generation finishes; the reference has no batching at all
(batch-1 CLI). This bench serves N requests whose generation caps vary
like LibriTTS utterance lengths (1-7 s at 75 Hz via the reference's
16x-text stop rule) through both paths on the flagship 12L/1024d bf16
model and reports end-to-end wall, aggregate RTF, and the speedup.

Every batch the static path sees contains one max-length text, so both
paths compile exactly one program set; passes are interleaved
(static/continuous x2) and the steady-state (second) pass is reported,
per the session-variance methodology in BASELINE.md.

Usage: benchmarks/run_tpu.sh benchmarks/bench_continuous.py
         [n_reqs] [slots] [chunk]
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
    from valle_tpu.data import AudioTokenizer, TextTokenizer
    from valle_tpu.data.collation import TextTokenCollater
    from valle_tpu.models import ValleConfig, ValleModel
    from valle_tpu.serving import (
        ContinuousBatcher,
        SynthesisRequest,
        Synthesizer,
        plan_groups,
    )

    args = sys.argv[1:]
    N = int(args[0]) if len(args) > 0 else 64
    SLOTS = int(args[1]) if len(args) > 1 else 32
    CHUNK = int(args[2]) if len(args) > 2 else 64
    GEN = 512

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

    # Generation caps ~ utterance lengths: text of k chars stops at
    # 16*(k+2)+1 frames (reference 16x rule). k in [3, 30] -> ~80-512
    # frames (~1-7 s), mean ~4 s. One max-length text per SLOTS-group
    # keeps the static path on a single padded shape.
    rng = np.random.RandomState(0)

    # lengths are FIXED across passes (they determine every padded shape
    # and derived gen budget — varying them would put fresh compiles in
    # the timed pass); only prompt values + rng vary per pass, which is
    # what defeats the tunnel's identical-input execution cache.
    lens = np.random.RandomState(100).randint(3, 31, size=N)
    for lo in range(0, N, SLOTS):
        lens[lo] = 30

    def make_reqs(seed):
        r = np.random.RandomState(seed)
        return [SynthesisRequest(
                    text="a" * int(k),
                    prompt_codes=r.randint(0, 1024, (225, 8)))
                for k in lens], lens

    synth = Synthesizer(model, params, tokenizer, collater, audio_tok,
                        top_k=1, max_gen_len=GEN, decode_mode="exact")
    def make_cb(admission):
        return ContinuousBatcher(
            model, params, tokenizer, collater, audio_tok, slots=SLOTS,
            text_pad=48, prompt_pad=256, max_gen_len=GEN, chunk=CHUNK,
            top_k=1, admission=admission)

    cb_fifo, cb_lpt = make_cb("fifo"), make_cb("lpt")

    def run_static(reqs):
        out = []
        for lo in range(0, len(reqs), SLOTS):
            out.extend(synth.synthesize(reqs[lo: lo + SLOTS],
                                        max_gen_len=GEN))
        return out

    def run_static_sorted(reqs):
        # length-sorted grouping: each group's derived decode budget
        # tracks its own longest text (serving.plan_groups)
        out = [None] * len(reqs)
        for group in plan_groups(reqs, SLOTS):
            res = synth.synthesize([reqs[i] for i in group])
            for i, r in zip(group, res):
                out[i] = r
        return out

    results = {}
    for it in range(2):                      # 0 = compile, 1 = steady
        for name, fn, stats_of in (
                ("static", run_static, None),
                ("static_sorted", run_static_sorted, None),
                ("continuous", cb_fifo.run, cb_fifo),
                ("continuous_lpt", cb_lpt.run, cb_lpt)):
            reqs, _ = make_reqs(100 + it)    # vary inputs per pass
            t0 = time.perf_counter()
            out = fn(reqs)
            for r in out:
                np.asarray(r.wav)
            wall = time.perf_counter() - t0
            audio_s = sum(r.frames for r in out) / 75.0
            rec = {"wall_s": round(wall, 2),
                   "audio_s": round(audio_s, 1),
                   "rtf": round(audio_s / wall, 1),
                   "mean_frames": round(np.mean([r.frames for r in out]), 1)}
            if stats_of is not None:
                rec.update({k: (round(v, 2) if isinstance(v, float) else v)
                            for k, v in stats_of.last_stats.items()})
            tag = f"{name}_pass{it}"
            results[tag] = rec
            print(f"[{tag}] {json.dumps(rec)}", flush=True)

    base = results["static_pass1"]["wall_s"]
    for arm in ("static_sorted", "continuous", "continuous_lpt"):
        results[f"{arm}_vs_static"] = round(
            base / results[f"{arm}_pass1"]["wall_s"], 3)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
