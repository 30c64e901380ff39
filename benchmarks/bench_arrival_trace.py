#!/usr/bin/env python3
"""Online serving under Poisson arrivals: continuous batching vs static.

VERDICT round-3 weak #3: every prior continuous-batching number was
OFFLINE (all requests present up front), where length-sorted static
grouping wins (BASELINE.md). Continuous batching's claimed niche is
ONLINE arrivals; this bench measures that claim with an event-driven
replay that mirrors `bin/serve.py`'s production semantics exactly:

  * requests arrive by a Poisson process at a load expressed as a
    fraction of the system's measured offline capacity;
  * the worker drains everything queued at cycle start (the server's
    coalescing drain), then serves the drain — static mode through
    `plan_groups` (longest-first groups of `slots`, each group's clients
    released as IT finishes, per ServingWorker._run_and_deliver);
    continuous mode through `ContinuousBatcher.run` (slot recycling;
    clients released at drain end — the server API returns then);
  * arrivals during a cycle wait for the next drain.

Engine walls are REAL (measured on the chip per drain composition);
only the clock between cycles is simulated, so hours of trace replay
cost minutes of chip time and the tunnel's idle jitter stays out of
the latency numbers. Pass 0 compiles, pass 1 (same arrival times,
fresh prompt values) is reported.

Reports p50/p95/mean per-request latency (completion - arrival),
makespan, and aggregate RTF per (policy, load).

Usage: benchmarks/run_tpu.sh benchmarks/bench_arrival_trace.py
         [n=96] [slots=16] [loads=0.5,0.8] [gen=512] [chunk=64]
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

    N, SLOTS, GEN, CHUNK = 96, 16, 512, 64
    loads = [0.5, 0.8]
    small = "small" in sys.argv[1:]   # CPU smoke mode
    if small:
        N, SLOTS, GEN, CHUNK = 10, 4, 64, 16
        loads = [0.5]
    for a in sys.argv[1:]:
        if a.startswith("n="):
            N = int(a.split("=")[1])
        if a.startswith("slots="):
            SLOTS = int(a.split("=")[1])
        if a.startswith("loads="):
            loads = [float(x) for x in a.split("=")[1].split(",")]
        if a.startswith("gen="):
            GEN = int(a.split("=")[1])
        if a.startswith("chunk="):
            CHUNK = int(a.split("=")[1])

    if small:
        cfg = ValleConfig(d_model=64, nhead=4, num_layers=2, prefix_mode=1,
                          num_quantizers=8, max_len=4096)
    else:
        cfg = ValleConfig(d_model=1024, nhead=16, num_layers=12,
                          prefix_mode=1, num_quantizers=8, max_len=4096)
    model = ValleModel(cfg)
    params, _ = model.init(jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params)
    tokenizer = TextTokenizer(backend="char")
    collater = TextTokenCollater(sorted(set("abcdefghijklmnopqrstuvwxyz_ ")))
    audio_tok = AudioTokenizer()

    synth = Synthesizer(model, params, tokenizer, collater, audio_tok,
                        top_k=1, max_gen_len=GEN, decode_mode="exact")
    cb = ContinuousBatcher(model, params, tokenizer, collater, audio_tok,
                           slots=SLOTS, text_pad=48, prompt_pad=256,
                           max_gen_len=GEN, chunk=CHUNK, top_k=1,
                           admission="lpt")

    # LibriTTS-like length mix: k chars -> 16*(k+2)+1 gen frames (~1-7 s)
    lens = np.random.RandomState(100).randint(3, 31, size=N)

    def make_reqs(seed):
        r = np.random.RandomState(seed)
        return [SynthesisRequest(text="a" * int(k),
                                 prompt_codes=r.randint(0, 1024, (225, 8)))
                for k in lens]

    # ---- capacity calibration: offline static_sorted over all N -------
    def run_static_groups(reqs, idxs):
        """plan_groups over idxs; returns [(group_idxs, wall_s, results)]."""
        out = []
        for group in plan_groups([reqs[i] for i in idxs], SLOTS):
            gi = [idxs[g] for g in group]
            t0 = time.perf_counter()
            res = synth.synthesize([reqs[i] for i in gi])
            for r in res:
                np.asarray(r.wav)
            out.append((gi, time.perf_counter() - t0, res))
        return out

    for p in range(2):                    # pass 0 compiles
        reqs = make_reqs(p)
        t0 = time.perf_counter()
        groups = run_static_groups(reqs, list(range(N)))
        wall = time.perf_counter() - t0
        audio_s = sum(r.frames for _, _, res in groups for r in res) / 75.0
    capacity = audio_s / wall             # audio seconds per wall second
    mean_audio = audio_s / N
    print(f"# offline capacity {capacity:.1f}x RT, mean utt "
          f"{mean_audio:.2f}s", flush=True)

    results = {"capacity_rtf_offline": round(capacity, 1),
               "mean_utt_s": round(mean_audio, 2)}

    def simulate(policy, reqs, arrivals):
        t, i, lat = 0.0, 0, np.zeros(N)
        pending = list(range(N))
        queue = []
        drains = []                      # drain sizes, for the diagnosis
        while pending or queue:
            if not queue:
                # idle: jump to the next arrival
                t = max(t, arrivals[i])
            while i < N and arrivals[i] <= t + 1e-9:
                queue.append(i)
                i += 1
            drain, queue = queue, []
            drains.append(len(drain))
            if policy == "static":
                for gi, w, _ in run_static_groups(reqs, drain):
                    t += w
                    for j in gi:
                        lat[j] = t - arrivals[j]
            else:
                t0 = time.perf_counter()
                res = cb.run([reqs[j] for j in drain])
                for r in res:
                    np.asarray(r.wav)
                w = time.perf_counter() - t0
                t += w
                for j in drain:
                    lat[j] = t - arrivals[j]
            for j in drain:
                pending.remove(j)
        return lat, t, drains

    rng = np.random.RandomState(7)
    for load in loads:
        rps = load * capacity / mean_audio
        arrivals = np.cumsum(rng.exponential(1.0 / rps, size=N))
        for policy in ("static", "continuous"):
            for p in range(2):            # pass 0 compiles, pass 1 counts
                reqs = make_reqs(50 + p)
                lat, makespan, drains = simulate(policy, reqs, arrivals)
            audio_s = mean_audio * N
            rec = {
                "p50_latency_s": round(float(np.percentile(lat, 50)), 2),
                "p95_latency_s": round(float(np.percentile(lat, 95)), 2),
                "mean_latency_s": round(float(lat.mean()), 2),
                "makespan_s": round(makespan, 1),
                "rtf_aggregate": round(audio_s / makespan, 1),
                "arrival_rps": round(rps, 2),
                "n_drains": len(drains),
                "mean_drain": round(float(np.mean(drains)), 1),
                "max_drain": int(np.max(drains)),
            }
            name = f"{policy}_load{load}"
            results[name] = rec
            print(f"[{name}] {json.dumps(rec)}", flush=True)
        results[f"cb_vs_static_p50_load{load}"] = round(
            results[f"static_load{load}"]["p50_latency_s"]
            / max(results[f"continuous_load{load}"]["p50_latency_s"], 1e-9),
            3)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
