"""Capture a jax.profiler trace of the AR training step (12L/1024d bf16,
ScaledAdam/Eden) to attribute fwd / bwd / optimizer cost.

Writes to /tmp/valle_tpu_profile_train and prints the per-op aggregation
inline (no second process needed).
"""
import collections
import glob
import gzip
import json

import jax
import jax.numpy as jnp
import numpy as np

LOGDIR = "/tmp/valle_tpu_profile_train"


def main():
    from valle_tpu.models import ValleConfig
    from valle_tpu.training import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )
    from valle_tpu.models.valle import init_valle

    B, S, T = 12, 64, 608  # ~ max-duration-80 bucketed batch shape
    cfg = ValleConfig(d_model=1024, nhead=16, num_layers=12, prefix_mode=1,
                      num_quantizers=8, max_len=4096)
    params, _ = init_valle(jax.random.PRNGKey(0), cfg)
    opt, lr_fn = make_optimizer(params, train_stage=1)
    del params
    state = init_train_state(jax.random.PRNGKey(0), cfg, opt)
    step = jax.jit(make_train_step(cfg, opt, lr_fn, train_stage=1,
                                   accum_steps=1,
                                   compute_dtype=jnp.bfloat16))

    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    batch = {
        "text": jax.random.randint(ks[0], (B, S), 0, 100, dtype=jnp.int32),
        "text_lens": jnp.full((B,), S, jnp.int32),
        "audio": jax.random.randint(ks[1], (B, T, 8), 0, 1024,
                                    dtype=jnp.int32),
        "audio_lens": jnp.full((B,), T, jnp.int32),
    }

    def run(state, i):
        b = dict(batch)
        b["audio"] = b["audio"].at[0, 0, 0].set(i % 1024)
        return step(state, b, jnp.int32(0), jax.random.fold_in(ks[2], i))

    state2, m = run(state, 0)
    np.asarray(m["loss"])
    state2, m = run(state2, 1)
    np.asarray(m["loss"])

    jax.profiler.start_trace(LOGDIR)
    state2, m = run(state2, 2)
    np.asarray(m["loss"])
    jax.profiler.stop_trace()

    path = sorted(glob.glob(LOGDIR + "/**/*.trace.json.gz",
                            recursive=True))[-1]
    with gzip.open(path) as f:
        tr = json.load(f)
    tn, pn = {}, {}
    for e in tr["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tn[(e["pid"], e["tid"])] = e["args"]["name"]
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pn[e["pid"]] = e["args"]["name"]
    agg = collections.Counter()
    cnt = collections.Counter()
    tot = 0.0
    for e in tr["traceEvents"]:
        if (e.get("ph") == "X"
                and tn.get((e["pid"], e["tid"])) == "XLA Ops"
                and pn.get(e["pid"], "").startswith("/device")):
            agg[e["name"]] += e.get("dur", 0)
            cnt[e["name"]] += 1
            tot += e.get("dur", 0)
    print(f"total XLA-op ms: {tot / 1e3:.1f}", flush=True)
    for name, d in agg.most_common(25):
        print(f"{d / 1e3:9.2f} ms  n={cnt[name]:5d}  {name[:90]}",
              flush=True)


if __name__ == "__main__":
    main()
