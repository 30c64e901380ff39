#!/usr/bin/env python3
"""Per-step host sync vs pipelined dispatch on the training step.

Every prior training number (BASELINE.md rounds 2-4) timed the step with
a host materialization per iteration — which is also what
`bin/trainer.py:660` does in production (`float(metrics["loss"])` every
step, feeding the per-step MetricsTracker recurrence). On an
async-dispatch runtime that sync costs a full host<->device round trip
per step and stops the host from running ahead (data loading, logging);
over this tunnel the round trip is network RTT.

Three same-session arms, AR flagship shapes (B16xT375, auto policies):

  rtt        a jitted (1,)-add timed with per-call materialization —
             the dispatch+sync floor with ~zero device work
  sync       per-step materialization (the historical methodology and
             today's trainer behavior)
  pipe<K>    K steps chained state->state with ONE materialization at
             the end; wall/K. State evolves per step so the tunnel's
             identical-input execution cache never hits; device-side
             peak memory is ~2 states (host drops old references, the
             serial execution queue pins at most the in-flight pair).

pipe - sync quantifies what deferring the trainer's metric reads to
log_interval boundaries is worth (the TPU-first fix if the gap is real).

Usage: benchmarks/run_tpu.sh benchmarks/bench_step_pipelining.py
         [ar|nar] [b=N] [k=12] [small]
"""

import json
import sys
import time

import numpy as np


def main():
    argv = sys.argv[1:]
    stage = "nar" if "nar" in argv else "ar"
    K = 12
    small = "small" in argv
    Bs = None
    for a in argv:
        if a.startswith("k="):
            K = int(a.split("=")[1])
        if a.startswith("b="):
            Bs = int(a.split("=")[1])

    import jax
    import jax.numpy as jnp

    from valle_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    from valle_tpu.models import ValleConfig
    from valle_tpu.models.valle import init_valle
    from valle_tpu.training import init_train_state, make_optimizer, \
        make_train_step

    if small:
        d_model, nhead, layers = 64, 4, 2
        B, T, S = 4, 48, 16
    else:
        d_model, nhead, layers = 1024, 16, 12
        B, T, S = (16, 375, 96) if stage == "ar" else (8, 375, 96)
    if Bs:
        B = Bs
    train_stage = 1 if stage == "ar" else 2

    cfg = ValleConfig(d_model=d_model, nhead=nhead, num_layers=layers,
                      prefix_mode=1, num_quantizers=8, max_len=4096,
                      remat="full" if stage == "ar" else "none",
                      attn_score_bf16=True)
    params, _ = init_valle(jax.random.PRNGKey(0), cfg)
    opt, lr_fn = make_optimizer(params, base_lr=0.05,
                                train_stage=train_stage)
    del params
    state = init_train_state(jax.random.PRNGKey(0), cfg, opt)
    state = state._replace(params=jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else x, state.params))
    step = jax.jit(make_train_step(cfg, opt, lr_fn,
                                   train_stage=train_stage, accum_steps=1,
                                   compute_dtype=jnp.bfloat16))
    ks = jax.random.split(jax.random.PRNGKey(1), 2)
    batch = {
        "text": jax.random.randint(ks[0], (B, S), 0, 100, dtype=jnp.int32),
        "text_lens": jnp.full((B,), S, jnp.int32),
        "audio": jax.random.randint(ks[1], (B, T, 8), 0, 1024,
                                    dtype=jnp.int32),
        "audio_lens": jnp.full((B,), T, jnp.int32),
    }
    rng = jax.random.key(0, impl="rbg")
    results = {"stage": stage, "B": B, "K": K}

    # ---- rtt floor -----------------------------------------------------
    tiny = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8,), jnp.float32)
    x = tiny(x)
    np.asarray(x)
    t0 = time.perf_counter()
    n = 20
    for _ in range(n):
        x = tiny(x)
        np.asarray(x)
    results["rtt_ms"] = round((time.perf_counter() - t0) / n * 1e3, 2)
    print(f"[rtt] {results['rtt_ms']} ms", flush=True)

    # ---- compile + warm ------------------------------------------------
    t0 = time.perf_counter()
    st, m = step(state, batch, jnp.int32(0), rng)
    print(f"[compile+first] {time.perf_counter() - t0:.1f}s "
          f"loss={float(np.asarray(m['loss'])):.2f}", flush=True)
    for w in range(4):
        st, m = step(st, batch, jnp.int32(0),
                     jax.random.fold_in(rng, 100 + w))
        np.asarray(m["loss"])

    # ---- per-step sync (historical methodology + trainer behavior) -----
    def arm_sync(reps=2):
        best = None
        for r in range(reps):
            stl = st
            t0 = time.perf_counter()
            for i in range(K):
                stl, ml = step(stl, batch, jnp.int32(0),
                               jax.random.fold_in(rng, 1000 * r + i))
                np.asarray(ml["loss"])
            dt = (time.perf_counter() - t0) / K
            best = dt if best is None else min(best, dt)
        return best

    # ---- pipelined: chain K steps, materialize once --------------------
    def arm_pipe(reps=2):
        best = None
        for r in range(reps):
            stl = st
            losses = []
            t0 = time.perf_counter()
            for i in range(K):
                stl, ml = step(stl, batch, jnp.int32(0),
                               jax.random.fold_in(rng, 5000 * r + i))
                losses.append(ml["loss"])   # keep handles, read later
            np.asarray(losses[-1])          # block on the chain
            dt = (time.perf_counter() - t0) / K
            # the deferred metric reads are now free (already computed)
            t1 = time.perf_counter()
            vals = [float(np.asarray(v)) for v in losses]
            results["deferred_read_ms_total"] = round(
                (time.perf_counter() - t1) * 1e3, 2)
            assert all(np.isfinite(vals))
            best = dt if best is None else min(best, dt)
        return best

    sync = arm_sync()
    pipe = arm_pipe()
    frames = B * T
    results.update({
        "sync_ms_per_step": round(sync * 1e3, 1),
        "pipe_ms_per_step": round(pipe * 1e3, 1),
        "sync_frames_per_sec": round(frames / sync, 1),
        "pipe_frames_per_sec": round(frames / pipe, 1),
        "speedup": round(sync / pipe, 3),
    })
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
