"""Attribute the training step's time under the ROUND-3 auto policies.

Two instruments, one process (so every number shares a session):

1. A same-session cost ladder — each rung jitted separately, timed over
   varied inputs (the tunnel caches identical-input executions):
       fwd            loss only (dropout on)
       fwdbwd         value_and_grad (grad_norm materialized so the bwd
                      can't be dead-code-eliminated)
       step           the real train step (fwd+bwd+ScaledAdam+Eden)
       step_nodrop    train step with deterministic=True (dropout-mask
                      generation + mask applies removed)
       opt_only       ScaledAdam update + apply alone, on param-shaped
                      gradients (direct cost of the optimizer incl. the
                      median-window clipping and per-slice stats)
   Derived: bwd = fwdbwd - fwd; optimizer-in-step = step - fwdbwd
   (cross-check vs opt_only); dropout = step - step_nodrop.

2. A jax.profiler trace of ONE full step, rolled up by XLA op category
   (MXU dot/conv, fusions, scatter/gather = embedding grads + ScaledAdam
   indexed stats, rng = dropout masks, copies, reductions) + top raw ops.

Usage:
  benchmarks/run_tpu.sh benchmarks/profile_train.py [ar|nar] [b=N]
      [remat=POLICY] [ladder-only]

Replaces attribution for the reference hot loop
(/root/reference/valle/bin/trainer.py:588-714). Shapes match
benchmarks/bench_train_stage.py so ms/step lines up with BASELINE.md.
"""
import collections
import glob
import gzip
import json
import sys
import time

import numpy as np

LOGDIR = "/tmp/valle_tpu_profile_train"
V5E_PEAK_BF16 = 197e12


def categorize(name: str) -> str:
    n = name.lower()
    if n.startswith(("dot", "convolution", "cublas", "matmul")):
        return "mxu (dot/conv)"
    if "scatter" in n:
        return "scatter"
    if "gather" in n:
        return "gather"
    if n.startswith(("all-reduce", "all-gather", "reduce-scatter",
                     "collective")):
        return "collective"
    if n.startswith(("rng", "threefry", "philox")) or "rng" in n:
        return "rng"
    if n.startswith(("copy", "transpose", "bitcast", "reshape", "slice",
                     "dynamic-slice", "dynamic-update-slice", "concatenate",
                     "pad")):
        return "data movement"
    if n.startswith(("reduce", "sort")):
        return "reduce/sort"
    if n.startswith("fusion"):
        return "fusion (elementwise/mixed)"
    if n.startswith("custom-call"):
        return "custom-call"
    return "other"


def main():
    args = sys.argv[1:]
    stage = "nar" if "nar" in args else "ar"
    remat_override = None
    B_override = None
    for a in args:
        if a.startswith("remat="):
            remat_override = a.split("=", 1)[1]
        if a.startswith("b="):
            B_override = int(a.split("=", 1)[1])

    import jax
    import jax.numpy as jnp
    import optax

    from valle_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    from valle_tpu.models import ValleConfig, resolve_remat
    from valle_tpu.models.valle import init_valle, valle_forward
    from valle_tpu.training import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    if stage == "ar":
        train_stage, B, T, S = 1, 16, 375, 96
    else:
        train_stage, B, T, S = 2, 8, 375, 96
    if B_override:
        B = B_override
    d_model, n_layers = 1024, 12
    for a in args:                    # tiny dims for CPU smoke tests
        if a.startswith("d="):
            d_model = int(a.split("=", 1)[1])
        if a.startswith("l="):
            n_layers = int(a.split("=", 1)[1])
        if a.startswith("t="):
            T = int(a.split("=", 1)[1])
    remat = remat_override or resolve_remat("auto", train_stage)
    print(f"# stage={stage} B={B} T={T} S={S} remat={remat} "
          f"score_bf16=True (auto policies)", flush=True)

    cfg = ValleConfig(d_model=d_model, nhead=16, num_layers=n_layers,
                      prefix_mode=1, num_quantizers=8, max_len=4096,
                      remat=remat, attn_score_bf16=True)
    opt_params, _ = init_valle(jax.random.PRNGKey(0), cfg)
    opt, lr_fn = make_optimizer(opt_params, base_lr=0.05,
                                train_stage=train_stage)
    del opt_params
    state = init_train_state(jax.random.PRNGKey(0), cfg, opt)
    state = state._replace(params=jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else x, state.params))

    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    batch = {
        "text": jax.random.randint(ks[0], (B, S), 0, 100, dtype=jnp.int32),
        "text_lens": jnp.full((B,), S, jnp.int32),
        "audio": jax.random.randint(ks[1], (B, T, 8), 0, 1024,
                                    dtype=jnp.int32),
        "audio_lens": jnp.full((B,), T, jnp.int32),
    }
    rng = jax.random.key(0, impl="rbg")

    # ---- ladder rungs --------------------------------------------------
    def loss_fn(params, model_state, b, r, deterministic=False):
        loss, metrics, new_state = valle_forward(
            params, cfg, b, train_stage=train_stage, rng=r,
            deterministic=deterministic, compute_dtype=jnp.bfloat16,
            state=model_state)
        return loss, (metrics, new_state)

    @jax.jit
    def fwd(state, b, r):
        return loss_fn(state.params, state.model_state, b, r)[0]

    @jax.jit
    def fwdbwd(state, b, r):
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.model_state, b, r)
        return loss, optax.global_norm(grads)

    step = jax.jit(make_train_step(cfg, opt, lr_fn, train_stage=train_stage,
                                   accum_steps=1,
                                   compute_dtype=jnp.bfloat16))

    def fwd_det(params, cfg_, b, **kw):
        kw["deterministic"] = True
        return valle_forward(params, cfg_, b, **kw)

    step_nodrop = jax.jit(make_train_step(
        cfg, opt, lr_fn, train_stage=train_stage, accum_steps=1,
        compute_dtype=jnp.bfloat16, forward_fn=fwd_det))

    @jax.jit
    def opt_only(state, scale):
        # param-shaped synthetic grads; scale varies per call so the
        # tunnel's identical-input cache can't shortcut the execution
        grads = jax.tree_util.tree_map(
            lambda p: (jnp.full(p.shape, 1e-4, jnp.float32) * scale
                       if jnp.issubdtype(p.dtype, jnp.floating)
                       else jnp.zeros_like(p)),
            state.params)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return optax.global_norm(params)

    def timed(name, fn, n=8):
        t0 = time.perf_counter()
        out = fn(0)
        jax.tree_util.tree_map(np.asarray, out)
        print(f"[{name}] compile+first {time.perf_counter()-t0:.1f}s",
              flush=True)
        for w in range(3):
            jax.tree_util.tree_map(np.asarray, fn(100 + w))
        t0 = time.perf_counter()
        for i in range(n):
            jax.tree_util.tree_map(np.asarray, fn(i))
        ms = (time.perf_counter() - t0) / n * 1e3
        print(f"[{name}] {ms:.1f} ms", flush=True)
        return ms

    def timed_pipe(name, fn, n=12):
        """Pipelined: dispatch n calls (rng-varied so the tunnel's
        identical-input cache can't shortcut), materialize only the
        last — per-call transport RTT amortizes to ~1/n, matching the
        trainer's deferred-metrics dispatch regime
        (bench_step_pipelining.py)."""
        jax.tree_util.tree_map(np.asarray, fn(0))   # compiled by the
        t0 = time.perf_counter()                    # sync rung already
        out = None
        for i in range(n):
            out = fn(200 + i)
        jax.tree_util.tree_map(np.asarray, out)
        ms = (time.perf_counter() - t0) / n * 1e3
        print(f"[{name}] {ms:.1f} ms", flush=True)
        return ms

    res = {}
    res["fwd"] = timed("fwd", lambda i: fwd(
        state, batch, jax.random.fold_in(rng, i)))
    res["fwdbwd"] = timed("fwdbwd", lambda i: fwdbwd(
        state, batch, jax.random.fold_in(rng, i))[1])
    res["step"] = timed("step", lambda i: step(
        state, batch, jnp.int32(0), jax.random.fold_in(rng, i))[1]["loss"])
    res["step_nodrop"] = timed("step_nodrop", lambda i: step_nodrop(
        state, batch, jnp.int32(0), jax.random.fold_in(rng, i))[1]["loss"])

    # dropout-mask width A/B, same session: the default step above traced
    # with 8-bit masks (embedding._DROPOUT_BITS, read at trace time); this
    # arm re-traces the identical step with 32-bit bernoulli masks
    from valle_tpu.modules import embedding as emb_mod

    bits_was = emb_mod._DROPOUT_BITS
    emb_mod._DROPOUT_BITS = 32
    try:
        step32 = jax.jit(make_train_step(
            cfg, opt, lr_fn, train_stage=train_stage, accum_steps=1,
            compute_dtype=jnp.bfloat16))
        res["step_drop32"] = timed("step_drop32", lambda i: step32(
            state, batch, jnp.int32(0),
            jax.random.fold_in(rng, i))[1]["loss"])
    finally:
        emb_mod._DROPOUT_BITS = bits_was

    res["opt_only"] = timed("opt_only", lambda i: opt_only(
        state, jnp.float32(1.0 + i)))

    # ---- pipelined rungs: the RTT-free attribution ---------------------
    # (each sync rung above pays a full transport round trip per call;
    # these re-time the already-compiled rungs with deferred
    # materialization, isolating device time from transport)
    fwd_det_j = jax.jit(lambda st, b, r: loss_fn(
        st.params, st.model_state, b, r, deterministic=True)[0])
    res["fwd_p"] = timed_pipe("fwd_p", lambda i: fwd(
        state, batch, jax.random.fold_in(rng, i)))
    res["fwd_nodrop_p"] = timed_pipe("fwd_nodrop_p", lambda i: fwd_det_j(
        state, batch, jax.random.fold_in(rng, i)))
    res["fwdbwd_p"] = timed_pipe("fwdbwd_p", lambda i: fwdbwd(
        state, batch, jax.random.fold_in(rng, i))[1])
    res["step_p"] = timed_pipe("step_p", lambda i: step(
        state, batch, jnp.int32(0), jax.random.fold_in(rng, i))[1]["loss"])
    res["step_nodrop_p"] = timed_pipe(
        "step_nodrop_p", lambda i: step_nodrop(
            state, batch, jnp.int32(0),
            jax.random.fold_in(rng, i))[1]["loss"])

    frames = B * T
    res["derived"] = {
        "bwd_ms": round(res["fwdbwd"] - res["fwd"], 1),
        "optimizer_in_step_ms": round(res["step"] - res["fwdbwd"], 1),
        "dropout_ms": round(res["step"] - res["step_nodrop"], 1),
        "frames_per_sec": round(frames / (res["step"] / 1e3), 1),
        "pipe": {
            "bwd_ms": round(res["fwdbwd_p"] - res["fwd_p"], 1),
            "optimizer_in_step_ms": round(
                res["step_p"] - res["fwdbwd_p"], 1),
            "dropout_ms": round(res["step_p"] - res["step_nodrop_p"], 1),
            "fwd_dropout_ms": round(res["fwd_p"] - res["fwd_nodrop_p"], 1),
            "frames_per_sec": round(frames / (res["step_p"] / 1e3), 1),
        },
    }
    print(json.dumps(res), flush=True)

    if "ladder-only" in args:
        return

    # ---- trace one full step -------------------------------------------
    st2, m = step(state, batch, jnp.int32(0), jax.random.fold_in(rng, 999))
    np.asarray(m["loss"])
    jax.profiler.start_trace(LOGDIR)
    st2, m = step(st2, batch, jnp.int32(0), jax.random.fold_in(rng, 1000))
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
    agg, cnt, cats = (collections.Counter(), collections.Counter(),
                      collections.Counter())
    tot = 0.0
    for e in tr["traceEvents"]:
        if (e.get("ph") == "X"
                and tn.get((e["pid"], e["tid"])) == "XLA Ops"
                and pn.get(e["pid"], "").startswith("/device")):
            d = e.get("dur", 0)
            agg[e["name"]] += d
            cnt[e["name"]] += 1
            cats[categorize(e["name"])] += d
            tot += d
    print(f"total XLA-op ms: {tot / 1e3:.1f}", flush=True)
    print("-- categories --", flush=True)
    for cat, d in cats.most_common():
        print(f"{d / 1e3:9.2f} ms  {100 * d / max(tot, 1):5.1f}%  {cat}",
              flush=True)
    print("-- top ops --", flush=True)
    for name, d in agg.most_common(25):
        print(f"{d / 1e3:9.2f} ms  n={cnt[name]:5d}  {name[:90]}",
              flush=True)


if __name__ == "__main__":
    main()
