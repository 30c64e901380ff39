#!/usr/bin/env python3
"""Per-stage training step throughput + MFU, with remat / score-dtype A/Bs.

VERDICT round-2 gaps addressed:
- NAR-stage training throughput was unmeasured, although the reference's
  recipe spends most of its wall-clock there (epochs 3..40,
  /root/reference/README.md:106-112);
- training MFU was unreported and full remat was unconditional
  (models/valle.py remat policy, now cfg.remat);
- the NAR attention's f32 S x S score materialization (2.4 GB/layer-pass,
  profile_nar.py) had no intermediate mitigation measured — bf16 scores
  (cfg.attn_score_bf16 / --attn-score-bf16; the scorebf16 arg here)
  are benched here UNDER A LOSS-PARITY
  GUARD.

Shapes mirror the reference recipe budgets: AR max-duration 80 s/batch
(bf16), NAR max-duration 40 s/batch. MFU counts useful FLOPs (3x forward
for fwd+bwd, remat recompute NOT credited) against the v5e bf16 peak of
197 TFLOP/s.

Usage:
  benchmarks/run_tpu.sh benchmarks/bench_train_stage.py [ar|nar]
      [remat=full,dots,none] [scorebf16 | score=f32,bf16]
      [dropout=8,32] [impl=einsum,flash] [ostate=f32,bf16] [pipe]

``ostate=`` A/Bs the ScaledAdam state storage dtype (f32 vs bf16
momentum/second-moment buffers; f32 arithmetic either way) — the
round-4 ladder priced the optimizer marginal at 10.2 ms of fp32 m/v
traffic. Losses are identical across ostate arms at step 1 (first
update differs only in storage rounding).

``impl=`` A/Bs the training-attention implementation IN-PROCESS
(cfg.attn_impl: einsum vs the fused fwd+bwd Pallas kernels with
in-kernel dropout, ops/flash_mha.py — the round-4 verdict's named
frontier). Loss parity between impls is a DRAW difference only
(different dropout mask generator), so compare against the variant's
own deterministic loss ordering, not bitwise.

``pipe`` times with pipelined dispatch (chain steps, materialize once)
— the trainer's steady-state regime since its metric reads became
deferred; without it each timed step pays a transport round trip
(BASELINE.md round-4, bench_step_pipelining.py).

``dropout=`` A/Bs the dropout mask width IN-PROCESS (the module flag is
read at trace time, and each variant jits its own step), isolating the
round-4 8-bit-mask win (modules/embedding.py) at the full-step level.
"""

import json
import sys
import time

import numpy as np

V5E_PEAK_BF16 = 197e12


def stack_flops(B, T_seq, D, L, V):
    """Forward FLOPs of an L-layer stack + logits head (per step)."""
    per_layer = 24 * T_seq * D * D + 4 * T_seq * T_seq * D
    return B * (L * per_layer + 2 * T_seq * D * V)


def main():
    args = sys.argv[1:]
    stage = "nar" if "nar" in args else "ar"
    remats = ["full"]
    for a in args:
        if a.startswith("remat="):
            remats = a.split("=", 1)[1].split(",")
    # score materialization variants: "scorebf16" = bf16 only,
    # "score=f32,bf16" = in-process A/B (cfg.attn_score_bf16 is a config
    # field, so both variants compile side by side in ONE process — the
    # A/B no longer crosses the session-variance boundary)
    scores = [False]
    for a in args:
        if a.startswith("score="):
            scores = [s in ("bf16", "on", "1")
                      for s in a.split("=", 1)[1].split(",")]
    if "scorebf16" in args:
        scores = [True]
    dbits_list = [None]  # None = module default (8 since round 4)
    for a in args:
        if a.startswith("dropout="):
            dbits_list = [int(x) for x in a.split("=", 1)[1].split(",")]
    impls = ["einsum"]
    for a in args:
        if a.startswith("impl="):
            impls = a.split("=", 1)[1].split(",")
    ostates = ["float32"]
    for a in args:
        if a.startswith("ostate="):
            # A/B the ScaledAdam state storage dtype (f32 vs bf16 m/v
            # buffers — the round-4 ladder's 10.2 ms optimizer marginal)
            ostates = [{"f32": "float32", "bf16": "bfloat16"}.get(x, x)
                       for x in a.split("=", 1)[1].split(",")]
    pipe = "pipe" in args  # pipelined timing (deferred materialization)

    import jax
    import jax.numpy as jnp

    from valle_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    from valle_tpu.models import ValleConfig
    from valle_tpu.models.valle import init_valle
    from valle_tpu.training import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    # reference budgets: AR 80 s/batch, NAR 40 s/batch; 5.6 s mean cuts.
    # Those are the reference's GPU-memory habits, not v5e constraints —
    # "b=16,32,64" ladders the batch size (per-step audio budget) to find
    # the 16 GB chip's own optimum under the auto remat/score policies.
    if stage == "ar":
        train_stage, B, T, S = 1, 16, 375, 96      # ~80 s of audio
    else:
        train_stage, B, T, S = 2, 8, 375, 96       # ~40 s of audio
    Bs = [B]
    for a in args:
        if a.startswith("b="):
            Bs = [int(x) for x in a.split("=", 1)[1].split(",")]

    cfg0 = ValleConfig(d_model=1024, nhead=16, num_layers=12, prefix_mode=1,
                       num_quantizers=8, max_len=4096)
    params, _ = init_valle(jax.random.PRNGKey(0), cfg0)
    opts = {sd: make_optimizer(params, base_lr=0.05,
                               train_stage=train_stage, state_dtype=sd)
            for sd in ostates}
    del params

    ks = jax.random.split(jax.random.PRNGKey(1), 2)

    def make_batch(B):
        return {
            "text": jax.random.randint(ks[0], (B, S), 0, 100,
                                       dtype=jnp.int32),
            "text_lens": jnp.full((B,), S, jnp.int32),
            "audio": jax.random.randint(ks[1], (B, T, 8), 0, 1024,
                                        dtype=jnp.int32),
            "audio_lens": jnp.full((B,), T, jnp.int32),
        }

    # attention sequence length seen by the stack
    T_seq = (S + T) if stage == "ar" else (S + 225 + T)
    V = 1025 if stage == "ar" else 1024

    rng = jax.random.key(0, impl="rbg")
    results = {}

    def run_variant(name, remat, score_bf16, B, dbits=None, impl="einsum",
                    ostate="float32"):
        # Runs in its own frame so EVERY device buffer (batch, train
        # state, step outputs) dies when it returns/raises — an OOM'd
        # b=16 arm used to leave its buffers live and crash the NEXT
        # arm's make_batch (2026-08-18 queue-3 run).
        if dbits is not None:
            # module flag is read at trace time; each variant jits its
            # own step below, so setting it here pins THIS variant's mask
            # width (in-process dropout-bits A/B)
            from valle_tpu.modules import embedding as _emb
            _emb._DROPOUT_BITS = dbits
        batch = make_batch(B)
        frames = B * T
        useful = 3 * stack_flops(B, T_seq, 1024, 12, V)
        cfg = ValleConfig(d_model=1024, nhead=16, num_layers=12,
                          prefix_mode=1, num_quantizers=8, max_len=4096,
                          remat=remat, attn_score_bf16=score_bf16,
                          attn_impl=impl)
        opt, lr_fn = opts[ostate]
        state = init_train_state(jax.random.PRNGKey(0), cfg, opt)
        state = state._replace(params=jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, state.params))
        step = jax.jit(make_train_step(
            cfg, opt, lr_fn, train_stage=train_stage, accum_steps=1,
            compute_dtype=jnp.bfloat16))
        t0 = time.perf_counter()
        st, m = step(state, batch, jnp.int32(0), rng)
        first_loss = float(np.asarray(m["loss"]))
        print(f"[{name}] compile+first {time.perf_counter()-t0:.1f}s "
              f"loss={first_loss:.2f}", flush=True)
        for w in range(4):
            st, m = step(state, batch, jnp.int32(0),
                         jax.random.fold_in(rng, 100 + w))
            np.asarray(m["loss"])
        n = 8
        if pipe:
            # pipelined: chain state->state, materialize once — the
            # trainer's steady-state regime now that metric reads are
            # deferred (bench_step_pipelining.py; trainer.py round-4)
            n = 12
            t0 = time.perf_counter()
            for i in range(n):
                st, m = step(st, batch, jnp.int32(0),
                             jax.random.fold_in(rng, i))
            np.asarray(m["loss"])
        else:
            t0 = time.perf_counter()
            for i in range(n):
                st, m = step(state, batch, jnp.int32(0),
                             jax.random.fold_in(rng, i))
                np.asarray(m["loss"])
        dt = (time.perf_counter() - t0) / n
        return {
            "ms_per_step": round(dt * 1e3, 1),
            "frames_per_sec": round(frames / dt, 1),
            "mfu_pct": round(100 * useful / dt / V5E_PEAK_BF16, 1),
            "loss": round(first_loss, 3),
        }

    variants = [(r, s, b, d, i, o) for r in remats for s in scores
                for b in Bs for d in dbits_list for i in impls
                for o in ostates]
    for remat, score_bf16, B, dbits, impl, ostate in variants:
        name = (f"{stage}_remat_{remat}" + ("_sbf16" if score_bf16 else "")
                + (f"_b{B}" if len(Bs) > 1 else "")
                + (f"_d{dbits}" if len(dbits_list) > 1 else "")
                + (f"_{impl}" if len(impls) > 1 else "")
                + (f"_o{jnp.dtype(ostate).name}" if len(ostates) > 1
                   else ""))
        print(f"[{name}] compiling...", flush=True)
        try:
            results[name] = run_variant(name, remat, score_bf16, B, dbits,
                                        impl, ostate)
        except Exception as e:  # OOM etc.: record and move on
            results[name] = {"error": str(e)[:200]}
            print(f"[{name}] FAILED: {str(e)[:200]}", flush=True)
            continue
        print(f"[{name}] {json.dumps(results[name])}", flush=True)

    results["config"] = {"stage": stage, "Bs": Bs, "T": T, "S": S,
                         "T_seq": T_seq}
    print(json.dumps(results))


if __name__ == "__main__":
    main()
