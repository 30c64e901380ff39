#!/usr/bin/env python3
"""Headline benchmark: batched AR decode throughput on the flagship model.

Measures EnCodec-frame generation rate of the KV-cache AR decoder
(batch 32, 12L/1024d/16h, bf16) on one chip — the reference's dominant
inference cost, which it executes as an O(T^2) full recompute per token at
batch size 1 (reference valle/models/valle.py:1004-1057).

Prints ONE JSON line:
  {"metric": "ar_decode_frames_per_sec_per_chip", "value": N,
   "unit": "frames/s", "vs_baseline": R}

vs_baseline is measured against the BASELINE.md north-star target of
"batch-32 >= 20x real-time per chip" = 20 * 75 frames/s = 1500 frames/s
(EnCodec runs at 75 frames/s). vs_baseline >= 1.0 means target met.
"""

import json
import time

import jax
import jax.numpy as jnp


def _wait_for_backend(max_attempts: int = 3) -> None:
    """The tunnel chip is exclusive and slow to release; a start during an
    outage or a lingering grant surfaces as RuntimeError("Unable to
    initialize backend 'axon': UNAVAILABLE ...") after a long internal
    timeout. Retry a bounded number of times so a transient outage does
    not cost the round its headline number."""
    for attempt in range(1, max_attempts + 1):
        try:
            jax.devices()
            return
        except RuntimeError as e:
            if "Unable to initialize backend" not in str(e):
                raise
            if attempt == max_attempts:
                raise
            print(f"# backend unavailable (attempt {attempt}); "
                  "retrying in 60 s", flush=True)
            time.sleep(60)


def main():
    from valle_tpu.utils import enable_compilation_cache

    _wait_for_backend()
    enable_compilation_cache()
    from valle_tpu.models import ValleConfig, init_valle
    from valle_tpu.models.inference import valle_ar_decode

    B, S, P, GEN = 32, 64, 225, 150  # 3 s prompt, 2 s generation
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

    # SELF-TUNING mode pick: decode-kernel throughput varies between
    # tunnel sessions in ways that do not track the XLA baseline (round-3
    # measured the round-2-champion fused kernels at 2x their recorded
    # ms/step in a session where the XLA path matched its record —
    # BASELINE.md). Probe the token-exact candidates in THIS session and
    # keep the fastest; every candidate is parity-tested, so the pick
    # only affects speed.
    candidates = [
        ("fused_unroll", {"use_decode_kernel": True,
                          "decode_kernel_mode": "fused",
                          "unroll_layers": True}),
        ("exact", {}),
    ]

    import numpy as np

    def make_run(kw):
        def run(rng):
            return valle_ar_decode(
                params, cfg, text, text_lens, prompt_q0, prompt_lens, rng,
                top_k=10, temperature=1.0, max_gen_len=GEN,
                compute_dtype=jnp.bfloat16, force_full_length=True, **kw)
        return run

    # Timing methodology (hard-won on this backend):
    # - jax.block_until_ready does NOT wait on the tunnel backend (it
    #   returns at dispatch); every iteration must MATERIALIZE its result
    #   with np.asarray to time real execution.
    # - identical-input executions are cached; fold a fresh rng per iter.
    # - the first ~3 post-compile executions run ~2x slow (one-time
    #   program/weight loading); warm up with several executions before
    #   timing steady state.
    def timed(run, n_iters, base=0):
        t0 = time.perf_counter()
        for i in range(n_iters):
            codes, _ = run(jax.random.fold_in(ks[2], base + i + 1))
            np.asarray(codes)
        return (time.perf_counter() - t0) / n_iters

    best = None
    for name, kw in candidates:
        run = make_run(kw)
        try:  # the whole probe: a kernel can also die in warmup/timing
            np.asarray(run(jax.random.fold_in(ks[2], 0))[0])
            for w in range(4):
                np.asarray(run(jax.random.fold_in(ks[2], 100 + w))[0])
            probe = timed(run, 2, base=200)
        except Exception as e:  # pragma: no cover - backend-specific
            print(f"# mode {name} unavailable ({type(e).__name__})",
                  flush=True)
            continue
        print(f"# probe {name}: {probe*1e3/GEN:.3f} ms/step", flush=True)
        if best is None or probe < best[2]:
            best = (name, run, probe)

    if best is None:
        # Both probes failed (e.g. a transient tunnel error mid-warmup).
        # Last resort so the round still gets a headline: one more shot at
        # the exact XLA path, letting a real failure propagate loudly.
        run = make_run({})
        for w in range(5):
            np.asarray(run(jax.random.fold_in(ks[2], 300 + w))[0])
        best = ("exact_retry", run, float("inf"))

    name, run, _ = best
    print(f"# selected decode mode: {name}", flush=True)
    dt = timed(run, 3)

    frames = B * GEN
    fps = frames / dt
    target = 20.0 * 75.0  # 20x real-time per chip at 75 Hz
    print(json.dumps({
        "metric": "ar_decode_frames_per_sec_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / target, 3),
    }))


if __name__ == "__main__":
    main()
