#!/usr/bin/env python3
"""Per-stage training throughput: sequence packing vs duration bucketing.

Builds a synthetic LibriTTS-like corpus (lognormal durations, mean ~5.6 s —
egs/libritts/README.md:20-28), drives BOTH real data paths end to end
(sampler -> dataset/collation -> jitted ScaledAdam train step) and reports
REAL codec frames per second (padding excluded) plus padding efficiency.

Methodology per benchmarks/README.md: vary the step rng (fold step index),
materialize with np.asarray, warm every compiled shape before timing.

Usage: benchmarks/run_tpu.sh benchmarks/bench_train_packing.py \
           [ar|nar] [n_utts] [rows=N] [frames=N] [sbf16|sf32] \
           [pack-remat=POLICY] [small]

The ``nar`` mode benches the NAR stage (train_stage 2, prefix mode 1,
remat "none" per the --remat auto policy) with ``PackedNarSpeechDataset``
vs the reference's max-duration-40 bucketing; rows= sets packed rows per
batch (default: 8 AR / 4 NAR — ~55 s of real audio, near the NAR-stage
budget ladder measured in bench_train_stage.py); frames= sets the packed
row length (attention is quadratic in it — the NAR packing tradeoff).
"""

import sys
import time

import numpy as np


def make_corpus(tmp, n_utts, rng):
    import h5py

    from valle_tpu.data.manifests import Cut, CutSet, FeatureRef

    frame_shift = 320.0 / 24000
    h5 = f"{tmp}/feats.h5"
    cuts = []
    with h5py.File(h5, "w") as f:
        for i in range(n_utts):
            dur = float(np.clip(rng.lognormal(np.log(5.0), 0.45), 1.0, 14.0))
            nf = int(round(dur / frame_shift)) + 1
            codes = rng.randint(0, 1024, size=(nf, 8)).astype(np.int16)
            f.create_dataset(f"utt{i}", data=codes)
            n_tok = max(4, int(dur * 15))
            cuts.append(Cut(
                id=f"utt{i}", duration=dur, text="x",
                tokens=[chr(97 + rng.randint(0, 24)) for _ in range(n_tok)],
                features=FeatureRef(
                    storage_path=h5, storage_key=f"utt{i}",
                    num_frames=nf, num_features=8, frame_shift=frame_shift)))
    return CutSet(cuts)


def main():
    import tempfile

    import jax
    import jax.numpy as jnp

    from valle_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    from valle_tpu.data.collation import TextTokenCollater
    from valle_tpu.data.dataset import SpeechSynthesisDataset
    from valle_tpu.data.packing import (
        PackedNarSpeechDataset,
        PackedSpeechDataset,
        SequencePackingSampler,
    )
    from valle_tpu.data.sampler import DynamicBucketingSampler
    from valle_tpu.models import ValleConfig
    from valle_tpu.models.valle import (
        init_valle,
        valle_ar_forward_packed,
        valle_nar_forward_packed,
    )
    from valle_tpu.training import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    small = "small" in sys.argv[1:]  # CPU smoke mode
    stage = "nar" if "nar" in sys.argv[1:] else "ar"
    train_stage = 2 if stage == "nar" else 1
    rows_per_batch = 4 if stage == "nar" else 8
    max_frames = 1024
    for a in sys.argv[1:]:
        if a.startswith("rows="):
            rows_per_batch = int(a.split("=", 1)[1])
        if a.startswith("frames="):
            # packed row length: attention is quadratic in it, so shorter
            # rows trade padding efficiency against attention FLOPs per
            # real frame (the bucketed comparison pads to ~(S+225+375))
            max_frames = int(a.split("=", 1)[1])
    # score-dtype arms: "sbf16" = bf16 score materialization only (the
    # trainer's --attn-score-bf16 auto default, BASELINE.md round-3),
    # "sf32" = f32 only; default runs BOTH in one process so the
    # f32-vs-bf16 comparison is same-session (variant orderings can
    # invert between processes — BASELINE.md methodology).
    if "sbf16" in sys.argv[1:]:
        score_arms = [True]
    elif "sf32" in sys.argv[1:]:
        score_arms = [False]
    else:
        score_arms = [False, True]
    args = [a for a in sys.argv[1:]
            if a not in ("small", "sbf16", "sf32", "ar", "nar")
            and not a.startswith(("rows=", "frames=", "pack-remat="))]
    n_utts = int(args[0]) if args else (40 if small else 400)
    rng_np = np.random.RandomState(0)
    tmp = tempfile.mkdtemp(prefix="packbench")
    cuts = make_corpus(tmp, n_utts, rng_np)
    # both paths see the same cuts; packed rows bound utterance length the
    # way the reference bounds duration (bin/trainer.py filter, 14 s)
    n0 = len(cuts)
    cuts = cuts.filter(
        lambda c: c.features.num_frames <= max_frames
        and len(c.tokens) + 2 <= 256)
    print(f"corpus: {len(cuts)}/{n0} cuts within packed row capacity",
          flush=True)
    symbols = sorted({t for c in cuts for t in c.tokens})
    collater = TextTokenCollater(symbols)

    # remat per the trainer's --remat auto policy (BASELINE.md round-3):
    # AR full (md80 OOMs without), NAR none (+19%). The PACKED arm can
    # need more remat than the bucketed arm — packed NAR rows are ~4x
    # longer sequences (frames=1024 + 225 prefix + text vs T<=375):
    # remat=none AND remat=scores both OOM'd there (2026-08-18); the
    # recorded NAR number runs pack-remat=full — so pack-remat= overrides
    # the packed arm only; each arm runs at its own deployable policy.
    remat = "none" if stage == "nar" else "full"
    pack_remat = remat
    for a in sys.argv[1:]:
        if a.startswith("pack-remat="):
            pack_remat = a.split("=", 1)[1]

    def make_cfg(sbf16, remat=remat):
        if small:
            return ValleConfig(d_model=64, nhead=4, num_layers=2,
                               prefix_mode=1, num_quantizers=8,
                               max_len=4096, attn_score_bf16=sbf16,
                               remat=remat)
        return ValleConfig(d_model=1024, nhead=16, num_layers=12,
                           prefix_mode=1, num_quantizers=8, max_len=4096,
                           attn_score_bf16=sbf16, remat=remat)

    cfg = make_cfg(False)  # param shapes are score-dtype independent
    opt_params, _ = init_valle(jax.random.PRNGKey(0), cfg)
    opt, lr_fn = make_optimizer(opt_params, base_lr=0.05,
                                train_stage=train_stage)
    del opt_params

    # rbg dropout keys: the trainer default (+30% step time vs threefry,
    # bench_train_rng.py)
    rng = jax.random.key(0, impl="rbg")
    results = {}

    def warm_path(name, batches, step_fn, state):
        """Compile every distinct shape before any timing."""
        shapes = {}
        for b in batches:
            key = tuple((k, v.shape) for k, v in sorted(b.items()))
            if key not in shapes:
                shapes[key] = b
        print(f"[{name}] {len(batches)} batches, {len(shapes)} compiled "
              f"shapes", flush=True)
        for b in shapes.values():
            state, m = step_fn(state, b, jnp.int32(0), rng)
            np.asarray(m["loss"])

    def time_epoch(batches, frames, step_fn, state, salt):
        """One timed pass. frames are HOST-precomputed per batch: a
        device sync inside the loop would serialize dispatch and let
        tunnel latency jitter contaminate the arm (the 2026-08-18
        q2c/q2d packed-arm 48% discrepancy); only the last step's loss
        is materialized (steps chain through state, so it forces all)."""
        t0 = time.perf_counter()
        for i, b in enumerate(batches):
            state, m = step_fn(
                state, b, jnp.int32(0), jax.random.fold_in(rng, salt + i))
        np.asarray(m["loss"])
        dt = time.perf_counter() - t0
        return sum(frames) / dt, dt * 1e3 / len(batches)

    def record(name, batches, rounds_fps, rounds_ms, eff):
        # best round: tunnel slowdowns only ever subtract throughput
        k = int(np.argmax(rounds_fps))
        results[name] = {
            "steps": len(batches),
            "ms_per_step": round(rounds_ms[k], 1),
            "real_frames_per_sec": round(rounds_fps[k], 1),
            "rounds_frames_per_sec": [round(f, 1) for f in rounds_fps],
            "padding_efficiency": round(eff, 3),
        }
        print(f"[{name}] {results[name]}", flush=True)

    # ---- bucketed path (reference budget: AR md80 / NAR md40) ----
    dataset = SpeechSynthesisDataset(collater)
    sampler = DynamicBucketingSampler(
        cuts, max_duration=(40 if stage == "nar" else 80), num_buckets=6,
        shuffle=True, seed=1)
    bucket_batches, bucket_frames = [], []
    padded = real = 0
    for b in sampler:
        bd = dataset.__getitem__(b.cuts, pad_audio_to=b.pad_audio_to,
                                 pad_text_to=b.pad_text_to)
        mb = {
            "text": jnp.asarray(bd["text_tokens"], jnp.int32),
            "text_lens": jnp.asarray(bd["text_tokens_lens"], jnp.int32),
            "audio": jnp.asarray(bd["audio_features"], jnp.int32),
            "audio_lens": jnp.asarray(bd["audio_features_lens"], jnp.int32),
        }
        padded += int(mb["audio"].shape[0] * mb["audio"].shape[1])
        real += int(np.sum(bd["audio_features_lens"]))
        bucket_frames.append(int(np.sum(bd["audio_features_lens"])))
        bucket_batches.append(mb)
    bucket_eff = real / max(padded, 1)

    state = init_train_state(jax.random.PRNGKey(0), cfg, opt)
    state = state._replace(params=jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else x, state.params))

    # ---- packed path (same corpus; 1024-frame rows) ----
    pdataset = (PackedNarSpeechDataset(collater) if stage == "nar"
                else PackedSpeechDataset(collater))
    packed_fwd = (valle_nar_forward_packed if stage == "nar"
                  else valle_ar_forward_packed)
    audio_key = "nar_codes" if stage == "nar" else "ar_inputs"
    psampler = SequencePackingSampler(cuts, max_frames=max_frames,
                                      max_text=256,
                                      rows_per_batch=rows_per_batch, seed=1)
    packed_batches, packed_frames = [], []
    padded = real = 0
    for b in psampler:
        bd = pdataset.__getitem__(b.cuts, pad_audio_to=b.pad_audio_to,
                                  pad_text_to=b.pad_text_to)
        mb = {k: jnp.asarray(v) for k, v in bd.items() if k != "utt_id"}
        padded += int(mb[audio_key].shape[0] * mb[audio_key].shape[1])
        real += int(np.sum(bd["row_frames"]))
        packed_frames.append(int(np.sum(bd["row_frames"])))
        packed_batches.append(mb)
    pack_eff = real / max(padded, 1)

    import json

    n_rounds = 1 if small else 3
    for sbf16 in score_arms:
        acfg = make_cfg(sbf16)
        tag = "sbf16" if sbf16 else "sf32"
        step_bucket = jax.jit(make_train_step(
            acfg, opt, lr_fn, train_stage=train_stage, accum_steps=1,
            compute_dtype=jnp.bfloat16))
        pcfg = make_cfg(sbf16, remat=pack_remat)
        step_packed = jax.jit(make_train_step(
            pcfg, opt, lr_fn, train_stage=train_stage, accum_steps=1,
            compute_dtype=jnp.bfloat16,
            forward_fn=packed_fwd))
        warm_path(f"bucketed_{tag}", bucket_batches, step_bucket, state)
        warm_path(f"packed_{tag}", packed_batches, step_packed, state)
        # INTERLEAVED rounds: tunnel throughput drifts within a session,
        # so each arm must sample every time slice, not own one
        b_fps, b_ms, p_fps, p_ms = [], [], [], []
        for r in range(n_rounds):
            fps, ms = time_epoch(bucket_batches, bucket_frames,
                                 step_bucket, state, 1000 * r)
            b_fps.append(fps), b_ms.append(ms)
            fps, ms = time_epoch(packed_batches, packed_frames,
                                 step_packed, state, 1000 * r)
            p_fps.append(fps), p_ms.append(ms)
            print(f"[round {r}] bucketed {b_fps[-1]:.0f} f/s, "
                  f"packed {p_fps[-1]:.0f} f/s", flush=True)
        record(f"bucketed_{tag}", bucket_batches, b_fps, b_ms, bucket_eff)
        record(f"packed_{tag}", packed_batches, p_fps, p_ms, pack_eff)
        results[f"packed_vs_bucketed_{tag}"] = round(
            results[f"packed_{tag}"]["real_frames_per_sec"]
            / results[f"bucketed_{tag}"]["real_frames_per_sec"], 3)
    if len(score_arms) == 2:
        for path in ("bucketed", "packed"):
            results[f"{path}_bf16_vs_f32_scores"] = round(
                results[f"{path}_sbf16"]["real_frames_per_sec"]
                / results[f"{path}_sf32"]["real_frames_per_sec"], 3)
    results["config"] = {"stage": stage, "rows_per_batch": rows_per_batch,
                         "max_frames": max_frames, "n_utts": n_utts,
                         "remat": remat, "pack_remat": pack_remat}
    print(json.dumps(results))


if __name__ == "__main__":
    main()
