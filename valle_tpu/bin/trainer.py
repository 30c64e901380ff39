#!/usr/bin/env python3
"""VALL-E trainer CLI (TPU-native).

Capability parity with reference ``valle/bin/trainer.py``: the same flag
surface (epochs, start-epoch/start-batch resume, exp-dir, optimizer/
scheduler/base-lr/warmup, seed, inf-check, save-every-n + keep-last-k,
valid-interval, average-period model averaging, accumulate-grad-steps,
dtype, duration filters, train-stage 0/1/2, oom-check) plus the model and
data flags; checkpoint contents include the model hyperparameters so
``infer.py`` can rebuild the model from the checkpoint alone.

TPU-native design:
- one process drives all local devices; data parallelism via a
  ``jax.sharding.Mesh`` (gradient psum by XLA) instead of mp.spawn+DDP
  (reference :849-915,1152); multi-host via ``jax.distributed``;
- the train step is jitted per bucket shape (the bucketing sampler emits a
  bounded static-shape set); ``--oom-check`` pre-compiles and runs the
  largest shapes up front (reference's pessimistic-batch scan, :1096);
- bf16 needs no GradScaler on TPU; ``--inf-check`` validates loss/grad
  finiteness every step;
- crash forensics: the offending batch is dumped to ``batch-<uuid>.npz``
  (reference dumps batch-<uuid>.pt, :699-701).

Example (LibriTTS AR stage, mirrors reference README.md:96-102):
  python3 -m valle_tpu.bin.trainer --max-duration 80 --dtype bfloat16 \
      --save-every-n 10000 --valid-interval 20000 \
      --model-name valle --share-embedding true --norm-first true \
      --add-prenet false --decoder-dim 1024 --nhead 16 \
      --num-decoder-layers 12 --prefix-mode 1 --base-lr 0.05 \
      --warmup-steps 200 --average-period 0 --train-stage 1 \
      --num-epochs 20 --start-epoch 1 --accumulate-grad-steps 4 \
      --exp-dir exp/valle
"""

from __future__ import annotations

import argparse
import copy
import logging
import random
import uuid
from pathlib import Path
from typing import Optional

import numpy as np

from ..models import add_model_arguments, get_model
from ..utils import AttributeDict, MetricsTracker, get_env_info, setup_logger, str2bool
from ..utils import checkpoint as ckpt_lib


def get_parser():
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("--world-size", type=int, default=1,
                        help="Total data-parallel processes (multi-host).")
    parser.add_argument("--tensorboard", type=str2bool, default=True)
    parser.add_argument("--num-epochs", type=int, default=20)
    parser.add_argument("--start-epoch", type=int, default=1,
                        help="Resume from exp-dir/epoch-{start_epoch-1}.")
    parser.add_argument("--start-batch", type=int, default=0,
                        help="If positive, resume from "
                             "exp-dir/checkpoint-{start_batch}.")
    parser.add_argument("--exp-dir", type=str, default="exp/valle_dev")
    parser.add_argument("--optimizer-name", type=str, default="ScaledAdam")
    parser.add_argument("--optim-state-dtype", type=str, default="float32",
                        choices=("float32", "bfloat16"),
                        help="Storage dtype of the per-parameter-sized "
                             "ScaledAdam buffers (momentum + second "
                             "moments). bfloat16 halves the optimizer's "
                             "m/v HBM traffic; arithmetic stays f32 "
                             "(optim/scaled_adam.py). float32 = exact "
                             "reference-trajectory parity. Ignored by "
                             "other optimizers.")
    parser.add_argument("--scheduler-name", type=str, default="Eden")
    parser.add_argument("--base-lr", type=float, default=0.05)
    parser.add_argument("--warmup-steps", type=int, default=200)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--inf-check", type=str2bool, default=False)
    parser.add_argument("--save-every-n", type=int, default=10000)
    parser.add_argument("--valid-interval", type=int, default=10000)
    parser.add_argument("--keep-last-k", type=int, default=20)
    parser.add_argument("--average-period", type=int, default=0)
    parser.add_argument("--accumulate-grad-steps", type=int, default=1)
    parser.add_argument("--dtype", type=str, default="float32",
                        help="float32 | bfloat16 (fp16 has no TPU benefit; "
                             "maps to bfloat16).")
    parser.add_argument("--filter-min-duration", type=float, default=0.0)
    parser.add_argument("--filter-max-duration", type=float, default=20.0)
    parser.add_argument("--train-stage", type=int, default=0,
                        help="0: all, 1: AR decoder, 2: NAR decoders.")
    parser.add_argument("--tp", type=int, default=1,
                        help="Tensor-parallel size; local devices are laid "
                             "out as a (data = n//tp, model = tp) mesh.")
    parser.add_argument("--visualize", type=str2bool, default=False)
    parser.add_argument("--profile", type=str2bool, default=False,
                        help="Capture a jax.profiler trace of training "
                             "steps 10-20 into exp-dir/profile.")
    parser.add_argument("--oom-check", type=str2bool, default=True)
    parser.add_argument("--rng-impl", type=str, default="rbg",
                        choices=("rbg", "threefry"),
                        help="Dropout PRNG: rbg is ~30%% faster per train "
                             "step on TPU; threefry is JAX's cross-"
                             "backend-reproducible default.")
    parser.add_argument("--log-interval", type=int, default=100)
    parser.add_argument("--max-steps-per-epoch", type=int, default=0,
                        help="Debug: cap steps per epoch (0 = unlimited).")
    add_model_arguments(parser)
    from ..data.datamodule import TtsDataModule

    TtsDataModule.add_arguments(parser)
    return parser


def get_params() -> AttributeDict:
    return AttributeDict({
        "best_train_loss": float("inf"),
        "best_valid_loss": float("inf"),
        "best_train_epoch": -1,
        "best_valid_epoch": -1,
        "batch_idx_train": 0,
        "log_interval": 100,
        "reset_interval": 200,
        "valid_interval": 10000,
        "env_info": get_env_info(),
    })


def filter_short_and_long_utterances(cuts, min_duration, max_duration):
    def keep(c):
        return min_duration < c.duration < max_duration

    return cuts.filter(keep)


def _model_batch(batch, accum: int, dp: int = 1):
    """Host batch dict -> model inputs, reshaped for grad accumulation.

    The batch is rounded to a multiple of ``accum * dp`` so each microbatch
    divides evenly over the 'data' mesh axis (tiny batches are duplicated
    up, oversized remainders dropped — the sampler's duration budget makes
    remainders rare).
    """
    from ..data.input_strategies import PromptedFeatures

    if "ar_inputs" in batch or "nar_codes" in batch:
        # sequence-packed batch (AR or NAR): already model-ready
        out = {k: np.asarray(v) for k, v in batch.items() if k != "utt_id"}
        return _group_batch(out, accum, dp)

    feats = batch["audio_features"]
    lens = batch["audio_features_lens"]
    out = {
        "text": np.asarray(batch["text_tokens"], np.int32),
        "text_lens": np.asarray(batch["text_tokens_lens"], np.int32),
    }
    if isinstance(feats, PromptedFeatures):
        prompts, features = feats.data
        p_lens, f_lens = lens.data
        out["audio"] = np.asarray(features, np.int32)
        out["audio_lens"] = np.asarray(f_lens, np.int32)
        out["prompt_codes"] = np.asarray(prompts, np.int32)
        out["prompt_lens"] = np.asarray(p_lens, np.int32)
    else:
        feats = np.asarray(feats)
        if np.issubdtype(feats.dtype, np.floating):
            out["audio"] = feats.astype(np.float32)  # mel features
        else:
            out["audio"] = feats.astype(np.int32)    # codec tokens
        out["audio_lens"] = np.asarray(lens, np.int32)

    return _group_batch(out, accum, dp)


def _group_batch(out, accum: int, dp: int):
    group = accum * dp
    if group > 1:
        B = out["text"].shape[0]
        usable = (B // group) * group
        if usable == 0:  # duplicate to fill microbatches / data shards
            reps = -(-group // B)
            out = {k: np.concatenate([v] * reps)[:group]
                   for k, v in out.items()}
            usable = group
        if accum > 1:
            out = {k: v[:usable].reshape(accum, usable // accum,
                                         *v.shape[1:])
                   for k, v in out.items()}
        else:
            out = {k: v[:usable] for k, v in out.items()}
    return out


def _place_batch(mb, mesh, accum: int):
    """device_put the host batch with DP shardings over the mesh."""
    import jax

    from ..parallel.mesh import batch_shardings

    return jax.device_put(
        mb, batch_shardings(mb, mesh, leading_accum=accum > 1))


def load_checkpoint_if_available(params, exp_dir: Path, model,
                                 opt_state_template=None):
    """Resume logic incl. stage-switch (reference trainer.py:331-483).

    Returns (train_state_items or None, meta). When the saved train stage
    differs from the requested one, optimizer state is dropped and the
    per-stage best losses are reset (reference :383-416). On a same-stage
    resume the restored opt_state (raw dicts from orbax) is rebuilt into
    the optax state structure via ``opt_state_template``.
    """
    path = None
    if params.start_batch > 0:
        path = exp_dir / f"checkpoint-{params.start_batch}"
    elif (exp_dir / "preempted").exists():
        # automatic preemption resume: schedulers restart the same
        # command, so the SIGTERM checkpoint loads without extra flags
        path = exp_dir / "preempted"
    elif params.start_epoch > 1:
        path = exp_dir / f"epoch-{params.start_epoch - 1}"
    if path is None or not path.exists():
        return None, {}
    logging.info(f"Loading checkpoint from {path}")
    items, meta = ckpt_lib.load_checkpoint(str(path))
    run_params = (meta or {}).get("run_params") or {}
    saved_stage = run_params.get("train_stage", 0)
    if saved_stage != params.train_stage:
        logging.info(
            f"Switching training stage {saved_stage} -> "
            f"{params.train_stage}: dropping optimizer state")
        items.pop("opt_state", None)
    else:
        for k in ("best_train_loss", "best_valid_loss", "batch_idx_train"):
            if k in run_params:
                params[k] = run_params[k]
        if "opt_state" in items and opt_state_template is not None:
            items["opt_state"] = ckpt_lib.restore_tree(
                opt_state_template, items["opt_state"])
    return items, meta


_VALID_FWD_CACHE: dict = {}


def compute_validation_loss(params, model, model_params, model_state,
                            valid_dl, compute_dtype, mesh=None):
    import jax
    import jax.numpy as jnp
    from functools import partial

    from ..models import ValleModel
    from ..models.valle import valle_forward

    tot = MetricsTracker()
    # cache the jitted forward across validation rounds: rebuilding
    # jax.jit(partial(...)) each call discards the trace cache and
    # re-traces every bucket shape every valid_interval
    key = (id(model), params.train_stage, compute_dtype)
    fwd = _VALID_FWD_CACHE.get(key)
    if fwd is None:
        if isinstance(model, ValleModel):
            fwd = jax.jit(partial(
                valle_forward, cfg=model.cfg,
                train_stage=params.train_stage,
                deterministic=True, compute_dtype=compute_dtype,
                nar_stage=jnp.int32(1)))
        else:
            from ..models.transformer import transformer_tts_forward

            fwd = jax.jit(partial(
                transformer_tts_forward, cfg=model.cfg,
                deterministic=True, compute_dtype=compute_dtype))
        _VALID_FWD_CACHE[key] = fwd
    # dispatch the whole dev set without per-batch host syncs (same
    # pipelining rationale as the train loop's deferred metric reads),
    # then fetch every batch's scalars at once
    pending, n_utts = [], []
    for batch in valid_dl:
        mb = _model_batch(batch, accum=1,
                          dp=mesh.shape["data"] if mesh is not None else 1)
        if mesh is not None:
            mb = _place_batch(mb, mesh, accum=1)
        loss, metrics, _ = fwd(model_params, batch=mb, state=model_state)
        pending.append(dict(metrics, loss=loss))
        n_utts.append(len(mb["text"]))
    if pending:
        keys = sorted(pending[0])
        # cached like fwd above: a fresh jit(lambda) each call would
        # retrace (and over a remote transport, recompile) per validation
        stack = _VALID_FWD_CACHE.get(("stack", tuple(keys)))
        if stack is None:
            stack = jax.jit(lambda ms, _k=tuple(keys): jnp.stack(
                [jnp.stack([jnp.asarray(m[k], jnp.float32) for k in _k])
                 for m in ms]))
            _VALID_FWD_CACHE[("stack", tuple(keys))] = stack
        stacked = stack(pending)
        for row, n in zip(np.asarray(stacked), n_utts):
            vals = dict(zip(keys, row))
            frames = float(vals["frames"])
            tot["loss"] += float(vals["loss"])
            tot["frames"] += frames
            tot["utterances"] += n
            for k in ("ArTop10Accuracy", "NarTop10Accuracy"):
                if k in vals:
                    tot[k] += float(vals[k]) * frames
    tot.reduce()
    loss_value = tot["loss"] / max(tot["frames"], 1)
    if tot["frames"] == 0:
        logging.warning("validation loader produced no batches; "
                        "skipping best-valid tracking")
        return tot
    if loss_value < params.best_valid_loss:
        params.best_valid_epoch = params.cur_epoch
        params.best_valid_loss = loss_value
    return tot


# Preemption-aware save (SURVEY 5.3): SIGTERM/SIGUSR1 (the signals cloud
# schedulers send before eviction) set this flag; the train loop finishes
# the in-flight step, writes a "preempted" checkpoint with sampler state,
# and exits 0 so `--start-batch`-style resume continues mid-epoch.
_PREEMPT = {"signum": None}


def _on_preempt_signal(signum, frame):  # pragma: no cover - signal path
    _PREEMPT["signum"] = signum
    logging.warning(
        f"received signal {signum}: will checkpoint and exit after the "
        "current step")


def install_preemption_handler():
    """Install SIGTERM/SIGUSR1 checkpoint-and-exit handlers.

    Returns a zero-arg restorer that reinstates whatever handlers were
    active before. `run()` calls it on every exit path: a host that
    embeds the trainer (pytest, a notebook, a supervisor) must not keep
    swallowing external SIGTERM after training ends — with the handler
    left installed, TERM merely sets _PREEMPT and no loop is running to
    act on it, making the process unkillable except by KILL.
    """
    import signal
    import threading

    if threading.current_thread() is not threading.main_thread():
        return lambda: None  # signals only deliverable to the main thread
    previous = {}
    for sig in (signal.SIGTERM, signal.SIGUSR1):
        try:
            previous[sig] = signal.getsignal(sig)
            signal.signal(sig, _on_preempt_signal)
        except (ValueError, OSError):  # pragma: no cover - exotic hosts
            previous.pop(sig, None)

    def restore():
        for sig, handler in previous.items():
            try:
                if signal.getsignal(sig) is _on_preempt_signal:
                    signal.signal(sig, handler)
            except (ValueError, OSError):  # pragma: no cover
                pass

    return restore


def save_checkpoint(exp_dir: Path, name: str, params, state, model,
                    sampler_state=None, model_avg=None):
    run_params = {
        "train_stage": params.train_stage,
        "batch_idx_train": params.batch_idx_train,
        "best_train_loss": params.best_train_loss,
        "best_valid_loss": params.best_valid_loss,
        "model_config": model.config_dict(),
        "model_name": params.model_name,
        "text_tokens": str(params.text_tokens),
        "env_info": params.env_info,
    }
    # NOT rank-gated: orbax saves are collective — every process writes
    # the shards it owns and process 0 finalizes + writes the sidecar
    # (see utils/checkpoint.save_checkpoint). Host-only fs work like
    # pruning stays on process 0.
    ckpt_lib.save_checkpoint(
        str(exp_dir), name, params=state.params,
        state=state.model_state, opt_state=state.opt_state,
        model_avg=model_avg,
        sampler_state=sampler_state, run_params=run_params)


def run(args) -> None:
    """Train; preemption handlers are scoped to the call (restored on
    every exit path, including the preemption SystemExit itself)."""
    _PREEMPT["signum"] = None
    restore = install_preemption_handler() or (lambda: None)
    try:
        return _run(args)
    finally:
        restore()


def _run(args) -> None:
    import jax
    import jax.numpy as jnp

    from ..data.datamodule import TtsDataModule
    from ..parallel.mesh import batch_shardings, make_mesh, setup_distributed
    from ..training import (
        TrainState,
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    setup_distributed()
    from ..utils import enable_compilation_cache

    enable_compilation_cache()
    params = get_params()
    params.update(vars(args))
    params.valid_interval = args.valid_interval
    params.log_interval = args.log_interval

    exp_dir = Path(args.exp_dir)
    exp_dir.mkdir(parents=True, exist_ok=True)
    setup_logger(f"{exp_dir}/log/log-train", rank=jax.process_index(),
                 world_size=jax.process_count())
    logging.info("Training started")
    logging.info(params)

    random.seed(args.seed)
    np.random.seed(args.seed)
    # dropout PRNG: "rbg" (hardware bit generator) cuts the train step
    # ~30% vs threefry on TPU (256 vs 333 ms/step at 12L/1024d bf16 —
    # benchmarks/bench_train_rng.py; threefry spends ~2.4 ms/layer
    # generating dropout bits). Deterministic per seed either way;
    # "threefry" restores JAX's cross-backend-stable default.
    if args.rng_impl == "rbg":
        rng = jax.random.key(args.seed, impl="rbg")
    else:
        rng = jax.random.PRNGKey(args.seed)

    tb_writer = None
    if args.tensorboard and jax.process_index() == 0:
        from tensorboardX import SummaryWriter

        tb_writer = SummaryWriter(
            log_dir=f"{exp_dir}/tensorboard_stage{args.train_stage}")

    compute_dtype = (jnp.bfloat16 if args.dtype.lower() in
                     ("bfloat16", "bf16", "float16", "fp16")
                     else jnp.float32)

    model = get_model(params)
    cfg = model.cfg
    logging.info(f"Model config: {cfg}")

    init_params, init_state = model.init(jax.random.PRNGKey(args.seed))
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(init_params))
    logging.info(f"Number of model parameters: {n_params}")

    opt, lr_fn = make_optimizer(
        init_params, base_lr=args.base_lr,
        clipping_scale=2.0 if args.optimizer_name == "ScaledAdam" else None,
        train_stage=args.train_stage, warmup_steps=args.warmup_steps,
        optimizer_name=args.optimizer_name,
        scheduler_name=args.scheduler_name,
        decoder_dim=args.decoder_dim,
        state_dtype=args.optim_state_dtype)
    opt_state = opt.init(init_params)
    state = TrainState(params=init_params, opt_state=opt_state,
                       model_state=init_state,
                       step=jnp.zeros((), jnp.int32))

    # resume
    items, meta = load_checkpoint_if_available(
        params, exp_dir, model, opt_state_template=opt_state)
    sampler_state = None
    model_avg = None
    if items is not None:
        state = TrainState(
            params=items["params"],
            opt_state=items.get("opt_state", opt_state),
            model_state=items.get("state", init_state),
            step=jnp.asarray(params.batch_idx_train, jnp.int32))
        model_avg = items.get("model_avg")
        sampler_state = (meta or {}).get("sampler_state")
    if args.average_period > 0 and model_avg is None:
        model_avg = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float64), state.params)

    # mesh + sharding: (data = n_devices // tp, model = tp); params and
    # mirrored optimizer buffers carry the TP shardings, batches are
    # device_put with DP shardings every step (reference DDP semantics,
    # trainer.py:867,915,1152 — done the XLA way: shardings in, psum out)
    n_dev = len(jax.devices())
    if n_dev % args.tp != 0:
        raise SystemExit(
            f"--tp {args.tp} does not divide device count {n_dev}")
    mesh = make_mesh(tp=args.tp)
    logging.info(f"Device mesh: {dict(mesh.shape)}")
    from valle_tpu.training import shard_train_state

    state = shard_train_state(state, mesh)

    forward_fn = None
    if getattr(args, "ar_pack", False):
        if args.train_stage != 1 or args.model_name.lower() != "valle":
            raise SystemExit(
                "--ar-pack requires --train-stage 1 and --model-name valle")
        from ..models.valle import valle_ar_forward_packed

        forward_fn = valle_ar_forward_packed
    if getattr(args, "nar_pack", False):
        if (args.train_stage != 2 or args.model_name.lower() != "valle"
                or args.prefix_mode not in (0, 1)):
            raise SystemExit(
                "--nar-pack requires --train-stage 2, --model-name valle "
                "and --prefix-mode 0/1")
        from ..models.valle import valle_nar_forward_packed

        forward_fn = valle_nar_forward_packed
    step_fn = jax.jit(make_train_step(
        cfg, opt, lr_fn, train_stage=args.train_stage,
        accum_steps=args.accumulate_grad_steps,
        compute_dtype=compute_dtype, forward_fn=forward_fn))

    # Multi-process data policy (the SPMD way, not the DDP way): every
    # process iterates the IDENTICAL global batch sequence (same cuts,
    # same seed, same deterministic sampler -> same shapes), and
    # `_place_batch`'s device_put splits the batch rows over the global
    # 'data' mesh axis — each host only transfers the shards its own
    # devices hold. Rank-sharding the sampler instead (the reference's
    # DDP semantics, trainer.py:867,915) would hand different processes
    # different bucket SHAPES for the same lockstep step and deadlock
    # the collective. The cost is redundant host-side collation of rows
    # a process doesn't own — codec tokens are ~8 B/frame, negligible
    # next to a train step. Exercised for real by
    # tests/test_multiprocess.py (2-process trajectory == 1-process).
    if jax.process_count() > 1 and args.world_size_data != 1:
        raise SystemExit(
            "--world-size-data must stay 1 under multi-process training: "
            "batches are replicated across hosts and row-sharded by the "
            "mesh (see comment above); rank-sharded sampling would "
            "desynchronize batch shapes across the lockstep SPMD step")
    dm = TtsDataModule(args)
    train_cuts = filter_short_and_long_utterances(
        dm.train_cuts(), args.filter_min_duration, args.filter_max_duration)
    valid_cuts = dm.dev_cuts()
    train_dl = dm.train_dataloaders(train_cuts,
                                    sampler_state_dict=sampler_state)
    valid_dl = dm.valid_dataloaders(valid_cuts)

    if args.oom_check:
        scan_largest_batches_for_compile(args, cfg, step_fn, state,
                                         train_dl, rng, mesh)

    for epoch in range(args.start_epoch, args.num_epochs + 1):
        params.cur_epoch = epoch
        train_dl.sampler.set_epoch(epoch - 1)
        state, model_avg = train_one_epoch(
            args, params, model, state, step_fn, train_dl, valid_dl,
            compute_dtype, tb_writer, rng, epoch, exp_dir, model_avg, mesh)
        save_checkpoint(exp_dir, f"epoch-{epoch}", params, state, model,
                        sampler_state=train_dl.state_dict(),
                        model_avg=model_avg)
    logging.info("Done!")
    return state


def scan_largest_batches_for_compile(args, cfg, step_fn, state, train_dl,
                                     rng, mesh=None):
    """TPU analog of the reference OOM pre-scan (trainer.py:1096-1140):
    compile + run the train step on each distinct bucket shape up front."""
    import jax
    import jax.numpy as jnp

    shapes = {}
    # iterating the sampler pops its mid-epoch resume counter
    # (_resume_consumed); preserve it or --start-batch resume silently
    # replays the epoch from the top when oom-check is on
    resume_consumed = getattr(train_dl.sampler, "_resume_consumed", 0)
    for b in train_dl.sampler:
        key = (b.pad_audio_to, b.pad_text_to)
        if key not in shapes:
            shapes[key] = b
    train_dl.sampler._resume_consumed = resume_consumed
    logging.info(f"compile-scan over {len(shapes)} bucket shapes")
    for key, b in sorted(shapes.items(), reverse=True):
        batch = train_dl.dataset.__getitem__(
            b.cuts, pad_audio_to=b.pad_audio_to, pad_text_to=b.pad_text_to)
        mb = _model_batch(batch, args.accumulate_grad_steps,
                          dp=mesh.shape["data"] if mesh is not None else 1)
        if mesh is not None:
            mb = _place_batch(mb, mesh, args.accumulate_grad_steps)
        try:
            new_state, metrics = step_fn(state, mb, jnp.int32(0), rng)
            jax.block_until_ready(metrics["loss"])
            logging.info(f"  shape {key}: ok (loss {float(metrics['loss']):.1f})")
        except Exception:
            logging.exception(f"compile-scan failed on shape {key} "
                              f"(batch of {len(b.cuts)} cuts)")
            raise


def visualize_one_batch(args, model, state, valid_dl, exp_dir, epoch,
                        compute_dtype):
    """Render eval heatmaps (reference trainer.py:575-583 + visualizer):
    the model's actual encoder output and decoder prediction/codes."""
    import jax

    from ..models import ValleModel
    from ..models.visualizer import visualize

    out_dir = exp_dir / f"eval_epoch{epoch}"
    out_dir.mkdir(parents=True, exist_ok=True)
    batch = next(iter(valid_dl))
    mb = _model_batch(batch, accum=1)
    if isinstance(model, ValleModel):
        from ..models.valle import valle_visualize_outputs

        enc, dec = jax.jit(valle_visualize_outputs, static_argnames="cfg")(
            state.params, model.cfg, mb, state.model_state)
    else:
        from ..models.transformer import transformer_visualize_outputs

        enc, dec = jax.jit(
            transformer_visualize_outputs, static_argnames="cfg")(
                state.params, model.cfg, mb, state.model_state)
    visualize((np.asarray(enc), np.asarray(dec)), batch, str(out_dir))
    logging.info(f"visualizations written to {out_dir}")


def _diagnose_nonfinite_step(args, model, prev_state, mb, epoch, rng,
                             compute_dtype):
    """Name the first non-finite op/leaf (reference --inf-check hooks,
    trainer.py:177-180 — done post-hoc with checkify, zero steady cost)."""
    import jax
    import jax.numpy as jnp

    from ..utils.inf_check import diagnose_nonfinite

    if prev_state is None:
        return "(rerun with --inf-check true for a per-op diagnosis)"
    from ..models import ValleModel
    from ..models.valle import valle_forward

    if not isinstance(model, ValleModel):
        from ..models.transformer import transformer_tts_forward

        forward_fn = transformer_tts_forward
    elif "ar_inputs" in mb:  # sequence-packed AR batch
        from ..models.valle import valle_ar_forward_packed

        forward_fn = valle_ar_forward_packed
    elif "nar_codes" in mb:  # sequence-packed NAR batch
        from ..models.valle import valle_nar_forward_packed

        forward_fn = valle_nar_forward_packed
    else:
        forward_fn = valle_forward

    micro = mb
    step_rng = jax.random.fold_in(rng, prev_state.step)
    if args.accumulate_grad_steps > 1:  # diagnose the first microbatch
        micro = {k: v[0] for k, v in mb.items()}
        # match the real step's per-microbatch fold (training.py) or the
        # dropout masks differ and the NaN may not reproduce
        step_rng = jax.random.fold_in(step_rng, 0)

    def loss_fn(p, batch):
        loss, _, _ = forward_fn(
            p, model.cfg, batch, train_stage=args.train_stage,
            rng=step_rng,
            deterministic=False, compute_dtype=compute_dtype,
            state=prev_state.model_state)
        return loss

    try:
        return diagnose_nonfinite(loss_fn, prev_state.params, micro)
    except Exception as e:  # never mask the original failure
        return f"(diagnosis failed: {e})"


def train_one_epoch(args, params, model, state, step_fn, train_dl, valid_dl,
                    compute_dtype, tb_writer, rng, epoch, exp_dir,
                    model_avg, mesh=None):
    import jax
    import jax.numpy as jnp

    dp = mesh.shape["data"] if mesh is not None else 1
    tot_loss = MetricsTracker()
    iter_dl = iter(train_dl)

    # Deferred metric reads: `float(metrics["loss"])` every step forces a
    # host<->device round trip per step, which serializes dispatch — the
    # host can't run ahead preparing batch N+1 while step N executes, and
    # on network-attached chips each sync is a full RTT (measured 27.5 ms
    # on this tunnel; per-step sync costs the AR stage 30% of its step
    # rate — BASELINE.md round-4, `bench_step_pipelining.py`). Metrics
    # stay on device and are fetched in ONE batched transfer per
    # log_interval window; the MetricsTracker recurrence then replays
    # per step in order, so logged values are bit-identical to the
    # per-step path (tests/test_trainer_deferred_metrics.py). inf_check
    # keeps the per-step sync: its contract is catching the FIRST
    # non-finite step before the next one launches.
    defer = not args.inf_check
    pending = []                     # [(batch_idx_train, metrics)] device
    _METRIC_KEYS = ("loss", "frames", "lr", "grad_norm")
    # one jit object for the whole run (module cache): traces are cached
    # per pending-list length, so epoch 2+ reuses epoch 1's compilations
    stack_metrics = _VALID_FWD_CACHE.get(("train_stack", _METRIC_KEYS))
    if stack_metrics is None:
        stack_metrics = jax.jit(lambda ms: jnp.stack(
            [jnp.stack([jnp.asarray(m[k], jnp.float32)
                        for k in _METRIC_KEYS]) for m in ms]))
        _VALID_FWD_CACHE[("train_stack", _METRIC_KEYS)] = stack_metrics

    def flush_pending():
        """Fetch all pending step metrics in one transfer and replay the
        tracker recurrence; returns the LAST step's (loss, frames, lr,
        grad_norm) or None if nothing was pending."""
        nonlocal tot_loss, pending
        if not pending:
            return None
        vals = np.asarray(stack_metrics([m for _, m in pending]))
        last = None
        for (bi, _), row in zip(pending, vals):
            l, f = float(row[0]), float(row[1])
            cur = MetricsTracker()
            cur["loss"] = l
            cur["frames"] = f
            tot_loss = (tot_loss * (1 - 1.0 / params.reset_interval)) + cur
            last = (l, f, float(row[2]), float(row[3]))
        pending = []
        return last

    profiling = False
    for batch_idx, batch in enumerate(iter_dl):
        params.batch_idx_train += 1
        if args.profile and epoch == args.start_epoch:
            if batch_idx == 10 and not profiling:
                jax.profiler.start_trace(str(exp_dir / "profile"))
                profiling = True
            elif batch_idx == 20 and profiling:
                jax.profiler.stop_trace()
                profiling = False
                logging.info(f"profiler trace written to {exp_dir}/profile")
        mb = _model_batch(batch, args.accumulate_grad_steps, dp=dp)
        if mesh is not None:
            mb = _place_batch(mb, mesh, args.accumulate_grad_steps)
        prev_state = state if args.inf_check else None
        try:
            # reference steps Eden with epoch-1 (trainer.py:1033)
            state, metrics = step_fn(state, mb, jnp.int32(epoch - 1), rng)
        except Exception:
            fname = exp_dir / f"batch-{uuid.uuid4()}.npz"
            np.savez(fname, **{k: np.asarray(v) for k, v in mb.items()})
            logging.exception(f"train step failed; batch saved to {fname}")
            if defer:
                flush_pending()  # tot_loss reflects every completed step
            raise

        if defer:
            pending.append((params.batch_idx_train, metrics))
        else:
            loss = float(metrics["loss"])
            frames = float(metrics["frames"])
            if args.inf_check and not (np.isfinite(loss) and
                                       np.isfinite(float(metrics["grad_norm"]))):
                fname = exp_dir / f"batch-{uuid.uuid4()}.npz"
                np.savez(fname, **{k: np.asarray(v) for k, v in mb.items()})
                report = _diagnose_nonfinite_step(args, model, prev_state, mb,
                                                  epoch, rng, compute_dtype)
                raise FloatingPointError(
                    f"non-finite loss {loss} / grad_norm "
                    f"{float(metrics['grad_norm'])} at batch "
                    f"{params.batch_idx_train}; batch saved to {fname}\n"
                    f"{report}")

            cur = MetricsTracker()
            cur["loss"] = loss
            cur["frames"] = frames
            tot_loss = (tot_loss * (1 - 1.0 / params.reset_interval)) + cur

        if args.average_period > 0 and (
                params.batch_idx_train % args.average_period == 0):
            # model_avg += (model - model_avg) * period / batch_idx
            # (icefall update_averaged_model semantics, trainer.py:703-714)
            w = args.average_period / max(params.batch_idx_train,
                                          args.average_period)
            model_avg = jax.tree_util.tree_map(
                lambda avg, p: avg + (p.astype(jnp.float64) - avg) * w,
                model_avg, state.params)

        if params.batch_idx_train % args.save_every_n == 0:
            save_checkpoint(exp_dir,
                            f"checkpoint-{params.batch_idx_train}",
                            params, state, model,
                            sampler_state=train_dl.state_dict(),
                            model_avg=model_avg)
            if jax.process_index() == 0:   # single writer prunes too
                ckpt_lib.remove_checkpoints(str(exp_dir), args.keep_last_k)

        preempted = _PREEMPT["signum"] is not None
        if jax.process_count() > 1:
            # checkpoint saves are collective (orbax): a SIGTERM landing
            # on one host only would deadlock the job unless all ranks
            # agree to save — 4-byte allgather per step, noise vs a
            # 100+ ms train step
            from jax.experimental import multihost_utils

            preempted = bool(multihost_utils.process_allgather(
                np.int32(preempted)).max())
        if preempted:
            if defer:
                flush_pending()  # tot_loss reflects every completed step
            save_checkpoint(exp_dir, "preempted", params, state, model,
                            sampler_state=train_dl.state_dict(),
                            model_avg=model_avg)
            logging.warning(
                f"preemption checkpoint saved to {exp_dir}/preempted "
                f"(signal {_PREEMPT['signum']}, batch "
                f"{params.batch_idx_train}); exiting")
            raise SystemExit(0)

        if batch_idx % params.log_interval == 0:
            if defer:
                loss, frames, lr, grad_norm = flush_pending()
            else:
                lr = float(metrics.get("lr", 0.0))
                grad_norm = float(metrics["grad_norm"])
            logging.info(
                f"Epoch {epoch}, batch {batch_idx}, train_stage "
                f"{args.train_stage}, "
                f"loss[{loss / max(frames, 1):.4f}], "
                f"tot_loss[{tot_loss['loss'] / max(tot_loss['frames'], 1):.4f}]"
                f", lr: {lr:.2e}")
            if tb_writer is not None:
                tb_writer.add_scalar("train/grad_norm", grad_norm,
                                     params.batch_idx_train)
                tb_writer.add_scalar("train/learning_rate", lr,
                                     params.batch_idx_train)
                tb_writer.add_scalar("train/current_loss",
                                     loss / max(frames, 1),
                                     params.batch_idx_train)
                tb_writer.add_scalar(
                    "train/tot_loss",
                    tot_loss["loss"] / max(tot_loss["frames"], 1),
                    params.batch_idx_train)

        if params.batch_idx_train % params.valid_interval == 0:
            logging.info("Computing validation loss")
            valid_info = compute_validation_loss(
                params, model, state.params, state.model_state, valid_dl,
                compute_dtype, mesh=mesh)
            logging.info(f"Epoch {epoch}, validation: {valid_info}")
            if args.visualize and jax.process_index() == 0:
                visualize_one_batch(args, model, state, valid_dl,
                                    exp_dir, epoch, compute_dtype)
            if tb_writer is not None:
                valid_info.write_summary(tb_writer, "train/valid_",
                                         params.batch_idx_train)
            if params.best_valid_epoch == epoch:
                save_checkpoint(exp_dir, "best-valid-loss", params, state,
                                model, model_avg=model_avg)

        if args.max_steps_per_epoch and (
                batch_idx + 1 >= args.max_steps_per_epoch):
            break

    if profiling:  # epoch ended before batch 20: finalize the trace
        jax.profiler.stop_trace()
        logging.info(f"profiler trace written to {exp_dir}/profile")

    flush_pending()   # steps since the last log window
    epoch_loss = tot_loss["loss"] / max(tot_loss["frames"], 1)
    if epoch_loss < params.best_train_loss:
        params.best_train_epoch = epoch
        params.best_train_loss = epoch_loss
        save_checkpoint(exp_dir, "best-train-loss", params, state, model,
                        model_avg=model_avg)
    return state, model_avg


def main():
    parser = get_parser()
    args = parser.parse_args()
    run(args)


if __name__ == "__main__":
    main()
