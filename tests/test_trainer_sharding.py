"""Trainer CLI multi-device wiring: the executed train step must consume a
('data',)-sharded batch and produce TP-sharded params/optimizer state when
run with --tp on a multi-device mesh (reference DDP semantics,
valle/bin/trainer.py:867,915,1152 — done via mesh shardings + XLA psum)."""

import sys

import numpy as np
import pytest

from valle_tpu.data.manifests import Cut, CutSet, FeatureRef, Hdf5FeatureStore
from valle_tpu.utils import SymbolTable


@pytest.fixture(scope="module")
def tokenized_dir(tmp_path_factory):
    """A pre-tokenized dataset built directly (no tokenizer CLI): HDF5
    (T, 8) codec codes + char tokens + symbol table."""
    root = tmp_path_factory.mktemp("trainer_sharding")
    rng = np.random.RandomState(0)
    texts = ["hello world", "testing speech", "one two three", "a b c",
             "synthesis works", "tiny data", "more text", "sample utt",
             "the quick fox", "jumps over"]
    frame_shift = 320.0 / 24000

    def build(cut_texts, name):
        h5 = root / f"feats_{name}.h5"
        cuts = []
        with Hdf5FeatureStore(h5).writer() as w:
            for i, text in enumerate(cut_texts):
                T = 40 + 7 * (i % 4)
                codes = rng.randint(0, 1024, size=(T, 8)).astype(np.int16)
                key = f"{name}_{i:03d}"
                w.write(key, codes)
                cuts.append(Cut(
                    id=key, duration=T * frame_shift,
                    text=text, tokens=list(text.replace(" ", "_")),
                    speaker=f"spk{i % 2}",
                    features=FeatureRef(
                        storage_path=str(h5), storage_key=key,
                        num_frames=T, num_features=8,
                        frame_shift=frame_shift)))
        CutSet(cuts).to_file(root / f"cuts_{name}.jsonl.gz")

    build(texts[:8], "train")
    build(texts[8:], "dev")
    table = SymbolTable()
    for s in ["<pad>", "<bos>", "<eos>"] + sorted(
            {c for t in texts for c in t.replace(" ", "_")}):
        table.add(s)
    table.to_file(root / "unique_text_tokens.k2symbols")
    return root


def _args(tokenized_dir, exp_dir, tp):
    from valle_tpu.bin.trainer import get_parser

    return get_parser().parse_args([
        "--manifest-dir", str(tokenized_dir),
        "--text-tokens", str(tokenized_dir / "unique_text_tokens.k2symbols"),
        "--exp-dir", str(exp_dir),
        "--decoder-dim", "32", "--nhead", "2", "--num-decoder-layers", "2",
        "--model-name", "valle", "--prefix-mode", "1",
        "--train-stage", "0", "--tp", str(tp),
        "--num-epochs", "1", "--max-duration", "20", "--num-buckets", "2",
        "--filter-min-duration", "0.01", "--filter-max-duration", "10.0",
        "--base-lr", "0.05", "--warmup-steps", "10",
        "--save-every-n", "100", "--valid-interval", "2",
        "--log-interval", "1", "--num-workers", "0",
        "--max-steps-per-epoch", "2",
        "--accumulate-grad-steps", "2",
        "--tensorboard", "false", "--oom-check", "false",
        "--visualize", "true",
    ])


def test_trainer_cli_dp_tp_sharding(tokenized_dir, tmp_path, monkeypatch):
    import jax
    from jax.sharding import PartitionSpec as P

    from valle_tpu.bin import trainer

    placed = []
    orig = trainer._place_batch

    def spy(mb, mesh, accum):
        out = orig(mb, mesh, accum)
        placed.append({k: v.sharding for k, v in out.items()})
        return out

    monkeypatch.setattr(trainer, "_place_batch", spy)

    state = trainer.run(_args(tokenized_dir, tmp_path / "exp", tp=2))

    # every batch that reached the step was data-sharded on the mesh
    assert placed, "no batch was placed on the mesh"
    for sh in placed:
        spec = sh["text"].spec
        assert "data" in spec, f"batch not DP-sharded: {spec}"
        mesh = sh["text"].mesh
        assert dict(mesh.shape) == {"data": 4, "model": 2}

    # the trained params left the run TP-sharded
    # (XLA may drop trailing Nones from output specs — compare normalized)
    def norm(spec, ndim):
        return tuple(spec) + (None,) * (ndim - len(spec))

    attn = state.params["ar"]["decoder"]["layers"]["self_attn"]
    assert norm(attn["in_w"].sharding.spec, 3) == (None, None, "model")
    assert norm(attn["out_w"].sharding.spec, 3) == (None, "model", None)

    # mirrored optimizer buffers too (not replicated)
    flat = jax.tree_util.tree_flatten_with_path(state.opt_state)[0]
    tp_sharded = [p for p, leaf in flat
                  if hasattr(leaf, "sharding")
                  and "model" in (leaf.sharding.spec or ())]
    assert tp_sharded, "optimizer state entirely replicated under TP"

    # training actually advanced
    assert int(state.step) == 2

    # --visualize rendered real model outputs at validation
    pngs = list((tmp_path / "exp").glob("eval_epoch*/**/*.png")) + \
        list((tmp_path / "exp").glob("eval_epoch*/*.png"))
    assert pngs, "no visualization written"


def test_trainer_start_batch_fast_forwards_sampler(tokenized_dir, tmp_path,
                                                   monkeypatch):
    """--start-batch resume continues mid-epoch instead of replaying the
    epoch from the top (reference trainer.py:346-364)."""
    from valle_tpu.bin import trainer

    seen = []
    orig = trainer._model_batch

    def spy(batch, accum, dp=1):
        out = orig(batch, accum, dp)
        seen.append(np.asarray(out["text"]))
        return out

    monkeypatch.setattr(trainer, "_model_batch", spy)

    args = _args(tokenized_dir, tmp_path / "exp_resume", tp=1)
    args.accumulate_grad_steps = 1
    args.max_steps_per_epoch = 3
    args.save_every_n = 2
    args.valid_interval = 100
    args.max_duration = 1.2  # small budget -> several batches per epoch
    args.inf_check = True    # exercise the finite-loss/grad_norm path
    trainer.run(args)
    first_run = list(seen)
    assert len(first_run) >= 3

    seen.clear()
    args2 = _args(tokenized_dir, tmp_path / "exp_resume", tp=1)
    args2.accumulate_grad_steps = 1
    args2.max_steps_per_epoch = 1
    args2.valid_interval = 100
    args2.max_duration = 1.2
    args2.start_batch = 2  # resume from checkpoint-2 (after 2 batches)
    trainer.run(args2)
    assert seen, "resumed run consumed no batch"
    # the first resumed batch is the epoch's 3rd batch, not its 1st
    np.testing.assert_array_equal(seen[0], first_run[2])
    assert (seen[0].shape != first_run[0].shape
            or not np.array_equal(seen[0], first_run[0]))


def test_trainer_cli_rejects_bad_tp(tokenized_dir, tmp_path):
    from valle_tpu.bin import trainer

    with pytest.raises(SystemExit):
        trainer.run(_args(tokenized_dir, tmp_path / "exp_bad", tp=3))
