"""Deferred metric reads must not change what the trainer reports.

`bin/trainer.py` defers `metrics` host reads to log_interval boundaries
(one batched transfer + an in-order MetricsTracker replay) so dispatch
pipelines instead of syncing every step — measured +30% AR step rate on
a network-attached chip (BASELINE.md round-4,
`bench_step_pipelining.py`). `--inf-check true` keeps the historical
per-step sync. The two paths must log bit-identical loss/tot_loss/lr
lines and train bit-identical parameters (the reference's per-batch
tracker semantics, /root/reference/valle/bin/trainer.py:671-713, are
what the replay reproduces).
"""

import re

import numpy as np
import pytest

# module-scoped dataset fixture shared with the sharding tests
from tests.test_trainer_sharding import tokenized_dir  # noqa: F401


def _args(tokenized_dir, exp_dir, inf_check):
    from valle_tpu.bin.trainer import get_parser

    return get_parser().parse_args([
        "--manifest-dir", str(tokenized_dir),
        "--text-tokens", str(tokenized_dir / "unique_text_tokens.k2symbols"),
        "--exp-dir", str(exp_dir),
        "--decoder-dim", "32", "--nhead", "2", "--num-decoder-layers", "2",
        "--model-name", "valle", "--prefix-mode", "1",
        "--train-stage", "0",
        "--num-epochs", "1", "--max-duration", "20", "--num-buckets", "2",
        "--filter-min-duration", "0.01", "--filter-max-duration", "10.0",
        "--base-lr", "0.05", "--warmup-steps", "10",
        "--save-every-n", "100", "--valid-interval", "100",
        "--log-interval", "3", "--num-workers", "0",
        "--max-steps-per-epoch", "7",
        "--inf-check", "true" if inf_check else "false",
        "--tensorboard", "false", "--oom-check", "false",
    ])


def _run(tokenized_dir, exp_dir, inf_check):
    import jax

    from valle_tpu.bin import trainer

    state = trainer.run(_args(tokenized_dir, exp_dir, inf_check))
    # setup_logger(force=True) swaps handlers mid-run, so capture from the
    # trainer's own log file; keep only the message part (after "Epoch")
    lines = []
    for f in sorted(exp_dir.glob("log/log-train*")):
        for raw in f.read_text().splitlines():
            if "tot_loss[" in raw:
                lines.append(raw[raw.index("Epoch"):])
    leaves = [np.asarray(x) for x in jax.tree_util.tree_leaves(state.params)]
    return lines, leaves


def test_deferred_metrics_match_per_step_sync(tokenized_dir, tmp_path):  # noqa: F811
    deferred_lines, deferred_params = _run(
        tokenized_dir, tmp_path / "exp_defer", False)
    sync_lines, sync_params = _run(
        tokenized_dir, tmp_path / "exp_sync", True)

    # the deferred replay logs the same loss[...]/tot_loss[...]/lr lines
    assert deferred_lines, "no log-interval lines captured"
    assert deferred_lines == sync_lines

    # the log-interval lines carry real, finite numbers
    for line in deferred_lines:
        vals = [float(v) for v in re.findall(r"\[([-0-9.e+]+)\]", line)]
        assert vals and all(np.isfinite(vals))

    # metric readback strategy cannot touch the training math
    assert len(deferred_params) == len(sync_params)
    for a, b in zip(deferred_params, sync_params):
        np.testing.assert_array_equal(a, b)
