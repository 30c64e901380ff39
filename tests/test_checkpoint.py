"""Checkpoint layer: orbax round-trips, pruning, stage-switch semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from valle_tpu.models import ValleConfig, init_valle
from valle_tpu.utils import checkpoint as ckpt


def test_save_load_roundtrip(tmp_path):
    cfg = ValleConfig(d_model=32, nhead=2, num_layers=2, num_quantizers=4,
                      max_len=256)
    params, state = init_valle(jax.random.PRNGKey(0), cfg)
    run_params = {"train_stage": 1, "batch_idx_train": 42,
                  "model_config": {"d_model": 32}}
    path = ckpt.save_checkpoint(
        str(tmp_path), "epoch-1", params=params, state=state,
        opt_state={"dummy": jnp.ones((3,))},
        sampler_state={"epoch": 2}, run_params=run_params)
    items, meta = ckpt.load_checkpoint(path)
    assert meta["run_params"]["train_stage"] == 1
    assert meta["sampler_state"]["epoch"] == 2
    for a, b in zip(jax.tree_util.tree_leaves(items["params"]),
                    jax.tree_util.tree_leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(
        np.asarray(items["opt_state"]["dummy"]), np.ones((3,)))


def test_overwrite_same_name(tmp_path):
    params = {"w": jnp.zeros((2,))}
    ckpt.save_checkpoint(str(tmp_path), "best-valid-loss", params=params)
    params2 = {"w": jnp.ones((2,))}
    ckpt.save_checkpoint(str(tmp_path), "best-valid-loss", params=params2)
    items, _ = ckpt.load_checkpoint(str(tmp_path / "best-valid-loss"))
    np.testing.assert_array_equal(np.asarray(items["params"]["w"]),
                                  np.ones((2,)))


def test_remove_checkpoints(tmp_path):
    for step in (100, 200, 300, 400):
        ckpt.save_checkpoint(str(tmp_path), f"checkpoint-{step}",
                             params={"w": jnp.zeros(1)})
    ckpt.save_checkpoint(str(tmp_path), "epoch-1", params={"w": jnp.zeros(1)})
    ckpt.remove_checkpoints(str(tmp_path), keep_last_k=2)
    left = sorted(p.name for p in tmp_path.glob("checkpoint-*"))
    assert left == ["checkpoint-300", "checkpoint-400"]
    assert (tmp_path / "epoch-1").exists()  # epoch ckpts never pruned
