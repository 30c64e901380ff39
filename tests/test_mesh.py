"""Mesh/sharding rules: TP specs land on the right leaves, divisibility
guard falls back to replication, batch sharding covers the data axis."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from valle_tpu.models import ValleConfig, init_valle
from valle_tpu.parallel.mesh import (
    batch_shardings,
    make_mesh,
    param_shardings,
)


def test_make_mesh_shapes():
    mesh = make_mesh(tp=2)
    assert mesh.shape == {"data": 4, "model": 2}
    mesh_dp = make_mesh(tp=1)
    assert mesh_dp.shape == {"data": 8, "model": 1}


def test_param_shardings_rules():
    cfg = ValleConfig(d_model=64, nhead=4, num_layers=2, num_quantizers=4,
                      max_len=256)
    params, _ = init_valle(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(tp=2)
    sh = param_shardings(params, mesh)

    attn = sh["ar"]["decoder"]["layers"]["self_attn"]
    # the packed (d, 3d) QKV projection is replicated: a 'model' split
    # crosses the Q/K/V block boundaries and would force per-layer
    # resharding collectives (see parallel/mesh.py)
    assert attn["in_w"].spec == P()
    assert attn["out_w"].spec == P(None, "model", None)   # row parallel
    ffn = sh["ar"]["decoder"]["layers"]["ffn"]
    assert ffn["lin1"]["w"].spec == P(None, None, "model")
    assert ffn["lin2"]["w"].spec == P(None, "model", None)
    # embeddings replicated
    assert sh["ar"]["text_emb"]["weight"].spec == P()


def test_divisibility_guard():
    """Leaves whose sharded dim doesn't divide tp must replicate."""
    cfg = ValleConfig(d_model=36, nhead=2, num_layers=1, num_quantizers=2,
                      max_len=128)  # 3*36=108 not divisible by 8
    params, _ = init_valle(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(tp=8, dp=1)
    sh = param_shardings(params, mesh)
    assert sh["ar"]["decoder"]["layers"]["self_attn"]["in_w"].spec == P()


def test_batch_shardings_and_placement():
    mesh = make_mesh(tp=1)
    batch = {"text": jnp.zeros((8, 5), jnp.int32),
             "lens": jnp.zeros((8,), jnp.int32)}
    sh = batch_shardings(batch, mesh)
    assert sh["text"].spec == P("data", None)
    placed = jax.device_put(batch, sh)
    assert len(placed["text"].sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(placed["text"]),
                                  np.asarray(batch["text"]))
