"""Tensor-parallel NUMERIC equivalence (VERDICT round-2 weak spot #1).

The round-2 suite proved tp=2 *runs* (sharding specs, finite loss) but
never that it computes the SAME THING as a single device. GSPMD makes
divergence unlikely, but a wrong partition spec usually degrades to
silent resharding or numeric drift rather than an error — these tests
pin the math:

- an fp32 dp4 x tp2 train step must reproduce the single-device step's
  loss, grad norm, and UPDATED PARAMETERS to round-off;
- serving decode under a tp=2 mesh must emit exactly the same tokens;
- gradient accumulation must commute with batch splitting (accum=2 over
  micro-batches == accum=1 over the concatenated batch), with dropout
  disabled so the equivalence is exact.

Reference capability matched: DDP training equivalence
(/root/reference/valle/bin/trainer.py:867-915) — torch DDP allreduce
guarantees this by construction; here XLA collectives do, and we verify.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from valle_tpu.models import ValleConfig, init_valle
from valle_tpu.models.valle import valle_forward
from valle_tpu.parallel.mesh import batch_shardings, make_mesh
from valle_tpu.training import (
    init_train_state,
    make_optimizer,
    make_train_step,
    shard_train_state,
)


def _cfg(**kw):
    kw.setdefault("d_model", 64)
    kw.setdefault("nhead", 4)
    kw.setdefault("num_layers", 2)
    kw.setdefault("prefix_mode", 1)
    kw.setdefault("num_quantizers", 8)
    kw.setdefault("max_len", 512)
    kw.setdefault("max_prefix_len", 8)
    return ValleConfig(**kw)


def _batch(accum, B, S=12, T=32, seed=1):
    ks = jax.random.split(jax.random.PRNGKey(seed), 2)
    lead = (accum, B) if accum else (B,)
    return {
        "text": jax.random.randint(ks[0], lead + (S,), 0, 100,
                                   dtype=jnp.int32),
        "text_lens": jnp.full(lead, S, jnp.int32),
        "audio": jax.random.randint(ks[1], lead + (T, 8), 0, 1024,
                                    dtype=jnp.int32),
        "audio_lens": jnp.full(lead, T, jnp.int32),
    }


def _tree_allclose(a, b, rtol, atol):
    flat_a = jax.tree_util.tree_leaves(a)
    flat_b = jax.tree_util.tree_leaves(b)
    assert len(flat_a) == len(flat_b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=rtol, atol=atol)


def test_tp2_train_step_matches_single_device():
    """fp32 dp4 x tp2 step == single-device step: loss, grad norm, and the
    full updated parameter tree to round-off."""
    cfg = _cfg()
    params, _ = init_valle(jax.random.PRNGKey(0), cfg)
    opt, lr_fn = make_optimizer(params, base_lr=0.05, train_stage=0,
                                warmup_steps=10.0)
    del params
    state0 = init_train_state(jax.random.PRNGKey(0), cfg, opt)
    accum, B = 2, 8
    batch = _batch(accum, B)
    step_fn = jax.jit(make_train_step(
        cfg, opt, lr_fn, train_stage=0, accum_steps=accum,
        compute_dtype=jnp.float32))

    mesh = make_mesh(tp=2, devices=jax.devices()[:8])
    sb = jax.device_put(batch,
                        batch_shardings(batch, mesh, leading_accum=True))
    st_tp, m_tp = step_fn(shard_train_state(state0, mesh), sb,
                          jnp.int32(0), jax.random.PRNGKey(3))

    mesh1 = make_mesh(tp=1, devices=jax.devices()[:1])
    b1 = jax.device_put(batch,
                        batch_shardings(batch, mesh1, leading_accum=True))
    st_1, m_1 = step_fn(shard_train_state(state0, mesh1), b1,
                        jnp.int32(0), jax.random.PRNGKey(3))

    np.testing.assert_allclose(float(m_tp["loss"]), float(m_1["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m_tp["grad_norm"]),
                               float(m_1["grad_norm"]), rtol=1e-4)
    # updated params: the strongest statement — any resharding /
    # collective mistake shows up here after ScaledAdam's nonlinearities
    _tree_allclose(st_tp.params, st_1.params, rtol=3e-5, atol=1e-6)


def test_tp2_serving_tokens_exact():
    """Greedy decode under a dp4 x tp2 mesh emits exactly the tokens the
    unsharded path emits (fp32; round-2 only proved this at tp=1)."""
    from valle_tpu.models.inference import valle_inference

    cfg = _cfg(d_model=64)
    params, _ = init_valle(jax.random.PRNGKey(0), cfg)
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    B, S, P, G = 8, 9, 6, 12
    text = jax.random.randint(ks[0], (B, S), 0, 90)
    text_lens = jnp.full((B,), S).at[1].set(6)
    pcodes = jax.random.randint(ks[1], (B, P, 8), 0, 1024)
    p_lens = jnp.full((B,), P).at[1].set(4)

    base_codes, base_lens = valle_inference(
        params, cfg, text, text_lens, pcodes, p_lens,
        top_k=1, rng=ks[2], max_gen_len=G)

    from valle_tpu.parallel.mesh import param_shardings
    from jax.sharding import NamedSharding, PartitionSpec as Pspec

    mesh = make_mesh(tp=2, devices=jax.devices()[:8])
    sparams = jax.device_put(params, param_shardings(params, mesh))

    def put(a):
        return jax.device_put(a, NamedSharding(
            mesh, Pspec("data", *(None,) * (a.ndim - 1))))

    tp_codes, tp_lens = valle_inference(
        sparams, cfg, put(text), put(text_lens), put(pcodes), put(p_lens),
        top_k=1, rng=ks[2], max_gen_len=G)

    np.testing.assert_array_equal(np.asarray(base_lens),
                                  np.asarray(tp_lens))
    np.testing.assert_array_equal(np.asarray(base_codes),
                                  np.asarray(tp_codes))


def test_grad_accum_commutes_with_batch_split():
    """accum=2 over two micro-batches == accum=1 over their concatenation
    (sum-reduced loss/grads make this exact up to fp32 reassociation),
    both under dp sharding. Dropout is forced off via forward_fn so the
    rng-per-microbatch folding cannot alias the comparison, and the AR
    stage is used because the NAR quantizer stage is SAMPLED per
    micro-batch (reference semantics, valle.py:780) — stage-0 training is
    not expected to commute with batch splitting."""
    cfg = _cfg()

    def det_forward(params, cfg_, batch, *, train_stage, rng,
                    deterministic, compute_dtype, state):
        return valle_forward(
            params, cfg_, batch, train_stage=train_stage, rng=rng,
            deterministic=True, compute_dtype=compute_dtype, state=state)

    params, _ = init_valle(jax.random.PRNGKey(0), cfg)
    opt, lr_fn = make_optimizer(params, base_lr=0.05, train_stage=1,
                                warmup_steps=10.0)
    del params
    state0 = init_train_state(jax.random.PRNGKey(0), cfg, opt)
    mesh = make_mesh(tp=1, devices=jax.devices()[:4])

    accum_batch = _batch(2, 4)                       # (2, 4, ...)
    flat_batch = jax.tree_util.tree_map(
        lambda x: x.reshape((8,) + x.shape[2:]), accum_batch)

    step_acc = jax.jit(make_train_step(
        cfg, opt, lr_fn, train_stage=1, accum_steps=2,
        compute_dtype=jnp.float32, forward_fn=det_forward))
    step_flat = jax.jit(make_train_step(
        cfg, opt, lr_fn, train_stage=1, accum_steps=1,
        compute_dtype=jnp.float32, forward_fn=det_forward))

    sb_acc = jax.device_put(
        accum_batch, batch_shardings(accum_batch, mesh, leading_accum=True))
    sb_flat = jax.device_put(flat_batch, batch_shardings(flat_batch, mesh))

    st_a, m_a = step_acc(shard_train_state(state0, mesh), sb_acc,
                         jnp.int32(0), jax.random.PRNGKey(3))
    st_f, m_f = step_flat(shard_train_state(state0, mesh), sb_flat,
                          jnp.int32(0), jax.random.PRNGKey(3))

    np.testing.assert_allclose(float(m_a["loss"]), float(m_f["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m_a["frames"]), float(m_f["frames"]))
    _tree_allclose(st_a.params, st_f.params, rtol=3e-5, atol=1e-6)
