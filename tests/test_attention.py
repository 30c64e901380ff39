"""Flash-attention kernel vs the einsum oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from valle_tpu.ops.attention import (
    flash_attention,
    fused_attention,
    naive_attention,
)


def make_inputs(B=2, H=4, S=256, T=256, D=64, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    q = jax.random.normal(ks[0], (B, H, S, D))
    k = jax.random.normal(ks[1], (B, H, T, D))
    v = jax.random.normal(ks[2], (B, H, T, D))
    lens = jnp.array([T, int(T * 0.7)][:B])
    key_valid = jnp.where(jnp.arange(T)[None, :] < lens[:, None], 0.0,
                          -jnp.inf)
    bias = key_valid[:, None, None, :]
    if S == T:  # add a causal structure when square
        pos = jnp.arange(S)
        causal = jnp.where(pos[None, :] <= pos[:, None], 0.0, -jnp.inf)
        bias = bias + causal[None, None]
    return q, k, v, jnp.broadcast_to(bias, (B, 1, S, T))


def test_flash_matches_naive_forward_and_grads():
    q, k, v, bias = make_inputs()
    ref = naive_attention(q, k, v, bias)
    out = flash_attention(q, k, v, bias, 128, 128, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    gf = jax.grad(lambda *a: jnp.sum(
        flash_attention(*a, bias, 128, 128, True) ** 2), argnums=(0, 1, 2))(
        q, k, v)
    gr = jax.grad(lambda *a: jnp.sum(
        naive_attention(*a, bias) ** 2), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_fused_attention_pads_odd_shapes():
    """Non-tile-multiple S/T must pad+mask correctly (interpret mode)."""
    q, k, v, bias = make_inputs(S=200, T=333)
    ref = naive_attention(q, k, v, bias)
    out = fused_attention(q, k, v, bias, use_pallas=True, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_attention_fully_masked_row():
    """Rows whose keys are ALL masked must produce finite output."""
    q, k, v, _ = make_inputs(S=128, T=128)
    bias = jnp.full((2, 1, 128, 128), -jnp.inf)
    bias = bias.at[:, :, :, :4].set(0.0)
    bias = bias.at[0, :, 5].set(-jnp.inf)  # row 5 of sample 0 fully masked
    out = fused_attention(q, k, v, bias, use_pallas=True, interpret=True)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_cpu_dispatch_falls_back():
    q, k, v, bias = make_inputs(S=64, T=64)
    out = fused_attention(q, k, v, bias)  # cpu backend -> naive
    ref = naive_attention(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
