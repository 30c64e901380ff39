"""Transformer mel-TTS model + scaling toolbox tests (mirrors reference
valle/tests/valle_test.py:225-268 and scaling_test.py, plus value-level
checks of the grad-shaping ops the reference only self-tests in __main__).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from valle_tpu.models.transformer import (
    TransformerTtsConfig,
    TransformerTtsModel,
    transformer_tts_forward,
)
from valle_tpu.modules import scaling as sc


def make_batch(B=2, S=9, T=30, M=100):
    ks = jax.random.split(jax.random.PRNGKey(0), 2)
    return {
        "text": jax.random.randint(ks[0], (B, S), 0, 100),
        "text_lens": jnp.array([S, S - 3]),
        "audio": jax.random.normal(ks[1], (B, T, M)),
        "audio_lens": jnp.array([T, T - 7]),
    }


@pytest.mark.parametrize("scaling", [False, True])
def test_forward_and_inference(scaling):
    cfg = TransformerTtsConfig(d_model=32, nhead=2, num_layers=2,
                               scaling_xformers=scaling, max_len=512)
    m = TransformerTtsModel(cfg)
    params, state = m.init(jax.random.PRNGKey(0))
    batch = make_batch()
    fwd = jax.jit(functools.partial(
        transformer_tts_forward, cfg=cfg, deterministic=False))
    loss, metrics, _ = fwd(params, batch=batch, rng=jax.random.PRNGKey(1),
                           state=state)
    assert jnp.isfinite(loss) and float(loss) > 0
    assert "stop_loss" in metrics and "stop_accuracy" in metrics

    mel, lens = m.inference(params, batch["text"], batch["text_lens"],
                            max_gen_len=16)
    assert mel.shape == (2, 16, 100)
    assert bool(jnp.all(lens <= 16))


def test_forward_gradients_flow():
    cfg = TransformerTtsConfig(d_model=32, nhead=2, num_layers=2,
                               scaling_xformers=True, max_len=512)
    m = TransformerTtsModel(cfg)
    params, state = m.init(jax.random.PRNGKey(0))
    batch = make_batch()

    def loss_fn(p):
        loss, _, _ = transformer_tts_forward(
            p, cfg, batch, rng=jax.random.PRNGKey(1), deterministic=False,
            state=state)
        return loss

    grads = jax.jit(jax.grad(loss_fn))(params)
    gnorm = sum(float(jnp.sum(g.astype(jnp.float32) ** 2))
                for g in jax.tree_util.tree_leaves(grads)) ** 0.5
    assert np.isfinite(gnorm) and gnorm > 0


# ---------------------------------------------------------------------------
# Scaling toolbox value checks
# ---------------------------------------------------------------------------


def test_double_swish_value_and_grad():
    x = jnp.linspace(-4, 4, 41)
    y = sc.double_swish(x)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(x * jax.nn.sigmoid(x - 1.0)), rtol=1e-6)
    # analytic derivative vs numeric (the reference gradchecks this,
    # scaling.py:1365-1371)
    g = jax.vmap(jax.grad(sc.double_swish))(x)
    eps = 1e-3
    num = (sc.double_swish(x + eps) - sc.double_swish(x - eps)) / (2 * eps)
    np.testing.assert_allclose(np.asarray(g), np.asarray(num), atol=1e-3)


def test_basic_norm_formula():
    p = sc.init_basic_norm(eps=0.25)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 7, 16))
    y = sc.basic_norm(p, x, training=False)
    expected = x * (jnp.mean(x ** 2, axis=-1, keepdims=True) + 0.25) ** -0.5
    np.testing.assert_allclose(np.asarray(y), np.asarray(expected),
                               rtol=1e-5)


def test_activation_balancer_shapes_grads():
    """Backward must dampen gradients toward constraint satisfaction
    while forward stays identity."""
    x = jnp.abs(jax.random.normal(jax.random.PRNGKey(0), (8, 16))) + 5.0
    # all-positive, large-magnitude activations violate max_positive=0.95
    # and max_abs: the balancer INCREASES the positive gradient (stronger
    # pressure to decrease x under gradient descent)

    def f(xx):
        y = sc.activation_balancer(
            xx, jax.random.PRNGKey(1), channel_dim=-1, min_prob=1.0,
            max_abs=1.0, training=True)
        return jnp.sum(y)

    y = sc.activation_balancer(
        x, jax.random.PRNGKey(1), channel_dim=-1, min_prob=1.0, max_abs=1.0,
        training=True)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))  # identity
    g = jax.grad(f)(x)
    assert bool(jnp.all(g > 1.0))  # boosted from the nominal 1.0
    # eval mode: untouched
    g_eval = jax.grad(lambda xx: jnp.sum(sc.activation_balancer(
        xx, None, training=False)))(x)
    np.testing.assert_allclose(np.asarray(g_eval), 1.0)


def test_penalize_abs_values_gt():
    x = jnp.array([0.5, 20.0, -15.0])
    y = sc.penalize_abs_values_gt(x, 10.0, 1e-2)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))
    g = jax.grad(lambda v: jnp.sum(sc.penalize_abs_values_gt(
        v, 10.0, 1e-2)))(x)
    np.testing.assert_allclose(np.asarray(g), [1.0, 1.01, 0.99], rtol=1e-6)


def test_whitening_metric_and_grad():
    x = jax.random.normal(jax.random.PRNGKey(0), (64, 16))
    m = sc.whitening_metric(x, num_groups=2)
    assert float(m) >= 1.0
    # near-white data -> metric near 1; rank-1 data -> metric >> 1
    big = jax.random.normal(jax.random.PRNGKey(2), (16384, 16))
    assert float(sc.whitening_metric(big, 1)) == pytest.approx(1.0, rel=0.05)
    rank1 = jnp.outer(jax.random.normal(jax.random.PRNGKey(3), (64,)),
                      jax.random.normal(jax.random.PRNGKey(4), (16,)))
    assert float(sc.whitening_metric(rank1, 1)) > 5.0
    # whiten passes values through and modifies grads when above limit
    y = sc.whiten(x, 2, 1.0, 0.01)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))
    g = jax.grad(lambda v: jnp.sum(sc.whiten(v, 2, 1.0, 0.01)))(x)
    assert not np.allclose(np.asarray(g), 1.0)


def test_sr_linear_power_iteration():
    p, state = sc.init_sr_linear(jax.random.PRNGKey(0), 8, 4)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 8))
    y1, state = sc.sr_linear(p, state, x)
    y2, state = sc.sr_linear(p, state, x)
    assert y1.shape == (3, 4)
    # power iteration converges: u stabilizes
    _, state2 = sc.sr_linear(p, state, x)
    for _ in range(20):
        _, state2 = sc.sr_linear(p, state2, x)
    u1 = state2["u"]
    _, state3 = sc.sr_linear(p, state2, x)
    np.testing.assert_allclose(np.asarray(state3["u"]), np.asarray(u1),
                               atol=1e-4)
