"""Grad-shaping toolbox ops (reference valle/modules/scaling.py inline
self-tests, :1240-1401): MaxEig, custom softmax, RandomGrad, ScaledConv1d,
SRConv1d, Whiten, DoubleSwish."""

import jax
import jax.numpy as jnp
import numpy as np

import valle_tpu.modules.scaling as sc


def _dominated_x(proportion, seed=0):
    """x with a planted dominant direction (reference _test_max_eig)."""
    rng = np.random.RandomState(seed)
    x = rng.randn(100, 128).astype(np.float32)
    direction = rng.randn(128).astype(np.float32)
    coeffs = rng.randn(100, 1).astype(np.float32)
    return jnp.asarray(x + proportion * direction * coeffs)


def test_max_eig_grad_edit_only_when_dominated():
    """Mirrors reference _test_max_eig: grads pass through when no single
    direction dominates; get modified when one does."""
    for proportion, expect_equal in ((0.1, True), (10.0, False)):
        x = _dominated_x(proportion)
        state = sc.init_max_eig(128)
        key = jax.random.PRNGKey(1)
        # a few applications to let the power iteration converge
        for i in range(4):
            _, state = sc.max_eig(state, x, jax.random.fold_in(key, i),
                                  max_var_per_eig=0.5, scale=0.1)

        def f(xx):
            y, _ = sc.max_eig(state, xx, jax.random.fold_in(key, 99),
                              max_var_per_eig=0.5, scale=0.1)
            g = jax.random.normal(jax.random.PRNGKey(7), y.shape)
            return jnp.sum(y * g)

        grad = jax.grad(f)(x)
        base = jax.random.normal(jax.random.PRNGKey(7), x.shape)
        if expect_equal:
            np.testing.assert_allclose(np.asarray(grad), np.asarray(base),
                                       atol=1e-2)
        else:
            assert not np.allclose(np.asarray(grad), np.asarray(base),
                                   atol=1e-2)
        # forward is identity either way
        y, _ = sc.max_eig(state, x, jax.random.fold_in(key, 5),
                          max_var_per_eig=0.5, scale=0.1)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_max_eig_state_probability_schedule():
    x = _dominated_x(0.05)
    state = sc.init_max_eig(128)
    assert float(state["cur_prob"]) == 1.0
    _, s1 = sc.max_eig(state, x, jax.random.PRNGKey(0),
                       max_var_per_eig=0.9)
    # inactive constraint regresses cur_prob toward min_prob
    assert float(s1["cur_prob"]) < 1.0
    # eval mode / no rng: no-op
    y, s_same = sc.max_eig(state, x, None, training=True)
    assert s_same is state
    y2, _ = sc.max_eig(state, x, jax.random.PRNGKey(0), training=False)
    np.testing.assert_array_equal(np.asarray(y2), np.asarray(x))


def test_softmax_matches_jax_and_gradients():
    """Reference _test_softmax: custom softmax == plain softmax in value
    and gradient at fp32."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(4, 17).astype(np.float32))

    np.testing.assert_allclose(
        np.asarray(sc.softmax(x, -1)),
        np.asarray(jax.nn.softmax(x, axis=-1)), rtol=1e-6, atol=1e-7)

    g = jnp.asarray(rng.randn(4, 17).astype(np.float32))
    grad_custom = jax.grad(lambda a: jnp.sum(sc.softmax(a, -1) * g))(x)
    grad_plain = jax.grad(
        lambda a: jnp.sum(jax.nn.softmax(a, axis=-1) * g))(x)
    np.testing.assert_allclose(np.asarray(grad_custom),
                               np.asarray(grad_plain), rtol=1e-5, atol=1e-6)


def test_random_grad_expectation_preserving():
    """Small bf16 grads are zeroed/boosted randomly but keep expectation;
    fp32 grads pass through untouched."""
    x = jnp.zeros((20000,), jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    tiny = 2.0e-06  # below min_abs=5e-6

    def f(a):
        y = sc.random_grad(a, key, min_abs=5e-6)
        return jnp.sum(y * jnp.full(a.shape, tiny, jnp.bfloat16))

    g = jax.grad(f)(x)
    vals = np.asarray(g, np.float32)
    nonzero = vals[vals != 0]
    assert len(nonzero) > 0 and len(nonzero) < len(vals)
    np.testing.assert_allclose(abs(nonzero), 5e-6, rtol=1e-2)
    # expectation preserved to sampling noise
    np.testing.assert_allclose(vals.mean(), tiny, rtol=0.15)

    # fp32: identity backward
    x32 = jnp.ones((8,), jnp.float32)
    g32 = jax.grad(lambda a: jnp.sum(sc.random_grad(a, key) * 3.0))(x32)
    np.testing.assert_array_equal(np.asarray(g32), np.full(8, 3.0))

    # eval / no rng: identity function
    assert sc.random_grad(x32, None) is x32


def test_scaled_conv1d_initial_scale():
    k0 = jax.random.PRNGKey(0)
    p1 = sc.init_scaled_conv1d(k0, 8, 16, 3, initial_scale=1.0)
    p_half = sc.init_scaled_conv1d(k0, 8, 16, 3, initial_scale=0.5)
    np.testing.assert_allclose(np.asarray(p_half["w"]),
                               0.5 * np.asarray(p1["w"]), rtol=1e-6)
    assert np.abs(np.asarray(p_half["b"])).max() <= 0.05 + 1e-7
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 11, 8))
    y = sc.scaled_conv1d(p1, x)
    assert y.shape == (2, 11, 16)  # SAME padding
    y2 = sc.scaled_conv1d(p1, x, stride=2)
    assert y2.shape == (2, 6, 16)


def test_sr_conv1d_spectral_normalization():
    """After power iteration converges, the effective (out, in*k) weight
    has spectral norm ~= sigma parameter (1.0 at init)."""
    p, state = sc.init_sr_conv1d(jax.random.PRNGKey(0), 8, 16, 3)
    p["w"] = p["w"] * 7.3  # blow up the raw weight; SR should cancel it
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 11, 8))
    for _ in range(30):
        y, state = sc.sr_conv1d(p, state, x, kernel_size=3)
    assert y.shape == (2, 11, 16)
    # reconstruct the normalized weight the op applied
    w = np.asarray(p["w"], np.float64)
    u = np.asarray(state["u"], np.float64)
    v = w @ u
    v /= np.linalg.norm(v)
    u2 = w.T @ v
    u2 /= np.linalg.norm(u2)
    sigma_est = v @ (w @ u2)
    eff = (float(p["sigma"][0]) / sigma_est) * w
    top_sv = np.linalg.svd(eff, compute_uv=False)[0]
    np.testing.assert_allclose(top_sv, 1.0, rtol=5e-3)
