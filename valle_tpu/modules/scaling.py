"""Gradient-shaping toolbox (icefall "scaled" training tricks) in JAX.

Capability parity with reference ``valle/modules/scaling.py`` — the pieces
used by the ``--scaling-xformers`` Transformer variant and the toolbox
extras: DoubleSwish (:1156-1222), ActivationBalancer (:639-764),
BasicNorm (:360-430) / BalancedBasicNorm, ScaledLinear/ScaledConv1d
(:427-470), Whiten (:806-1000), penalize_abs_values_gt (:764-790),
random_clamp (:212), SRLinear spectral-norm layers (:551-615).

These are custom-VJP ops: forward is (mostly) identity, backward nudges
gradients. TPU notes: DoubleSwish keeps the exact derivative instead of the
reference's uint8-quantized cache (a CUDA memory trick; on TPU rematerialize
instead), and stochastic application uses explicit jax PRNG keys instead of
python-level random.random() gates.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# DoubleSwish
# ---------------------------------------------------------------------------


@jax.custom_vjp
def double_swish(x):
    """x * sigmoid(x - 1) (reference scaling.py:1156-1212)."""
    return x * jax.nn.sigmoid(x - 1.0)


def _ds_fwd(x):
    s = jax.nn.sigmoid(x.astype(jnp.float32) - 1.0)
    y = x.astype(jnp.float32) * s
    return y.astype(x.dtype), (y, s)


def _ds_bwd(res, g):
    y, s = res
    deriv = y * (1 - s) + s
    return ((g.astype(jnp.float32) * deriv).astype(g.dtype),)


double_swish.defvjp(_ds_fwd, _ds_bwd)


# ---------------------------------------------------------------------------
# ActivationBalancer
# ---------------------------------------------------------------------------


def _compute_sign_factor(x, channel_dim, min_positive, max_positive,
                         gain_factor, max_factor):
    if channel_dim < 0:
        channel_dim += x.ndim
    sum_dims = tuple(d for d in range(x.ndim) if d != channel_dim)
    prop_pos = jnp.mean((x > 0).astype(jnp.float32), axis=sum_dims)
    factor1 = (jnp.clip((min_positive - prop_pos)
                        * (gain_factor / min_positive), 0, max_factor)
               if min_positive != 0.0 else 0.0)
    factor2 = (jnp.clip((prop_pos - max_positive)
                        * (gain_factor / (1.0 - max_positive)), 0, max_factor)
               if max_positive != 1.0 else 0.0)
    return factor1 - factor2


def _compute_scale_factor(x, channel_dim, min_abs, max_abs, gain_factor,
                          max_factor):
    if channel_dim < 0:
        channel_dim += x.ndim
    sum_dims = tuple(d for d in range(x.ndim) if d != channel_dim)
    x_abs_mean = jnp.mean(jnp.abs(x), axis=sum_dims).astype(jnp.float32)
    below = (jnp.clip((min_abs - x_abs_mean) * (gain_factor / min_abs),
                      0, max_factor) if min_abs != 0.0 else 0.0)
    above = jnp.clip((x_abs_mean - max_abs) * (gain_factor / max_abs),
                     0, max_factor)
    return below - above


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def _balancer_core(x, scale_factor, sign_factor, apply_gate, channel_dim):
    return x


def _bal_fwd(x, scale_factor, sign_factor, apply_gate, channel_dim):
    return x, (x > 0, scale_factor, sign_factor, apply_gate)


def _bal_bwd(channel_dim, res, g):
    xgt0, scale_factor, sign_factor, apply_gate = res
    cd = channel_dim if channel_dim >= 0 else channel_dim + g.ndim
    shape = [1] * g.ndim
    shape[cd] = -1
    scale_r = scale_factor.reshape(shape)
    factor = scale_r * (xgt0.astype(g.dtype) - 0.5)
    if sign_factor is not None:
        factor = factor + sign_factor.reshape(shape)
    neg_delta = jnp.abs(g) * factor * apply_gate
    sf_grad = None if sign_factor is None else jnp.zeros_like(sign_factor)
    return (g - neg_delta, jnp.zeros_like(scale_factor), sf_grad,
            jnp.zeros_like(apply_gate))


_balancer_core.defvjp(_bal_fwd, _bal_bwd)


def activation_balancer(
    x,
    rng: Optional[jax.Array] = None,
    *,
    channel_dim: int = -1,
    min_positive: float = 0.05,
    max_positive: float = 0.95,
    max_factor: float = 0.04,
    sign_gain_factor: float = 0.01,
    scale_gain_factor: float = 0.02,
    min_abs: float = 0.2,
    max_abs: float = 100.0,
    min_prob: float = 0.1,
    step: Optional[jnp.ndarray] = None,
    training: bool = True,
):
    """Gradient balancer (reference scaling.py:639-764).

    Applied with probability max(min_prob, 0.5^(1+step/4000)) per call
    (the reference's decaying schedule); a no-op in eval or without rng.
    """
    if not training or rng is None:
        return x
    if step is None:
        prob = min_prob
    else:
        prob = jnp.maximum(
            min_prob, 0.5 ** (1.0 + step.astype(jnp.float32) / 4000.0))
    gate = (jax.random.uniform(rng, ()) < prob).astype(jnp.float32)
    xd = jax.lax.stop_gradient(x)
    # reference divides the gain by the LIVE application probability
    # (scaling.py:730-751), not by its floor — with the step schedule the
    # early prob is 0.5 and a /min_prob divisor would over-scale the edit
    if min_positive != 0.0 or max_positive != 1.0:
        sign_factor = _compute_sign_factor(
            xd, channel_dim, min_positive, max_positive,
            gain_factor=sign_gain_factor / prob, max_factor=max_factor)
    else:
        sign_factor = None
    scale_factor = _compute_scale_factor(
        xd, channel_dim, min_abs=min_abs, max_abs=max_abs,
        gain_factor=scale_gain_factor / prob, max_factor=max_factor)
    return _balancer_core(x, scale_factor, sign_factor, gate, channel_dim)


def balanced_double_swish(x, rng=None, *, channel_dim=-1, max_abs=10.0,
                          min_prob=0.25, step=None, training=True):
    """ActivationBalancer -> DoubleSwish (reference scaling.py:1225-1236)."""
    x = activation_balancer(
        x, rng, channel_dim=channel_dim, max_abs=max_abs, min_prob=min_prob,
        step=step, training=training)
    return double_swish(x)


# ---------------------------------------------------------------------------
# BasicNorm / BalancedBasicNorm
# ---------------------------------------------------------------------------


def init_basic_norm(eps: float = 0.25):
    return {"log_eps": jnp.asarray(math.log(eps), jnp.float32)}


def basic_norm(params, x, *, channel_dim: int = -1, rng=None,
               training: bool = True, eps_min: float = -3.0,
               eps_max: float = 3.0):
    """x * (mean(x^2) + eps.exp())^-0.5 with learnable log-eps
    (reference scaling.py:360-430; the 25%-probability clamp in training
    keeps log-eps in [eps_min, eps_max])."""
    log_eps = params["log_eps"]
    if training and rng is not None:
        clamped = jnp.clip(log_eps, eps_min, eps_max)
        use_clamp = jax.random.uniform(rng, ()) < 0.25
        log_eps = jnp.where(use_clamp, clamped, log_eps)
    xf = x.astype(jnp.float32)
    scales = (jnp.mean(xf * xf, axis=channel_dim, keepdims=True)
              + jnp.exp(log_eps)) ** -0.5
    return (xf * scales).astype(x.dtype)


def init_balanced_basic_norm(eps: float = 0.25):
    return {"norm": init_basic_norm(eps)}


def balanced_basic_norm(params, x, *, rng=None, training=True, step=None):
    """ActivationBalancer(0.45, 0.55, max_abs=6) -> BasicNorm
    (reference transformer.py:133-157)."""
    r1 = r2 = None
    if rng is not None:
        r1, r2 = jax.random.split(rng)
    x = activation_balancer(
        x, r1, channel_dim=-1, min_positive=0.45, max_positive=0.55,
        max_abs=6.0, step=step, training=training)
    return basic_norm(params["norm"], x, rng=r2, training=training)


# ---------------------------------------------------------------------------
# Scaled initializers (reference scaling.py:427-470)
# ---------------------------------------------------------------------------


def init_scaled_linear(rng, d_in: int, d_out: int, *, bias: bool = True,
                       initial_scale: float = 1.0):
    from .transformer import _kaiming_uniform_linear

    wkey, bkey = jax.random.split(rng)
    p = {"w": _kaiming_uniform_linear(wkey, d_in, d_out) * initial_scale}
    if bias:
        p["b"] = jax.random.uniform(
            bkey, (d_out,), jnp.float32, -0.1 * initial_scale,
            0.1 * initial_scale)
    return p


# ---------------------------------------------------------------------------
# Whitening penalty (reference scaling.py:806-1000)
# ---------------------------------------------------------------------------


def whitening_metric(x: jnp.ndarray, num_groups: int) -> jnp.ndarray:
    """1.0 iff the grouped covariance eigenvalues are all equal."""
    x = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    num_frames, num_channels = x.shape
    assert num_channels % num_groups == 0
    cpg = num_channels // num_groups
    x = x.reshape(num_frames, num_groups, cpg).transpose(1, 0, 2)
    x = x - x.mean(axis=1, keepdims=True)
    x_covar = jnp.matmul(x.transpose(0, 2, 1), x)
    diag = jnp.diagonal(x_covar, axis1=1, axis2=2)
    x_covar_mean_diag = diag.mean()
    x_covarsq_mean_diag = (x_covar ** 2).sum() / (num_groups * cpg)
    return x_covarsq_mean_diag / (x_covar_mean_diag ** 2 + 1e-20)


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def whiten(x, num_groups: int, whitening_limit: float, grad_scale: float):
    return x


def _whiten_fwd(x, num_groups, whitening_limit, grad_scale):
    return x, x


def _whiten_bwd(num_groups, whitening_limit, grad_scale, x_orig, g):
    def penalty(xd):
        return jax.nn.relu(whitening_metric(xd, num_groups)
                           - whitening_limit)

    penalty_grad = jax.grad(penalty)(
        jax.lax.stop_gradient(x_orig.astype(jnp.float32)))
    gf = g.astype(jnp.float32)
    scale = grad_scale * (
        jnp.linalg.norm(gf) / (jnp.linalg.norm(penalty_grad) + 1e-20))
    return ((gf + penalty_grad * scale).astype(g.dtype),)


whiten.defvjp(_whiten_fwd, _whiten_bwd)


# ---------------------------------------------------------------------------
# Misc grad-shaping ops
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def penalize_abs_values_gt(x, limit: float = 10.0, penalty: float = 1e-4):
    return x


def _pen_fwd(x, limit, penalty):
    return x, jnp.sign(x) * ((jnp.abs(x) - limit) > 0)


def _pen_bwd(limit, penalty, signed_over, g):
    return (g + penalty * signed_over.astype(g.dtype),)


penalize_abs_values_gt.defvjp(_pen_fwd, _pen_bwd)


def random_clamp(x, rng, min_val=None, max_val=None, prob: float = 0.5,
                 reflect: float = 0.0):
    """Per-element randomized clamp (reference scaling.py:212-219).

    Forward only (the straight-through backward comes from jnp.where's
    natural gradient; the reference's reflect term is reproduced exactly).
    """
    clamped = jnp.clip(x, min_val, max_val)
    mask = jax.random.uniform(rng, x.shape) < prob
    ans = jnp.where(mask, clamped, x)
    if reflect != 0.0:
        ans = ans * (1.0 + reflect) - x * reflect
    return ans


# ---------------------------------------------------------------------------
# Memory-efficient softmax (reference scaling.py:282-317)
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def softmax(x, axis: int = -1):
    """Softmax whose backward saves only the OUTPUT and runs in fp32
    (reference SoftmaxFunction: more accurate half-precision training and
    half the activation memory of saving the input)."""
    return jax.nn.softmax(x, axis=axis)


def _softmax_fwd(x, axis):
    ans = jax.nn.softmax(x.astype(jnp.float32), axis=axis).astype(x.dtype)
    return ans, ans


def _softmax_bwd(axis, ans, g):
    ansf = ans.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    xg = ansf * gf
    xg = xg - ansf * xg.sum(axis=axis, keepdims=True)
    return (xg.astype(g.dtype),)


softmax.defvjp(_softmax_fwd, _softmax_bwd)


# ---------------------------------------------------------------------------
# RandomGrad (reference scaling.py:222-280)
# ---------------------------------------------------------------------------


def random_cast_to_half(x, rng, *, min_abs: float = 5.0e-06,
                        dtype=jnp.float16):
    """Expectation-preserving randomized cast to a 16-bit float: elements
    below ``min_abs`` become +-min_abs with probability |x|/min_abs, else 0
    (reference scaling.py:222-235)."""
    x_abs = jnp.abs(x)
    too_small = x_abs < min_abs
    rand_val = (min_abs * jnp.sign(x)
                * (jax.random.uniform(rng, x.shape) * min_abs < x_abs))
    return jnp.where(too_small, rand_val, x).astype(dtype)


@jax.custom_vjp
def _random_grad_core(x, rng, min_abs):
    return x


def _rg_fwd(x, rng, min_abs):
    return x, (rng, min_abs)


def _rg_bwd(res, g):
    rng, min_abs = res
    if g.dtype in (jnp.float16, jnp.bfloat16):
        g = random_cast_to_half(
            g.astype(jnp.float32), rng, min_abs=float(min_abs),
            dtype=g.dtype)
    return (g, None, None)


_random_grad_core.defvjp(_rg_fwd, _rg_bwd)


def random_grad(x, rng=None, *, min_abs: float = 5.0e-06,
                training: bool = True):
    """Identity forward; in backward, removes tiny 16-bit grads with an
    expectation-preserving randomization (reference RandomGrad,
    scaling.py:237-280 — an amp-roundoff mitigation)."""
    if not training or rng is None:
        return x
    return _random_grad_core(x, rng, jnp.float32(min_abs))


# ---------------------------------------------------------------------------
# MaxEig (reference scaling.py:1002-1153)
# ---------------------------------------------------------------------------


def init_max_eig(num_channels: int):
    """State: power-iteration direction estimate + application probability
    (the reference's max_eig_direction buffer and cur_prob)."""
    d = jnp.arange(num_channels, dtype=jnp.float32)
    return {"direction": d / jnp.linalg.norm(d),
            "cur_prob": jnp.float32(1.0)}


@partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _max_eig_core(x, coeffs, direction, gate, channel_dim, scale):
    return x


def _me_fwd(x, coeffs, direction, gate, channel_dim, scale):
    return x, (jax.lax.stop_gradient(x), coeffs, direction, gate)


def _me_bwd(channel_dim, scale, res, g):
    x_orig, coeffs, direction, gate = res
    cd = channel_dim if channel_dim >= 0 else channel_dim + x_orig.ndim
    C = x_orig.shape[cd]

    def variance_proportion(xd):
        xm = jnp.moveaxis(xd, cd, -1).reshape(-1, C)
        xm = xm - xm.mean(axis=0)
        x_var = jnp.mean(xm ** 2)
        resid = xm - coeffs * direction
        resid_var = jnp.mean(resid ** 2)
        return (x_var - resid_var) / (x_var + 1.0e-20)

    pg = jax.grad(variance_proportion)(x_orig.astype(jnp.float32))
    gf = g.astype(jnp.float32)
    extra = pg * (scale * jnp.linalg.norm(gf)
                  / (jnp.linalg.norm(pg) + 1.0e-20))
    out = (gf + gate * extra).astype(g.dtype)
    return (out, jnp.zeros_like(coeffs), jnp.zeros_like(direction),
            jnp.zeros_like(gate))


_max_eig_core.defvjp(_me_fwd, _me_bwd)


def max_eig(state, x, rng=None, *, channel_dim: int = -1,
            max_var_per_eig: float = 0.2, min_prob: float = 0.01,
            scale: float = 0.01, training: bool = True):
    """Discourage any single direction from dominating the activation
    covariance (reference MaxEig, scaling.py:1002-1110). Returns
    (x, new_state); the gradient edit applies only when the constraint is
    active (top-eig variance proportion >= max_var_per_eig) and the
    probability gate fires. cur_prob regresses to min_prob while inactive
    and snaps to 1.0 when active, like the reference."""
    if not training or rng is None or max_var_per_eig <= 0:
        return x, state
    cd = channel_dim if channel_dim >= 0 else channel_dim + x.ndim
    C = x.shape[cd]
    xf = jax.lax.stop_gradient(x.astype(jnp.float32))
    xm = jnp.moveaxis(xf, cd, -1).reshape(-1, C)
    xm = xm - xm.mean(axis=0)

    prev = state["direction"]
    coeffs = (xm * prev).sum(axis=1, keepdims=True) + 1.0e-10
    new_dir = (xm * coeffs).sum(axis=0) / ((coeffs ** 2).sum() + 1.0e-20)
    x_var = jnp.mean(xm ** 2)
    resid_var = jnp.mean((xm - coeffs * new_dir) ** 2)
    vp = (x_var - resid_var) / (x_var + 1.0e-20)

    run = jax.random.uniform(rng, ()) < state["cur_prob"]
    active = run & (vp >= max_var_per_eig)
    # direction update: 0.1*prev + new, normalized; keep prev if non-finite
    nd = 0.1 * prev + new_dir
    nd = nd / (jnp.linalg.norm(nd) + 1.0e-20)
    nd = jnp.where(jnp.all(jnp.isfinite(nd)), nd, prev)
    new_state = {
        "direction": jnp.where(run, nd, prev),
        "cur_prob": jnp.where(
            run,
            jnp.where(active, 1.0,
                      0.75 * state["cur_prob"] + 0.25 * min_prob),
            state["cur_prob"]),
    }
    y = _max_eig_core(x, coeffs, new_dir, active.astype(jnp.float32),
                      channel_dim, scale)
    return y, new_state


# ---------------------------------------------------------------------------
# ScaledConv1d (reference scaling.py:452-470)
# ---------------------------------------------------------------------------


def init_scaled_conv1d(rng, c_in: int, c_out: int, kernel_size: int, *,
                       bias: bool = True, initial_scale: float = 1.0):
    """Conv1d init with output magnitude scaled by ``initial_scale``
    (weights x scale, bias ~ U(-0.1*scale, 0.1*scale)); weight stored
    (k, in, out) for NTC convolution."""
    wkey, bkey = jax.random.split(rng)
    fan_in = c_in * kernel_size
    bound = 1.0 / math.sqrt(fan_in)  # torch kaiming_uniform(a=sqrt(5))
    p = {"w": jax.random.uniform(
        wkey, (kernel_size, c_in, c_out), jnp.float32, -bound, bound)
        * initial_scale}
    if bias:
        p["b"] = jax.random.uniform(
            bkey, (c_out,), jnp.float32, -0.1 * initial_scale,
            0.1 * initial_scale)
    return p


def scaled_conv1d(params, x, *, stride: int = 1):
    """SAME-padded 1-D conv, x: (B, T, C)."""
    y = jax.lax.conv_general_dilated(
        x, params["w"].astype(x.dtype), window_strides=(stride,),
        padding="SAME", dimension_numbers=("NTC", "TIO", "NTC"))
    if "b" in params:
        y = y + params["b"].astype(x.dtype)
    return y


# ---------------------------------------------------------------------------
# SRLinear (spectral-norm linear, reference scaling.py:551-615)
# ---------------------------------------------------------------------------


def init_sr_linear(rng, d_in: int, d_out: int, bias: bool = True):
    from .transformer import init_linear

    k1, k2 = jax.random.split(rng)
    p = init_linear(k1, d_in, d_out, bias=bias)
    p["sigma"] = jnp.ones((1,))
    u = jax.random.normal(k2, (d_in,))
    state = {"u": u / jnp.linalg.norm(u)}
    return p, state


def sr_linear(params, state, x, *, training: bool = True):
    """One power-iteration step per call; weight scaled to sigma/||W||_2."""
    w = params["w"].astype(jnp.float32)  # (d_in, d_out)
    u = state["u"]
    v = w.T @ u
    v = v / (jnp.linalg.norm(v) + 1e-12)
    u_new = w @ v
    u_new = u_new / (jnp.linalg.norm(u_new) + 1e-12)
    sigma_est = v @ (w.T @ u_new)
    sigma_est = jax.lax.stop_gradient(sigma_est)
    weight = (params["sigma"] / (sigma_est + 1e-12)) * w
    y = x @ weight.astype(x.dtype)
    if "b" in params:
        y = y + params["b"].astype(x.dtype)
    new_state = {"u": jax.lax.stop_gradient(u_new)} if training else state
    return y, new_state


# ---------------------------------------------------------------------------
# SRConv1d (spectral-norm conv, reference scaling.py:587-615)
# ---------------------------------------------------------------------------


def init_sr_conv1d(rng, c_in: int, c_out: int, kernel_size: int,
                   bias: bool = True):
    """Spectral-norm conv: the (out, in*k) flattened weight is power-iter
    normalized like SRLinear (reference SRConv1d subclasses SRLinear with
    in_features = in*k)."""
    k1, k2, k3 = jax.random.split(rng, 3)
    fan_in = c_in * kernel_size
    bound = 1.0 / math.sqrt(fan_in)  # kaiming_uniform(a=sqrt(5))
    p = {"w": jax.random.uniform(
        k1, (c_out, fan_in), jnp.float32, -bound, bound),
        "sigma": jnp.ones((1,))}
    if bias:
        p["b"] = jax.random.uniform(k2, (c_out,), jnp.float32, -bound,
                                    bound)
    u = jax.random.normal(k3, (fan_in,))
    state = {"u": u / jnp.linalg.norm(u)}
    return p, state


def sr_conv1d(params, state, x, *, kernel_size: int, stride: int = 1,
              training: bool = True):
    """SAME-padded spectral-norm conv, x: (B, T, C_in). Returns
    (y, new_state). torch-orientation power iteration: v = W u; u = W^T v;
    sigma = v . W u (reference scaling.py:556-575)."""
    w = params["w"].astype(jnp.float32)  # (out, in*k)
    u = state["u"]
    v = w @ u
    v = v / (jnp.linalg.norm(v) + 1e-12)
    u_new = w.T @ v
    u_new = u_new / (jnp.linalg.norm(u_new) + 1e-12)
    sigma_est = jax.lax.stop_gradient(v @ (w @ u_new))
    weight = (params["sigma"] / (sigma_est + 1e-12)) * w
    c_out = weight.shape[0]
    c_in = weight.shape[1] // kernel_size
    wk = weight.reshape(c_out, c_in, kernel_size).transpose(2, 1, 0)
    y = jax.lax.conv_general_dilated(
        x, wk.astype(x.dtype), window_strides=(stride,), padding="SAME",
        dimension_numbers=("NTC", "TIO", "NTC"))
    if "b" in params:
        y = y + params["b"].astype(x.dtype)
    new_state = {"u": jax.lax.stop_gradient(u_new)} if training else state
    return y, new_state
