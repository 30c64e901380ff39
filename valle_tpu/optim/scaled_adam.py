"""ScaledAdam as an optax GradientTransformation.

Capability parity with reference ``valle/modules/optim.py:129-661``
(icefall's ScaledAdam): updates proportional to each tensor's RMS, a learned
per-tensor log-scale with its own Adam-like moments, median-window adaptive
gradient clipping, and a plain-Adam path for scalar (numel==1) parameters.

TPU-first notes: the reference stacks same-shape params to cut CUDA kernel
launches (``BatchedOptimizer``, optim.py:29-126); under XLA the whole update
is one fused program, so no such packing is needed. Our model already stacks
per-layer weights on a leading axis for ``lax.scan`` — those leaves are
treated exactly like the reference's batched params (axis 0 is the stacking
dim, statistics are per-slice). The median-window clipping state (ring
buffer of model norms + threshold) lives in the optimizer state and updates
with ``jnp.where`` — fully jittable, no host round-trips.

Known deviation: stacked NAR audio-embedding tables carry one padded row
(id 1024) on quantizers 1..7 for uniform shapes; it has zero values/grads
and only perturbs that tensor's RMS by ~1/1025.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

# path-entry names whose subtrees hold leading-axis-stacked parameters
_DEFAULT_STACKED_KEYS = frozenset(
    {"layers", "audio_embs", "stage_embs", "predict_stacked"})


def default_stacked_fn(path) -> bool:
    """True if this leaf's axis 0 is a parameter-stacking dim."""
    keys = [getattr(entry, "key", None) for entry in path]
    if any(k in _DEFAULT_STACKED_KEYS for k in keys):
        return True
    # non-shared NAR predict heads: nar/predict/w is (Q-1, nd, V) stacked
    # (the AR head ar/predict/w is a single 2-dim matrix — not stacked)
    return "nar" in keys and "predict" in keys


class _UpdOut(NamedTuple):
    """Per-leaf update results (distinct type so optax.MaskedNode sentinels
    in the tree are not mistaken for results)."""
    u: Any
    delta: Any
    eas: Any
    rms: Any
    seas: Any
    sgrads: Any


class ScaledAdamState(NamedTuple):
    step: jnp.ndarray                  # scalar int32
    delta: Any                         # pytree like params (momentum buffer)
    exp_avg_sq: Any                    # pytree like params
    param_rms: Any                     # pytree of keepdims-RMS tensors
    scale_exp_avg_sq: Any              # like param_rms
    scale_grads: Any                   # (size_update_period, ...) per leaf
    model_norms: jnp.ndarray           # (clipping_update_period,)
    model_norm_threshold: jnp.ndarray  # scalar
    num_clipped: jnp.ndarray           # scalar int32 (diagnostics)


def scaled_adam(
    learning_rate: float = 3e-2,
    clipping_scale: Optional[float] = None,
    b1: float = 0.9,
    b2: float = 0.98,
    scalar_lr_scale: float = 0.1,
    eps: float = 1e-8,
    param_min_rms: float = 1e-5,
    param_max_rms: float = 3.0,
    scalar_max: float = 10.0,
    size_update_period: int = 4,
    clipping_update_period: int = 100,
    stacked_fn: Callable = default_stacked_fn,
    clip_main_grad: bool = False,
    state_dtype: Any = jnp.float32,
) -> optax.GradientTransformation:
    """Build the transformation. Pair with ``optax.inject_hyperparams`` to
    drive ``learning_rate`` from the Eden schedule.

    ``stacked_fn(path) -> bool`` marks leaves whose axis 0 stacks several
    logical parameters (per-layer weights): statistics are kept per-slice.

    ``state_dtype`` is the STORAGE dtype of the two per-parameter-sized
    buffers (``exp_avg_sq`` second moments and the ``delta`` momentum);
    all arithmetic stays float32 (load -> f32 compute -> store). The
    round-4 step ladder priced the optimizer marginal at ~10 ms/step —
    "the bandwidth floor for ~4.7 GB of fp32 m/v/param traffic"
    (BASELINE.md); bf16 state halves the m/v share of that traffic.
    bf16 ``exp_avg_sq`` perturbs the denom by <=2^-9 relative; bf16
    ``delta`` additionally quantizes the RETURNED update (delta IS the
    step). Both are characterized (not parity-matched) against the fp32
    trajectory in tests/test_scaled_adam.py and gated by the tiny-corpus
    convergence test. The tiny keepdims statistics (param_rms,
    scale_exp_avg_sq, scale_grads) always stay f32.
    """
    state_dtype = jnp.dtype(state_dtype)

    def _axes(p, stacked: bool):
        """Reduction axes for per-parameter statistics."""
        if stacked and p.ndim > 1:
            return tuple(range(1, p.ndim))
        return tuple(range(p.ndim))

    def _is_scalar(p, stacked: bool) -> bool:
        n = p.size // p.shape[0] if (stacked and p.ndim >= 1) else p.size
        return n == 1

    def _rms(p, stacked: bool):
        pf = p.astype(jnp.float32)
        return jnp.sqrt(jnp.mean(pf * pf, axis=_axes(p, stacked),
                                 keepdims=True))

    def init_fn(params):
        def rms_init(path, p):
            st = stacked_fn(path)
            if _is_scalar(p, st):
                return jnp.zeros((1,) * max(p.ndim, 1), jnp.float32)
            return _rms(p, st)

        tmwp = jax.tree_util.tree_map_with_path
        return ScaledAdamState(
            step=jnp.zeros((), jnp.int32),
            delta=jax.tree_util.tree_map(
                lambda p: jnp.zeros_like(p, state_dtype), params),
            exp_avg_sq=jax.tree_util.tree_map(
                lambda p: jnp.zeros_like(p, state_dtype), params),
            param_rms=tmwp(rms_init, params),
            scale_exp_avg_sq=tmwp(
                lambda path, p: jnp.zeros_like(rms_init(path, p)), params),
            scale_grads=tmwp(
                lambda path, p: jnp.zeros(
                    (size_update_period,) + rms_init(path, p).shape,
                    jnp.float32),
                params),
            model_norms=jnp.zeros((clipping_update_period,), jnp.float32),
            model_norm_threshold=jnp.asarray(jnp.inf, jnp.float32),
            num_clipped=jnp.zeros((), jnp.int32),
        )

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("scaled_adam requires params")
        grads = updates
        step = state.step
        lr = jnp.asarray(learning_rate, jnp.float32)
        tmwp = jax.tree_util.tree_map_with_path

        # ---- adaptive clipping (reference optim.py:316-412) --------------
        if clipping_scale is not None:
            def leaf_sumsq(path, g, rms):
                st = stacked_fn(path)
                gf = g.astype(jnp.float32)
                if _is_scalar(g, st):
                    return jnp.sum(gf * gf)
                return jnp.sum((gf * rms) ** 2)

            tot_sumsq = sum(jax.tree_util.tree_leaves(
                tmwp(leaf_sumsq, grads, state.param_rms)))
            tot_norm = jnp.sqrt(tot_sumsq)
            idx = step % clipping_update_period
            model_norms = state.model_norms.at[idx].set(tot_norm)
            sorted_norms = jnp.sort(model_norms)
            # reference quartile indexing: (period//4)*2 (optim.py:369-376)
            median = sorted_norms[min(clipping_update_period - 1,
                                      (clipping_update_period // 4) * 2)]
            refresh = (step % clipping_update_period == 0) & (step > 0)
            threshold = jnp.where(refresh, clipping_scale * median,
                                  state.model_norm_threshold)
            have_estimate = step >= clipping_update_period
            clip = jnp.where(
                have_estimate,
                jnp.minimum(1.0, threshold / (tot_norm + 1e-20)),
                1.0)
            num_clipped = state.num_clipped + jnp.where(
                have_estimate & (clip < 1.0), 1, 0).astype(jnp.int32)
        else:
            clip = jnp.float32(1.0)
            model_norms = state.model_norms
            threshold = state.model_norm_threshold
            num_clipped = state.num_clipped

        size_lr = lr * scalar_lr_scale
        beta2_corr = b2 ** size_update_period
        is_size_step = (step % size_update_period) == (size_update_period - 1)
        size_step = (step + 1) // size_update_period
        bc2_size = 1.0 - beta2_corr ** size_step.astype(jnp.float32)
        bc2_main = 1.0 - b2 ** (step.astype(jnp.float32) + 1.0)

        def upd(path, p, g, delta, eas, rms, seas, sgrads):
            st = stacked_fn(path)
            # Reference quirk, reproduced for exact parity: the clipped grad
            # is used ONLY by the size/scale update (optim.py:495-507); the
            # main Adam moments re-read the UNclipped p.grad
            # (optim.py:611,648). Set clip_main_grad=True for the evidently
            # intended behavior (clip everywhere).
            g_raw = g.astype(jnp.float32)
            g_clip = g_raw * clip
            g = g_clip if clip_main_grad else g_raw
            pf = p.astype(jnp.float32)
            # state buffers load from their storage dtype; ALL arithmetic
            # is f32; they store back at the end (inert at f32 storage)
            delta = delta.astype(jnp.float32) * b1
            eas = eas.astype(jnp.float32)
            if _is_scalar(p, st):
                # plain Adam for scalars (reference optim.py:639-661)
                eas = eas * b2 + g * g * (1 - b2)
                denom = jnp.sqrt(eas / bc2_main) + eps
                delta = delta + g / denom * (-size_lr * (1 - b1))
                delta_st = delta.astype(state_dtype)
                upd_val = (jnp.clip(pf, -scalar_max, scalar_max) - pf) \
                    + delta_st.astype(jnp.float32)
                return _UpdOut(upd_val.astype(p.dtype), delta_st,
                               eas.astype(state_dtype), rms, seas, sgrads)

            axes = _axes(p, st)
            # record this step's scale gradient in the ring buffer
            sg = jnp.sum(pf * g_clip, axis=axes, keepdims=True)
            sgrads = sgrads.at[step % size_update_period].set(sg)

            # periodic param_rms refresh + size (scale) update
            rms_new = jnp.sqrt(jnp.mean(pf * pf, axis=axes, keepdims=True))
            rms = jnp.where(is_size_step, rms_new, rms)
            seas_new = seas * beta2_corr + jnp.mean(
                sgrads ** 2, axis=0) * (1 - beta2_corr)
            seas = jnp.where(is_size_step, seas_new, seas)
            denom_s = jnp.sqrt(seas) + eps
            scale_step = (-size_lr * jnp.sqrt(bc2_size)
                          * jnp.sum(sgrads, axis=0) / denom_s)
            scale_step = jnp.where(rms < param_min_rms, 0.0, scale_step)
            scale_step = jnp.where(rms > param_max_rms,
                                   -size_lr * size_update_period, scale_step)
            do_size = is_size_step & (step > 0)
            delta = delta + jnp.where(do_size, (1 - b1) * pf * scale_step,
                                      0.0)

            # main RMS-scaled Adam step (reference optim.py:598-637)
            eas = eas * b2 + g * g * (1 - b2)
            eas_eff = jnp.where(bc2_main < 0.99, eas / bc2_main, eas)
            denom = jnp.sqrt(eas_eff) + eps
            alpha = -lr * (1 - b1) * jnp.maximum(rms, param_min_rms)
            delta = delta + (g / denom) * alpha
            # the APPLIED update is the STORED delta (quantize-then-apply:
            # u == next step's momentum buffer, as in the reference)
            delta_st = delta.astype(state_dtype)
            return _UpdOut(delta_st.astype(jnp.float32).astype(p.dtype),
                           delta_st, eas.astype(state_dtype), rms, seas,
                           sgrads)

        out = tmwp(upd, params, grads, state.delta, state.exp_avg_sq,
                   state.param_rms, state.scale_exp_avg_sq,
                   state.scale_grads)
        treedef = jax.tree_util.tree_structure(params)
        leaves = jax.tree_util.tree_leaves(
            out, is_leaf=lambda x: isinstance(x, _UpdOut))

        def pick(i):
            return jax.tree_util.tree_unflatten(
                treedef, [leaf[i] for leaf in leaves])

        new_state = ScaledAdamState(
            step=step + 1,
            delta=pick(1),
            exp_avg_sq=pick(2),
            param_rms=pick(3),
            scale_exp_avg_sq=pick(4),
            scale_grads=pick(5),
            model_norms=model_norms,
            model_norm_threshold=threshold,
            num_clipped=num_clipped,
        )
        return pick(0), new_state

    return optax.GradientTransformation(init_fn, update_fn)
