"""Eve optimizer (AdamW variant with RMS-conditional weight decay).

Capability parity with reference ``valle/modules/optim.py:836-985``:
AdamW whose decoupled weight decay only applies while a tensor's norm
exceeds ``target_rms * sqrt(numel)``; scalar parameters are never decayed.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax


class _UpdOut(NamedTuple):
    u: Any
    m: Any
    v: Any


class EveState(NamedTuple):
    step: jnp.ndarray
    exp_avg: Any
    exp_avg_sq: Any


def eve(
    learning_rate: float = 1e-3,
    b1: float = 0.9,
    b2: float = 0.98,
    eps: float = 1e-8,
    weight_decay: float = 1e-3,
    target_rms: float = 0.1,
) -> optax.GradientTransformation:
    def init_fn(params):
        z = lambda p: jnp.zeros_like(p, jnp.float32)
        return EveState(
            step=jnp.zeros((), jnp.int32),
            exp_avg=jax.tree_util.tree_map(z, params),
            exp_avg_sq=jax.tree_util.tree_map(z, params),
        )

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("eve requires params")
        step = state.step + 1
        bc1 = 1 - b1 ** step.astype(jnp.float32)
        bc2 = 1 - b2 ** step.astype(jnp.float32)
        lr = jnp.asarray(learning_rate, jnp.float32)

        def upd(p, g, m, v):
            gf = g.astype(jnp.float32)
            pf = p.astype(jnp.float32)
            m = m * b1 + gf * (1 - b1)
            v = v * b2 + gf * gf * (1 - b2)
            denom = jnp.sqrt(v) * (bc2 ** -0.5) + eps
            step_size = lr / bc1
            delta = -step_size * m / denom
            if p.size > 1:
                above = jnp.linalg.norm(pf) > (target_rms
                                               * jnp.sqrt(float(p.size)))
                decay = -pf * (weight_decay * above)
                delta = delta + decay
            return _UpdOut(delta.astype(p.dtype), m, v)

        out = jax.tree_util.tree_map(upd, params, updates, state.exp_avg,
                                     state.exp_avg_sq)
        treedef = jax.tree_util.tree_structure(params)
        leaves = jax.tree_util.tree_leaves(
            out, is_leaf=lambda x: isinstance(x, _UpdOut))
        pick = lambda i: jax.tree_util.tree_unflatten(
            treedef, [l[i] for l in leaves])
        return pick(0), EveState(step=step, exp_avg=pick(1),
                                 exp_avg_sq=pick(2))

    return optax.GradientTransformation(init_fn, update_fn)
