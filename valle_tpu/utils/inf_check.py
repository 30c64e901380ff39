"""Non-finite diagnostics: the TPU-native equivalent of the reference's
per-module inf/nan hooks (``icefall.hooks.register_inf_check_hooks``,
reference ``valle/bin/trainer.py:177-180,992``).

The reference registers forward/backward hooks on every nn.Module and logs
the first module whose output contains inf/nan. Under XLA there are no
module objects at run time, so the equivalent is split in two:

- steady state: the train step always reports ``grad_norm``; a non-finite
  loss or grad_norm triggers diagnosis (zero overhead until failure,
  cheaper than the reference's every-step hooks);
- on failure: (a) ``checkify`` re-runs the forward+backward with
  ``float_checks`` and names the first NaN-producing primitive with its
  source location in the model code — strictly more precise than a module
  name; (b) ``nonfinite_leaf_paths`` walks a gradient/parameter pytree and
  lists every leaf containing inf/nan.
"""

from __future__ import annotations

from typing import Callable, List, Optional

import jax
import jax.numpy as jnp


def nonfinite_leaf_paths(tree) -> List[str]:
    """Key paths of all leaves containing inf or nan."""
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    if not flat:
        return []
    # check in each leaf's own dtype: downcasting f64 to f32 would turn
    # finite values beyond ~3.4e38 into spurious infs (ints are finite)
    finite = jax.jit(lambda leaves: [
        (jnp.all(jnp.isfinite(x))
         if jnp.issubdtype(x.dtype, jnp.floating) else jnp.bool_(True))
        for x in leaves])([leaf for _, leaf in flat])
    return [jax.tree_util.keystr(path)
            for (path, _), ok in zip(flat, finite) if not bool(ok)]


def first_nan_location(fn: Callable, *args) -> Optional[str]:
    """Run ``fn(*args)`` under checkify float checks; returns a message
    naming the first NaN-producing primitive (with model source location),
    or None if no NaN was generated."""
    from jax.experimental import checkify

    checked = checkify.checkify(fn, errors=checkify.float_checks)
    err, _ = jax.jit(checked)(*args)
    err = jax.device_get(err)
    msg = err.get()
    return str(msg) if msg else None


def diagnose_nonfinite(loss_fn: Callable, params, *args) -> str:
    """Full report for a non-finite training step.

    ``loss_fn(params, *args) -> scalar loss`` should reproduce the failing
    computation (same batch/rng). Returns a multi-line report: non-finite
    parameter leaves, non-finite gradient leaves, and the first
    NaN-producing op in forward+backward.
    """
    lines = []
    bad_params = nonfinite_leaf_paths(params)
    if bad_params:
        lines.append(f"non-finite PARAM leaves: {bad_params}")

    try:
        grads = jax.jit(jax.grad(loss_fn))(params, *args)
        bad_grads = nonfinite_leaf_paths(grads)
        if bad_grads:
            lines.append(f"non-finite GRAD leaves: {bad_grads}")
    except Exception as e:  # diagnosis must never mask the original error
        lines.append(f"(grad recomputation failed: {e})")

    try:
        loc = first_nan_location(
            lambda p, *a: jax.grad(loss_fn)(p, *a), params, *args)
        if loc is None:
            loc = first_nan_location(loss_fn, params, *args)
        if loc:
            lines.append(f"first NaN op: {loc}")
    except Exception as e:
        lines.append(f"(checkify pass failed: {e})")

    return "\n".join(lines) if lines else "no non-finite values reproduced"
