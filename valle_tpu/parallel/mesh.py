"""Device mesh + sharding rules (data parallel / tensor parallel).

Capability parity with the reference's distribution layer
(``valle/bin/trainer.py:849-915,1152``: mp.spawn + NCCL DDP, SURVEY.md §2.4)
— re-designed the TPU way: one process, a ``jax.sharding.Mesh`` over all
devices, params/batch annotated with ``NamedSharding``; XLA inserts the
gradient psums over ICI (and DCN across slices via
``jax.distributed.initialize``).

Beyond parity, a 'model' mesh axis provides tensor parallelism over
attention/FFN projections (the reference has none — SURVEY §2.4 TP: none).
Pipeline/expert parallelism do not apply to this model family.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: Optional[int] = None, tp: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a ('data', 'model') mesh. dp defaults to n_devices // tp."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        assert n % tp == 0, (n, tp)
        dp = n // tp
    assert dp * tp == n, f"dp({dp}) * tp({tp}) != devices({n})"
    arr = np.empty((dp, tp), dtype=object)
    for i, d in enumerate(devices):
        arr[i // tp, i % tp] = d
    return Mesh(arr, axis_names=("data", "model"))


def _spec_from_keys(keys, leaf) -> P:
    """Tensor-parallel partition spec for one parameter leaf (by key path).

    Attention in-projections and FFN first layers are column-parallel
    (shard the output dim over 'model'); out-projections and FFN second
    layers are row-parallel (shard the input dim). Everything else is
    replicated. Leaves under 'layers' carry a leading stacking axis.
    """
    name = keys[-1] if keys else None
    nd = leaf.ndim

    def spec(*tail):
        lead = (None,) * (nd - len(tail))
        return P(*(lead + tail))

    in_attn = "self_attn" in keys or "cross_attn" in keys
    # the packed (d, 3d) QKV projection is NOT column-sharded: a 'model'
    # split at 3d/tp crosses the Q/K/V block boundaries (tp=2 puts the
    # cut at 1.5d), so the per-head split right after it would force
    # resharding collectives every layer. Replicating the in-proj keeps
    # attention compute local until the row-parallel out-proj.
    if in_attn and name in ("in_w", "in_b"):
        return P()
    if in_attn and name == "out_w":
        return spec("model", None)    # (d, d) rows
    if "lin1" in keys and name == "w":
        return spec("model")
    if "lin1" in keys and name == "b":
        return spec("model")
    if "lin2" in keys and name == "w":
        return spec("model", None)
    return P()  # replicated


def _guarded_sharding(keys, leaf, mesh: Mesh) -> NamedSharding:
    spec = _spec_from_keys(keys, leaf)
    # guard: dims must divide the mesh axis size
    tp = mesh.shape["model"]
    ok = all(
        (s is None) or (leaf.shape[i] % tp == 0)
        for i, s in enumerate(spec + (None,) * (leaf.ndim - len(spec))))
    return NamedSharding(mesh, spec if ok else P())


def param_shardings(params, mesh: Mesh):
    """NamedSharding pytree for the parameter tree (TP rules above)."""
    def f(path, leaf):
        return _guarded_sharding([getattr(e, "key", None) for e in path],
                                 leaf, mesh)

    return jax.tree_util.tree_map_with_path(f, params)


def opt_state_shardings(opt_state, params, mesh: Mesh):
    """NamedSharding pytree for an optimizer state.

    Optimizer buffers mirror parameter leaves nested under state fields
    (e.g. ``.inner_state[0].exp_avg_sq['ar']['decoder']...``); each buffer
    leaf gets the TP spec of the parameter whose key path is a suffix of the
    buffer's path (guarded by shape divisibility — per-tensor statistics
    whose trailing dims are size-1 fall back to replication). Scalars and
    hyperparams are replicated. Works through ``optax.masked`` /
    ``inject_hyperparams`` wrappers because matching is by path suffix, not
    tree structure.
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    param_paths = {
        tuple(getattr(e, "key", None) for e in path) for path, _ in flat}

    def f(path, leaf):
        keys = [getattr(e, "key", None) for e in path]
        for start in range(len(keys)):
            suffix = tuple(keys[start:])
            if suffix in param_paths:
                return _guarded_sharding(list(suffix), leaf, mesh)
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(f, opt_state)


def batch_shardings(batch, mesh: Mesh, *, leading_accum: bool = False):
    """Shard the batch dim of every array over 'data'.

    With ``leading_accum=True`` arrays are (accum, batch, ...): the
    microbatch dim is replicated (it is scanned over inside the step) and
    dim 1 is sharded.
    """
    lead = (None,) if leading_accum else ()

    def f(leaf):
        n_tail = leaf.ndim - len(lead) - 1
        if n_tail < 0:
            raise ValueError(
                f"batch leaf with {leaf.ndim} dims cannot carry "
                f"{'an accum and ' if lead else ''}a batch dim to shard")
        return NamedSharding(mesh, P(*lead, "data", *((None,) * n_tail)))

    return jax.tree_util.tree_map(f, batch)


def replicated(tree, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda _: NamedSharding(mesh, P()), tree)


def setup_distributed() -> None:
    """Multi-host init (DCN): call once per process before device use.

    The reference's ``setup_dist``/``cleanup_dist`` equivalent
    (``bin/trainer.py:867,1073``); no-op when ``JAX_COORDINATOR_ADDRESS``
    is unset (single-host). On managed clusters (Cloud TPU pods, Slurm,
    OpenMPI) jax auto-detects everything and only the address is needed;
    for a manual launch export all three:

        JAX_COORDINATOR_ADDRESS=host0:12345 \\
        JAX_NUM_PROCESSES=N JAX_PROCESS_ID=i  python -m valle_tpu.bin.trainer ...

    (jax itself only reads the address env var — the process count/id
    normally come from cluster auto-detection, so a bare-metal launch
    must pass them explicitly; exercised for real by
    ``tests/test_multiprocess.py``.)
    """
    import os

    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not addr:
        return
    nproc = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    jax.distributed.initialize(
        coordinator_address=addr,
        num_processes=int(nproc) if nproc else None,
        process_id=int(pid) if pid else None)
