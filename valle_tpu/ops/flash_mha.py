"""Fused fwd+bwd training attention (Pallas/TPU) with in-kernel dropout.

The training step's last large inefficiency (BASELINE.md round-4 RTT-free
attribution) is the attention score pipeline: the XLA einsum path
materializes the (B, H, S, T) scores AND probabilities to HBM (bf16 since
round 3), draws a same-shaped dropout mask (8-bit since round 4), and under
``remat=full`` does all of it twice. This module replaces that whole
pipeline at the layer level — the reference's hot path is torch's fused MHA
with dropout on the probabilities (``valle/modules/activation.py:383-427``,
``valle/modules/transformer.py:663``):

- ``flash_mha_train``: a ``jax.custom_vjp`` pair of Pallas kernels. The
  forward computes exact row-block softmax attention tile-by-tile in VMEM
  (no online-softmax rescale passes: the full key row fits VMEM at VALL-E
  shapes) and saves only the (B, S, H) log-sum-exp. The backward recomputes
  the probabilities from q, k and the LSE and accumulates dk/dv across
  query blocks in VMEM — the score/probability matrices never exist in HBM
  in either direction, which also makes ``remat="none"`` fit shapes that
  previously OOM'd.
- Dropout on the attention probabilities is drawn IN-KERNEL from the TPU
  hardware PRNG (``pltpu.prng_random_bits``), seeded per (batch, head,
  q-block) program so the backward regenerates the forward's exact mask
  without storing it. The keep/drop rule is the same quantized 8-bit
  estimator as ``modules.embedding.dropout`` (threshold = round(rate*256)
  on a uniform byte, rescale by the QUANTIZED keep probability) so the
  estimator stays unbiased; the draw itself differs from the XLA path's
  (different generator), which moves losses only within the seed-to-seed
  band.
- Masks are rebuilt inside the kernel from per-position int32 codes
  (``ops.masks.flash_codes_*``) instead of streaming a (B, 1, S, T) bias
  array: ``visible(i, j) = (qseg_i == kseg_j) & (kcode_j <= qcode_i)``
  covers every VALL-E mask (AR composite, NAR padding, 3-region
  prompt-padding, packed same-segment AR/NAR with the always-visible
  diagonal) — see the code builders in ``ops/masks.py``.

Layout notes (why these shapes):
- grid (B, H, nq) with the q-block axis innermost: k/v are fetched to VMEM
  once per (b, h) and revisited across q blocks; in the backward the same
  ordering lets dk/dv accumulate in f32 VMEM scratch and flush once.
- ``qcode``/``qseg`` ride as (B, S, 1) and ``kcode``/``kseg`` as
  (B, 1, T): a (1, bq, 1) / (1, 1, T) block lands as a (bq, 1) sublane
  column / (1, T) lane row that broadcast against each other with no
  in-kernel transpose — AND every block's trailing two dims are either
  8/128-divisible or equal to the array dims, which Mosaic requires
  (a (bq, 1)-of-(S, B) layout lowers fine in interpret mode but is
  rejected by the TPU lowering).
- LSE is stored (B, H, S, 1): a (1, 1, bq, 1) block is a natural
  (bq, 1) column and the size-1 lane dim is "equal to overall".

CPU/testing: ``interpret=True`` runs everything except the hardware PRNG
(not implemented by the interpreter); tests inject ``debug_bits`` (an
explicit uint8 array, the same byte-threshold rule) to exercise the
dropout math on CPU. ``tests/test_flash_mha.py`` pins fwd/grad parity
against the einsum reference.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30  # finite: fully-masked rows stay finite (outputs loss-masked)
CODE_INVALID = 1 << 30  # kcode for padded keys: never <= any qcode


class _Static(NamedTuple):
    bq: int
    thresh: int          # dropout byte threshold, 0 = no dropout
    add_diag: bool       # packed rows: the diagonal is always visible
    packed: bool         # segment operands present
    use_bits: bool       # explicit uint8 bits operand (tests)
    interpret: bool


def _keep_scale(thresh: int) -> float:
    return 1.0 / (1.0 - thresh / 256.0)


def _visible(qcode, qseg, kcode, kseg, static, iq, bq, T):
    """(bq, T) bool visibility from the int32 code blocks."""
    vis = kcode <= qcode                      # (bq,1) vs (1,T) -> (bq,T)
    if static.packed:
        vis = jnp.logical_and(vis, qseg == kseg)
    if static.add_diag:
        qpos = iq * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, T), 0)
        kpos = jax.lax.broadcasted_iota(jnp.int32, (bq, T), 1)
        vis = jnp.logical_or(vis, qpos == kpos)
    return vis


def _dropout_keep(static, seeds_ref, b, h, iq, bq, T, bits_ref):
    """(bq, T) bool keep mask — hardware PRNG or explicit test bits."""
    if static.use_bits:
        byte = bits_ref[0, 0].astype(jnp.int32)
    else:
        from jax.experimental.pallas import tpu as pltpu

        # one seed per (b, h, q-block) program: the backward re-seeds with
        # the same tuple and regenerates the forward's exact mask. The
        # program index XORs into the SECOND word (Mosaic supports at
        # most two seed values): distinct per program for b,h,iq < 4096,
        # and the fold is reproduced bit-identically by the backward.
        pltpu.prng_seed(seeds_ref[0],
                        seeds_ref[1] ^ ((b * 4096 + h) * 4096 + iq))
        bits = pltpu.prng_random_bits((bq, T))
        byte = jnp.bitwise_and(bits.astype(jnp.int32), 255)
    return byte >= static.thresh


def _fwd_kernel(seeds_ref, q_ref, k_ref, v_ref, qcode_ref, kcode_ref,
                *rest, static: _Static, sm_scale: float):
    refs = list(rest)
    qseg_ref = refs.pop(0) if static.packed else None
    kseg_ref = refs.pop(0) if static.packed else None
    bits_ref = refs.pop(0) if static.use_bits else None
    o_ref, lse_ref = refs

    import jax.experimental.pallas as pl

    b = pl.program_id(0)
    h = pl.program_id(1)
    iq = pl.program_id(2)
    bq = q_ref.shape[2]
    T = k_ref.shape[2]

    q = q_ref[0, 0]                                   # (bq, D)
    k = k_ref[0, 0]                                   # (T, D)
    v = v_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * sm_scale  # (bq, T) f32

    vis = _visible(qcode_ref[0], qseg_ref[0] if static.packed else None,
                   kcode_ref[0],
                   kseg_ref[0] if static.packed else None,
                   static, iq, bq, T)
    s = jnp.where(vis, s, NEG_INF)

    m = jnp.max(s, axis=-1, keepdims=True)            # (bq, 1)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    lse_ref[0, 0] = m + jnp.log(l)                    # (bq, 1)

    if static.thresh > 0:
        keep = _dropout_keep(static, seeds_ref, b, h, iq, bq, T, bits_ref)
        p = jnp.where(keep, p * _keep_scale(static.thresh), 0.0)
    pn = (p / l).astype(v.dtype)
    o_ref[0, 0] = jax.lax.dot_general(
        pn, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _bwd_kernel(seeds_ref, q_ref, k_ref, v_ref, qcode_ref, kcode_ref,
                *rest, static: _Static, sm_scale: float, nq: int):
    refs = list(rest)
    qseg_ref = refs.pop(0) if static.packed else None
    kseg_ref = refs.pop(0) if static.packed else None
    bits_ref = refs.pop(0) if static.use_bits else None
    (o_ref, lse_ref, g_ref, dq_ref, dk_ref, dv_ref,
     dk_scr, dv_scr) = refs

    import jax.experimental.pallas as pl

    b = pl.program_id(0)
    h = pl.program_id(1)
    iq = pl.program_id(2)
    bq = q_ref.shape[2]
    T = k_ref.shape[2]

    @pl.when(iq == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    q = q_ref[0, 0]                                   # (bq, D)
    k = k_ref[0, 0]                                   # (T, D)
    v = v_ref[0, 0]
    g = g_ref[0, 0]                                   # (bq, D) = dL/dout
    out = o_ref[0, 0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * sm_scale
    vis = _visible(qcode_ref[0], qseg_ref[0] if static.packed else None,
                   kcode_ref[0],
                   kseg_ref[0] if static.packed else None,
                   static, iq, bq, T)
    s = jnp.where(vis, s, NEG_INF)
    p = jnp.exp(s - lse_ref[0, 0])                    # normalized probs

    # delta_i = sum_d out_id * g_id  (= sum_j dpd_ij * pd_ij, the softmax
    # vjp's row term — the dropped entries cancel exactly, see module doc)
    delta = jnp.sum(out.astype(jnp.float32) * g.astype(jnp.float32),
                    axis=-1, keepdims=True)           # (bq, 1)

    dpd = jax.lax.dot_general(
        g, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)           # (bq, T) = g @ v^T

    if static.thresh > 0:
        keep = _dropout_keep(static, seeds_ref, b, h, iq, bq, T, bits_ref)
        scale = _keep_scale(static.thresh)
        pd = jnp.where(keep, p * scale, 0.0)          # dropped, normalized
        dp = jnp.where(keep, dpd * scale, 0.0)
    else:
        pd = p
        dp = dpd

    # dv += pd^T @ g ; ds = p * (dp - delta); dq = ds @ k; dk += ds^T @ q
    dv_scr[:] += jax.lax.dot_general(
        pd.astype(g.dtype), g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    ds = (p * (dp - delta)).astype(q.dtype)           # (bq, T)
    dq_ref[0, 0] = (jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * sm_scale).astype(dq_ref.dtype)
    dk_scr[:] += jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * sm_scale

    @pl.when(iq == nq - 1)
    def _flush():
        dk_ref[0, 0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[:].astype(dv_ref.dtype)


def _specs(B, H, nq, bq, T, D, static):
    """Shared in_specs for fwd/bwd (seeds prefetched, then tensor operands)."""
    import jax.experimental.pallas as pl

    specs = [
        pl.BlockSpec((1, 1, bq, D), lambda b, h, iq, *_: (b, h, iq, 0)),  # q
        pl.BlockSpec((1, 1, T, D), lambda b, h, iq, *_: (b, h, 0, 0)),    # k
        pl.BlockSpec((1, 1, T, D), lambda b, h, iq, *_: (b, h, 0, 0)),    # v
        pl.BlockSpec((1, bq, 1), lambda b, h, iq, *_: (b, iq, 0)),  # qcode
        pl.BlockSpec((1, 1, T), lambda b, h, iq, *_: (b, 0, 0)),    # kcode
    ]
    if static.packed:
        specs += [
            pl.BlockSpec((1, bq, 1), lambda b, h, iq, *_: (b, iq, 0)),
            pl.BlockSpec((1, 1, T), lambda b, h, iq, *_: (b, 0, 0)),
        ]
    if static.use_bits:
        specs.append(
            pl.BlockSpec((1, 1, bq, T), lambda b, h, iq, *_: (b, h, iq, 0)))
    return specs


def _pallas_fwd(q, k, v, qcodeT, kcode, qsegT, kseg, seeds, bits, static):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, S, D = q.shape
    T = k.shape[2]
    bq = static.bq
    nq = S // bq
    operands = [q, k, v, qcodeT, kcode]
    if static.packed:
        operands += [qsegT, kseg]
    if static.use_bits:
        operands.append(bits)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, H, nq),
        in_specs=_specs(B, H, nq, bq, T, D, static),
        out_specs=[
            pl.BlockSpec((1, 1, bq, D), lambda b, h, iq, *_: (b, h, iq, 0)),
            pl.BlockSpec((1, 1, bq, 1), lambda b, h, iq, *_: (b, h, iq, 0)),
        ],
    )
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, static=static,
                          sm_scale=1.0 / math.sqrt(D)),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, H, S, D), q.dtype),
            jax.ShapeDtypeStruct((B, H, S, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=static.interpret,
    )(seeds, *operands)
    return out, lse


def _pallas_bwd(q, k, v, qcodeT, kcode, qsegT, kseg, seeds, bits,
                out, lse, g, static):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, S, D = q.shape
    T = k.shape[2]
    bq = static.bq
    nq = S // bq
    operands = [q, k, v, qcodeT, kcode]
    if static.packed:
        operands += [qsegT, kseg]
    if static.use_bits:
        operands.append(bits)
    operands += [out, lse, g]

    in_specs = _specs(B, H, nq, bq, T, D, static) + [
        pl.BlockSpec((1, 1, bq, D), lambda b, h, iq, *_: (b, h, iq, 0)),  # out
        pl.BlockSpec((1, 1, bq, 1), lambda b, h, iq, *_: (b, h, iq, 0)),  # lse
        pl.BlockSpec((1, 1, bq, D), lambda b, h, iq, *_: (b, h, iq, 0)),  # g
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, H, nq),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, bq, D), lambda b, h, iq, *_: (b, h, iq, 0)),
            pl.BlockSpec((1, 1, T, D), lambda b, h, iq, *_: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, T, D), lambda b, h, iq, *_: (b, h, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((T, D), jnp.float32),   # dk accumulator
            pltpu.VMEM((T, D), jnp.float32),   # dv accumulator
        ],
    )
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, static=static,
                          sm_scale=1.0 / math.sqrt(D), nq=nq),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, H, S, D), q.dtype),
            jax.ShapeDtypeStruct((B, H, T, D), k.dtype),
            jax.ShapeDtypeStruct((B, H, T, D), v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=static.interpret,
    )(seeds, *operands)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _flash_core(static, q, k, v, qcodeT, kcode, qsegT, kseg, seeds, bits):
    out, _ = _pallas_fwd(q, k, v, qcodeT, kcode, qsegT, kseg, seeds, bits,
                         static)
    return out


def _flash_core_fwd(static, q, k, v, qcodeT, kcode, qsegT, kseg, seeds,
                    bits):
    out, lse = _pallas_fwd(q, k, v, qcodeT, kcode, qsegT, kseg, seeds, bits,
                           static)
    return out, (q, k, v, qcodeT, kcode, qsegT, kseg, seeds, bits, out, lse)


def _flash_core_bwd(static, res, g):
    (q, k, v, qcodeT, kcode, qsegT, kseg, seeds, bits, out, lse) = res
    dq, dk, dv = _pallas_bwd(q, k, v, qcodeT, kcode, qsegT, kseg, seeds,
                             bits, out, lse, g, static)
    return dq, dk, dv, None, None, None, None, None, None


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pick_bq(S_pad: int, T_pad: int) -> int:
    """Largest q block in {512, 256, 128} dividing S_pad whose f32 score
    tile (+ same-shape PRNG bits) stays within ~4 MiB of VMEM."""
    budget = 4 * 1024 * 1024
    for bq in (512, 256, 128):
        if S_pad % bq == 0 and bq * T_pad * 8 <= budget:
            return bq
    return 128


def flash_mha_train(q, k, v, qcode, kcode, *, qseg=None, kseg=None,
                    add_diag: bool = False, dropout_rate: float = 0.0,
                    rng: Optional[jax.Array] = None,
                    block_q: Optional[int] = None, interpret: bool = False,
                    debug_bits: Optional[jnp.ndarray] = None):
    """Fused training attention with mask-from-codes and prob dropout.

    q: (B, H, S, D); k, v: (B, H, T, D); qcode (B, S) / kcode (B, T) int32
    visibility codes (``ops.masks.flash_codes_*``): query i sees key j iff
    ``kcode[j] <= qcode[i]`` (and ``qseg[i] == kseg[j]`` when segment ids
    are given; ``add_diag`` additionally unmasks i == j, the packed-mask
    diagonal rule). Padded keys use ``CODE_INVALID``.

    ``dropout_rate`` applies the reference's dropout-on-probabilities
    (activation.py:12) with the 8-bit quantized estimator; ``rng`` seeds
    the in-kernel hardware PRNG (ignored when ``debug_bits`` — a
    (B, H, S, T) uint8 array — is supplied, the CPU-testable path).
    """
    B, H, S, D = q.shape
    T = k.shape[2]
    thresh = int(round(dropout_rate * 256.0)) if dropout_rate > 0.0 else 0
    if thresh > 0 and rng is None and debug_bits is None:
        raise ValueError("dropout_rate > 0 requires rng or debug_bits")
    if thresh > 0 and debug_bits is None and interpret:
        # the interpreter has no TPU PRNG lowering: draw the mask bytes
        # outside (CPU/test path only; same byte-threshold estimator)
        debug_bits = jax.random.bits(rng, (B, H, S, T), jnp.uint8)

    S_pad = _round_up(S, 128)
    T_pad = _round_up(T, 128)
    bq = block_q or _pick_bq(S_pad, T_pad)
    S_pad = _round_up(S_pad, bq)

    if S_pad != S:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, S_pad - S), (0, 0)))
    if T_pad != T:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, T_pad - T), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, T_pad - T), (0, 0)))
    # padded queries see nothing (uniform rows, sliced off + loss-masked);
    # padded keys are invisible to everyone. Codes ride (B, S, 1) /
    # (B, 1, T) — see the layout notes in the module docstring.
    qcode3 = jnp.pad(qcode.astype(jnp.int32), ((0, 0), (0, S_pad - S)),
                     constant_values=-1)[:, :, None]
    kcode3 = jnp.pad(kcode.astype(jnp.int32), ((0, 0), (0, T_pad - T)),
                     constant_values=CODE_INVALID)[:, None, :]
    packed = qseg is not None
    qseg3 = kseg3 = None
    if packed:
        qseg3 = jnp.pad(qseg.astype(jnp.int32), ((0, 0), (0, S_pad - S)),
                        constant_values=-(1 << 20))[:, :, None]
        kseg3 = jnp.pad(kseg.astype(jnp.int32), ((0, 0), (0, T_pad - T)),
                        constant_values=-(2 << 20))[:, None, :]

    use_bits = debug_bits is not None
    bits = None
    if use_bits:
        bits = jnp.pad(debug_bits, ((0, 0), (0, 0), (0, S_pad - S),
                                    (0, T_pad - T)))
    if thresh > 0 and not use_bits:
        seeds = jax.lax.bitcast_convert_type(
            jax.random.bits(rng, (2,), jnp.uint32), jnp.int32)
    else:
        seeds = jnp.zeros((2,), jnp.int32)

    static = _Static(bq=bq, thresh=thresh, add_diag=add_diag, packed=packed,
                     use_bits=use_bits, interpret=interpret)
    out = _flash_core(static, q, k, v, qcode3, kcode3, qseg3, kseg3, seeds,
                      bits)
    return out[:, :, :S]


def reference_mha(q, k, v, qcode, kcode, *, qseg=None, kseg=None,
                  add_diag=False, dropout_rate=0.0, debug_bits=None):
    """Einsum oracle for the kernel's exact semantics (tests)."""
    B, H, S, D = q.shape
    T = k.shape[2]
    vis = kcode[:, None, :] <= qcode[:, :, None]          # (B, S, T)
    if qseg is not None:
        vis = vis & (qseg[:, :, None] == kseg[:, None, :])
    if add_diag:
        eye = jnp.arange(S)[:, None] == jnp.arange(T)[None, :]
        vis = vis | eye[None]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) / math.sqrt(D)
    s = jnp.where(vis[:, None], s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    if dropout_rate > 0.0:
        thresh = int(round(dropout_rate * 256.0))
        keep = debug_bits.astype(jnp.int32) >= thresh
        p = jnp.where(keep, p * _keep_scale(thresh), 0.0)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(v.dtype)
