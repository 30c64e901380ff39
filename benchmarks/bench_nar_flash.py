"""NAR full-sequence attention: XLA einsum (materializes the f32 S*S
score matrix — profiler: 2.4 GB HBM traffic per layer-pass, 3.4 of 7 ms)
vs the OFFICIAL jax.experimental.pallas TPU flash attention (our
hand-written flash kernel lost 3.8x to XLA; the official one is the
properly engineered comparison).

Shape: B=32, H=16, S=768 (NAR pipeline 736 rounded to the 128-multiple
flash needs), D=64, bf16, padding masked via SegmentIds / additive bias.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

B, H, S, D = 32, 16, 768, 64
PASSES = 12          # one NAR pass = 12 layers; scan amortizes dispatch
ITERS = 4


def xla_attn(q, k, v, bias):
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
    s = s / np.sqrt(D) + bias
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def make_run(fn):
    @jax.jit
    def run(qs, k, v, aux):
        def step(carry, q):
            o = fn(q, k, v, aux)
            return carry + o.astype(jnp.float32).sum(), None

        out, _ = jax.lax.scan(step, jnp.float32(0), qs)
        return out

    return run


def timed(run, rng, k, v, aux):
    qs0 = jax.random.normal(rng, (PASSES, B, H, S, D), jnp.bfloat16)
    np.asarray(run(qs0, k, v, aux))
    best = []
    for i in range(ITERS):
        qs = jax.random.normal(jax.random.fold_in(rng, i + 1),
                               (PASSES, B, H, S, D), jnp.bfloat16)
        np.asarray(qs)
        t0 = time.perf_counter()
        np.asarray(run(qs, k, v, aux))
        best.append((time.perf_counter() - t0) / PASSES * 1e3)
    return min(best)


def main():
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds,
        flash_attention,
    )

    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    k = jax.random.normal(ks[0], (B, H, S, D), jnp.bfloat16)
    v = jax.random.normal(ks[1], (B, H, S, D), jnp.bfloat16)
    lens = jnp.concatenate([jnp.full((B // 2,), 736),
                            jnp.full((B - B // 2,), 650)]).astype(jnp.int32)
    pos = jnp.arange(S)[None, :]
    valid = pos < lens[:, None]
    bias = jnp.where(valid, 0.0, -1e30).astype(jnp.float32)[:, None, None, :]
    # segment ids: valid tokens 0, pads 1 (pads attend only each other;
    # their outputs are discarded downstream)
    seg = (~valid).astype(jnp.int32)
    seg_ids = SegmentIds(q=seg, kv=seg)

    flash = functools.partial(flash_attention, sm_scale=1.0 / np.sqrt(D))

    res = {}
    res["xla_einsum"] = round(timed(
        make_run(lambda q, k, v, b: xla_attn(q, k, v, b)),
        ks[2], k, v, bias), 2)
    print(f"[xla_einsum] {res['xla_einsum']} ms/layer-call x12", flush=True)
    res["flash_segids"] = round(timed(
        make_run(lambda q, k, v, s_: flash(q, k, v, segment_ids=s_)),
        ks[2], k, v, seg_ids), 2)
    print(f"[flash_segids] {res['flash_segids']} ms", flush=True)
    res["flash_bias"] = round(timed(
        make_run(lambda q, k, v, b: flash(
            q, k, v, ab=jnp.broadcast_to(b, (B, H, S, S)).astype(
                jnp.float32))),
        ks[2], k, v, bias), 2)
    print(f"[flash_bias] {res['flash_bias']} ms", flush=True)

    # numerics: flash vs xla on valid rows
    q1 = jax.random.normal(ks[3], (B, H, S, D), jnp.bfloat16)
    o_x = xla_attn(q1, k, v, bias)
    o_f = flash(q1, k, v, segment_ids=seg_ids)
    m = valid[:, None, :, None]
    err = float(jnp.max(jnp.abs(jnp.where(m, o_x - o_f, 0.0))))
    print({"results_ms_per_layer": res, "max_abs_diff_valid": err},
          flush=True)


if __name__ == "__main__":
    main()
