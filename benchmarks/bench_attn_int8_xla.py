"""Is the decode-attention VPU loop fusion BYTE-bound or ELEMENT-bound?

Profiler: QK/PV loop fusions stream the bf16 cache at ~300 GB/s and are
57% of the decode step. If byte-bound, an int8 cache with POST-DOT
dequant (scores * k_scale per position; probs * v_scale before the PV
dot — mathematically exact per position, converts fused into the reduce,
nothing materialized — unlike modules.transformer.mha_decode_step_int8
which materializes a dequantized bf16 cache) should halve it. If
element-bound, parity.

Times one layer-step of attention under an inner scan; same session A/B.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

B, H, T, D = 32, 16, 512, 64
STEPS = 64
ITERS = 4


def attn_bf16(q, aux, bias):
    k, v = aux
    s = jnp.einsum("bhd,bhtd->bht", q.astype(jnp.float32),
                   k.astype(jnp.float32))
    s = s / np.sqrt(D) + bias
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bht,bhtd->bhd", p, v.astype(jnp.float32))


def attn_int8_postdot(q, aux, bias):
    kq, ks, vq, vs = aux
    s = jnp.einsum("bhd,bhtd->bht", q.astype(jnp.float32),
                   kq.astype(jnp.float32))
    s = s * ks / np.sqrt(D) + bias                  # post-dot dequant
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bht,bhtd->bhd", p * vs, vq.astype(jnp.float32))


def make_run(fn):
    @jax.jit
    def run(qs, aux, bias):
        def step(c, q):
            o = fn(q, aux, bias)
            return c + o.sum(), None

        out, _ = jax.lax.scan(step, jnp.float32(0), qs)
        return out

    return run


def timed(run, rng, aux, bias):
    qs0 = jax.random.normal(rng, (STEPS, B, H, D), jnp.bfloat16)
    np.asarray(run(qs0, aux, bias))
    best = []
    for i in range(ITERS):
        qs = jax.random.normal(jax.random.fold_in(rng, i + 1),
                               (STEPS, B, H, D), jnp.bfloat16)
        np.asarray(qs)
        t0 = time.perf_counter()
        np.asarray(run(qs, aux, bias))
        best.append((time.perf_counter() - t0) / STEPS * 1e6)
    return min(best)


def main():
    import sys
    sys.path.insert(0, ".")
    from valle_tpu.modules.transformer import quantize_kv

    ks_ = jax.random.split(jax.random.PRNGKey(0), 4)
    k = jax.random.normal(ks_[0], (B, H, T, D), jnp.bfloat16)
    v = jax.random.normal(ks_[1], (B, H, T, D), jnp.bfloat16)
    kq, ks = quantize_kv(k)
    vq, vs = quantize_kv(v)
    mask = jax.random.bernoulli(ks_[2], 0.9, (B, 1, T))
    bias = jnp.broadcast_to(
        jnp.where(mask, 0.0, -1e30).astype(jnp.float32), (B, H, T))

    res = {}
    res["bf16"] = round(timed(make_run(attn_bf16), ks_[3], (k, v), bias), 1)
    print(f"[bf16] {res['bf16']} us/layer-step", flush=True)
    res["int8_postdot"] = round(timed(
        make_run(attn_int8_postdot), ks_[3], (kq, ks, vq, vs), bias), 1)
    print(f"[int8_postdot] {res['int8_postdot']} us/layer-step", flush=True)
    res["bf16_again"] = round(
        timed(make_run(attn_bf16), ks_[3], (k, v), bias), 1)
    print(f"[bf16 again] {res['bf16_again']} us", flush=True)

    q1 = jax.random.normal(ks_[3], (B, H, D), jnp.bfloat16)
    o1 = attn_bf16(q1, (k, v), bias)
    o2 = attn_int8_postdot(q1, (kq, ks, vq, vs), bias)
    err = float(jnp.max(jnp.abs(o1 - o2)))
    print({"results_us": res, "max_abs_diff": err}, flush=True)


if __name__ == "__main__":
    main()
