"""Decode-attention matvec experiment: profiler traces show the per-step
QK and PV einsums (q seq-len 1) lower to VPU *loop fusions* streaming the
KV cache at ~300 GB/s, while MXU convolution fusions in the same step
stream weights at ~700 GB/s (profile_decode.py, 2026-08-16). Hypothesis:
padding the single query row to an 8-row matmul (broadcast, take row 0)
flips the lowering to the MXU stream and nearly halves attention time.

Times one full layer-step attention (QK + mask + softmax + PV) under an
inner lax.scan to amortize dispatch; rng-varied inputs.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

B, H, T, D = 32, 16, 512, 64
STEPS = 64   # inner scan steps per timed call
ITERS = 4


def attn_m1(q, k, v, bias):
    s = jnp.einsum("bhd,bhtd->bht", q.astype(jnp.float32),
                   k.astype(jnp.float32))
    s = s / jnp.sqrt(D) + bias
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bht,bhtd->bhd", p, v.astype(jnp.float32))


def attn_m8(q, k, v, bias):
    q8 = jnp.broadcast_to(q[:, :, None, :], (B, H, 8, D))
    s = jax.lax.dot_general(
        q8, k, (((3,), (3,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32)       # (B, H, 8, T)
    s = s / jnp.sqrt(D) + bias[:, :, None, :]
    p = jax.nn.softmax(s, axis=-1)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32)       # (B, H, 8, D)
    return o[:, :, 0, :]


def attn_m8_bf16(q, k, v, bias):
    q8 = jnp.broadcast_to(q[:, :, None, :], (B, H, 8, D))
    s = jax.lax.dot_general(
        q8, k, (((3,), (3,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32)
    s = s / jnp.sqrt(D) + bias[:, :, None, :]
    p = jax.nn.softmax(s, axis=-1)
    o = jax.lax.dot_general(
        p.astype(jnp.bfloat16), v, (((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32)
    return o[:, :, 0, :]


def make_run(attn):
    @jax.jit
    def run(qs, k, v, bias):
        def step(carry, q):
            o = attn(q, k, v, bias)
            return carry + o.astype(jnp.float32).sum(), None

        out, _ = jax.lax.scan(step, jnp.float32(0), qs)
        return out

    return run


def timed(run, rng, k, v, bias):
    qs0 = jax.random.normal(rng, (STEPS, B, H, D), jnp.bfloat16)
    np.asarray(run(qs0, k, v, bias))  # compile
    best = []
    for i in range(ITERS):
        qs = jax.random.normal(jax.random.fold_in(rng, i + 1),
                               (STEPS, B, H, D), jnp.bfloat16)
        np.asarray(qs)                 # exclude rng gen from the timing
        t0 = time.perf_counter()
        np.asarray(run(qs, k, v, bias))
        best.append((time.perf_counter() - t0) / STEPS * 1e6)
    return min(best)


def main():
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    k = jax.random.normal(ks[0], (B, H, T, D), jnp.bfloat16)
    v = jax.random.normal(ks[1], (B, H, T, D), jnp.bfloat16)
    mask = jax.random.bernoulli(ks[2], 0.9, (B, 1, T))
    bias = jnp.where(mask, 0.0, -1e30).astype(jnp.float32)
    bias = jnp.broadcast_to(bias, (B, H, T))

    res = {}
    for name, fn in (("m1_loopfusion", attn_m1), ("m8_mxu", attn_m8),
                     ("m8_mxu_bf16p", attn_m8_bf16)):
        us = timed(make_run(fn), ks[3], k, v, bias)
        res[name] = round(us, 1)
        print(f"[{name}] {us:.1f} us per layer-step attention", flush=True)
    # numerics check m1 vs m8
    q = jax.random.normal(ks[3], (B, H, D), jnp.bfloat16)
    o1 = attn_m1(q, k, v, bias)
    o8 = attn_m8(q, k, v, bias)
    err = float(jnp.max(jnp.abs(o1 - o8)))
    print({"results_us": res, "max_abs_diff_m1_m8": err}, flush=True)


if __name__ == "__main__":
    main()
