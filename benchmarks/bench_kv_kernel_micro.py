#!/usr/bin/env python3
"""Micro-A/B of decode-attention primitives, one session, dispatch-amortized.

The round-3 full-decode A/B showed the new combined-KV kernel 10x slower
than XLA attention AND the round-2 fused kernels 2x off their recorded
numbers — this script isolates which primitive is slow in the CURRENT
session (tunnel/chip behavior varies between sessions; only same-session
comparisons are valid — CLAUDE.md).

Each variant runs inside a lax.scan of N iterations (q folded per
iteration so the tunnel's identical-input cache cannot short-circuit),
and the output is reduced to a scalar so materialization doesn't time
the tunnel transfer.

Usage: benchmarks/run_tpu.sh benchmarks/bench_kv_kernel_micro.py [N]
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from valle_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    B, H, T, D, S, L = 32, 16, 512, 64, 64, 12
    dt = jnp.bfloat16
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q0 = jax.random.normal(ks[0], (B, H, 1, D), dt)
    k = jax.random.normal(ks[1], (B, H, T, D), dt)
    v = jax.random.normal(ks[2], (B, H, T, D), dt)
    x_lens = jnp.full((B,), S, jnp.int32)
    wp = jnp.full((B,), 440, jnp.int32)

    kk = jnp.arange(T)[None, :]
    valid = (kk < x_lens[:, None]) | ((kk >= S) & (kk <= wp[:, None]))
    bias = jnp.where(valid, 0.0, -1e30).astype(jnp.float32)[:, None, None]

    kv4 = jnp.concatenate([k, v], axis=-1)                 # (B,H,T,2D)
    kv5 = jnp.broadcast_to(kv4[None], (L,) + kv4.shape).copy()

    from valle_tpu.modules.transformer import quantize_kv
    from valle_tpu.ops.decode_attention_int8_grouped import (
        combine_kv_int8,
        decode_attention_int8_grouped,
        stack_scales,
    )
    from valle_tpu.ops.decode_attention_kv import decode_attention_kv
    from valle_tpu.ops.decode_attention_grouped import (
        decode_attention_grouped,
    )

    kq, ksc = quantize_kv(k)
    vq, vsc = quantize_kv(v)
    kv_i8 = combine_kv_int8(kq, vq)
    sc_i8 = stack_scales(ksc, vsc)
    kT = jnp.swapaxes(k, -2, -1).copy()                    # (B,H,D,T)
    vT = jnp.swapaxes(v, -2, -1).copy()

    def xla_attn(qi):
        s = jnp.einsum("bhqd,bhkd->bhqk", qi, k,
                       preferred_element_type=jnp.float32)
        s = s / np.sqrt(D) + bias
        p = jax.nn.softmax(s, axis=-1).astype(dt)
        return jnp.einsum("bhqk,bhkd->bhqd", p, v,
                          preferred_element_type=jnp.float32).astype(dt)

    # operands are passed as jit ARGUMENTS — closure-captured arrays get
    # constant-folded into the HLO, and an 805 MB constant overflows the
    # remote-compile tunnel (HTTP 413) besides skewing the measurement
    variants = {
        "xla": (lambda qi, op: xla_attn(qi), ()),
        "kv_sliced": (lambda qi, op: decode_attention_kv(
            qi, op[0], x_lens, wp, S=S), (kv4,)),
        "kv_stacked": (lambda qi, op: decode_attention_kv(
            qi, op[0], x_lens, wp, 5, S=S), (kv5,)),
        "int8": (lambda qi, op: decode_attention_int8_grouped(
            qi, op[0], op[1], x_lens, wp, S=S), (kv_i8, sc_i8)),
        "grouped_bf16T": (lambda qi, op: decode_attention_grouped(
            qi, op[0], op[1], x_lens, wp, S=S), (kT, vT)),
    }

    results = {}
    for name, (fn, operands) in variants.items():
        @jax.jit
        def run(q, operands, fn=fn):
            def body(c, i):
                qi = c + 0.0001 * i  # vary input every iteration
                o = fn(qi.astype(dt), operands)
                return c, jnp.sum(o.astype(jnp.float32))
            _, sums = jax.lax.scan(body, q, jnp.arange(N, dtype=jnp.float32))
            return jnp.sum(sums)

        t0 = time.perf_counter()
        np.asarray(run(q0, operands))
        print(f"[{name}] compile+first {time.perf_counter()-t0:.1f}s",
              flush=True)
        times = []
        for it in range(4):
            qv = q0 + 0.001 * it
            t0 = time.perf_counter()
            np.asarray(run(qv, operands))
            times.append(time.perf_counter() - t0)
        best = min(times[1:])
        results[name] = {"us_per_call": round(best / N * 1e6, 1)}
        print(f"[{name}] {results[name]}", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
