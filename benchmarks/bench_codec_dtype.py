"""A/B fp32 vs bf16 EnCodec decode on the real chip (pipeline shape
B=32, F=448) and report the bf16 path's SNR vs fp32.

Interleaved rounds, scalar materialization, varied inputs (see
BASELINE.md timing rules).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from valle_tpu.codec import EncodecConfig, init_encodec, encodec_decode

B, F, NQ = 32, 448, 8
ITERS = 8


def timed(fn, codes):
    t0 = time.perf_counter()
    for i in range(ITERS):
        np.asarray(fn((codes + i) % 1024))
    return (time.perf_counter() - t0) / ITERS * 1000


def main():
    cfg = EncodecConfig()
    params = init_encodec(jax.random.PRNGKey(0), cfg)
    codes = jax.random.randint(jax.random.PRNGKey(1), (B, F, NQ), 0, 1024)

    @jax.jit
    def dec32(c):
        return jnp.abs(encodec_decode(params, c, cfg=cfg)).sum()

    @jax.jit
    def dec16(c):
        return jnp.abs(
            encodec_decode(params, c, cfg=cfg, dtype=jnp.bfloat16)).sum()

    # fidelity on a small batch (full waveforms to host once)
    small = codes[:2, :64]
    ref = np.asarray(encodec_decode(params, small, cfg=cfg))
    out = np.asarray(encodec_decode(params, small, cfg=cfg,
                                    dtype=jnp.bfloat16))
    snr = 10 * np.log10(np.mean(ref ** 2) / np.mean((out - ref) ** 2))
    print(f"bf16 decode SNR vs fp32: {snr:.1f} dB", flush=True)

    np.asarray(dec32(codes)); np.asarray(dec16(codes))  # compile
    f32, f16 = [], []
    for r in range(3):
        f32.append(timed(dec32, (codes + 5 * r) % 1024))
        f16.append(timed(dec16, (codes + 9 * r) % 1024))
        print(f"round {r}: fp32 {f32[-1]:.1f} ms  bf16 {f16[-1]:.1f} ms",
              flush=True)
    print({"fp32_ms": round(min(f32), 1), "bf16_ms": round(min(f16), 1),
           "speedup": round(min(f32) / min(f16), 3),
           "snr_db": round(float(snr), 1)}, flush=True)


if __name__ == "__main__":
    main()
