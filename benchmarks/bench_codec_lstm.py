"""A/B the codec LSTM input-projection hoist on the real chip.

Times encodec_decode at the pipeline shape (B=32, F=448 frames -> 6 s of
24 kHz audio each) with the shipped hoisted LSTM vs the old two-matmuls-
per-step cell, in ONE session (session-to-session variance is up to 3x).

Timing rules (see BASELINE.md): vary an input per iteration (fold the
codes), materialize a scalar with np.asarray.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from valle_tpu.codec import EncodecConfig, init_encodec, encodec_decode
from valle_tpu.codec import seanet

B, F, NQ = 32, 448, 8
ITERS = 8


def lstm_apply_old(p, x, skip: bool = True):
    """Pre-hoist cell: input projection recomputed every step."""
    Bx, T, C = x.shape

    def layer(x, lp):
        def cell(carry, xt):
            h, c = carry
            gates = xt @ lp["w_ih"] + lp["b_ih"] + h @ lp["w_hh"] + lp["b_hh"]
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            h = jax.nn.sigmoid(o) * jnp.tanh(c)
            return (h, c), h

        h0 = jnp.zeros((Bx, C), x.dtype)
        (_, _), ys = jax.lax.scan(cell, (h0, h0), jnp.swapaxes(x, 0, 1))
        return jnp.swapaxes(ys, 0, 1)

    y = x
    n_layers = p["layers"]["w_ih"].shape[0]
    for i in range(n_layers):
        lp = jax.tree_util.tree_map(lambda a: a[i], p["layers"])
        y = layer(y, lp)
    return y + x if skip else y


def timed(fn, codes):
    out = fn(codes)  # compile
    np.asarray(out)
    t0 = time.perf_counter()
    for i in range(ITERS):
        c = (codes + i) % 1024
        np.asarray(fn(c))
    return (time.perf_counter() - t0) / ITERS * 1000


def main():
    cfg = EncodecConfig()
    params = init_encodec(jax.random.PRNGKey(0), cfg)
    codes = jax.random.randint(jax.random.PRNGKey(1), (B, F, NQ), 0, 1024)

    @jax.jit
    def dec(c):
        return jnp.abs(encodec_decode(params, c, cfg=cfg)).sum()

    # encodec_decode is itself jitted and caches on avals: trace each
    # variant through a cache-busted copy or the patch is silently ignored.
    import valle_tpu.codec.model as codec_model

    orig = seanet.lstm_apply
    seanet.lstm_apply = lstm_apply_old
    try:
        codec_model.encodec_decode.clear_cache()

        @jax.jit
        def dec_old(c):
            return jnp.abs(encodec_decode(params, c, cfg=cfg)).sum()

        np.asarray(dec_old(codes))  # compile old
    finally:
        seanet.lstm_apply = orig
    codec_model.encodec_decode.clear_cache()
    np.asarray(dec(codes))  # compile new

    # interleave A/B rounds to cancel warm-up drift
    new_ms, old_ms = [], []
    for r in range(3):
        old_ms.append(timed(dec_old, (codes + 7 * r) % 1024))
        new_ms.append(timed(dec, (codes + 11 * r) % 1024))
        print(f"round {r}: old {old_ms[-1]:.1f} ms  new {new_ms[-1]:.1f} ms",
              flush=True)
    ms_old, ms_new = min(old_ms), min(new_ms)
    print({"hoisted_ms": round(ms_new, 1), "old_ms": round(ms_old, 1),
           "speedup": round(ms_old / ms_new, 3)}, flush=True)


if __name__ == "__main__":
    main()
