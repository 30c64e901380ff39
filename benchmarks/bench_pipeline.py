#!/usr/bin/env python3
"""Full zero-shot pipeline benchmark: AR decode + 7 NAR passes + EnCodec
waveform synthesis, batch 32 on one chip. Reports per-stage times, aggregate
RTF, and per-utterance p50 latency.

Run AFTER any other TPU process has exited (the tunnel chip is exclusive).
"""

import time

import jax
import jax.numpy as jnp


def timeit(f, iters=3):
    """Materialize EVERY iteration (block_until_ready is dispatch-only on
    the tunnel backend) and warm past the slow first executions."""
    import numpy as np

    for _ in range(3):
        np.asarray(jax.tree_util.tree_leaves(f())[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        np.asarray(jax.tree_util.tree_leaves(f())[0])
    return (time.perf_counter() - t0) / iters


def main():
    from valle_tpu.codec import EncodecConfig, encodec_decode, init_encodec
    from valle_tpu.models import ValleConfig, init_valle
    from valle_tpu.models.inference import valle_ar_decode, valle_nar_decode

    B, S, P, GEN = 32, 64, 224, 448  # ~6 s generated per utterance
    cfg = ValleConfig(d_model=1024, nhead=16, num_layers=12, prefix_mode=1,
                      num_quantizers=8, max_len=4096)
    params, _ = init_valle(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), params)

    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    text = jax.random.randint(ks[0], (B, S), 0, 100, dtype=jnp.int32)
    text_lens = jnp.full((B,), S, jnp.int32)
    prompts = jax.random.randint(ks[1], (B, P, 8), 0, 1024, dtype=jnp.int32)
    p_lens = jnp.full((B,), P, jnp.int32)

    state = {"i": 0}

    import sys

    pos = [a for a in sys.argv[1:] if not a.startswith("-")]
    modes = pos or ["int8"]
    KW = {"int8": {"use_decode_kernel": True,
                   "decode_kernel_mode": "int8_grouped"},
          "fused": {"use_decode_kernel": True,
                    "decode_kernel_mode": "fused",
                    "unroll_layers": True},
          "unroll": {"unroll_layers": True},
          "exact": {}}

    def make_ar(kw):
        def ar():
            state["i"] += 1
            return valle_ar_decode(
                params, cfg, text, text_lens, prompts[..., 0], p_lens,
                jax.random.fold_in(ks[2], state["i"]),
                top_k=10, max_gen_len=GEN, compute_dtype=jnp.bfloat16,
                force_full_length=True, **kw)
        return ar

    # time every requested AR mode in THIS session (cross-session
    # pipeline totals are incomparable — up to 3x variance); the pipeline
    # total below uses the first mode listed
    ar_times = {}
    gen_q0 = gen_lens = None
    for mode in modes:
        ar = make_ar(KW[mode])
        if gen_q0 is None:
            gen_q0, gen_lens = ar()
        ar_times[mode] = timeit(ar)
        print(f"AR decode [{mode}]: {ar_times[mode] * 1e3:8.1f} ms "
              f"({B * GEN / ar_times[mode]:8.0f} frames/s)", flush=True)
    mode, t_ar = modes[0], ar_times[modes[0]]
    print(f"AR decode mode for totals: {mode}", flush=True)

    def nar():
        # perturb one token per call (identical-input runs are cached)
        state["i"] += 1
        g = gen_q0.at[0, 0].set(state["i"] % 1024)
        return valle_nar_decode(
            params, cfg, text, text_lens, prompts, p_lens, g, gen_lens,
            compute_dtype=jnp.bfloat16)

    codes = nar()
    t_nar = timeit(nar)

    ccfg = EncodecConfig()
    cparams = init_encodec(jax.random.PRNGKey(3), ccfg)

    codec_dtype = (jnp.bfloat16 if "--codec-bf16" in sys.argv
                   else jnp.float32)

    def codec():
        state["i"] += 1
        c = codes.at[0, 0, 0].set(state["i"] % 1024)
        return encodec_decode(cparams, c, cfg=ccfg, dtype=codec_dtype)

    t_codec = timeit(codec)

    total = t_ar + t_nar + t_codec
    audio_sec = B * GEN / 75.0
    print(f"batch={B} gen_frames={GEN} ({GEN / 75.0:.1f} s audio each)")
    print(f"AR decode : {t_ar * 1e3:8.1f} ms "
          f"({B * GEN / t_ar:8.0f} frames/s)")
    print(f"NAR passes: {t_nar * 1e3:8.1f} ms")
    print(f"EnCodec   : {t_codec * 1e3:8.1f} ms")
    print(f"TOTAL     : {total * 1e3:8.1f} ms  ->  aggregate RTF "
          f"{audio_sec / total:.1f}x realtime; per-utterance p50 latency "
          f"{total * 1e3:.0f} ms for {GEN / 75.0:.1f} s of audio")


if __name__ == "__main__":
    main()
