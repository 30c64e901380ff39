"""Capture a jax.profiler device trace of the AR decode loop.

Writes the trace under /tmp/valle_tpu_profile; inspect the generated
plugins/profile/*/  files (trace.json.gz is human-readable). If the axon
tunnel backend cannot profile, this exits with a clear message instead of
a traceback.
"""
import glob
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

LOGDIR = "/tmp/valle_tpu_profile"


def main():
    from valle_tpu.models import ValleConfig, init_valle
    from valle_tpu.models.inference import valle_ar_decode

    B, S, P, GEN = 32, 64, 225, 64
    cfg = ValleConfig(d_model=1024, nhead=16, num_layers=12, prefix_mode=1,
                      num_quantizers=8, max_len=4096)
    params, _ = init_valle(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), params)

    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    text = jax.random.randint(ks[0], (B, S), 0, 100, dtype=jnp.int32)
    text_lens = jnp.full((B,), S, jnp.int32)
    prompt_q0 = jax.random.randint(ks[1], (B, P), 0, 1024, dtype=jnp.int32)
    prompt_lens = jnp.full((B,), P, jnp.int32)

    def run(rng):
        return valle_ar_decode(
            params, cfg, text, text_lens, prompt_q0, prompt_lens, rng,
            top_k=10, max_gen_len=GEN, compute_dtype=jnp.bfloat16,
            force_full_length=True)

    np.asarray(run(jax.random.fold_in(ks[2], 0))[0])  # compile + warm
    np.asarray(run(jax.random.fold_in(ks[2], 1))[0])

    try:
        jax.profiler.start_trace(LOGDIR)
        np.asarray(run(jax.random.fold_in(ks[2], 2))[0])
        jax.profiler.stop_trace()
    except Exception as e:
        print(f"PROFILER UNAVAILABLE on this backend: {type(e).__name__}: "
              f"{e}", flush=True)
        sys.exit(2)

    files = sorted(glob.glob(LOGDIR + "/**/*", recursive=True))
    for f in files:
        print(f, flush=True)
    print("trace captured", flush=True)


if __name__ == "__main__":
    main()
