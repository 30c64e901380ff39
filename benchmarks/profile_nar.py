"""Capture a jax.profiler trace of the NAR 7-pass decode at the pipeline
shape (B=32, ~740-frame sequences) to attribute its ~0.7 s cost.

Writes to /tmp/valle_tpu_profile_nar.
"""
import glob
import sys

import jax
import jax.numpy as jnp
import numpy as np

LOGDIR = "/tmp/valle_tpu_profile_nar"


def main():
    from valle_tpu.models import ValleConfig, init_valle
    from valle_tpu.models.inference import valle_nar_decode

    B, S, P, GEN = 32, 64, 224, 448
    cfg = ValleConfig(d_model=1024, nhead=16, num_layers=12, prefix_mode=1,
                      num_quantizers=8, max_len=4096)
    params, _ = init_valle(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), params)

    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    text = jax.random.randint(ks[0], (B, S), 0, 100, dtype=jnp.int32)
    text_lens = jnp.full((B,), S, jnp.int32)
    prompts = jax.random.randint(ks[1], (B, P, 8), 0, 1024, dtype=jnp.int32)
    p_lens = jnp.full((B,), P, jnp.int32)
    gen_q0 = jax.random.randint(ks[2], (B, GEN), 0, 1024, dtype=jnp.int32)
    gen_lens = jnp.full((B,), GEN, jnp.int32)

    def run(g):
        return valle_nar_decode(params, cfg, text, text_lens, prompts,
                                p_lens, g, gen_lens,
                                compute_dtype=jnp.bfloat16)

    np.asarray(run(gen_q0))
    np.asarray(run(gen_q0.at[0, 0].set(1)))

    try:
        jax.profiler.start_trace(LOGDIR)
        np.asarray(run(gen_q0.at[0, 1].set(2)))
        jax.profiler.stop_trace()
    except Exception as e:
        print(f"PROFILER UNAVAILABLE: {type(e).__name__}: {e}", flush=True)
        sys.exit(2)

    for f in sorted(glob.glob(LOGDIR + "/**/*", recursive=True)):
        print(f, flush=True)
    print("trace captured", flush=True)


if __name__ == "__main__":
    main()
