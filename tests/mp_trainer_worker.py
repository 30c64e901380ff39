"""Subprocess entry for tests/test_multiprocess.py — NOT a pytest file.

Runs the real trainer CLI in one process of a multi-process
`jax.distributed` job (coordinator/rank config comes from the
JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars
read by `valle_tpu.parallel.mesh.setup_distributed`). Before handing
control to the trainer it wraps `utils.checkpoint.save_checkpoint` with
a recorder so the test can assert the process_index()==0 write gating
actually held on every rank (the reference gates with rank==0 the same
way, /root/reference/valle/bin/trainer.py:735,1063).

Usage: python mp_trainer_worker.py <argv.json> <calls_out.json>
where argv.json holds the trainer argv list (without the program name).
"""

import json
import sys


def main() -> None:
    argv_file, calls_out = sys.argv[1], sys.argv[2]
    with open(argv_file) as f:
        trainer_argv = json.load(f)

    import valle_tpu.utils.checkpoint as ckpt_lib

    calls = []
    orig_save = ckpt_lib.save_checkpoint

    def recording_save(out_dir, name, **kw):
        calls.append(name)
        return orig_save(out_dir, name, **kw)

    ckpt_lib.save_checkpoint = recording_save

    from valle_tpu.bin.trainer import main as trainer_main

    sys.argv = ["trainer"] + trainer_argv
    try:
        trainer_main()
    finally:
        with open(calls_out, "w") as f:
            json.dump(calls, f)


if __name__ == "__main__":
    main()
