"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must run BEFORE jax initializes its backends. Two things matter here:
1. This machine's ``sitecustomize`` registers an experimental remote-TPU
   ("axon") backend and force-sets ``jax_platforms="axon,cpu"``; tests must
   undo that (the tunnel is slow and single-chip).
2. ``--xla_force_host_platform_device_count=8`` exposes 8 virtual CPU
   devices, the TPU-world analog of the reference's "loop over available
   devices" trick (reference valle/tests/valle_test.py:29-35): sharding and
   collectives are exercised for real.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# Clear the axon pool address too: the sitecustomize contacts the pool at
# jax-init time EVEN under JAX_PLATFORMS=cpu, and subprocesses spawned by
# tests (recipe prepare.sh -> tokenizer/trainer CLIs) inherit os.environ —
# during a tunnel outage each such child hangs ~25 min in backend init
# (reproduced 2026-08-18: `JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS=127.0.0.1
# python -c "import jax; jax.devices()"` hangs; with the var empty it
# returns instantly). The pytest process itself was unaffected only
# because jax.config.update below short-circuits before the pool call.
os.environ["PALLAS_AXON_POOL_IPS"] = ""
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables after each test module.

    The full suite compiles many hundreds of XLA:CPU programs in one
    process; past ~250 tests the accumulated executables reproducibly
    segfaulted a LATER unrelated compile (observed 2026-08-19: two
    full-suite runs died at 82%+ in test_valle_model while every
    half-suite subset — including the victim test with either half —
    passed; 125 GB RAM free, so pressure inside XLA:CPU/jit caches, not
    the host). Modules rarely share jitted shapes, so per-module
    clearing costs little and keeps the single-process `pytest tests/`
    invocation green.
    """
    yield
    jax.clear_caches()
