"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set env vars BEFORE jax is imported anywhere, so this conftest performs
the setup at import time. This is the TPU-world analog of the reference's
"loop over available devices" trick (reference valle/tests/valle_test.py:29-35):
multi-device behavior is exercised on host CPU devices.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
