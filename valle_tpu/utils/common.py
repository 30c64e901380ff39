"""Small host/device utilities used across the framework.

Replaces the handful of icefall pure-Python helpers the reference imports
(``make_pad_mask``, ``AttributeDict``, ``str2bool``, ``setup_logger`` — see
reference ``valle/bin/trainer.py:46-55`` and SURVEY.md N9). ``make_pad_mask``
here is a jittable JAX function.
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
from datetime import datetime
from pathlib import Path
from typing import Optional

import jax.numpy as jnp
import numpy as np


class AttributeDict(dict):
    """dict with attribute access; the runtime 'params' bag for CLIs."""

    def __getattr__(self, key):
        try:
            return self[key]
        except KeyError as e:
            raise AttributeError(key) from e

    def __setattr__(self, key, value):
        self[key] = value

    def __delattr__(self, key):
        try:
            del self[key]
        except KeyError as e:
            raise AttributeError(key) from e


def str2bool(v) -> bool:
    """argparse-friendly bool parser (same contract as icefall's)."""
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError("Boolean value expected.")


def make_pad_mask(lengths: jnp.ndarray, max_len: Optional[int] = None) -> jnp.ndarray:
    """Boolean padding mask: True at PADDED positions.

    Args:
      lengths: (B,) int array of valid lengths.
      max_len: static sequence length. Unlike the torch version, on TPU this
        should always be passed explicitly (static shape); if omitted we fall
        back to ``lengths.max()`` which only works outside jit.

    Returns:
      (B, max_len) bool array, ``mask[b, t] = t >= lengths[b]``.
    """
    if max_len is None:
        max_len = int(np.asarray(lengths).max())
    pos = jnp.arange(max_len, dtype=lengths.dtype)[None, :]
    return pos >= lengths[:, None]


def setup_logger(
    log_filename: Optional[str] = None,
    log_level: str = "info",
    use_console: bool = True,
    rank: int = 0,
    world_size: int = 1,
) -> None:
    """Per-process logging to file + console (parity with icefall setup_logger)."""
    now = datetime.now()
    date_time = now.strftime("%Y-%m-%d-%H-%M-%S")
    if log_filename is not None:
        if world_size > 1:
            log_filename = f"{log_filename}-{date_time}-{rank}"
        else:
            log_filename = f"{log_filename}-{date_time}"
        Path(log_filename).parent.mkdir(parents=True, exist_ok=True)

    level = getattr(logging, log_level.upper(), logging.INFO)
    formatter = (
        f"%(asctime)s %(levelname)s [%(filename)s:%(lineno)d] "
        f"({rank}/{world_size}) %(message)s"
    )
    logging.basicConfig(
        level=level,
        format=formatter,
        filename=log_filename,
        force=True,
    )
    if use_console:
        console = logging.StreamHandler(sys.stderr)
        console.setLevel(level)
        console.setFormatter(logging.Formatter(formatter))
        logging.getLogger("").addHandler(console)


def get_env_info() -> dict:
    """Environment snapshot persisted into checkpoints for forensics."""
    import jax

    return {
        "jax-version": jax.__version__,
        "python-version": sys.version.split()[0],
        "jax-backend": jax.default_backend(),
        "device-count": jax.device_count(),
        "hostname": os.uname().nodename,
    }


def enable_compilation_cache(path: Optional[str] = None) -> None:
    """Persistent XLA compilation cache (survives process restarts).

    First compiles over this environment's remote tunnel take minutes;
    caching them makes repeat CLI/bench invocations start fast.
    """
    import jax

    cache_dir = path or os.environ.get(
        "VALLE_TPU_COMPILATION_CACHE", "/tmp/valle_tpu_xla_cache")
    if cache_dir in ("off", "0", "none"):
        return
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # older jax without the flags
        pass
