"""Training metrics accumulation with cross-device reduction.

Capability parity with icefall's ``MetricsTracker`` as used by the reference
trainer (``valle/bin/trainer.py:535-570``): a dict-of-sums that supports
``+``, scaling, pretty-printing normalized by frame count, an all-reduce
(`psum` over the mesh here, NCCL all_reduce there), and TensorBoard writing.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Optional

import jax
import jax.numpy as jnp


class MetricsTracker(defaultdict):
    def __init__(self):
        super().__init__(float)

    def __add__(self, other: "MetricsTracker") -> "MetricsTracker":
        ans = MetricsTracker()
        for k, v in self.items():
            ans[k] = v
        for k, v in other.items():
            ans[k] = ans[k] + v
        return ans

    def __mul__(self, alpha: float) -> "MetricsTracker":
        ans = MetricsTracker()
        for k, v in self.items():
            ans[k] = v * alpha
        return ans

    def __str__(self) -> str:
        ans = ""
        for k, v in self.norm_items():
            norm_value = "%.4g" % v
            ans += str(k) + "=" + str(norm_value) + ", "
        frames = "%.2f" % self["frames"]
        ans += "over " + str(frames) + " frames."
        return ans

    def norm_items(self):
        """Yield (key, normalized_value): losses/metrics divided by frames.

        Guards frames/utterances == 0 (e.g. an empty validation loader)
        instead of dividing by zero."""
        num_frames = max(self["frames"], 1) if "frames" in self else 1
        num_utterances = (max(self["utterances"], 1)
                          if "utterances" in self else 1)
        for k, v in self.items():
            if k in ("frames", "utterances"):
                continue
            norm_value = (
                float(v) / num_frames
                if "utt_" not in k
                else float(v) / num_utterances
            )
            yield k, norm_value

    def reduce(self, axis_name: Optional[str] = None):
        """All-reduce the metric sums across data-parallel workers.

        Inside a pjit/shard_map region pass ``axis_name``; outside (the
        common single-controller multi-device case) we sum across processes
        via ``jax.experimental.multihost_utils`` when world_size > 1.
        """
        if axis_name is not None:
            for k in list(self.keys()):
                self[k] = jax.lax.psum(jnp.asarray(self[k]), axis_name)
            return self
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            # NOTE: every process must carry the SAME key set (the train
            # loop populates keys deterministically); sorted order makes
            # the allgathered vectors align by construction
            keys = sorted(self.keys())
            vals = jnp.asarray([float(self[k]) for k in keys])
            summed = multihost_utils.process_allgather(vals).sum(axis=0)
            for k, v in zip(keys, summed):
                self[k] = float(v)
        return self

    def write_summary(self, tb_writer, prefix: str, batch_idx: int) -> None:
        for k, v in self.norm_items():
            tb_writer.add_scalar(prefix + k, v, batch_idx)
