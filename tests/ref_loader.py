"""Load the reference PyTorch implementation from /root/reference for parity
tests, stubbing its unavailable dependencies (icefall, torchmetrics, lhotse).

The reference is used ONLY as a test oracle — no code is copied from it.
"""

import sys
import types


def load_reference_valle():
    """Returns the reference ``valle.models.valle`` module (torch)."""
    if "valle.models.valle" in sys.modules:
        return sys.modules["valle.models.valle"]

    import torch

    # ---- icefall stub -----------------------------------------------------
    icefall = types.ModuleType("icefall")
    icefall_utils = types.ModuleType("icefall.utils")

    def make_pad_mask(lengths, max_len=0):
        n = max(int(lengths.max()), max_len)
        pos = torch.arange(n, device=lengths.device)[None, :]
        return pos >= lengths[:, None]

    class AttributeDict(dict):
        __getattr__ = dict.__getitem__

        def __setattr__(self, k, v):
            self[k] = v

    def str2bool(v):
        return str(v).lower() in ("yes", "true", "t", "y", "1")

    icefall_utils.make_pad_mask = make_pad_mask
    icefall_utils.AttributeDict = AttributeDict
    icefall_utils.str2bool = str2bool
    icefall.utils = icefall_utils
    sys.modules.setdefault("icefall", icefall)
    sys.modules.setdefault("icefall.utils", icefall_utils)

    # ---- torchmetrics stub --------------------------------------------------
    tm = types.ModuleType("torchmetrics")
    tmc = types.ModuleType("torchmetrics.classification")

    class MulticlassAccuracy(torch.nn.Module):
        """Micro top-k accuracy with ignore_index (enough for the oracle)."""

        def __init__(self, num_classes, top_k=1, average="micro",
                     multidim_average="global", ignore_index=None):
            super().__init__()
            self.top_k = top_k
            self.ignore_index = ignore_index

        def forward(self, logits, targets):
            # logits (B, C, T), targets (B, T)
            k = min(self.top_k, logits.shape[1])
            topk = logits.topk(k, dim=1).indices  # (B, k, T)
            hit = (topk == targets[:, None, :]).any(dim=1)
            valid = torch.ones_like(targets, dtype=torch.bool)
            if self.ignore_index is not None:
                valid = targets != self.ignore_index
            num = (hit & valid).sum()
            den = valid.sum().clamp(min=1)
            return num.float() / den.float()

    class BinaryAccuracy(torch.nn.Module):
        def __init__(self, *a, **k):
            super().__init__()

        def forward(self, preds, targets):
            return ((preds > 0.5) == (targets > 0.5)).float().mean()

    tmc.MulticlassAccuracy = MulticlassAccuracy
    tmc.BinaryAccuracy = BinaryAccuracy
    tm.classification = tmc
    sys.modules.setdefault("torchmetrics", tm)
    sys.modules.setdefault("torchmetrics.classification", tmc)

    # ---- valle.data stub (avoids lhotse/encodec/phonemizer imports) -------
    vdata = types.ModuleType("valle.data")
    vis = types.ModuleType("valle.data.input_strategies")

    class PromptedFeatures:
        def __init__(self, prompts, features):
            self.prompts = prompts
            self.features = features

        @property
        def data(self):
            return (self.prompts, self.features)

        def to(self, device):
            return PromptedFeatures(self.prompts.to(device),
                                    self.features.to(device))

        def sum(self):
            return self.features.sum()

        @property
        def ndim(self):
            return self.features.ndim

    vis.PromptedFeatures = PromptedFeatures
    vdata.input_strategies = vis
    sys.modules["valle.data"] = vdata
    sys.modules["valle.data.input_strategies"] = vis

    # ---- lhotse stub (only fix_random_seed is touched by optim.py) --------
    lhotse = types.ModuleType("lhotse")
    lhotse_utils = types.ModuleType("lhotse.utils")

    def fix_random_seed(seed):
        import random as _r

        _r.seed(seed)
        torch.manual_seed(seed)

    lhotse_utils.fix_random_seed = fix_random_seed
    lhotse.utils = lhotse_utils
    sys.modules.setdefault("lhotse", lhotse)
    sys.modules.setdefault("lhotse.utils", lhotse_utils)

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import valle.models.valle as ref_valle  # noqa: E402

    return ref_valle


def load_reference_optim():
    """Returns the reference ``valle.modules.optim`` module (torch)."""
    load_reference_valle()
    import valle.modules.optim as ref_optim  # noqa: E402

    return ref_optim
