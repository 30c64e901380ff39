from .common import (  # noqa: F401
    AttributeDict,
    enable_compilation_cache,
    get_env_info,
    make_pad_mask,
    setup_logger,
    str2bool,
)
from .metrics import MetricsTracker  # noqa: F401
from .symbol_table import SymbolTable  # noqa: F401


def Transpose(x):
    """(N, T, D) -> (N, D, T) (reference valle/utils/__init__.py:11)."""
    return x.swapaxes(1, 2)
