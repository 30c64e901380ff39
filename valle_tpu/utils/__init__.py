from .common import (  # noqa: F401
    AttributeDict,
    get_env_info,
    make_pad_mask,
    setup_logger,
    str2bool,
)
from .metrics import MetricsTracker  # noqa: F401
from .symbol_table import SymbolTable  # noqa: F401
