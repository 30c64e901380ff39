from .convert import import_encodec_state_dict, load_encodec_torch  # noqa: F401
from .model import (  # noqa: F401
    EncodecConfig,
    encodec_decode,
    encodec_encode,
    init_encodec,
)
from .quantization import init_rvq, rvq_decode, rvq_encode  # noqa: F401
