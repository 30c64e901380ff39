from .eve import eve  # noqa: F401
from .scaled_adam import ScaledAdamState, default_stacked_fn, scaled_adam  # noqa: F401
from .schedules import cosine_lr, eden_lr, get_lr_fn, noam_lr  # noqa: F401
