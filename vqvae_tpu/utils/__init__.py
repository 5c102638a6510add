from vqvae_tpu.utils.profiling import annotate, profile_trace, step_timer
from vqvae_tpu.utils.debug import enable_nan_checks, checked

__all__ = [
    "annotate",
    "profile_trace",
    "step_timer",
    "enable_nan_checks",
    "checked",
]
