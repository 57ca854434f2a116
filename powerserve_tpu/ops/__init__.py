from .elementwise import (
    ROPE_TYPE_NEOX,
    ROPE_TYPE_NORM,
    apply_rope,
    rms_norm,
    rope_cos_sin,
    rope_frequencies,
    silu_hadamard,
)
from .qmatmul import QLinear, qmatmul

__all__ = [
    "ROPE_TYPE_NEOX", "ROPE_TYPE_NORM", "apply_rope", "rms_norm",
    "rope_cos_sin", "rope_frequencies", "silu_hadamard", "QLinear", "qmatmul",
]
