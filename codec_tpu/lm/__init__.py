from .base import CodecLM, LmInfo, LmState, create_lm  # noqa: F401
from . import continuous_cfm, flow_lm, parallel_heads_delay, residual_depth_ar  # noqa: F401 (register kinds)
