from . import act, attn, conv, norms, rope, rvq  # noqa: F401
