"""Converters: HF/torch checkpoints → codec GGUF files.

The GGUF tensor/KV schema is wire-compatible with the reference runtime
(reference: scripts/converters/*.py define the schema; src/models/*.cpp
consume it), so files produced here load in either engine.
"""

from .registry import get_converter, known_converters  # noqa: F401
