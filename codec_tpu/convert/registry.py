from __future__ import annotations

from typing import Callable, Dict

_REGISTRY: Dict[str, Callable] = {}


def register(*names: str):
    def deco(cls):
        for name in names:
            _REGISTRY[name] = cls
        return cls
    return deco


def get_converter(name: str):
    if name not in _REGISTRY:
        raise ValueError(f"unknown converter {name!r} (known: {sorted(_REGISTRY)})")
    return _REGISTRY[name]


def known_converters():
    return sorted(_REGISTRY)


def _autoload():
    from . import (backbone, bluemagpie, bundled, chatterbox,  # noqa: F401
                   dac, mimi, moss_audio, nemo_nano, neucodec, pocket_tts,
                   qwen3_tts_tokenizer, snac, soprano, wavtokenizer,
                   xcodec2, xy_tokenizer)


_autoload()
