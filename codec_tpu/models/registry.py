"""Arch-string → model-class registry (reference vtable table:
src/codec.cpp:95-191)."""

from __future__ import annotations

from typing import Callable, Dict, Type

from ..runtime.model import CodecModel

_REGISTRY: Dict[str, Callable[[], Type[CodecModel]]] = {}


def register(arch: str):
    def deco(fn: Callable[[], Type[CodecModel]]):
        _REGISTRY[arch] = fn
        return fn
    return deco


def get_model_class(arch: str) -> Type[CodecModel]:
    if arch not in _REGISTRY:
        raise ValueError(f"unknown codec architecture: {arch!r} "
                         f"(known: {sorted(_REGISTRY)})")
    return _REGISTRY[arch]()


def known_archs():
    return sorted(_REGISTRY)


@register("mimi")
def _mimi():
    from .mimi_model import MimiCodec
    return MimiCodec


@register("dac")
def _dac():
    from .dac import DacCodec
    return DacCodec


@register("wavtokenizer")
def _wavtokenizer():
    from .wavtokenizer import WavTokenizerCodec
    return WavTokenizerCodec
