"""MimiCodec: CodecModel wrapper over the pure-functional mimi graph
(models/mimi.py). Reference entry points: codec_mimi_encode_with /
codec_mimi_decode_with (src/models/mimi.cpp:1028-1272)."""

from __future__ import annotations

import jax

from ..io.gguf import GGUFReader
from ..runtime.model import CodecModel
from .mimi import MimiConfig, load_mimi_params, mimi_decode_fn, mimi_encode_fn


class MimiCodec(CodecModel):
    arch = "mimi"

    def _load(self, reader: GGUFReader) -> None:
        self.cfg = MimiConfig.from_gguf(reader)
        self.params = load_mimi_params(reader, self.cfg, dtype=self.compute_dtype)
        self.sample_rate = self.cfg.sample_rate
        self.hop_size = self.cfg.hop_size
        self.n_q = self.cfg.n_q
        self.codebook_size = self.cfg.codebook_size
        self.latent_dim = self.cfg.hidden
        self.has_encoder = self.cfg.has_encoder
        self.has_decoder = self.cfg.has_decoder

    def _decode_impl(self, codes: jax.Array, n_q: int) -> jax.Array:
        return mimi_decode_fn(self.params, codes, self.cfg, n_q=n_q)

    def _encode_impl(self, pcm: jax.Array, n_q: int) -> jax.Array:
        return mimi_encode_fn(self.params, pcm, self.cfg, n_q=n_q)
