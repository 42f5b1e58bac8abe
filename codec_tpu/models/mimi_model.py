"""MimiCodec: CodecModel wrapper over the pure-functional mimi graph
(models/mimi.py). Reference entry points: codec_mimi_encode_with /
codec_mimi_decode_with (src/models/mimi.cpp:1028-1272)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..io.gguf import GGUFReader
from ..runtime.model import CodecModel
from .mimi import MimiConfig, load_mimi_params, mimi_decode_fn, mimi_encode_fn


class MimiCodec(CodecModel):
    arch = "mimi"
    # b=1 decode compiles ~276 s with the best conv plan on the relay but
    # ~33 s with the fast plan (models/mimi.py _dec_plan): serve the first
    # call fast, upgrade in the background (runtime/model.py tiered jit).
    tiered_plans = True

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

    @classmethod
    def from_params(cls, cfg: MimiConfig, params, compute_dtype=jnp.float32):
        """In-memory Mimi (random or externally-built params) with the full
        CodecModel surface — used by bench.py and the multi-chip dryrun so
        they exercise the same decode/encode path as GGUF-loaded models."""
        return cls.from_parts(
            compute_dtype=compute_dtype, cfg=cfg, params=params,
            sample_rate=cfg.sample_rate, hop_size=cfg.hop_size, n_q=cfg.n_q,
            codebook_size=cfg.codebook_size, latent_dim=cfg.hidden,
            has_encoder=cfg.has_encoder, has_decoder=cfg.has_decoder)

    def _decode_impl(self, codes: jax.Array, n_q: int) -> jax.Array:
        return mimi_decode_fn(self.params, codes, self.cfg, n_q=n_q)

    encode_per_layer_pad = True        # reference pads per strided conv

    def _encode_impl(self, pcm: jax.Array, n_q: int,
                     n_valid=None) -> jax.Array:
        return mimi_encode_fn(self.params, pcm, self.cfg, n_q=n_q,
                              n_valid=n_valid)

    def streaming_decoder(self, n_q: int = 0, batch: int = 1):
        """Open a frame-streaming decode session (chunk-exact vs decode())."""
        if not self.has_decoder:
            raise ValueError("mimi: model has no decoder")
        return MimiStreamingDecoder(self, n_q=n_q, batch=batch)

    def streaming_encoder(self, n_q: int = 0, batch: int = 1):
        if not self.has_encoder:
            raise ValueError("mimi: model has no encoder")
        return MimiStreamingEncoder(self, n_q=n_q, batch=batch)


class MimiStreamingDecoder:
    """Frame-streaming decode session: push code chunks, receive PCM with
    codec-latency only. Chunk-exact vs full-sequence decode; one compiled
    step per chunk size, state donated so XLA updates KV/conv carries in
    place. (The reference has no streaming path — SURVEY §7 lists carried
    conv state as the "harder but better" TPU answer to its per-length
    graph rebuilds.)"""

    def __init__(self, model: "MimiCodec", n_q: int = 0, batch: int = 1):
        from .mimi import mimi_decode_stream_init, mimi_decode_stream_step

        self.model = model
        self.n_q = n_q if n_q > 0 else model.n_q
        self.batch = batch
        # snapshot the weight tree under the trace lock: concurrent
        # first-compiles on the shared model temporarily swap tracers
        # into model.params (runtime/model.py), and reading it unlocked
        # from a server thread raced into TracerArrayConversionError
        with model._trace_lock:
            self._params = model.params
        self.state = mimi_decode_stream_init(self._params, model.cfg, batch,
                                             dtype=model.compute_dtype)
        cfg, nq = model.cfg, self.n_q

        self._step = jax.jit(
            lambda p, s, c: mimi_decode_stream_step(p, s, c, cfg, n_q=nq),
            donate_argnums=(1,))

    def push(self, codes) -> "np.ndarray":
        """codes [Tc, n_q] or [B, Tc, n_q] int → pcm [(B,) Tc*hop]."""
        import numpy as np

        codes = np.asarray(codes, np.int32)
        squeeze = codes.ndim == 2
        if squeeze:
            codes = codes[None]
        pcm, self.state = self._step(self._params, self.state,
                                     jnp.asarray(codes))
        pcm = np.asarray(pcm)
        return pcm[0] if squeeze else pcm

    def reset(self) -> None:
        from .mimi import mimi_decode_stream_init

        self.state = mimi_decode_stream_init(
            self._params, self.model.cfg, self.batch,
            dtype=self.model.compute_dtype)


class MimiStreamingEncoder:
    """Frame-streaming encode session: push PCM chunks (multiples of
    hop_size), receive codes — the realtime-conversation direction
    (Moshi-style). Chunk-exact vs encode()."""

    def __init__(self, model: "MimiCodec", n_q: int = 0, batch: int = 1):
        from .mimi import mimi_encode_stream_init, mimi_encode_stream_step

        self.model = model
        self.n_q = n_q if n_q > 0 else model.n_q
        self.batch = batch
        with model._trace_lock:      # see MimiStreamingDecoder.__init__
            self._params = model.params
        self.state = mimi_encode_stream_init(self._params, model.cfg, batch,
                                             dtype=model.compute_dtype)
        cfg, nq = model.cfg, self.n_q
        self._step = jax.jit(
            lambda p, s, x: mimi_encode_stream_step(p, s, x, cfg, n_q=nq),
            donate_argnums=(1,))

    def push(self, pcm) -> "np.ndarray":
        pcm = self.model._pcm_host_f32(pcm)
        squeeze = pcm.ndim == 1
        if squeeze:
            pcm = pcm[None]
        if pcm.shape[1] % self.model.hop_size:
            raise ValueError(f"chunk length {pcm.shape[1]} not a multiple "
                             f"of hop_size {self.model.hop_size}")
        codes, self.state = self._step(self._params, self.state,
                                       jnp.asarray(pcm))
        codes = np.asarray(codes)
        return codes[0] if squeeze else codes

    def reset(self) -> None:
        from .mimi import mimi_encode_stream_init

        self.state = mimi_encode_stream_init(
            self._params, self.model.cfg, self.batch,
            dtype=self.model.compute_dtype)
