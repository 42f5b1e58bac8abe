"""codec-serve: HTTP serving for codec + TTS models.

No reference analog (the reference is a library + CLIs); this is the
production-serving layer the TPU rebuild adds. One process owns the model
(weights device-resident, compiled functions shared across requests),
stdlib-only threaded HTTP front end.

Concurrency model (reference analog: multiple codec_lm_state objects over
one codec_lm, src/lm/lm_internal.h:63-68): every request thread owns its
generation state — `lm.new_state()` per /synthesize, a fresh streaming-
decoder session per stream — while compiled functions and device-resident
weights are shared. JAX dispatch is thread-safe and the device queue
serializes execution, so concurrent requests overlap host work (sampling,
tokenize, WAV framing) with device compute instead of queueing behind a
global lock; only first-compile tracing serializes
(CodecModel._trace_lock), because tracing temporarily swaps tracers into
the shared weight attributes.

Endpoints:
  GET  /health                 → model/LM info JSON
  POST /decode                 body {"codes": [[...], ...], "n_q": 0}
                               → audio/wav
  POST /decode_stream          body {"codes": ..., "chunk_frames": 25}
                               → chunked-transfer audio/wav through a
                               streaming-decoder session (causal codecs;
                               first bytes after one chunk of frames)
  POST /batch_decode           body {"sequences": [[[...]], ...], "n_q": 0}
                               → {"wavs": [base64 WAV, ...]}; same-bucket
                               sequences decode as one batched graph +
                               one batched device fetch (decode_many)
  POST /encode                 body: WAV bytes → {"codes": [[...], ...]}
  POST /synthesize             body {"text": "...", "seed": 0,
                                     "max_frames": 0}
                               → audio/wav; with {"stream": true} the WAV
                               is chunked-transfer-encoded as frames are
                               vocoded (time-to-first-byte ≈ one AR step).
                               FlowLM models are self-contained; codebook-
                               AR kinds (CSM/Qwen3/MOSS) serve when the
                               process was started with --backbone
                               (generations serialize on one backbone)
  POST /synthesize_batch       body {"texts": [...], "seed": 0,
                                     "max_frames": 0, "chunk_frames": 8}
                               → {"wavs": [b64...], "n_frames", "stops"};
                               B generations batched through ONE vmapped
                               on-device loop (codebook-AR kinds)

Usage:
  python -m codec_tpu.serve --model pocket.gguf [--port 8765]
  python -m codec_tpu.serve --model csm.gguf --backbone bb.gguf  # AR kinds
"""

from __future__ import annotations

import argparse
import io
import json
import struct
import sys
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


def _wav_header(n_samples: int, sample_rate: int) -> bytes:
    """PCM16 mono WAV header. n_samples < 0 → 'unknown length' sizes
    (max-uint32 data size; players and ffmpeg accept this for streams)."""
    data_bytes = n_samples * 2 if n_samples >= 0 else 0xFFFFFFFF - 44
    riff = 36 + data_bytes if n_samples >= 0 else 0xFFFFFFFF
    return (b"RIFF" + struct.pack("<I", riff) + b"WAVEfmt " +
            struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2,
                        2, 16) + b"data" + struct.pack("<I", data_bytes))


def _pcm16(x: np.ndarray) -> bytes:
    return (np.clip(x, -1.0, 1.0) * 32767.0).astype("<i2").tobytes()


class CodecHTTPServer:
    def __init__(self, model_path: str, host: str = "127.0.0.1",
                 port: int = 8765, backbone_path: str = None,
                 backbone_mesh: tuple = None, dp: int = 0,
                 cont_batch: int = 0, chunk_frames: int = 8,
                 prefill_bucket: int = 0):
        import threading as _threading

        import codec_tpu
        from ..io.gguf import GGUFReader
        from ..lm import create_lm

        self.model = codec_tpu.load_model(model_path)
        self.reader = GGUFReader(model_path)
        self.lm = create_lm(self.reader)
        # Codebook-AR serving: one backbone loaded at startup; its KV
        # state is reset per request and generations serialize on a lock
        # (the codec decode + FlowLM paths stay fully concurrent).
        self.backbone = None
        self.backbone_path = backbone_path
        self.batch_mesh = None          # dp mesh for /synthesize_batch
        self._bb_lock = _threading.Lock()
        self._shared_lm = None          # lazy CodecLM for /synthesize_batch
        if backbone_path:
            from ..lm.backbone import create_backbone

            self.backbone = create_backbone(backbone_path)
            if dp > 1 and backbone_mesh and backbone_mesh[0] == "tp":
                # --dp N --tp M: one 2-D mesh — /synthesize_batch streams
                # split over dp, every backbone GEMM over tp
                from ..parallel.mesh import make_mesh_2d

                self.batch_mesh = make_mesh_2d(dp, backbone_mesh[1])
                self.backbone.set_mesh(self.batch_mesh, axis="tp")
            elif dp > 1 and backbone_mesh:
                raise ValueError("--dp composes with --tp only "
                                 "(pp/ep backbones run per-stream)")
            elif dp > 1:
                from ..parallel.mesh import make_mesh

                self.batch_mesh = make_mesh(dp, axis="dp")
            elif backbone_mesh:
                # ("tp"|"pp"|"ep", N): shard the preloaded backbone once;
                # every /synthesize(_batch) then runs multi-chip
                from ..lm.backbone import apply_backbone_mesh

                apply_backbone_mesh(self.backbone, *backbone_mesh)

        # Continuous batching (--cont-batch N): /synthesize requests for
        # codebook-AR kinds run through one N-slot engine — admitted the
        # moment a slot frees up, retired the moment their stream stops —
        # instead of serializing on the backbone lock (serve/cont_batch.py).
        self.cont_engine = None
        self._cont_batcher = None
        self._cont_pi = None
        self._cont_tok = None
        if cont_batch > 0:
            if self.backbone is None:
                raise ValueError("--cont-batch needs --backbone")
            if self.lm is None:
                raise ValueError("--cont-batch needs a codec_lm adaptor "
                                 "in the model GGUF")
            from ..cli.tts_cli import load_backbone_tokenizer
            from ..lm.prompt_info import build_prompt_info
            from ..ops.sample import OnDeviceSampling
            from .cont_batch import ContinuousBatcher, EngineThread

            pi = build_prompt_info(self.reader)
            if pi.is_continuous or pi.sequential_text_audio \
                    or pi.streaming_interleave:
                raise ValueError(f"--cont-batch supports plain codebook-AR "
                                 f"kinds only (family: {pi.host_arch})")
            self._cont_pi = pi
            self._cont_tok = load_backbone_tokenizer(
                GGUFReader(backbone_path))
            # --dp composes: the engine's slot state (KV/hidden/PRNG)
            # shards over the same dp mesh /synthesize_batch uses (and
            # over the dp axis of a --dp x --tp 2-D mesh). Requires
            # slots divisible by dp (the batcher validates).
            self._cont_batcher = ContinuousBatcher(
                self.backbone, self.lm, n_slots=cont_batch,
                on_device=OnDeviceSampling(
                    temperature=pi.default_temperature,
                    top_k=pi.default_top_k,
                    top_p=pi.default_top_p,
                    chunk_frames=max(2, chunk_frames)),
                pi=pi, prefill_bucket=prefill_bucket,
                mesh=self.batch_mesh)
            self.cont_engine = EngineThread(self._cont_batcher)
            self.cont_engine.start()
        self.prefill_bucket = int(prefill_bucket)
        outer = self

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, fmt, *args):
                print(f"serve: {self.address_string()} {fmt % args}",
                      file=sys.stderr)

            def _json(self, code: int, obj) -> None:
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _err(self, code: int, msg: str) -> None:
                self._json(code, {"error": msg})

            def do_GET(self):
                if self.path == "/stats":
                    return self._stats()
                if self.path != "/health":
                    return self._err(404, f"no route {self.path}")
                m = outer.model
                self._json(200, {
                    "status": "ok", "arch": m.arch,
                    "sample_rate": m.sample_rate, "hop_size": m.hop_size,
                    "n_q": m.n_q, "has_encoder": m.has_encoder,
                    "has_decoder": m.has_decoder,
                    "lm_kind": outer.lm.info.kind if outer.lm else None,
                })

            def _stats(self):
                """Serving observability: continuous-batching engine
                occupancy (slots/active/queued) when --cont-batch is on."""
                cb = None
                if outer._cont_batcher is not None:
                    b = outer._cont_batcher
                    cb = {"slots": b.B, "chunk_frames": b.K,
                          "active": b.n_active, "queued": b.n_queued}
                self._json(200, {
                    "cont_batch": cb,
                    "backbone": outer.backbone_path is not None,
                    "dp_mesh": dict(outer.batch_mesh.shape)
                    if outer.batch_mesh is not None else None,
                })

            def _body(self) -> bytes:
                n = int(self.headers.get("Content-Length", 0))
                return self.rfile.read(n)

            def do_POST(self):
                self._response_started = False
                try:
                    if self.path == "/decode":
                        return self._decode()
                    if self.path == "/decode_stream":
                        return self._decode_stream()
                    if self.path == "/batch_decode":
                        return self._batch_decode()
                    if self.path == "/encode":
                        return self._encode()
                    if self.path == "/synthesize":
                        return self._synthesize()
                    if self.path == "/synthesize_batch":
                        return self._synthesize_batch()
                    return self._err(404, f"no route {self.path}")
                except (ValueError, KeyError, json.JSONDecodeError) as e:
                    if self._response_started:
                        # Status line + headers already on the wire (e.g. an
                        # LmError mid-stream): a second response would corrupt
                        # the chunked stream. Log and drop the connection so
                        # the client sees a clean truncation, not a hang.
                        self.log_message("mid-stream error: %s", e)
                        self.close_connection = True
                        return
                    return self._err(400, str(e))
                except BrokenPipeError:
                    self.close_connection = True
                except Exception as e:        # noqa: BLE001
                    # Unexpected errors must not silently kill the worker
                    # thread (the client would only see a dropped
                    # connection): log the full traceback, answer 500 when
                    # the response hasn't started, else drop cleanly.
                    import traceback

                    self.log_message("handler error: %s\n%s", e,
                                     traceback.format_exc())
                    if self._response_started:
                        self.close_connection = True
                        return
                    return self._err(500, f"{type(e).__name__}: {e}")

            def send_response(self, code, message=None):
                self._response_started = True
                super().send_response(code, message)

            def _decode(self):
                req = json.loads(self._body())
                codes = np.asarray(req["codes"], np.int32)
                if codes.ndim != 2:
                    raise ValueError("codes must be [T, n_q]")
                # i16: PCM16 conversion happens in-graph (half the
                # device→host bytes; write_wav-rounding)
                pcm = outer.model.decode(codes, n_q=int(req.get("n_q", 0)),
                                         pcm_format="i16")
                body = (_wav_header(len(pcm), outer.model.sample_rate)
                        + pcm.astype("<i2").tobytes())
                self.send_response(200)
                self.send_header("Content-Type", "audio/wav")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _decode_stream(self):
                """Chunked-transfer WAV decode for causal codecs: code
                frames are pushed through a per-request streaming-decoder
                session, so the first audio bytes leave after one chunk
                instead of the full sequence (no reference analog — the
                reference decodes whole sequences per call)."""
                req = json.loads(self._body())
                codes = np.asarray(req["codes"], np.int32)
                if codes.ndim != 2:
                    raise ValueError("codes must be [T, n_q]")
                if not getattr(outer.model, "causal_time", False) or \
                        not hasattr(outer.model, "streaming_decoder"):
                    raise ValueError(
                        f"{outer.model.arch}: no streaming decode path")
                chunk_frames = max(1, int(req.get("chunk_frames", 25)))
                dec = outer.model.streaming_decoder(
                    n_q=int(req.get("n_q", 0)) or codes.shape[1])
                self.send_response(200)
                self.send_header("Content-Type", "audio/wav")
                self.send_header("Transfer-Encoding", "chunked")
                self.end_headers()

                def chunk(data: bytes):
                    self.wfile.write(f"{len(data):X}\r\n".encode() + data +
                                     b"\r\n")
                    self.wfile.flush()

                chunk(_wav_header(-1, outer.model.sample_rate))
                for t0 in range(0, codes.shape[0], chunk_frames):
                    pcm = dec.push(codes[t0: t0 + chunk_frames])
                    chunk(_pcm16(pcm))
                chunk(b"")

            def _batch_decode(self):
                """Many sequences in one request: same-bucket sequences run
                as one batched graph with a single batched device→host
                fetch (CodecModel.decode_many). Response is JSON with one
                base64 WAV per input sequence."""
                import base64

                req = json.loads(self._body())
                seqs = [np.asarray(s, np.int32) for s in req["sequences"]]
                outs = outer.model.decode_many(seqs,
                                               n_q=int(req.get("n_q", 0)),
                                               pcm_format="i16")
                sr = outer.model.sample_rate
                wavs = [base64.b64encode(_wav_header(len(p), sr)
                                         + p.astype("<i2").tobytes()).decode()
                        for p in outs]
                self._json(200, {"wavs": wavs, "sample_rate": sr})

            def _encode(self):
                from ..io.wav import read_wav, to_mono

                # mono PCM16 stays int16: encode() uploads half the bytes
                # and divides by 32768 in-graph (same path as codec_cli)
                x, sr = read_wav(io.BytesIO(self._body()), keep_i16=True)
                want_sr = getattr(outer.model, "encode_sample_rate", 0) or \
                    outer.model.sample_rate
                if sr != want_sr:
                    raise ValueError(f"sample rate {sr} != expected {want_sr}")
                if x.dtype == np.int16:
                    if x.shape[1] == 1:
                        codes = outer.model.encode(x[:, 0])
                        return self._json(200, {"codes": codes.tolist()})
                    x = x.astype(np.float32) / 32768.0
                codes = outer.model.encode(to_mono(x))
                self._json(200, {"codes": codes.tolist()})

            def _synthesize(self):
                from ..cli.tts_cli import (run_backbone_synthesize,
                                           run_flow_synthesize)
                from ..lm.flow_lm import FlowLM

                req = json.loads(self._body())
                text = req["text"]
                if outer.lm is not None and isinstance(outer.lm, FlowLM):
                    if req.get("stream"):
                        return self._synthesize_stream(req, text)
                    pcm, n_frames, stop = run_flow_synthesize(
                        outer.model, outer.lm, text,
                        seed=int(req.get("seed", 0)),
                        max_frames=int(req.get("max_frames", 0)))
                elif outer.cont_engine is not None:
                    # continuous batching: enqueue into the N-slot engine;
                    # concurrent requests generate TOGETHER (batched GEMMs)
                    # and each returns the moment its own stream stops
                    if req.get("stream"):
                        return self._synthesize_cont_stream(req, text)
                    pcm, n_frames, stop = self._synthesize_cont(req, text)
                elif outer.backbone is not None:
                    # codebook-AR kinds: the shared backbone's KV state is
                    # reset per request, generations serialize on a lock
                    with outer._bb_lock:
                        pcm, n_frames, stop = run_backbone_synthesize(
                            outer.model, outer.reader, outer.backbone_path,
                            text, seed=int(req.get("seed", 0)),
                            max_frames=int(req.get("max_frames", 0)),
                            bb=outer.backbone,
                            on_device=bool(req.get("on_device", False)),
                            chunk_frames=int(req.get("chunk_frames", 8)),
                            prefill_bucket=outer.prefill_bucket)
                else:
                    raise ValueError(
                        "synthesize needs a flow_lm model GGUF (self-"
                        "contained) or a server started with --backbone "
                        "for codebook-AR kinds")
                body = _wav_header(len(pcm), outer.model.sample_rate) + _pcm16(pcm)
                self.send_response(200)
                self.send_header("Content-Type", "audio/wav")
                self.send_header("Content-Length", str(len(body)))
                self.send_header("X-Frames", str(n_frames))
                self.send_header("X-Stop", stop)
                self.end_headers()
                self.wfile.write(body)

            def _cont_submit(self, req, text, frame_cb=None):
                """Tokenize + build prompt embeds on this handler thread
                (overlapping other streams' generation) and submit to the
                continuous-batching engine. Optional body fields
                temperature/top_k/top_p/min_p override the engine default
                chain for this request only (the chain is a traced
                per-slot input — no recompile, any mix batches
                together)."""
                import dataclasses as _dc

                import numpy as _np

                from ..lm.audio_lm import AudioLM

                pi = outer._cont_pi
                ids = outer._cont_tok.encode(
                    pi.prompt_prefix + text + pi.prompt_suffix)
                alm = AudioLM(outer.reader, codec=outer.model, lm=outer.lm)
                if alm.prompt_needs_composed:
                    embeds = [alm.compose_prompt_embd(t) for t in ids]
                else:
                    embeds = list(outer.backbone.embed_tokens(
                        _np.asarray(ids)))
                mf = int(req.get("max_frames", 0))
                sampling = None
                if any(k in req for k in ("temperature", "top_k", "top_p",
                                          "min_p")):
                    base = outer._cont_batcher.ods
                    sampling = _dc.replace(
                        base,
                        temperature=float(req.get("temperature",
                                                  base.temperature)),
                        top_k=int(req.get("top_k", base.top_k)),
                        top_p=float(req.get("top_p", base.top_p)),
                        min_p=float(req.get("min_p", base.min_p)))
                return alm, outer._cont_batcher.submit(
                    alm, embeds, seed=int(req.get("seed", 0)),
                    max_steps=mf if mf > 0 else 512, sampling=sampling,
                    frame_cb=frame_cb)

            def _synthesize_cont(self, req, text):
                """Submit to the engine and block for this request's
                whole result."""
                _alm, handle = self._cont_submit(req, text)
                try:
                    res = handle.wait(timeout=600.0)
                except TimeoutError:
                    # free the slot instead of generating to max_steps
                    # for a client that has stopped listening
                    handle.cancel()
                    raise ValueError("synthesis timed out; request "
                                     "cancelled")
                if res.pcm is None:
                    raise ValueError("no audio frames generated")
                return res.pcm, int(res.codes.shape[0]), \
                    "eos" if res.stopped_by_eos else "max_frames"

            def _synthesize_cont_stream(self, req, text):
                """Streamed continuous-batching synthesize: frames emitted
                at each engine chunk boundary are vocoded through a
                per-request streaming-decoder session and leave as chunked
                WAV — time-to-first-audio is one engine chunk + one vocode
                chunk, while the stream keeps generating in the shared
                batch. Requires a causal codec with a streaming decoder
                and a trivial LM-codes→codec-codes transform (no delay
                pattern / control cb0 / merged vocab: those need the
                whole-sequence flush before any frame is decodable)."""
                import queue as _queue

                if not getattr(outer.model, "causal_time", False) or \
                        not hasattr(outer.model, "streaming_decoder"):
                    raise ValueError(f"{outer.model.arch}: no streaming "
                                     f"decode path")
                frames: _queue.Queue = _queue.Queue()
                alm, handle = self._cont_submit(req, text,
                                                frame_cb=frames.put)
                try:
                    tr = alm.decode_transform
                    if tr.audio_cb_offset or tr.cb0_speech_offset or \
                            tr.max_delay(alm.n_codebook):
                        raise ValueError(
                            "streaming synthesize needs a trivial decode "
                            "transform (delay/merged-cb0 models flush at "
                            "EOS)")
                    dec = outer.model.streaming_decoder(n_q=alm.n_codebook)
                    vocode_n = max(1, int(req.get("chunk_frames", 0))
                                   or outer._cont_batcher.K)

                    self.send_response(200)
                    self.send_header("Content-Type", "audio/wav")
                    self.send_header("Transfer-Encoding", "chunked")
                    self.end_headers()
                    self._response_started = True

                    def chunk(data: bytes):
                        self.wfile.write(f"{len(data):X}\r\n".encode() +
                                         data + b"\r\n")
                        self.wfile.flush()

                    chunk(_wav_header(-1, outer.model.sample_rate))
                    deadline = time.monotonic() + 600.0
                    buf = []
                    while True:
                        try:
                            buf.append(frames.get(timeout=0.05))
                        except _queue.Empty:
                            if handle.done:
                                break
                            if time.monotonic() > deadline:
                                raise ValueError("synthesis timed out; "
                                                 "request cancelled")
                            continue
                        if len(buf) >= vocode_n:
                            chunk(_pcm16(dec.push(np.stack(buf))))
                            buf = []
                    while not frames.empty():      # post-done stragglers
                        buf.append(frames.get_nowait())
                    handle.wait(timeout=0)         # re-raise engine errors
                    if buf:
                        chunk(_pcm16(dec.push(np.stack(buf))))
                    chunk(b"")                     # terminating chunk
                    # mid-stream errors skip the terminator: do_POST logs
                    # and drops the connection → client sees a truncation
                except BaseException:
                    # any failure here (incl. a client disconnect breaking
                    # chunk()) must free the engine slot, or the orphaned
                    # stream generates to max_steps into a dead queue
                    handle.cancel()
                    raise

            def _synthesize_batch(self):
                """B texts through ONE vmapped on-device generation loop
                (run_codebook_ar_batch): batched GEMMs on the shared
                backbone instead of B serialized /synthesize calls.
                Body: {"texts": [...], "seed", "max_frames",
                "chunk_frames", "sampling": [{"temperature", "top_k",
                "top_p", "min_p"}, ...] (optional, one per text — chains
                ride as a traced per-stream input, no recompile)};
                response: one base64 WAV per text."""
                import base64

                from ..cli.tts_cli import run_backbone_synthesize_batch

                req = json.loads(self._body())
                texts = req["texts"]
                if outer.backbone is None:
                    raise ValueError("synthesize_batch needs a server "
                                     "started with --backbone")
                with outer._bb_lock:
                    if outer._shared_lm is None:
                        from ..lm import create_lm

                        outer._shared_lm = create_lm(outer.reader)
                    outs = run_backbone_synthesize_batch(
                        outer.model, outer.reader, outer.backbone_path,
                        texts, seed=int(req.get("seed", 0)),
                        max_frames=int(req.get("max_frames", 0)),
                        bb=outer.backbone, lm=outer._shared_lm,
                        chunk_frames=int(req.get("chunk_frames", 8)),
                        mesh=outer.batch_mesh,
                        prefill_bucket=outer.prefill_bucket,
                        sampling=req.get("sampling"))
                sr = outer.model.sample_rate
                wavs = []
                frames = []
                stops = []
                for pcm, n_frames, stop in outs:
                    pcm = pcm if pcm is not None else np.zeros(0, np.float32)
                    wavs.append(base64.b64encode(
                        _wav_header(len(pcm), sr) + _pcm16(pcm)).decode())
                    frames.append(n_frames)
                    stops.append(stop)
                self._json(200, {"wavs": wavs, "sample_rate": sr,
                                 "n_frames": frames, "stops": stops})

            def _synthesize_stream(self, req, text):
                """Chunked-transfer WAV: each AR frame is vocoded through
                the streaming decoder and flushed immediately."""
                import math

                from ..cli.tts_cli import flow_prepare_text

                lm, model = outer.lm, outer.model
                self.send_response(200)
                self.send_header("Content-Type", "audio/wav")
                self.send_header("Transfer-Encoding", "chunked")
                self.end_headers()

                def chunk(data: bytes):
                    self.wfile.write(f"{len(data):X}\r\n".encode() + data +
                                     b"\r\n")
                    self.wfile.flush()

                chunk(_wav_header(-1, model.sample_rate))
                # per-request state (st, dec): concurrent streams interleave
                # frame-by-frame on the shared compiled step functions
                text2, fae_guess = flow_prepare_text(text)
                ids = lm.tokenize(text2)
                st = lm.new_state()
                lm.flow_prefill(st, ids)
                fae = lm.frames_after_eos if lm.frames_after_eos >= 0 \
                    else fae_guess + 2
                max_gen = int(req.get("max_frames", 0)) or \
                    max(8, int(math.ceil((len(ids) / 3.0 + 2.0) * 12.5)))
                rng = np.random.default_rng(int(req.get("seed", 0)))
                noise_std = math.sqrt(lm.temperature)
                dec = model.streaming_decoder()
                prev = None
                eos_step = -1
                for step in range(max_gen):
                    noise = (rng.standard_normal(lm.ldim)
                             * noise_std).astype(np.float32)
                    lat, _, is_eos = lm.flow_step(st, prev_latent=prev,
                                                  noise=noise)
                    if is_eos and eos_step < 0:
                        eos_step = step
                    if eos_step >= 0 and step >= eos_step + fae:
                        break
                    chunk(_pcm16(dec.push(lm.denorm_latent(lat)[None])))
                    prev = lat
                chunk(b"")                   # terminating chunk

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self.host, self.port = host, self.httpd.server_address[1]

    def serve_forever(self):
        print(f"serve: listening on http://{self.host}:{self.port} "
              f"(arch={self.model.arch}, lm={self.lm.info.kind if self.lm else None})")
        self.httpd.serve_forever()

    def shutdown(self):
        if self.cont_engine is not None:
            self.cont_engine.stop()
        self.httpd.shutdown()


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="codec-serve")
    ap.add_argument("--model", required=True)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8765)
    ap.add_argument("--cont-batch", type=int, default=0,
                    help="continuous batching: N engine slots for "
                         "/synthesize on codebook-AR kinds (needs "
                         "--backbone); requests join/leave the running "
                         "batch at chunk boundaries")
    ap.add_argument("--chunk-frames", type=int, default=8,
                    help="frames per device call in the --cont-batch "
                         "engine")
    ap.add_argument("--prefill-bucket", type=int, default=0,
                    help="prefill whole prompts in one forward padded to "
                         "a multiple of N tokens (one dispatch per prompt "
                         "instead of one per token; 0 = per-token)")
    ap.add_argument("--backbone", default=None,
                    help="backbone GGUF for codebook-AR /synthesize "
                         "(same artifact as tts-cli --backbone)")
    ap.add_argument("--tp", type=int, default=0,
                    help="shard the backbone tensor-parallel over N chips")
    ap.add_argument("--pp", type=int, default=0,
                    help="shard the backbone pipeline-parallel over N stages")
    ap.add_argument("--ep", type=int, default=0,
                    help="shard a MoE backbone expert-parallel over N chips")
    ap.add_argument("--dp", type=int, default=0,
                    help="shard /synthesize_batch streams data-parallel "
                         "over N chips (composes with --tp on a 2-D mesh)")
    args = ap.parse_args(argv)
    if sum(1 for n in (args.tp, args.pp, args.ep) if n > 1) > 1:
        print("error: --tp, --pp and --ep are mutually exclusive",
              file=sys.stderr)
        return 1
    mesh = next((
        (k, n) for k, n in (("tp", args.tp), ("pp", args.pp),
                            ("ep", args.ep)) if n > 1), None)
    try:
        srv = CodecHTTPServer(args.model, args.host, args.port,
                              backbone_path=args.backbone,
                              backbone_mesh=mesh, dp=args.dp,
                              cont_batch=args.cont_batch,
                              chunk_frames=args.chunk_frames,
                              prefill_bucket=args.prefill_bucket)
    except (FileNotFoundError, ValueError) as e:
        print(f"error: {e}", file=sys.stderr)
        return 1
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        srv.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
