"""tts-cli: info / decode / synthesize over a codec(+LM) GGUF.

Mirrors the reference CLI surface (reference: examples/tts-cli.cpp). The
`synthesize` subcommand implements the self-contained FlowLM path
(reference: common/tts_runner_flow.cpp — Pocket-TTS: the AR transformer,
text LUT, LSD flow head and EOS head all live in the codec GGUF, so no
external backbone is needed). Backbone-driven flows (CSM / Qwen3 / MOSS /
Chatterbox) go through `codec_tpu.lm.tts_runner` with a caller-supplied
`Backbone`, exactly as the reference isolates llama.cpp behind
libttsbackbone.

Usage:
  python -m codec_tpu.cli.tts_cli info --model pocket.gguf
  python -m codec_tpu.cli.tts_cli decode --model mimi.gguf --codes c.npy --out o.wav
  python -m codec_tpu.cli.tts_cli synthesize --model pocket.gguf \
      --text "Hello there." --out o.wav [--ref-audio voice.wav] [--seed 0]
"""

from __future__ import annotations

import argparse
import math
import sys
import time

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="tts-cli")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("info")
    p.add_argument("--model", required=True)

    p = sub.add_parser("decode")
    p.add_argument("--model", required=True)
    p.add_argument("--codes", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--nq", type=int, default=0)

    p = sub.add_parser("synthesize")
    p.add_argument("--model", required=True)
    p.add_argument("--text", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--backbone", default=None,
                   help="backbone GGUF (convert_to_gguf.py --type "
                        "llama_backbone) for codebook-AR kinds")
    p.add_argument("--ref-audio", dest="ref_audio", default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max-frames", type=int, default=0)
    p.add_argument("--min-len", type=int, default=-1,
                   help="minimum frames before EOS/stop is honored "
                        "(flow_lm and continuous-CFM kinds; -1 = the "
                        "model default)")
    p.add_argument("--quant-exec", action="store_true",
                   help="execute Q8_0/Q4_K backbone weights HBM-resident "
                        "via the fused dequant-matmul kernels (sets "
                        "CODEC_QUANT_EXEC=1). Saves 1.8-2.7x backbone HBM "
                        "but measured ~0.6-0.75x chunked-generation speed "
                        "at CSM-1B shape (tools/rda_quant_micro.py) — a "
                        "memory-headroom lever, not a latency one")
    p.add_argument("--stream", action="store_true",
                   help="vocode each AR frame through the streaming decoder "
                        "as it is generated (reports time-to-first-audio)")
    p.add_argument("--on-device", action="store_true", dest="on_device",
                   help="codebook-AR kinds: sample on-device (fused frame; "
                        "the temperature/top-k chain then applies to every "
                        "codebook, not just cb0) and, where the kind and "
                        "backbone support it, chain --chunk-frames whole "
                        "frames per device call")
    p.add_argument("--chunk-frames", type=int, default=8,
                   help="frames per device call with --on-device (1 = one "
                        "fused frame per call)")
    p.add_argument("--prefill-bucket", type=int, default=0,
                   help="codebook-AR kinds: prefill the whole prompt in "
                        "one forward padded to a multiple of N tokens "
                        "(one device dispatch instead of one per token; "
                        "0 = per-token prefill)")
    p.add_argument("--temp", type=float, default=None,
                   help="sampling temperature (default: the model "
                        "family's preset; 0 = greedy)")
    p.add_argument("--top-k", type=int, default=None,
                   help="top-k filter (default: family preset)")
    p.add_argument("--top-p", type=float, default=None,
                   help="nucleus top-p filter (default: family preset)")
    p.add_argument("--min-p", type=float, default=None,
                   help="min-p filter (default: family preset)")
    p.add_argument("--rep-penalty", type=float, default=None,
                   help="repetition penalty (default: family preset)")
    p.add_argument("--cfg-weight", type=float, default=None,
                   help="Chatterbox CFG guidance weight (default 0.5; "
                        "0 = single lane, no guidance)")
    p.add_argument("--timesteps", type=int, default=None,
                   help="continuous-CFM Euler steps per frame "
                        "(BlueMagpie family; default 10)")
    p.add_argument("--grammar", default="",
                   help="GBNF constraint on the cb0 backbone sampler: a "
                        ".gbnf file path or a literal grammar string "
                        "(codebook-AR kinds; forces host sampling)")
    p.add_argument("--tp", type=int, default=0,
                   help="shard the backbone tensor-parallel over N chips "
                        "(Megatron column/row split; composes with "
                        "--on-device)")
    p.add_argument("--pp", type=int, default=0,
                   help="shard the backbone pipeline-parallel over N "
                        "stages (n_layers/N layers per chip; generation "
                        "runs the host per-frame loop)")
    p.add_argument("--ep", type=int, default=0,
                   help="shard a MoE backbone expert-parallel over N chips "
                        "(n_experts/N experts per chip)")
    return ap


def _apply_backbone_mesh(bb, args) -> None:
    """Wire --tp/--pp/--ep onto a loaded backbone (mutually exclusive)."""
    from ..lm.backbone import apply_backbone_mesh

    if sum(1 for n in (args.tp, args.pp, args.ep) if n > 1) > 1:
        raise ValueError("--tp, --pp and --ep are mutually exclusive")
    for kind, n in (("tp", args.tp), ("pp", args.pp), ("ep", args.ep)):
        if n > 1:
            apply_backbone_mesh(bb, kind, n)
            return


def load_backbone_tokenizer(bb_reader):
    """Baked tokenizer from a backbone GGUF: SPM-unigram
    (``backbone.tokenizer.spm_b64``, lm/spm.py) or byte-level BPE
    (``backbone.tokenizer.bpe_json_zb64``, lm/bpe.py — Llama-3/Qwen
    backbones). The reference gets this from llama.cpp's vocab
    (common/tts_runner.cpp:1096-1113); with the backbone in-repo the
    GGUF carries the tokenizer itself."""
    spm_b64 = bb_reader.get_str("backbone.tokenizer.spm_b64", "")
    if spm_b64:
        from ..lm.spm import SpmUnigram

        return SpmUnigram.from_b64(spm_b64)
    bpe_zb64 = bb_reader.get_str("backbone.tokenizer.bpe_json_zb64", "")
    if bpe_zb64:
        from ..lm.bpe import BpeByteLevel

        return BpeByteLevel.from_zb64(bpe_zb64)
    raise ValueError(
        "backbone GGUF has no baked tokenizer "
        "(backbone.tokenizer.spm_b64 / backbone.tokenizer.bpe_json_zb64)"
        " — re-convert with a tokenizer.model or tokenizer.json next to "
        "the checkpoint, or drive codec_tpu.lm.tts_runner directly with "
        "token ids")


def flow_prepare_text(text: str):
    """pocket_tts prepare_text_prompt parity (tts_runner_flow.cpp:34-56):
    strip, collapse spaces, uppercase first letter, ensure trailing
    punctuation; returns (text, frames_after_eos_guess)."""
    text = " ".join(text.split())
    if not text:
        return text, 3
    words = len(text.split(" "))
    guess = 3 if words <= 4 else 1
    if text[0].islower() and text[0].isascii():
        text = text[0].upper() + text[1:]
    if text[-1].isalnum():
        text += "."
    return text, guess


def run_flow_synthesize(model, lm, text: str, seed: int = 0,
                        ref_pcm=None, max_frames: int = 0,
                        min_len: int = 0, stream: bool = False,
                        temperature=None):
    """Self-contained FlowLM synthesize (reference:
    tts_runner_synthesize_selfcontained). → (pcm, n_frames, stop_reason).

    stream=True vocodes each frame through the chunk-exact streaming
    decoder as the AR loop emits it (time-to-first-audio = one AR step +
    one vocoder step, instead of the full utterance) — no reference
    analog; the reference decodes the whole latent sequence at the end.

    `temperature` overrides the GGUF's flow temperature (the LSD noise
    variance; 0 = deterministic flow — reference --temp semantics)."""
    text, fae_guess = flow_prepare_text(text)
    fae_guess += 2                                       # reference adds +2
    ids = lm.tokenize(text)
    print(f'flow_lm: text="{text}" -> {len(ids)} tokens; '
          f"d_model={lm.info.hidden_dim} ldim={lm.ldim}")

    voice_rows = None
    if ref_pcm is not None:
        mu = model.encode_latent(np.asarray(ref_pcm, np.float32))
        voice_rows = lm.speaker_rows(mu)
        print(f"flow_lm: voice conditioning -> {len(voice_rows)} rows")

    st = lm.new_state()
    lm.flow_prefill(st, ids, voice_rows=voice_rows)

    fae = lm.frames_after_eos if lm.frames_after_eos >= 0 else fae_guess
    max_gen = max_frames if max_frames > 0 else \
        max(8, int(math.ceil((len(ids) / 3.0 + 2.0) * 12.5)))

    rng = np.random.default_rng(seed)
    noise_std = math.sqrt(lm.temperature if temperature is None
                          else float(temperature))
    dec = model.streaming_decoder() if stream else None
    t_start = time.monotonic()
    ttfa = None
    latents = []
    chunks = []
    prev = None
    eos_step = -1
    stop = "max_frames"
    # AR in fixed-size device chunks (flow_lm.flow_run): one dispatch +
    # one readback per CHUNK frames instead of per frame. Frames past the
    # stop point are computed-then-discarded — causal AR makes the kept
    # prefix bit-identical to single-stepping. Smaller chunk when
    # streaming so time-to-first-audio stays ~chunk-sized.
    ar_chunk = 4 if stream else 16
    max_gen = min(max_gen, lm.max_T - st.kind_state["kv_pos"])
    step = 0
    done = False
    while step < max_gen and not done:
        # shrink the final chunk to the remaining KV capacity
        cur_chunk = min(ar_chunk, lm.max_T - st.kind_state["kv_pos"])
        noises = (rng.standard_normal((cur_chunk, lm.ldim)) *
                  noise_std).astype(np.float32)
        lats, eos_logits = lm.flow_run(st, noises, prev_latent=prev)
        for i in range(cur_chunk):
            if step >= max_gen:
                break
            if eos_logits[i] > lm.eos_threshold and eos_step < 0 \
                    and step >= min_len:
                eos_step = step
            if eos_step >= 0 and step >= eos_step + fae:
                stop = "eos_head"
                done = True
                break
            frame = lm.denorm_latent(lats[i])
            latents.append(frame)
            if dec is not None:
                chunks.append(dec.push(frame[None]))
                if ttfa is None:
                    ttfa = time.monotonic() - t_start
            step += 1
        prev = lats[-1]
    print(f"flow_lm: AR done: {len(latents)} frames, eos_step={eos_step}, "
          f"stop={stop}")
    if not latents:
        raise ValueError("flow_lm: no frames generated")
    if dec is not None:
        print(f"flow_lm: streaming vocoder — time-to-first-audio "
              f"{ttfa * 1e3:.0f} ms ({model.hop_size / model.sample_rate * 1e3:.0f} ms "
              f"of audio per frame)")
        pcm = np.concatenate(chunks)
    else:
        pcm = model.decode_latent(np.stack(latents))
    return pcm, len(latents), stop


def run_chatterbox_synthesize(model, reader, backbone_path, text: str,
                              seed: int = 0, max_frames: int = 0,
                              cfg_weight: float = 0.5,
                              on_device: bool = False,
                              chunk_frames: int = 8,
                              prefill_bucket: int = 0,
                              temperature=None, top_p=None, min_p=None,
                              rep_penalty=None):
    """Chatterbox T3 flow: dual CFG lanes over two backbone instances
    (reference: run_chatterbox, tts_runner.cpp:876 — the reference
    multiplexes lanes through llama seq-ids; here each lane owns a
    backbone with its own KV state). Requires baked tokenizer + builtin
    conds in the GGUF (codec.lm.chatterbox.*).

    `on_device`: run the loop as K-frame device chunks (both CFG lanes
    batched, the T3 sampler chain in-graph — T3Sampler's preset:
    temperature 0.8, min_p 0.05, repetition penalty 1.2 over the full
    history)."""
    from ..lm.audio_lm import AudioLM
    from ..lm.backbone import create_backbone
    from ..lm.chatterbox_t3 import ChatterboxT3
    from ..lm.tts_runner import T3Sampler, run_chatterbox

    t3 = ChatterboxT3(reader)
    if t3.tokenizer is None:
        raise ValueError("chatterbox GGUF has no baked tokenizer "
                         "(codec.lm.chatterbox.tokenizer.*)")
    n_lanes = 2 if cfg_weight > 0.0 else 1
    backbones = [create_backbone(backbone_path) for _ in range(n_lanes)]
    if backbones[0].cfg.hidden != t3.info.hidden_dim:
        raise ValueError(f"backbone hidden {backbones[0].cfg.hidden} != "
                         f"t3 hidden {t3.info.hidden_dim}")
    audio_lm = AudioLM(reader, codec=model)
    # T3Sampler preset (temp 0.8, min_p 0.05, rep 1.2) with CLI overrides
    s_temp = 0.8 if temperature is None else float(temperature)
    s_top_p = 1.0 if top_p is None else float(top_p)
    s_min_p = 0.05 if min_p is None else float(min_p)
    s_rep = 1.2 if rep_penalty is None else float(rep_penalty)
    sampler = T3Sampler(seed=seed, seed_token=t3.info.start_speech_token,
                        temperature=s_temp, top_p=s_top_p, min_p=s_min_p,
                        repetition_penalty=s_rep)
    ods = None
    if on_device:
        from ..ops.sample import OnDeviceSampling

        ods = OnDeviceSampling(temperature=s_temp, top_p=s_top_p,
                               min_p=s_min_p, repetition_penalty=s_rep,
                               repetition_window=-1, seed=seed,
                               chunk_frames=max(2, chunk_frames))
    res = run_chatterbox(audio_lm, t3, backbones, text,
                         max_frames=max_frames if max_frames > 0 else 512,
                         cfg_weight=cfg_weight, sampler=sampler,
                         on_device=ods, prefill_bucket=prefill_bucket)
    print(f"chatterbox AR done: {res.n_steps} steps, eos={res.stopped_by_eos}, "
          f"codes {res.codes.shape}")
    if res.pcm is None:
        raise ValueError("no audio frames generated")
    return res.pcm, res.codes.shape[0], \
        "eos" if res.stopped_by_eos else "max_frames"


def run_backbone_synthesize(model, reader, backbone_path, text: str,
                            seed: int = 0, max_frames: int = 0, bb=None,
                            on_device: bool = False, chunk_frames: int = 8,
                            prefill_bucket: int = 0, temperature=None,
                            top_k=None, top_p=None, min_p=None,
                            rep_penalty=None, cfg_weight=None,
                            timesteps=None, grammar: str = "",
                            min_len: int = -1):
    """Codebook-AR synthesize with the JAX llama backbone (reference:
    tts-cli over tts_runner_synthesize → run_codebook_ar,
    tts_runner.cpp:707,1043; backbone n_embd check at :1096-1113).

    `bb`: a preloaded LlamaBackbone to reuse across calls (the serving
    layer loads once and serializes generations); its KV state is reset
    here. Default loads fresh from backbone_path (one-shot CLI).

    `prefill_bucket > 0`: whole-prompt bucketed prefill on the plain
    codebook-AR path (lm/tts_runner.prefill_prompt) — one device
    dispatch per prompt instead of one per token.

    Sampler controls (reference tts-cli flags, tts-cli.cpp:126-138):
    `temperature`/`top_k`/`top_p`/`min_p`/`rep_penalty` override the
    model family's PromptInfo defaults when given (None = default);
    `cfg_weight` applies to the Chatterbox dual-lane flow, `timesteps`
    to continuous-CFM Euler steps, `grammar` (GBNF text) constrains the
    cb0 backbone sampler on the codebook-AR flow (token pieces come from
    the baked tokenizer; forces the host sampling path)."""
    from ..io.gguf import GGUFReader
    from ..lm.audio_lm import AudioLM
    from ..lm.backbone import create_backbone
    from ..lm.prompt_info import build_prompt_info
    from ..lm.tts_runner import SamplerChain, run_codebook_ar

    from ..lm.chatterbox_t3 import is_chatterbox

    if is_chatterbox(reader):
        return run_chatterbox_synthesize(model, reader, backbone_path,
                                         text, seed=seed,
                                         max_frames=max_frames,
                                         on_device=on_device,
                                         chunk_frames=chunk_frames,
                                         prefill_bucket=prefill_bucket,
                                         cfg_weight=0.5 if cfg_weight
                                         is None else float(cfg_weight),
                                         temperature=temperature,
                                         top_p=top_p, min_p=min_p,
                                         rep_penalty=rep_penalty)

    if bb is None:
        bb = create_backbone(backbone_path)
    else:
        bb.reset()
    pi = build_prompt_info(reader)
    if pi.hidden_dim and bb.cfg.hidden != pi.hidden_dim:
        raise ValueError(f"backbone hidden {bb.cfg.hidden} != "
                         f"codec.lm hidden {pi.hidden_dim}")

    tok = load_backbone_tokenizer(GGUFReader(backbone_path))
    ids = tok.encode(pi.prompt_prefix + text + pi.prompt_suffix)
    print(f"backbone: {len(ids)} prompt tokens; "
          f"hidden={bb.cfg.hidden} layers={bb.cfg.n_layers}")

    audio_lm = AudioLM(reader, codec=model)
    max_steps = max_frames if max_frames > 0 else 512

    # effective sampler chain: CLI overrides win over the model family's
    # PromptInfo defaults (reference: tts-cli.cpp:266-275 has_* plumbing)
    s_temp = pi.default_temperature if temperature is None \
        else float(temperature)
    s_top_k = pi.default_top_k if top_k is None else int(top_k)
    s_top_p = pi.default_top_p if top_p is None else float(top_p)
    s_min_p = 0.0 if min_p is None else float(min_p)
    s_rep = pi.default_repetition_penalty if rep_penalty is None \
        else float(rep_penalty)

    if pi.is_continuous:                # BlueMagpie continuous-latent CFM
        from ..lm.tts_runner import run_continuous

        if timesteps is not None:                    # CFM Euler steps
            audio_lm.set_continuous_params(n_timesteps=int(timesteps))
        res = run_continuous(audio_lm, bb, list(bb.embed_tokens(ids)),
                             max_steps=max_steps, min_len=min_len,
                             chunk_steps=chunk_frames if on_device else 1)
        print(f"continuous AR done: {res.n_steps} steps, "
              f"eos={res.stopped_by_eos}, latents {res.codes.shape}")
        if res.pcm is None:
            raise ValueError("no latents generated")
        return res.pcm, res.codes.shape[0], \
            "eos" if res.stopped_by_eos else "max_frames"

    if pi.sequential_text_audio:        # LFM2-Audio (text→audio switch)
        from ..lm.tts_runner import run_lfm2_sequential

        table = np.asarray(bb.params["tok_embd"], np.float32)
        ods = None
        if on_device:
            from ..ops.sample import OnDeviceSampling

            ods = OnDeviceSampling(temperature=s_temp, top_k=s_top_k,
                                   top_p=s_top_p, min_p=s_min_p, seed=seed,
                                   chunk_frames=max(1, chunk_frames))
        res = run_lfm2_sequential(
            audio_lm, bb, table, ids, pi, max_frames=max_steps,
            sampler=SamplerChain(seed=seed, temperature=s_temp,
                                 top_k=s_top_k, top_p=s_top_p,
                                 min_p=s_min_p),
            on_device=ods)
    elif pi.streaming_interleave:       # MOSS-TTS-Realtime
        from ..lm.tts_runner import run_realtime_streaming

        ods = None
        if on_device:
            from ..ops.sample import OnDeviceSampling

            ods = OnDeviceSampling(
                temperature=s_temp, top_k=s_top_k, top_p=s_top_p,
                min_p=s_min_p, repetition_penalty=s_rep,
                repetition_window=pi.repetition_window,
                seed=seed, chunk_frames=max(1, chunk_frames))
        res = run_realtime_streaming(
            audio_lm, bb, lambda tok: bb.embed_tokens([tok])[0],
            ctx_tokens=ids[: max(1, len(ids) - pi.prefill_text_len)],
            text_tokens=ids[max(1, len(ids) - pi.prefill_text_len):] or ids,
            pi=pi, max_frames=max_steps, on_device=ods)
    else:                               # CSM / Qwen3 / MOSS-TTSD
        chain = SamplerChain(seed=seed, temperature=s_temp, top_k=s_top_k,
                             top_p=s_top_p, min_p=s_min_p,
                             repetition_penalty=s_rep)

        def sampler(cb_idx, logits):
            return chain(logits) if cb_idx == 0 else int(logits.argmax())

        if audio_lm.prompt_needs_composed:
            # Merged-cb0 (MOSS-TTSD): each prompt row is the sum over the
            # per-codebook embedding tables — cb0 = the raw text token,
            # cb1..N-1 = speech_pad (reference: tts_runner.cpp:767-793,
            # audio_lm_compose_prompt_embd).
            prompt_embeds = [audio_lm.compose_prompt_embd(t) for t in ids]
        else:
            prompt_embeds = list(bb.embed_tokens(ids))
        ods = None
        if on_device and not grammar:
            from ..ops.sample import OnDeviceSampling

            ods = OnDeviceSampling(temperature=s_temp, top_k=s_top_k,
                                   top_p=s_top_p, min_p=s_min_p, seed=seed,
                                   chunk_frames=max(1, chunk_frames))
        token_pieces = None
        if grammar:
            # per-token detokenized strings for the pushdown matcher
            # (reference: tts_runner.h:64-73 grammar on the backbone
            # sampler; forces the host sampling path)
            token_pieces = [tok.decode_piece(i)
                            for i in range(tok.vocab_size)]
        res = run_codebook_ar(audio_lm, bb, prompt_embeds,
                              max_steps=max_steps, sampler=sampler, pi=pi,
                              on_device=ods, prefill_bucket=prefill_bucket,
                              grammar=grammar, token_pieces=token_pieces)
    print(f"backbone AR done: {res.n_steps} steps, "
          f"eos={res.stopped_by_eos}, codes {res.codes.shape}")
    if res.pcm is None:
        raise ValueError("no audio frames generated")
    return res.pcm, res.codes.shape[0], \
        "eos" if res.stopped_by_eos else "max_frames"


def run_chatterbox_synthesize_batch(model, reader, backbone_path, texts,
                                    seed: int = 0, max_frames: int = 0,
                                    bb=None, chunk_frames: int = 8,
                                    lm=None, prefill_bucket: int = 0,
                                    sampling=None,
                                    cfg_weight: float = 0.5, mesh=None):
    """Batched Chatterbox synthesize: B texts, each with its CFG lanes,
    through ONE vmapped device loop (lm/tts_runner.run_chatterbox_batch).
    `sampling` dicts override the T3 preset chain per text (the
    repetition penalty stays the engine-wide preset)."""
    import dataclasses as _dc

    from ..lm import create_lm
    from ..lm.audio_lm import AudioLM
    from ..lm.backbone import create_backbone
    from ..lm.chatterbox_t3 import ChatterboxT3
    from ..lm.tts_runner import run_chatterbox_batch
    from ..ops.sample import OnDeviceSampling

    t3 = ChatterboxT3(reader)
    if t3.tokenizer is None:
        raise ValueError("chatterbox GGUF has no baked tokenizer")
    if bb is None:
        bb = create_backbone(backbone_path)
    if bb.cfg.hidden != t3.info.hidden_dim:
        raise ValueError(f"backbone hidden {bb.cfg.hidden} != "
                         f"t3 hidden {t3.info.hidden_dim}")
    shared = lm if lm is not None else create_lm(reader)
    alms = [AudioLM(reader, codec=model, lm=shared) for _ in texts]
    base = OnDeviceSampling(temperature=0.8, top_p=1.0, min_p=0.05,
                            repetition_penalty=1.2, repetition_window=-1,
                            seed=seed, chunk_frames=max(2, chunk_frames))
    per_stream = None
    if sampling is not None:
        if len(sampling) != len(texts):
            raise ValueError("sampling needs one entry per text")
        per_stream = [
            _dc.replace(base,
                        temperature=float(s.get("temperature",
                                                base.temperature)),
                        top_k=int(s.get("top_k", base.top_k)),
                        top_p=float(s.get("top_p", base.top_p)),
                        min_p=float(s.get("min_p", base.min_p)))
            for s in sampling]
    results = run_chatterbox_batch(
        alms, t3, bb, texts, base,
        max_frames=max_frames if max_frames > 0 else 512,
        cfg_weight=cfg_weight, sampling=per_stream,
        prefill_bucket=prefill_bucket, mesh=mesh)
    return [(r.pcm, int(r.codes.shape[0]),
             "eos" if r.stopped_by_eos else "max_frames") for r in results]


def run_backbone_synthesize_batch(model, reader, backbone_path, texts,
                                  seed: int = 0, max_frames: int = 0,
                                  bb=None, chunk_frames: int = 8, lm=None,
                                  mesh=None, prefill_bucket: int = 0,
                                  sampling=None):
    """Batched codebook-AR synthesize: B texts through ONE vmapped
    on-device generation loop (lm/tts_runner.run_codebook_ar_batch) on
    shared codec + LM + backbone weights — the multi-stream TTS serving
    shape (reference contrast: one codec_lm_state per stream but a serial
    host loop each, lm_internal.h:63-68).

    Plain codebook-AR families (CSM / Qwen3-TTS / MOSS-TTSD) and the
    Chatterbox T3 family (B streams × CFG lanes through
    run_chatterbox_batch); continuous, LFM2-sequential and
    streaming-interleave kinds raise. `lm`: a preloaded CodecLM to share
    across calls. `sampling`: one dict per text ({"temperature",
    "top_k", "top_p", "min_p"}, missing keys = the family defaults) —
    per-stream chains ride as a traced chunk input.
    Returns [(pcm, n_frames, stop), ...] per text."""
    import numpy as _np

    from ..io.gguf import GGUFReader
    from ..lm import create_lm
    from ..lm.audio_lm import AudioLM
    from ..lm.backbone import create_backbone
    from ..lm.chatterbox_t3 import is_chatterbox
    from ..lm.prompt_info import build_prompt_info
    from ..lm.tts_runner import run_codebook_ar_batch
    from ..ops.sample import OnDeviceSampling

    if is_chatterbox(reader):
        return run_chatterbox_synthesize_batch(
            model, reader, backbone_path, texts, seed=seed,
            max_frames=max_frames, bb=bb, chunk_frames=chunk_frames,
            lm=lm, prefill_bucket=prefill_bucket, sampling=sampling,
            mesh=mesh)
    if bb is None:
        bb = create_backbone(backbone_path)
    else:
        bb.reset()
    pi = build_prompt_info(reader)
    if pi.is_continuous or pi.sequential_text_audio or pi.streaming_interleave:
        raise ValueError(f"batched synthesize supports plain codebook-AR "
                         f"kinds only (model family: {pi.host_arch})")
    if pi.hidden_dim and bb.cfg.hidden != pi.hidden_dim:
        raise ValueError(f"backbone hidden {bb.cfg.hidden} != "
                         f"codec.lm hidden {pi.hidden_dim}")
    tok = load_backbone_tokenizer(GGUFReader(backbone_path))

    shared = lm if lm is not None else create_lm(reader)
    alms = [AudioLM(reader, codec=model, lm=shared) for _ in texts]
    prompts = []
    for text, alm in zip(texts, alms):
        ids = tok.encode(pi.prompt_prefix + text + pi.prompt_suffix)
        if alm.prompt_needs_composed:
            prompts.append([alm.compose_prompt_embd(t) for t in ids])
        else:
            prompts.append(list(bb.embed_tokens(_np.asarray(ids))))
    ods = OnDeviceSampling(temperature=pi.default_temperature,
                           top_k=pi.default_top_k,
                           top_p=pi.default_top_p, seed=seed,
                           chunk_frames=max(2, chunk_frames))
    per_stream = None
    if sampling is not None:
        import dataclasses as _dc

        if len(sampling) != len(texts):
            raise ValueError("sampling needs one entry per text")
        per_stream = [
            _dc.replace(ods,
                        temperature=float(s.get("temperature",
                                                ods.temperature)),
                        top_k=int(s.get("top_k", ods.top_k)),
                        top_p=float(s.get("top_p", ods.top_p)),
                        min_p=float(s.get("min_p", ods.min_p)))
            for s in sampling]
    results = run_codebook_ar_batch(
        alms, bb, prompts, ods,
        max_steps=max_frames if max_frames > 0 else 512, pi=pi, mesh=mesh,
        prefill_bucket=prefill_bucket, sampling=per_stream)
    return [(r.pcm, int(r.codes.shape[0]),
             "eos" if r.stopped_by_eos else "max_frames") for r in results]


def _run(args) -> int:
    from ..io.gguf import GGUFReader

    if args.cmd == "info":
        r = GGUFReader(args.model)
        print(f"architecture: {r.architecture}")
        print(f"lm kind:      {r.get_str('codec.lm.kind', '<none>')}")
        print(f"host arch:    {r.get_str('codec.lm.host_arch', '<none>')}")
        for k in sorted(r.kv):
            if k.startswith(("codec.lm.", "codec.speaker.")) and \
                    not k.endswith("_b64"):
                v = r.kv[k]
                if isinstance(v, str) and len(v) > 60:
                    v = v[:57] + "..."
                print(f"  {k} = {v}")
        return 0

    import codec_tpu
    from ..io.wav import read_wav, to_mono, write_wav

    if args.cmd == "decode":
        model = codec_tpu.load_model(args.model)
        codes = np.load(args.codes)
        pcm = model.decode(codes, n_q=args.nq)
        write_wav(args.out, pcm, model.sample_rate)
        print(f"wrote {args.out}: {pcm.shape[0]} samples @ {model.sample_rate} Hz")
        return 0

    if args.cmd == "synthesize":
        from ..lm import create_lm
        from ..lm.flow_lm import FlowLM

        if getattr(args, "quant_exec", False):
            import os

            os.environ["CODEC_QUANT_EXEC"] = "1"

        reader = GGUFReader(args.model)
        lm = create_lm(reader)
        if lm is None:
            raise ValueError("GGUF has no codec.lm.* adaptor section")
        if not isinstance(lm, FlowLM) and not args.backbone:
            raise ValueError(
                f"kind {lm.info.kind!r} needs a backbone — pass "
                f"--backbone bb.gguf (flow_lm models are self-contained)")
        model = codec_tpu.load_model(args.model)
        if not isinstance(lm, FlowLM):
            bb = None
            if any(n > 1 for n in (args.tp, args.pp, args.ep)):
                from ..lm.backbone import create_backbone
                from ..lm.chatterbox_t3 import is_chatterbox

                if is_chatterbox(reader):
                    raise ValueError("--tp/--pp/--ep do not support the "
                                     "chatterbox dual-lane flow")
                bb = create_backbone(args.backbone)
                _apply_backbone_mesh(bb, args)
            grammar = args.grammar
            if grammar:
                # file path or literal GBNF string (reference:
                # tts-cli.cpp load_grammar_arg tries fopen first)
                try:
                    with open(grammar) as f:
                        grammar = f.read()
                except OSError:
                    pass
            pcm, n_frames, stop = run_backbone_synthesize(
                model, reader, args.backbone, args.text,
                seed=args.seed, max_frames=args.max_frames,
                on_device=args.on_device, chunk_frames=args.chunk_frames,
                bb=bb, prefill_bucket=args.prefill_bucket,
                temperature=args.temp, top_k=args.top_k, top_p=args.top_p,
                min_p=args.min_p, rep_penalty=args.rep_penalty,
                cfg_weight=args.cfg_weight, timesteps=args.timesteps,
                grammar=grammar, min_len=args.min_len)
            write_wav(args.out, pcm, model.sample_rate)
            print(f"wrote {args.out}: {pcm.shape[0]} samples "
                  f"({n_frames} frames, stop={stop})")
            return 0
        ref = None
        if args.ref_audio:
            x, sr = read_wav(args.ref_audio)
            if sr != model.sample_rate:
                raise ValueError(f"ref audio rate {sr} != {model.sample_rate}")
            ref = to_mono(x)
        pcm, n_frames, stop = run_flow_synthesize(
            model, lm, args.text, seed=args.seed, ref_pcm=ref,
            max_frames=args.max_frames, min_len=args.min_len,
            stream=args.stream, temperature=args.temp)
        write_wav(args.out, pcm, model.sample_rate)
        print(f"wrote {args.out}: {pcm.shape[0]} samples "
              f"({n_frames} frames, stop={stop})")
        return 0

    return 2


def main(argv=None) -> int:
    import os

    # one-shot process: compile only the fast-plan tier (see codec_cli);
    # an explicit CODEC_TIERED_JIT setting wins
    os.environ.setdefault("CODEC_TIERED_JIT", "fast")
    try:
        return _run(build_parser().parse_args(argv))
    except BrokenPipeError:
        return 0
    except Exception as e:
        from ..lm.base import LmError
        from ..runtime.model import CodecError

        if isinstance(e, (CodecError, LmError, ValueError, FileNotFoundError)):
            print(f"error: {e}", file=sys.stderr)
            return 1
        raise


if __name__ == "__main__":
    sys.exit(main())
