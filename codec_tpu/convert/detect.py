"""Model-type auto-detection from a checkpoint's config.json.

Reference behavior: scripts/convert-to-gguf.py:29-64 — detect from
`architectures` (including LM-source → codec pairing) with `model_type`
substring fallbacks, so `--type` is optional on the CLI.

`detect_type(cfg)` returns ``(converter_name, role)`` where role is:

- ``"codec"``   — cfg describes a codec checkpoint; convert directly.
- ``"bundled"`` — cfg is a single-checkpoint bundle (CSM / Moshi): one
  safetensors carrying codec + LM tensors; the bundled converter splits
  it (convert/bundled.py).
- ``"lm"``      — cfg describes a TTS LM whose codec lives in a separate
  repo; the checkpoint is the ``--lm-source`` and the codec checkpoint
  must be supplied (we have no network, so no auto-download — the
  reference pins default HF repos instead).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

# architectures[0] → (converter, role); exact matches first
_ARCH_MAP: Dict[str, Tuple[str, str]] = {
    "CsmForConditionalGeneration": ("csm", "bundled"),
    "MoshiForConditionalGeneration": ("moshi", "bundled"),
    "MimiModel": ("mimi", "codec"),
    "DacModel": ("dac", "codec"),
    # LM families that pair with a separately-shipped codec
    # (reference LM_SOURCE_TO_CODEC table)
    "MossTTSDForCausalLM": ("xy_tokenizer", "lm"),
    "AsteroidTTSModel": ("xy_tokenizer", "lm"),
    "MossTTSDelayModel": ("moss_audio", "lm"),
    "Qwen3TTSForConditionalGeneration": ("qwen3_tts_tokenizer", "lm"),
    "Lfm2AudioForConditionalGeneration": ("mimi", "lm"),
    "ChatterboxT3": ("chatterbox_s3g", "lm"),
    "MossTTSRealtime": ("moss_audio", "lm"),
}

# model_type substring → converter (checked in order; first hit wins)
_MODEL_TYPE_MAP = [
    ("csm", "csm"),
    ("moshi", "moshi"),
    ("mimi", "mimi"),
    ("descript", "dac"),
    ("dac", "dac"),
    ("wavtokenizer", "wavtokenizer"),
    ("snac", "snac"),
    ("soprano", "soprano"),
    ("nemo", "nemo_nano_codec"),
    ("nano", "nemo_nano_codec"),
    ("distill_neucodec", "distill_neucodec"),
    ("neucodec", "neucodec"),
    ("xcodec2", "xcodec2"),
    ("bigcodec", "xcodec2"),        # early HKUSTAudio/xcodec2 snapshots
    ("x-codec2", "xcodec2"),
    ("xy_tokenizer", "xy_tokenizer"),
    ("xy-tokenizer", "xy_tokenizer"),
    ("moss_audio", "moss_audio"),
    ("moss-audio", "moss_audio"),
    ("qwen3_tts_tokenizer", "qwen3_tts_tokenizer"),
    ("qwen3", "qwen3_tts_tokenizer"),
    ("chatterbox_s3t", "chatterbox_s3t"),
    ("chatterbox_s3g", "chatterbox_s3g"),
    ("bluemagpie", "bluemagpie"),
    ("audiovae", "bluemagpie"),
    ("pocket", "pocket_tts"),
]

_BUNDLED = {"csm", "moshi"}


def detect_type(cfg: Dict[str, Any]) -> Tuple[str, str]:
    """(converter_name, role) from a config.json dict; raises ValueError
    with the known names when nothing matches."""
    for a in cfg.get("architectures") or []:
        hit = _ARCH_MAP.get(a)
        if hit:
            return hit
    mt = str(cfg.get("model_type", "")).lower()
    if mt:
        if mt == "s3t":
            return "chatterbox_s3t", "codec"
        if mt == "s3g":
            return "chatterbox_s3g", "codec"
        for needle, name in _MODEL_TYPE_MAP:
            if needle in mt:
                return name, "bundled" if name in _BUNDLED else "codec"
    # last resort: architectures substring scan (older snapshots ship
    # custom class names but recognizable spellings)
    for a in cfg.get("architectures") or []:
        al = a.lower()
        for needle, name in _MODEL_TYPE_MAP:
            if needle in al:
                return name, "bundled" if name in _BUNDLED else "codec"
    raise ValueError(
        f"cannot detect model type from config.json "
        f"(architectures={cfg.get('architectures')!r}, "
        f"model_type={cfg.get('model_type')!r}) — pass --type explicitly")
