from .base import CodecLM, LmInfo, LmState, create_lm  # noqa: F401
from . import continuous_cfm, flow_lm, parallel_heads_delay, residual_depth_ar  # noqa: F401 (register kinds)


def create_speaker_encoder(reader):
    """Speaker-encoder dispatch (reference: speaker_arch_init, lm.cpp:316 —
    keyed on codec.speaker.encoder_arch). Returns None when the GGUF has no
    speaker section."""
    if not reader.get_bool("codec.speaker.has_encoder", False):
        return None
    arch = reader.get_str("codec.speaker.encoder_arch", "")
    hidden = reader.get_i32("codec.lm.hidden_dim", 1024)
    if arch == "chatterbox_voice_encoder":
        from .speaker_chatterbox import ChatterboxSpeakerEncoder

        return ChatterboxSpeakerEncoder(reader, hidden)
    if arch == "qwen3_tts_ecapa_tdnn":
        from .speaker_qwen3_tts import Qwen3TTSSpeakerEncoder

        return Qwen3TTSSpeakerEncoder(reader, hidden)
    raise ValueError(f"unknown speaker encoder arch: {arch!r}")
