"""Single-checkpoint bundled converters: CSM and Moshi.

Reference behavior: scripts/converters/csm.py:1-40 and moshi.py:1-24 —
one safetensors carries both the Mimi codec (``codec_model.*`` /
``audio_encoder.*``) and the depth-decoder LM (``depth_decoder.*`` et
al.); one conversion pass writes a codec+lm GGUF. The backbone half
(``backbone_model.*`` / ``decoder.*``) is converted separately with
``--type llama_backbone`` (our analog of the reference's extracted-HF-dir
flow).

The written GGUF's architecture is ``mimi`` so the codec loads through
the normal Mimi path; the ``lm.*`` section sits orthogonal to the codec
arch (same layout the reference emits).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict

from .base import BaseConverter
from .registry import get_converter, register


class _BundledMimiConverter(BaseConverter):
    architecture = "mimi"
    codec_prefix = ""            # subclass: tensor prefix of the codec half
    codec_cfg_key = ""           # subclass: config.json key of the sub-config
    lm_arch = ""                 # subclass: dump_lm_into arch selector

    def _codec_parts(self) -> tuple[Dict[str, Any], Dict[str, Any]]:
        pre = self.codec_prefix
        codec_sd = {k[len(pre):]: v for k, v in self.state_dict.items()
                    if k.startswith(pre)}
        if not codec_sd:
            raise ValueError(
                f"{self.lm_arch}: checkpoint has no {pre}* tensors")
        codec_cfg = self.config.get(self.codec_cfg_key)
        if codec_cfg is None:
            raise ValueError(
                f"{self.lm_arch}: config.json has no "
                f"{self.codec_cfg_key!r} block")
        return codec_sd, dict(codec_cfg)

    def convert_and_save(self, output_path: Path) -> None:
        from ..io.gguf import GGUFWriter
        from .lm_adaptor import dump_lm_into

        if self.state_dict is None:
            raise RuntimeError("no checkpoint loaded")
        codec_sd, codec_cfg = self._codec_parts()
        inner = get_converter("mimi")(
            quantization=self.quantization,
            quantize_codebook=self.quantize_codebook, verbose=self.verbose)
        inner.load_from_state_dict(codec_sd, codec_cfg)

        writer = GGUFWriter(output_path, self.architecture)
        inner.write_metadata(writer)
        inner.write_tensors(writer)
        dump_lm_into(writer, self.state_dict, self.config, arch=self.lm_arch)
        writer.write()
        if self.verbose:
            print(f"wrote {output_path}")


@register("csm")
class CsmBundledConverter(_BundledMimiConverter):
    """sesame/csm-1b: ``codec_model.*`` Mimi + residual_depth_ar LM
    (``depth_decoder.*``, ``lm_head``, backbone audio-embed table).
    Reference: scripts/converters/csm.py."""

    codec_prefix = "codec_model."
    codec_cfg_key = "codec_config"
    lm_arch = "CsmForConditionalGeneration"


@register("moshi")
class MoshiBundledConverter(_BundledMimiConverter):
    """kmhf/hf-moshiko(a): ``audio_encoder.*`` Mimi +
    flexible-weight residual_depth_ar LM (``depth_decoder.*``).
    Reference: scripts/converters/moshi.py."""

    codec_prefix = "audio_encoder."
    codec_cfg_key = "audio_encoder_config"
    lm_arch = "MoshiForConditionalGeneration"
