"""HF llama-family checkpoint → backbone GGUF.

Reference: scripts/convert-backbone-to-gguf.py (writes llama.cpp-loadable
GGUFs for the isolated libttsbackbone). Here the consumer is our own JAX
backbone (lm/backbone.py), so the schema is the codec_tpu-native
`backbone.*` layout. Covers the reference's backbone families:

- Llama 3.x (CSM): `rope_scaling.rope_type == "llama3"` → per-pair
  frequency factors baked into `backbone.rope_freq_factors` (same formula
  the reference bakes for the CSM depth decoder; lm_adaptor/csm.py).
- Qwen3 (Qwen3-TTS host): per-head q/k RMS norm (`q_norm`/`k_norm`).
- Qwen2-style attention biases.
- Tied or untied lm_head.
"""

from __future__ import annotations

import math

import numpy as np

from .base import BaseConverter
from .registry import register


def llama3_freq_factors(head_dim: int, rope_theta: float,
                        scaling: dict) -> np.ndarray:
    """HF Llama3RotaryEmbedding factor computation: inv_freq /= factor
    for low frequencies, smooth ramp in between (reference bakes the same
    table: converters/lm_adaptor/csm.py)."""
    factor = float(scaling.get("factor", 8.0))
    lo = float(scaling.get("low_freq_factor", 1.0))
    hi = float(scaling.get("high_freq_factor", 4.0))
    orig = float(scaling.get("original_max_position_embeddings", 8192))
    inv = rope_theta ** (-2.0 * np.arange(head_dim // 2) / head_dim)
    wavelen = 2.0 * math.pi / inv
    low_wl = orig / lo
    high_wl = orig / hi
    smooth = (orig / wavelen - lo) / (hi - lo)
    ff = np.where(wavelen > low_wl, factor,
                  np.where(wavelen < high_wl, 1.0,
                           1.0 / ((1.0 - smooth) / factor + smooth)))
    return ff.astype(np.float32)


@register("llama_backbone", "backbone")
class LlamaBackboneConverter(BaseConverter):
    architecture = "llama_backbone"

    def load_from_checkpoint(self, checkpoint_dir) -> None:
        """Also bake a tokenizer found next to the weights: tokenizer.model
        (SPM) or a byte-level-BPE tokenizer.json (Llama-3/Qwen). The
        reference's backbones get their vocab from llama.cpp; our backbone
        GGUF is self-contained (VERDICT r3 #2)."""
        import base64
        from pathlib import Path

        super().load_from_checkpoint(checkpoint_dir)
        d = Path(checkpoint_dir)
        spm = d / "tokenizer.model"
        if spm.exists() and not self.config.get("tokenizer_spm_b64"):
            self.config["tokenizer_spm_b64"] = base64.b64encode(
                spm.read_bytes()).decode("ascii")
            return
        tj = d / "tokenizer.json"
        if tj.exists() and not self.config.get("tokenizer_bpe_json_zb64"):
            from ..lm.bpe import BpeByteLevel

            data = tj.read_bytes()
            try:                      # only bake what the engine can parse
                BpeByteLevel.from_json_bytes(data)
            except ValueError as e:
                if self.verbose:
                    print(f"  tokenizer.json not baked: {e}")
            else:
                self.config["tokenizer_bpe_json_zb64"] = \
                    BpeByteLevel.json_to_zb64(data)

    def _sd(self, key):
        sd = self.state_dict
        for pre in ("", "model.", "language_model.model.", "backbone."):
            if pre + key in sd:
                return sd[pre + key]
        raise KeyError(key)

    def _has(self, key):
        try:
            self._sd(key)
            return True
        except KeyError:
            return False

    def write_metadata(self, writer) -> None:
        cfg = self.config
        emb = self._sd("embed_tokens.weight")
        hidden = int(cfg.get("hidden_size", emb.shape[1]))
        n_heads = int(cfg["num_attention_heads"])
        n_kv = int(cfg.get("num_key_value_heads", n_heads))
        qw = self._sd("layers.0.self_attn.q_proj.weight")
        head_dim = int(cfg.get("head_dim") or qw.shape[0] // n_heads)
        n_layers = 0
        while self._has(f"layers.{n_layers}.self_attn.q_proj.weight"):
            n_layers += 1
        self._dims = (hidden, n_layers, n_heads, n_kv, head_dim)

        writer.add_int32("backbone.hidden_dim", hidden)
        writer.add_int32("backbone.n_layers", n_layers)
        writer.add_int32("backbone.n_heads", n_heads)
        writer.add_int32("backbone.n_kv_heads", n_kv)
        writer.add_int32("backbone.head_dim", head_dim)
        if self._has("layers.0.mlp.gate_proj.weight"):
            ffn_dim = int(cfg.get(
                "intermediate_size",
                self._sd("layers.0.mlp.gate_proj.weight").shape[0]))
        else:                         # MoE: dense ffn_dim is unused
            ffn_dim = int(cfg.get("intermediate_size", 0))
        writer.add_int32("backbone.ffn_dim", ffn_dim)
        writer.add_int32("backbone.vocab_size",
                         int(cfg.get("vocab_size", emb.shape[0])))
        writer.add_float32("backbone.rope_theta",
                           float(cfg.get("rope_theta", 10000.0)))
        writer.add_float32("backbone.rms_eps",
                           float(cfg.get("rms_norm_eps", 1e-5)))
        writer.add_int32("backbone.max_ctx",
                         int(self.config.get("backbone_max_ctx",
                             min(4096, int(cfg.get("max_position_embeddings",
                                                   4096))))))
        # MoE (Qwen3-MoE-style): per-layer router + expert SwiGLUs. Mixed
        # dense/sparse stacks (decoder_sparse_step > 1 / mlp_only_layers)
        # are not supported — every layer must be MoE.
        self._moe = self._has("layers.0.mlp.experts.0.gate_proj.weight")
        if self._moe:
            n_experts = 0
            while self._has(f"layers.0.mlp.experts.{n_experts}."
                            f"gate_proj.weight"):
                n_experts += 1
            for i in range(n_layers):
                if not self._has(f"layers.{i}.mlp.experts.0.gate_proj.weight"):
                    raise ValueError(
                        f"MoE backbone: layer {i} has no experts (mixed "
                        f"dense/sparse stacks are not supported)")
            writer.add_int32("backbone.n_experts",
                             int(cfg.get("num_experts", n_experts)))
            writer.add_int32("backbone.n_experts_used",
                             int(cfg.get("num_experts_per_tok", 2)))
            writer.add_bool("backbone.norm_topk_prob",
                            bool(cfg.get("norm_topk_prob", True)))
            writer.add_int32(
                "backbone.moe_ffn_dim",
                int(cfg.get("moe_intermediate_size",
                            self._sd("layers.0.mlp.experts.0."
                                     "gate_proj.weight").shape[0])))
            self._n_experts = n_experts
        writer.add_bool("backbone.qk_norm",
                        self._has("layers.0.self_attn.q_norm.weight"))
        writer.add_bool("backbone.attn_bias",
                        self._has("layers.0.self_attn.q_proj.bias"))
        if cfg.get("tokenizer_spm_b64"):
            writer.add_string("backbone.tokenizer.spm_b64",
                              cfg["tokenizer_spm_b64"])
        if cfg.get("tokenizer_bpe_json_zb64"):
            writer.add_string("backbone.tokenizer.bpe_json_zb64",
                              cfg["tokenizer_bpe_json_zb64"])
        tied = not ("lm_head.weight" in self.state_dict and not
                    np.shares_memory(self.state_dict["lm_head.weight"], emb)
                    and not np.array_equal(self.state_dict["lm_head.weight"],
                                           emb))
        writer.add_bool("backbone.tied_lm_head", tied)
        self._tied = tied

    def write_tensors(self, writer) -> None:
        _, n_layers, _, _, head_dim = self._dims
        cfg = self.config
        self.add_tensor(writer, "backbone.tok_embd",
                        self._sd("embed_tokens.weight"))
        self.add_tensor(writer, "backbone.out_norm.w", self._sd("norm.weight"))
        if not self._tied:
            self.add_tensor(writer, "backbone.lm_head.w",
                            self.state_dict["lm_head.weight"])
        scaling = cfg.get("rope_scaling") or {}
        if scaling.get("rope_type", scaling.get("type")) == "llama3":
            writer.add_tensor("backbone.rope_freq_factors",
                              llama3_freq_factors(
                                  head_dim, float(cfg.get("rope_theta", 1e4)),
                                  scaling))
        for i in range(n_layers):
            src = f"layers.{i}.self_attn."
            dst = f"backbone.l{i}."
            self.add_tensor(writer, dst + "attn_norm.w",
                            self._sd(f"layers.{i}.input_layernorm.weight"))
            for a, b in (("q", "q_proj"), ("k", "k_proj"), ("v", "v_proj"),
                         ("o", "o_proj")):
                self.add_tensor(writer, dst + a + ".w",
                                self._sd(src + b + ".weight"))
                if a != "o" and self._has(src + b + ".bias"):
                    self.add_tensor(writer, dst + a + ".b",
                                    self._sd(src + b + ".bias"))
            if self._has(src + "q_norm.weight"):
                self.add_tensor(writer, dst + "q_norm.w",
                                self._sd(src + "q_norm.weight"))
                self.add_tensor(writer, dst + "k_norm.w",
                                self._sd(src + "k_norm.weight"))
            self.add_tensor(writer, dst + "ffn_norm.w",
                            self._sd(f"layers.{i}.post_attention_layernorm.weight"))
            if getattr(self, "_moe", False):
                self.add_tensor(writer, dst + "router.w",
                                self._sd(f"layers.{i}.mlp.gate.weight"))
                for a, b in (("gate_exps", "gate_proj"), ("up_exps", "up_proj"),
                             ("down_exps", "down_proj")):
                    stacked = np.stack(
                        [np.asarray(self._sd(f"layers.{i}.mlp.experts.{e}."
                                             f"{b}.weight"))
                         for e in range(self._n_experts)])
                    self.add_tensor(writer, dst + a + ".w", stacked)
            else:
                for a, b in (("gate", "gate_proj"), ("up", "up_proj"),
                             ("down", "down_proj")):
                    self.add_tensor(writer, dst + a + ".w",
                                    self._sd(f"layers.{i}.mlp.{b}.weight"))
