"""residual_depth_ar (Type C) — c0 from a linear head off the backbone
hidden; c1..c_{N-1} from a small Llama-style depth transformer run over the
growing prefix [h_in, embd(c0), embd(c1), ...].

Reference: src/lm/residual_depth_ar.cpp. Variants handled by flags:
  - shared in_proj (CSM / Qwen3-TTS): prefix rows in hidden_dim space,
    one 2D in_proj (or identity) applied to every row.
  - per-pos in_proj (Moshi / LFM2-Audio): prefix rows already in
    depth_hidden space; position p adds in_proj[p] @ h_in (+ bias[p]);
    pos 0 is text_embd[text_token] (Moshi) or zero (LFM2).
  - depth_emits_c0: all N codebooks come from the depth decoder (no c0_head).
  - heads: per-cb 2D `lm.depth.heads_{i}` or one 3D `lm.depth.heads` sliced
    per position (Moshi "flexible"); optional per-head pre-norm (LFM2).
  - optional qk-norm (Qwen3), RoPE NEOX/NORMAL or none (Moshi), llama3
    freq factors.

TPU design: the reference re-runs the depth prefix per position with a
per-step rebuilt ggml graph (or an incremental KV path); depth prefixes are
tiny (T <= n_codebook), so here each (T, head_idx) is one jitted
full-prefix function — jit's cache replaces the graph cache, weights stay
device-resident, and there is no per-step host graph work at all.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..io.gguf import GGUFReader
from ..ops import attn, norms, rope
from ..ops.sample import (apply_repetition_penalty, mask_outside_range,
                          sample_logits, sample_logits_dyn,
                          seen_mask_from_ring)
from .base import CodecLM, LmError, LmInfo, LmState, read_common_info, register_kind


def _per_pos_linear(w: jax.Array, x: jax.Array) -> jax.Array:
    """w: [out, in] shared or [N, out, in] per-pos; x: [T, in] → [T, out]."""
    if w.ndim == 2:
        return x @ w.T
    return jnp.einsum("ti,toi->to", x, w[: x.shape[0]])


@register_kind("residual_depth_ar")
class ResidualDepthArLM(CodecLM):
    def _load(self, r: GGUFReader) -> LmInfo:
        info = read_common_info(r, "residual_depth_ar")
        g = lambda n: r.get(n)
        gopt = lambda n: r.get_or_none(n)

        self.depth_layers = r.get_i32("codec.lm.residual.depth_layers", 0)
        self.depth_hidden = r.get_i32("codec.lm.residual.depth_hidden", 0)
        self.n_heads = r.get_i32("codec.lm.residual.depth_n_heads", 0)
        self.n_kv_heads = r.get_i32("codec.lm.residual.depth_n_kv_heads", 0)
        self.head_dim = r.get_i32("codec.lm.residual.depth_head_dim", 0)
        self.rope_theta = r.get_f32("codec.lm.residual.depth_rope_theta", 10000.0)
        self.rms_eps = r.get_f32("codec.lm.residual.depth_rms_norm_eps", 1e-5)
        self.has_in_proj = r.get_bool("codec.lm.residual.depth_has_in_proj", False)
        self.has_qk_norm = r.get_bool("codec.lm.residual.depth_has_qk_norm", False)
        self.has_output_norm = r.get_bool("codec.lm.residual.depth_has_output_norm", True)
        self.use_rope = r.get_bool("codec.lm.residual.depth_use_rope", True)
        self.in_proj_per_pos = r.get_bool("codec.lm.residual.depth_in_proj_per_pos", False)
        self.has_pre_head_norm = r.get_bool("codec.lm.residual.depth_has_pre_head_norm", False)
        self.depth_emits_c0 = r.get_bool("codec.lm.residual.depth_emits_c0", False)
        self.rope_interleaved = r.get_bool("codec.lm.residual.depth_rope_interleaved", False)
        modality = r.get_str("codec.lm.residual.c0_input_modality", "audio")
        self.c0_is_text = modality == "text"
        self.c0_is_none = modality == "none"
        if self.c0_is_text or self.c0_is_none:
            self.depth_emits_c0 = True

        # N tables: audio_embds[i] embeds c_i (prefix pos i+1 uses table i;
        # compose sums all N). The last table may be absent for models whose
        # compose path is external (Moshi).
        self.audio_embds: List[Optional[jnp.ndarray]] = []
        for i in range(info.n_codebook):
            t = gopt(f"lm.depth.audio_embd_{i}.weight")
            if t is None:
                t = gopt(f"lm.audio_embd_{i}.weight")
            self.audio_embds.append(jnp.asarray(t) if t is not None else None)
        self.text_embd = (jnp.asarray(g("lm.depth.text_embd.weight"))
                          if self.c0_is_text else None)

        self.c0_head = (jnp.asarray(g("lm.c0_head.weight"))
                        if not self.depth_emits_c0 else None)
        flex = gopt("lm.depth.heads.weight")
        self.flex_heads = jnp.asarray(flex) if flex is not None else None  # [N, V, H]
        self.depth_heads: List[jnp.ndarray] = []
        self.heads_pre_norm: List[Optional[jnp.ndarray]] = []
        n_depth_heads = info.n_codebook if self.depth_emits_c0 else info.n_codebook - 1
        if self.flex_heads is None:
            for i in range(max(0, n_depth_heads)):
                self.depth_heads.append(jnp.asarray(g(f"lm.depth.heads_{i}.weight")))
                pn = gopt(f"lm.depth.heads_{i}_norm.weight")
                self.heads_pre_norm.append(jnp.asarray(pn) if pn is not None else None)
        self.in_proj = (jnp.asarray(g("lm.depth.in_proj.weight"))
                        if self.has_in_proj or self.in_proj_per_pos else None)
        if self.in_proj is not None and self.in_proj.ndim == 3:
            # reference infers per-pos from in_proj->ne[2] > 1 at init
            self.in_proj_per_pos = True
        ipb = gopt("lm.depth.in_proj.bias")
        self.in_proj_bias = jnp.asarray(ipb) if ipb is not None else None
        self.output_norm = (jnp.asarray(g("lm.depth.output_norm.weight"))
                            if self.has_output_norm else None)
        ff = gopt("lm.depth.rope_freq_factors")
        self.freq_factors = np.asarray(ff) if ff is not None else None

        self.layers: List[Dict[str, Any]] = []
        for l in range(self.depth_layers):
            p = f"lm.depth.blk_{l}"
            lw = {k: jnp.asarray(g(f"{p}.{n}.weight")) for k, n in (
                ("attn_norm", "attn_norm"), ("q", "q"), ("k", "k"), ("v", "v"),
                ("o", "o"), ("ffn_norm", "ffn_norm"), ("gate", "ffn_gate"),
                ("up", "ffn_up"), ("down", "ffn_down"))}
            if self.has_qk_norm:
                lw["q_norm"] = jnp.asarray(g(f"{p}.q_norm.weight"))
                lw["k_norm"] = jnp.asarray(g(f"{p}.k_norm.weight"))
            self.layers.append(lw)

        # Qwen3-TTS talker helpers (optional)
        self.tp_text_embd = gopt("lm.text_embd.weight")
        self.tp_fc1_w = gopt("lm.text_projection.fc1.weight")
        self.tp_fc1_b = gopt("lm.text_projection.fc1.bias")
        self.tp_fc2_w = gopt("lm.text_projection.fc2.weight")
        self.tp_fc2_b = gopt("lm.text_projection.fc2.bias")

        # LFM2 backbone-side compose table (optional)
        ct = gopt("lm.compose.audio_embd.weight")
        self.compose_table = jnp.asarray(ct) if ct is not None else None
        self.compose_stride = r.get_i32(
            "codec.lm.compose.codebook_stride",
            r.get_i32("codec.lm.residual.compose_codebook_stride", 0))

        from ..runtime.jit_weights import jit_weighted
        self._c0_fn = (jit_weighted(self, lambda h: self.c0_head @ h,
                                    ("c0_head",))
                       if self.c0_head is not None else None)
        self._depth_cache: Dict[Tuple[int, int], Any] = {}
        self._fused_cache: Dict[Tuple, Any] = {}
        self._fused_consts_cache = None
        return info

    # -- depth forward -----------------------------------------------------
    def _depth_trunk(self, prefix: jax.Array, h_in: jax.Array) -> jax.Array:
        """prefix [T, row_dim], h_in [hidden] → hidden rows [T, depth_hidden]
        after the output norm. Causal attention means row k depends only on
        rows 0..k, so callers may pass a fixed-size buffer whose tail rows
        are not yet filled (the fused frame path relies on this)."""
        t = prefix.shape[0]
        if not self.in_proj_per_pos:
            x = _per_pos_linear(self.in_proj, prefix) if self.in_proj is not None else prefix
            if self.in_proj is not None and self.in_proj_bias is not None:
                x = x + self.in_proj_bias
        else:
            x = prefix
            if self.in_proj is not None:
                proj = jnp.einsum("i,toi->to", h_in, self.in_proj[:t])
                if self.in_proj_bias is not None:
                    b = self.in_proj_bias
                    proj = proj + (b[:t] if b.ndim == 2 else b)
                x = x + proj

        positions = jnp.arange(t)
        freq = None
        if self.use_rope and self.freq_factors is not None:
            freq = jnp.asarray(self.freq_factors)

        def rope_fn(z):                                   # z: [1, H, T, D]
            if not self.use_rope:
                return z
            if freq is not None:
                inv = rope.rope_freqs(self.head_dim, self.rope_theta) / freq
                ang = positions.astype(jnp.float32)[:, None] * inv[None]
                cos, sin = jnp.cos(ang)[None, None], jnp.sin(ang)[None, None]
                d = self.head_dim
                if self.rope_interleaved:
                    ze, zo = z[..., 0::2], z[..., 1::2]
                    return jnp.stack([ze * cos - zo * sin, ze * sin + zo * cos],
                                     axis=-1).reshape(z.shape)
                z1, z2 = z[..., : d // 2], z[..., d // 2:]
                return jnp.concatenate([z1 * cos - z2 * sin, z1 * sin + z2 * cos], -1)
            return rope.apply_rope(z, positions=positions, theta=self.rope_theta,
                                   neox=not self.rope_interleaved)

        xb = x[None]                                      # [1, T, H]
        for lw in self.layers:
            h = norms.rms_norm(xb, lw["attn_norm"], self.rms_eps)
            q = _per_pos_linear(lw["q"], h[0])[None]
            k = _per_pos_linear(lw["k"], h[0])[None]
            v = _per_pos_linear(lw["v"], h[0])[None]
            b, tt = 1, t
            q = q.reshape(b, tt, self.n_heads, self.head_dim).transpose(0, 2, 1, 3)
            k = k.reshape(b, tt, self.n_kv_heads, self.head_dim).transpose(0, 2, 1, 3)
            v = v.reshape(b, tt, self.n_kv_heads, self.head_dim).transpose(0, 2, 1, 3)
            if self.has_qk_norm:
                q = norms.rms_norm(q, lw["q_norm"], self.rms_eps)
                k = norms.rms_norm(k, lw["k_norm"], self.rms_eps)
            q, k = rope_fn(q), rope_fn(k)
            if self.n_kv_heads != self.n_heads:
                rep = self.n_heads // self.n_kv_heads
                k = jnp.repeat(k, rep, axis=1)
                v = jnp.repeat(v, rep, axis=1)
            m = attn.attn_mask(tt, tt, causal=True)
            ctx = attn.sdpa(q, k, v, mask=m)
            ctx = ctx.transpose(0, 2, 1, 3).reshape(b, tt, self.n_heads * self.head_dim)
            xb = xb + _per_pos_linear(lw["o"], ctx[0])[None]
            m2 = norms.rms_norm(xb, lw["ffn_norm"], self.rms_eps)
            gate = jax.nn.silu(_per_pos_linear(lw["gate"], m2[0]))
            up = _per_pos_linear(lw["up"], m2[0])
            xb = xb + _per_pos_linear(lw["down"], gate * up)[None]

        x = xb[0]
        if self.output_norm is not None:
            x = norms.rms_norm(x, self.output_norm, self.rms_eps)
        return x

    def _depth_forward(self, prefix: jax.Array, h_in: jax.Array,
                       head_idx: int) -> jax.Array:
        """prefix [T, row_dim], h_in [hidden] → logits [V_head]
        (reference: rda_build_depth_step)."""
        x = self._depth_trunk(prefix, h_in)
        last = x[prefix.shape[0] - 1]
        if self.has_pre_head_norm and self.heads_pre_norm[head_idx] is not None:
            last = norms.rms_norm(last, self.heads_pre_norm[head_idx], self.rms_eps)
        head = (self.flex_heads[head_idx] if self.flex_heads is not None
                else self.depth_heads[head_idx])
        return head @ last

    def _depth_jit(self, t: int, head_idx: int):
        key = (t, head_idx)
        fn = self._depth_cache.get(key)
        if fn is None:
            from ..runtime.jit_weights import array_attrs, jit_weighted
            fn = jit_weighted(self,
                              lambda p, h: self._depth_forward(p, h, head_idx),
                              array_attrs(self))
            self._depth_cache[key] = fn
        return fn

    # -- fused on-device frame ----------------------------------------------
    def _fused_consts(self):
        """Per-codebook heads/pre-norms/embed tables stacked (vocab-padded)
        so a lax.scan can index them with a traced codebook index."""
        c = self._fused_consts_cache
        if c is not None:
            return c
        info = self.info
        n = info.n_codebook
        off = 0 if self.depth_emits_c0 else 1
        n_dh = n - off
        if self.flex_heads is not None:
            heads = self.flex_heads                          # [n_dh, V, DH]
        elif self.depth_heads:
            vmax = max(int(w.shape[0]) for w in self.depth_heads)
            heads = jnp.stack([jnp.pad(w, ((0, vmax - w.shape[0]), (0, 0)))
                               for w in self.depth_heads])
        else:
            heads = None
        sizes = jnp.asarray(info.codebook_sizes[off:], jnp.int32) if n_dh else None
        pre_w = pre_m = None
        if self.has_pre_head_norm and self.heads_pre_norm:
            pre_w = jnp.stack(
                [w if w is not None else jnp.ones((self.depth_hidden,), jnp.float32)
                 for w in self.heads_pre_norm])
            pre_m = jnp.asarray([w is not None for w in self.heads_pre_norm])
        # embed tables consumed inside the scan: code for cb i (i in
        # [off, n-2]) is embedded into prefix row i+1 for the next step
        tabs = [self.audio_embds[i] for i in range(off, n - 1)]
        if any(t is None for t in tabs):
            raise LmError("fused frame: missing depth audio_embd table")
        tabs_s = None
        if tabs:
            rmax = max(int(t.shape[0]) for t in tabs)
            tabs_s = jnp.stack([jnp.pad(t, ((0, rmax - t.shape[0]), (0, 0)))
                                for t in tabs])
        c = (n, off, n_dh, heads, sizes, pre_w, pre_m, tabs_s)
        self._fused_consts_cache = c
        return c

    def fused_frame(self, *, temperature: float = 0.0, top_k: int = 0,
                    top_p: float = 1.0, min_p: float = 0.0, cb0_range=None):
        """One whole frame as a single compiled graph: c0 head + lax.scan
        over the depth codebooks with on-device sampling.

        Returns a jitted fn(h [hidden] f32, key, text_ctx int32) →
        codes [n_codebook] int32. The host step machine (step_begin/
        step_logits/step_push_code) computes identical logits (the scan runs
        the same full-prefix depth trunk over a fixed buffer; causal masking
        makes unfilled tail rows inert) — it remains the parity/custom-
        sampler API, this is the TPU fast path (one device round-trip per
        frame instead of 2·n_codebook).

        Reference contrast: src/lm/residual_depth_ar.cpp re-enters the host
        per codebook for sampling; here sampling (temperature/top_k/min_p/
        top_p chain, ops/sample.py) runs in-graph.
        """
        chain = (float(temperature), int(top_k), float(top_p), float(min_p))
        key = (chain, cb0_range)
        fn = self._fused_cache.get(key)
        if fn is not None:
            return fn
        from ..runtime.jit_weights import array_attrs, jit_weighted
        fn = jit_weighted(self, self._build_frame(chain, cb0_range=cb0_range),
                          array_attrs(self))
        self._fused_cache[key] = fn
        return fn

    def fused_frame_batched(self, *, temperature: float = 0.0, top_k: int = 0,
                            top_p: float = 1.0, min_p: float = 0.0):
        """Multi-stream variant of fused_frame: vmap over B independent
        streams in ONE graph — fn(h [B, hidden], keys [B] PRNG keys,
        text_ctx [B] int32) → codes [B, n_codebook] int32.

        With the batch arrays device_put against a `dp` mesh sharding, the
        jit follows the input sharding and the whole frame runs data-
        parallel over ICI with zero collectives (each stream is
        independent) — the multi-chip serving shape for AR codec LMs
        (reference contrast: src/lm/residual_depth_ar.cpp is strictly
        single-stream per context)."""
        chain = (float(temperature), int(top_k), float(top_p), float(min_p))
        key = ("batched",) + chain
        fn = self._fused_cache.get(key)
        if fn is not None:
            return fn
        frame = self._build_frame(chain)
        from ..runtime.jit_weights import array_attrs, jit_weighted
        fn = jit_weighted(self, jax.vmap(frame), array_attrs(self))
        self._fused_cache[key] = fn
        return fn

    def _build_frame(self, chain, rep=None, cb0_range=None):
        """The un-jitted single-stream frame fn for the given sampler chain
        (shared by fused_frame and fused_frame_batched).

        `cb0_range=(start, end, *extra)` masks the c0 head's logits to the
        RangeConstraint set in-graph (lm/tts_runner.py:508).

        `rep=(penalty, window)` builds the repetition-penalized variant for
        the realtime-streaming chunk (lm/fused_gen.py): the returned fn is
        frame(h, key, text_ctx, hist) → (codes, hist'), where hist is a
        per-codebook history ring [n_cb, window] int32 (window > 0, empty
        slots −1, plus a slot pointer) or a persistent seen-mask
        [n_cb, V] bool (window < 0). Penalty hits raw logits before the
        temperature chain and is skipped entirely at temperature <= 0 —
        both matching the host SamplerChain (lm/tts_runner.py:126-138);
        history still advances so greedy and sampled runs carry the same
        state shape.

        `chain=None` builds the TRACED-chain variant: the returned fn is
        frame(h, key, text_ctx, chain_vec) with chain_vec the f32[4]
        `[temperature, top_k, top_p, min_p]` row (`sample_logits_dyn`) —
        per-slot sampling parameters in the batched generation chunk."""
        n, off, n_dh, heads, sizes, pre_w, pre_m, tabs_s = self._fused_consts()
        info = self.info
        row_dim = info.audio_embed_dim

        if rep is not None:
            return self._build_frame_rp(chain, rep)

        if chain is None:
            def sample(lg, key, cv):
                return sample_logits_dyn(lg, key, cv)
        else:
            def sample(lg, key, cv):
                return sample_logits(lg, key, temperature=chain[0],
                                     top_k=chain[1], top_p=chain[2],
                                     min_p=chain[3])

        def frame_core(h, key, text_ctx, cv):
            # re-read the stacked tables from the attribute so jit_weighted
            # can swap traced leaves in (weights ride as jit ARGUMENTS — a
            # CSM-1B frame otherwise bakes GBs of constants into the MLIR)
            _, _, _, heads, sizes, pre_w, pre_m, tabs_s = \
                self._fused_consts_cache
            keys = jax.random.split(key, n)
            buf = jnp.zeros((n, row_dim), jnp.float32)
            codes = jnp.zeros((n,), jnp.int32)
            if not self.in_proj_per_pos:
                buf = buf.at[0, : info.hidden_dim].set(h)
            elif self.c0_is_text:
                buf = buf.at[0].set(self.text_embd[text_ctx])
            # c0_is_none: row 0 stays zero
            if not self.depth_emits_c0:
                lg0 = self.c0_head @ h
                if cb0_range is not None:
                    lg0 = mask_outside_range(lg0, cb0_range[0], cb0_range[1],
                                             cb0_range[2:])
                c0 = sample(lg0, keys[0], cv)
                codes = codes.at[0].set(c0)
                if n > 1:
                    buf = buf.at[1].set(self.audio_embds[0][c0])
            if n_dh == 0:
                return codes

            def body(carry, i):
                buf = carry
                x = self._depth_trunk(buf, h)            # [n, depth_hidden]
                row = x[i + off]
                if pre_w is not None:
                    row = jnp.where(pre_m[i],
                                    norms.rms_norm(row, pre_w[i], self.rms_eps),
                                    row)
                lg = heads[i] @ row
                lg = jnp.where(jnp.arange(lg.shape[0]) < sizes[i], lg, -jnp.inf)
                c = sample(lg, keys[i + off], cv)
                if tabs_s is not None:
                    emb = tabs_s[jnp.minimum(i, tabs_s.shape[0] - 1)][c]
                    nxt = jax.lax.dynamic_update_slice(buf, emb[None],
                                                       (i + off + 1, 0))
                    buf = jnp.where(i < n_dh - 1, nxt, buf)
                return buf, c
            _, depth_codes = jax.lax.scan(body, buf, jnp.arange(n_dh))
            return codes.at[off:].set(depth_codes) if off else depth_codes

        if chain is None:
            return frame_core
        return lambda h, key, text_ctx: frame_core(h, key, text_ctx, None)

    def _build_frame_rp(self, chain, rep):
        """Repetition-penalized frame variant (contract in _build_frame)."""
        n, off, n_dh, _, _, _, _, _ = self._fused_consts()
        info = self.info
        row_dim = info.audio_embed_dim
        pen, window = float(rep[0]), int(rep[1])
        vmax = max(info.codebook_sizes)
        use_pen = chain[0] > 0.0 and pen != 1.0 and window != 0

        def sample(lg, key, seen_row):
            if use_pen:
                lg = apply_repetition_penalty(lg, seen_row[: lg.shape[0]], pen)
            return sample_logits(lg, key, temperature=chain[0], top_k=chain[1],
                                 top_p=chain[2], min_p=chain[3])

        def frame(h, key, text_ctx, hist):
            _, _, _, heads, sizes, pre_w, pre_m, tabs_s = \
                self._fused_consts_cache
            if window > 0:
                rings, ptr = hist
                seen = jax.vmap(
                    lambda r: seen_mask_from_ring(r, vmax))(rings) \
                    if use_pen else None
            else:
                seen = hist if use_pen else None
            keys = jax.random.split(key, n)
            buf = jnp.zeros((n, row_dim), jnp.float32)
            codes = jnp.zeros((n,), jnp.int32)
            if not self.in_proj_per_pos:
                buf = buf.at[0, : info.hidden_dim].set(h)
            elif self.c0_is_text:
                buf = buf.at[0].set(self.text_embd[text_ctx])
            if not self.depth_emits_c0:
                c0 = sample(self.c0_head @ h, keys[0],
                            None if seen is None else seen[0])
                codes = codes.at[0].set(c0)
                if n > 1:
                    buf = buf.at[1].set(self.audio_embds[0][c0])
            if n_dh:
                def body(carry, i):
                    buf = carry
                    x = self._depth_trunk(buf, h)
                    row = x[i + off]
                    if pre_w is not None:
                        row = jnp.where(
                            pre_m[i],
                            norms.rms_norm(row, pre_w[i], self.rms_eps), row)
                    lg = heads[i] @ row
                    lg = jnp.where(jnp.arange(lg.shape[0]) < sizes[i],
                                   lg, -jnp.inf)
                    c = sample(lg, keys[i + off],
                               None if seen is None else seen[i + off])
                    if tabs_s is not None:
                        emb = tabs_s[jnp.minimum(i, tabs_s.shape[0] - 1)][c]
                        nxt = jax.lax.dynamic_update_slice(buf, emb[None],
                                                           (i + off + 1, 0))
                        buf = jnp.where(i < n_dh - 1, nxt, buf)
                    return buf, c

                _, depth_codes = jax.lax.scan(body, buf, jnp.arange(n_dh))
                codes = codes.at[off:].set(depth_codes) if off else depth_codes
            # history advances even when the penalty is inert (greedy /
            # penalty 1.0): the carried state keeps one shape per window
            if window > 0:
                rings = rings.at[:, ptr % window].set(codes)
                hist = (rings, ptr + 1)
            else:
                hist = hist.at[jnp.arange(n), codes].set(True)
            return codes, hist

        return frame

    # -- step machine hooks ------------------------------------------------
    def _begin(self, state: LmState, h: np.ndarray) -> None:
        state.kind_state["h"] = h
        state.kind_state["codes"] = []

    def _logits(self, state: LmState, k: int) -> np.ndarray:
        h = state.kind_state["h"]
        if k == 0 and not self.depth_emits_c0:
            return np.asarray(self._c0_fn(jnp.asarray(h)))
        t = k + 1
        row_dim = self.info.audio_embed_dim
        prefix = np.zeros((t, row_dim), np.float32)
        if not self.in_proj_per_pos:
            prefix[0, : self.info.hidden_dim] = h
        elif self.c0_is_text:
            if state.text_context is None:
                raise LmError("c0_input_modality=text: call set_text_context first")
            prefix[0] = np.asarray(self.text_embd[state.text_context])
        # c0_is_none: pos 0 stays zero
        codes = state.kind_state["codes"]
        for p in range(1, t):
            prefix[p] = np.asarray(self.audio_embds[p - 1][codes[p - 1]])
        head_idx = k if self.depth_emits_c0 else k - 1
        fn = self._depth_jit(t, head_idx)
        return np.asarray(fn(jnp.asarray(prefix), jnp.asarray(h)))

    def _pushed(self, state: LmState, k: int, code: int) -> None:
        state.kind_state["codes"].append(code)

    # -- embeddings --------------------------------------------------------
    def audio_embd(self, cb_idx: int, code: int) -> np.ndarray:
        embd = self.audio_embds[cb_idx]
        if not (0 <= code < embd.shape[0]):
            raise LmError(f"code {code} out of range")
        return np.asarray(embd[code])

    def compose_audio_embd(self, codes: Sequence[int]) -> np.ndarray:
        # ONE eager device gather+fetch per call, not one per codebook:
        # the tables are device arrays, and a per-codebook `np.asarray(
        # table[idx])` loop costs n_codebook serialized relay round trips
        # per composed frame (~35 ms/op floor, docs/PERF.md) — measured as
        # the round-4 serving collapse (BENCH_r04: 823 ms/frame; every
        # host-loop frame paid 32 round trips here).
        codes = list(codes)
        if self.compose_table is not None:
            idx = [c + i * self.compose_stride
                   for i, c in enumerate(codes) if c >= 0]
            if not idx:
                return np.zeros((self.info.compose_audio_embed_dim,),
                                np.float32)
            rows = np.asarray(jnp.take(self.compose_table,
                                       jnp.asarray(idx, jnp.int32), axis=0),
                              np.float32)
            return rows.sum(axis=0)
        out = np.zeros((self.info.audio_embed_dim,), np.float32)
        gathered = [np.asarray(self.audio_embds[i][c])
                    for i, c in enumerate(codes)
                    if c >= 0 and i < len(self.audio_embds)
                    and self.audio_embds[i] is not None]
        for g in gathered:
            out += g
        return out

    def compose_embd_fn(self):
        """Traceable analog of compose_audio_embd for the fused generation
        chunk (lm/fused_gen.py): codes [n_codebook] int32 → composed
        feedback embedding. Sampled codes are always in-range, so the host
        path's c>=0 pad guard is unnecessary here. Attributes are read
        inside the traced body so jit_weighted can swap argument leaves in."""
        if self.compose_table is not None:
            stride = int(self.compose_stride)

            def compose(codes):
                offs = jnp.arange(codes.shape[0], dtype=codes.dtype) * stride
                return self.compose_table[codes + offs].sum(0)

            return compose

        live = [i for i, t in enumerate(self.audio_embds) if t is not None]
        if not live:
            raise LmError("compose_embd_fn: no audio embedding tables")

        def compose(codes):
            acc = self.audio_embds[live[0]][codes[live[0]]]
            for i in live[1:]:
                acc = acc + self.audio_embds[i][codes[i]]
            return acc

        return compose

    # -- Qwen3-TTS talker helpers -----------------------------------------
    def text_proj_dim(self) -> int:
        return int(self.tp_fc2_w.shape[0]) if self.tp_fc2_w is not None else 0

    def project_text(self, text_token: int) -> np.ndarray:
        """fc2(silu(fc1(text_embd[token]))) (reference: codec_lm_project_text)."""
        if self.tp_text_embd is None:
            raise LmError("model has no text projection")
        x = np.asarray(self.tp_text_embd[text_token], np.float32)
        h = np.asarray(self.tp_fc1_w, np.float32) @ x + np.asarray(self.tp_fc1_b, np.float32)
        h = h * (1.0 / (1.0 + np.exp(-h)))                # silu
        return np.asarray(self.tp_fc2_w, np.float32) @ h + np.asarray(self.tp_fc2_b, np.float32)

    def codec_embd_row(self, code: int) -> np.ndarray:
        return self.audio_embd(0, code)
