"""flow_lm (Pocket-TTS) — self-contained continuous-latent AR model.

Reference: src/lm/flow_lm.cpp. The AR transformer, text LUT, LSD flow head
(SimpleMLPAdaLN) and EOS head all live in the codec GGUF; no external
backbone. Sequence = [text LUT embeds | optional BOS | voice rows |
AR latent embeds]. Each step: one transformer token over the KV cache →
EOS logit + LSD-decoded 32-d latent (unrolled Euler), fed back as the next
input. Latents are denormalized by lm.emb_std/emb_mean before Pocket-Mimi
decode.

TPU design: the KV cache is a pair of [L, max_T, H, D] device arrays
carried in the state and updated functionally (donated) by ONE jitted step
function; kv_pos is a traced scalar, so there is no per-bucket recompile at
all (the reference re-builds a ggml graph per 64-slot bucket).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..io.gguf import GGUFReader
from ..ops import act, norms
from .base import CodecLM, LmError, LmInfo, LmState, register_kind
from .spm import SpmUnigram


@register_kind("flow_lm")
class FlowLM(CodecLM):
    max_T = 2048

    def _load(self, r: GGUFReader) -> LmInfo:
        g = lambda n: jnp.asarray(r.get(n))
        gopt = lambda n: (jnp.asarray(r.get_or_none(n))
                          if r.has_tensor(n) else None)

        self.d_model = r.get_i32("codec.lm.d_model", 1024)
        self.n_layers = r.get_i32("codec.lm.n_layers", 6)
        self.n_heads = r.get_i32("codec.lm.n_heads", 16)
        self.head_dim = r.get_i32("codec.lm.head_dim", self.d_model // max(1, self.n_heads))
        self.ldim = r.get_i32("codec.lm.ldim", 32)
        self.flow_dim = r.get_i32("codec.lm.flow_dim", 512)
        self.flow_depth = r.get_i32("codec.lm.flow_depth", 6)
        self.insert_bos_before_voice = r.get_bool("codec.lm.insert_bos_before_voice", False)
        self.lsd_steps = max(1, r.get_i32("codec.lm.lsd_decode_steps", 1))
        self.frames_after_eos = r.get_i32("codec.lm.frames_after_eos", -1)
        self.max_period = r.get_f32("codec.lm.max_period", 10000.0)
        self.temperature = r.get_f32("codec.lm.temperature", 0.7)
        self.eos_threshold = r.get_f32("codec.lm.eos_threshold", -4.0)
        self.ln_eps = 1e-5
        self.flow_ln_eps = 1e-6
        self.flow_rms_eps = 1e-5

        self.w: Dict[str, Any] = {}
        self.w["text_embed"] = g("lm.text.embed.w")           # [n_bins+1, d_model]
        self.w["bos_before_voice"] = gopt("lm.bos_before_voice")
        self.w["bos_emb"] = g("lm.bos_emb")                   # [ldim]
        self.w["input_linear"] = g("lm.input_linear.w")       # [d_model, ldim]
        self.w["out_norm_w"] = g("lm.out_norm.w")
        self.w["out_norm_b"] = g("lm.out_norm.b")
        self.w["out_eos_w"] = g("lm.out_eos.w")               # [1, d_model]
        self.w["out_eos_b"] = g("lm.out_eos.b")
        self.w["emb_std"] = gopt("lm.emb_std")
        self.w["emb_mean"] = gopt("lm.emb_mean")
        self.w["speaker_proj"] = gopt("lm.speaker_proj.w")    # [d_model, ldim]
        self.w["layers"] = []
        for l in range(self.n_layers):
            p = f"lm.tf.l{l}"
            self.w["layers"].append({k: g(f"{p}.{s}") for k, s in (
                ("inln_w", "inln.w"), ("inln_b", "inln.b"),
                ("paln_w", "paln.w"), ("paln_b", "paln.b"),
                ("q", "attn.q_proj.w"), ("k", "attn.k_proj.w"),
                ("v", "attn.v_proj.w"), ("o", "attn.o_proj.w"),
                ("fc1", "mlp.fc1.w"), ("fc2", "mlp.fc2.w"))})
        fw: Dict[str, Any] = {
            "in_w": g("lm.flow.input_proj.w"), "in_b": g("lm.flow.input_proj.b"),
            "cond_w": g("lm.flow.cond_embed.w"), "cond_b": g("lm.flow.cond_embed.b"),
            "final_adaln_w": g("lm.flow.final.adaln.w"),
            "final_adaln_b": g("lm.flow.final.adaln.b"),
            "final_w": g("lm.flow.final.linear.w"), "final_b": g("lm.flow.final.linear.b"),
            "time": [], "res": [],
        }
        for i in range(2):
            p = f"lm.flow.time_embed.{i}"
            fw["time"].append({
                "freqs": g(p + ".freqs"),
                "l1_w": g(p + ".l1.w"), "l1_b": g(p + ".l1.b"),
                "l2_w": g(p + ".l2.w"), "l2_b": g(p + ".l2.b"),
                "rms": g(p + ".rms.alpha"),
            })
        for b in range(self.flow_depth):
            p = f"lm.flow.res.{b}"
            fw["res"].append({
                "adaln_w": g(p + ".adaln.w"), "adaln_b": g(p + ".adaln.b"),
                "ln_w": g(p + ".in_ln.w"), "ln_b": g(p + ".in_ln.b"),
                "l1_w": g(p + ".mlp.l1.w"), "l1_b": g(p + ".mlp.l1.b"),
                "l2_w": g(p + ".mlp.l2.w"), "l2_b": g(p + ".mlp.l2.b"),
            })
        self.w["flow"] = fw

        b64 = r.get_str("codec.lm.tokenizer.spm_b64", "")
        self.spm: Optional[SpmUnigram] = SpmUnigram.from_b64(b64) if b64 else None

        # Host-side copies of the weights read OUTSIDE jit (prefill embed
        # assembly, latent denorm, speaker proj). Reading self.w from a
        # server thread races with jit_weighted tracing — which swaps
        # tracers into self.w — and np.asarray(tracer) raises; snapshot
        # once at load (also saves a device→host transfer per call).
        self._host = {k: (np.asarray(self.w[k]) if self.w[k] is not None
                          else None)
                      for k in ("text_embed", "bos_before_voice", "emb_std",
                                "emb_mean", "speaker_proj")}

        from ..runtime.jit_weights import jit_weighted
        self._step_jit = jit_weighted(self, self._step_fn, ("w",),
                                      donate_argnums=(0, 1))
        self._run_cache: Dict[int, Any] = {}
        self._prefill_cache: Dict[Tuple[int, int], Any] = {}

        return LmInfo(kind="flow_lm", hidden_dim=self.d_model,
                      is_continuous=True, latent_dim=self.ldim, patch_size=1)

    # -- transformer core --------------------------------------------------
    def _rope(self, x, pos):
        """x [H, T, D] NORMAL interleaved rope at positions pos [T]."""
        d = self.head_dim
        inv = self.max_period ** (-jnp.arange(0, d, 2) / d)
        ang = pos.astype(jnp.float32)[:, None] * inv[None]
        cos, sin = jnp.cos(ang)[None], jnp.sin(ang)[None]
        xe, xo = x[..., 0::2], x[..., 1::2]
        return jnp.stack([xe * cos - xo * sin, xe * sin + xo * cos],
                         axis=-1).reshape(x.shape)

    def _layer_step(self, x, lw, kc, vc, kv_pos, pos):
        """One incremental token. x [d_model]; kc/vc [max_T, H, D]."""
        h = norms.layer_norm(x, lw["inln_w"], lw["inln_b"], self.ln_eps)
        q = (lw["q"] @ h).reshape(self.n_heads, 1, self.head_dim)
        k = (lw["k"] @ h).reshape(self.n_heads, 1, self.head_dim)
        v = (lw["v"] @ h).reshape(self.n_heads, 1, self.head_dim)
        q = self._rope(q, pos)
        k = self._rope(k, pos)
        kc = jax.lax.dynamic_update_slice(kc, k.transpose(1, 0, 2), (kv_pos, 0, 0))
        vc = jax.lax.dynamic_update_slice(vc, v.transpose(1, 0, 2), (kv_pos, 0, 0))
        keys = kc.transpose(1, 0, 2)                       # [H, max_T, D]
        vals = vc.transpose(1, 0, 2)
        logits = jnp.einsum("hqd,hkd->hqk", q, keys,
                            preferred_element_type=jnp.float32) / (self.head_dim ** 0.5)
        mask = jnp.where(jnp.arange(self.max_T)[None, None] <= kv_pos, 0.0, -1e30)
        wts = jax.nn.softmax(logits + mask, axis=-1)
        ctx = jnp.einsum("hqk,hkd->hqd", wts, vals).reshape(-1)
        x = x + lw["o"] @ ctx
        f = norms.layer_norm(x, lw["paln_w"], lw["paln_b"], self.ln_eps)
        f = lw["fc2"] @ act.gelu_tanh(lw["fc1"] @ f)
        return x + f, kc, vc

    def _time_embed(self, tw, sval):
        args = tw["freqs"] * sval
        emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)])
        h = jax.nn.silu(tw["l1_w"] @ emb + tw["l1_b"])
        h = tw["l2_w"] @ h + tw["l2_b"]
        # unbiased (ddof=1) RMS norm around the mean
        d = h.shape[0]
        mu = h.mean()
        var = jnp.sum((h - mu) ** 2) / (d - 1)
        return h / jnp.sqrt(var + self.flow_rms_eps) * tw["rms"]

    def _flow_net(self, cond, sval, tval, x):
        fw = self.w["flow"]
        xh = fw["in_w"] @ x + fw["in_b"]
        t_comb = 0.5 * (self._time_embed(fw["time"][0], sval) +
                        self._time_embed(fw["time"][1], tval))
        y = t_comb + fw["cond_w"] @ cond + fw["cond_b"]
        sy = jax.nn.silu(y)
        fd = self.flow_dim
        for rb in fw["res"]:
            mod = rb["adaln_w"] @ sy + rb["adaln_b"]
            shift, scale, gate = mod[:fd], mod[fd:2 * fd], mod[2 * fd:]
            hn = norms.layer_norm(xh, rb["ln_w"], rb["ln_b"], self.flow_ln_eps)
            hn = hn * (1.0 + scale) + shift
            hn = rb["l2_w"] @ jax.nn.silu(rb["l1_w"] @ hn + rb["l1_b"]) + rb["l2_b"]
            xh = xh + gate * hn
        fmod = fw["final_adaln_w"] @ sy + fw["final_adaln_b"]
        fshift, fscale = fmod[:fd], fmod[fd:]
        mu = xh.mean()
        var = ((xh - mu) ** 2).mean()
        xf = (xh - mu) * jax.lax.rsqrt(var + self.flow_ln_eps)
        xf = xf * (1.0 + fscale) + fshift
        return fw["final_w"] @ xf + fw["final_b"]

    def _step_fn(self, kcs, vcs, prev_latent, is_bos, kv_pos, noise):
        """One AR frame (reference: build_step). kcs/vcs: [L, max_T, H, D].
        → (kcs, vcs, packed [ldim+1]) with packed = [latent ; eos_logit] so
        the host reads ONE array per step (each readback is a relay RTT)."""
        seq = jnp.where(is_bos, self.w["bos_emb"], prev_latent)
        x = self.w["input_linear"] @ seq
        pos = kv_pos[None]
        new_k, new_v = [], []
        for l, lw in enumerate(self.w["layers"]):
            x, kc, vc = self._layer_step(x, lw, kcs[l], vcs[l], kv_pos, pos)
            new_k.append(kc)
            new_v.append(vc)
        c = norms.layer_norm(x, self.w["out_norm_w"], self.w["out_norm_b"], self.ln_eps)
        eos = (self.w["out_eos_w"] @ c + self.w["out_eos_b"])[0]
        cur = noise
        n = self.lsd_steps
        for i in range(n):
            d = self._flow_net(c, i / n, (i + 1) / n, cur)
            cur = cur + d / n
        packed = jnp.concatenate([cur, eos[None]])
        return jnp.stack(new_k), jnp.stack(new_v), packed

    def _run_fn(self, kcs, vcs, prev_latent, frame0, kv_pos0, noises):
        """K AR frames in ONE compiled graph (lax.scan over _step_fn),
        feeding each frame's latent back on-device. noises [K, ldim].
        → (kcs, vcs, packed [K, ldim+1]). One dispatch + one readback per
        K frames amortizes the relay's per-call cost (tts_ar VERDICT #5)."""
        def body(carry, noise):
            kcs, vcs, prev, frame, kv_pos = carry
            kcs, vcs, packed = self._step_fn(
                kcs, vcs, prev, frame == 0, kv_pos, noise)
            return ((kcs, vcs, packed[: self.ldim], frame + 1, kv_pos + 1),
                    packed)
        (kcs, vcs, _, _, _), packed = jax.lax.scan(
            body, (kcs, vcs, prev_latent, frame0, kv_pos0), noises)
        return kcs, vcs, packed

    def _prefill_fn(self, kcs, vcs, seq):
        """Fill the KV cache with the prefix (reference: build_prefill).
        seq: [T, d_model] already-assembled prefix embeddings."""
        t = seq.shape[0]
        pos = jnp.arange(t)
        new_k, new_v = [], []
        x = seq.T                                          # [d_model, T]
        for lw in self.w["layers"]:
            h = norms.layer_norm(x.T, lw["inln_w"], lw["inln_b"], self.ln_eps).T
            q = (lw["q"] @ h).reshape(self.n_heads, self.head_dim, t).transpose(0, 2, 1)
            k = (lw["k"] @ h).reshape(self.n_heads, self.head_dim, t).transpose(0, 2, 1)
            v = (lw["v"] @ h).reshape(self.n_heads, self.head_dim, t).transpose(0, 2, 1)
            # NB reshape above must split (H*D, T) as [H, D, T]
            q = self._rope(q, pos)
            k = self._rope(k, pos)
            logits = jnp.einsum("hqd,hkd->hqk", q, k,
                                preferred_element_type=jnp.float32) / (self.head_dim ** 0.5)
            cmask = jnp.where(jnp.arange(t)[None, :] <= jnp.arange(t)[:, None], 0.0, -1e30)
            wts = jax.nn.softmax(logits + cmask, axis=-1)
            ctx = jnp.einsum("hqk,hkd->hqd", wts, v)
            ctx = ctx.transpose(1, 0, 2).reshape(t, -1)    # [T, H*D]
            x = x + lw["o"] @ ctx.T
            f = norms.layer_norm(x.T, lw["paln_w"], lw["paln_b"], self.ln_eps).T
            x = x + lw["fc2"] @ act.gelu_tanh(lw["fc1"] @ f)
            new_k.append(k.transpose(1, 0, 2))             # [T, H, D]
            new_v.append(v.transpose(1, 0, 2))
        kcs = jax.vmap(lambda c, n_: jax.lax.dynamic_update_slice(c, n_, (0, 0, 0)))(
            kcs, jnp.stack(new_k))
        vcs = jax.vmap(lambda c, n_: jax.lax.dynamic_update_slice(c, n_, (0, 0, 0)))(
            vcs, jnp.stack(new_v))
        return kcs, vcs

    # -- public API (mirrors codec_lm_flow_*) ------------------------------
    def new_state(self) -> LmState:
        st = LmState(self)
        self._init_kv(st)
        return st

    def _init_kv(self, st: LmState) -> None:
        shape = (self.n_layers, self.max_T, self.n_heads, self.head_dim)
        st.kind_state["k"] = jnp.zeros(shape, jnp.float32)
        st.kind_state["v"] = jnp.zeros(shape, jnp.float32)
        st.kind_state["kv_pos"] = 0
        st.kind_state["frame"] = 0
        st.kind_state["rng"] = np.random.default_rng(0)

    def flow_reset(self, st: LmState) -> None:
        st.reset()
        self._init_kv(st)

    def tokenize(self, text: str):
        if self.spm is None:
            raise LmError("no SentencePiece tokenizer baked in")
        return self.spm.encode(text)

    def speaker_rows(self, mu: np.ndarray) -> np.ndarray:
        """mu [T, ldim] → voice rows [T, d_model] (F.linear, no bias)."""
        if self._host["speaker_proj"] is None:
            raise LmError("model has no speaker_proj (no voice cloning)")
        return np.asarray(mu, np.float32) @ self._host["speaker_proj"].T

    def denorm_latent(self, latent: np.ndarray) -> np.ndarray:
        return np.asarray(latent) * self._host["emb_std"] + \
            self._host["emb_mean"]

    def flow_prefill(self, st: LmState, token_ids, voice_rows=None) -> None:
        token_ids = np.asarray(token_ids, np.int32)
        parts = [self._host["text_embed"][token_ids]]
        if self.insert_bos_before_voice and voice_rows is not None and len(voice_rows):
            parts.append(self._host["bos_before_voice"][None])
        if voice_rows is not None and len(voice_rows):
            parts.append(np.asarray(voice_rows, np.float32))
        seq = np.concatenate(parts, axis=0)
        t = seq.shape[0]
        if t > self.max_T:
            raise LmError(f"prefix length {t} exceeds KV capacity {self.max_T}")
        key = t
        fn = self._prefill_cache.get(key)
        if fn is None:
            from ..runtime.jit_weights import jit_weighted
            fn = jit_weighted(self, self._prefill_fn, ("w",),
                              donate_argnums=(0, 1))
            self._prefill_cache[key] = fn
        st.kind_state["k"], st.kind_state["v"] = fn(
            st.kind_state["k"], st.kind_state["v"], jnp.asarray(seq))
        st.kind_state["kv_pos"] = t
        st.kind_state["frame"] = 0

    def flow_step(self, st: LmState, prev_latent=None, noise=None):
        """→ (latent [ldim], eos_logit, is_eos). First frame consumes BOS."""
        ks = st.kind_state
        if ks["kv_pos"] >= self.max_T:
            raise LmError("KV cache full")
        is_bos = ks["frame"] == 0
        if noise is None:
            noise = ks["rng"].normal(0.0, np.sqrt(self.temperature),
                                     self.ldim).astype(np.float32)
        prev = (np.zeros(self.ldim, np.float32) if prev_latent is None
                else np.asarray(prev_latent, np.float32))
        k, v, packed = self._step_jit(
            ks["k"], ks["v"], jnp.asarray(prev), jnp.asarray(is_bos),
            jnp.asarray(ks["kv_pos"], jnp.int32), jnp.asarray(noise))
        ks["k"], ks["v"] = k, v
        ks["kv_pos"] += 1
        ks["frame"] += 1
        packed = np.asarray(packed)                  # one readback
        eos_logit = float(packed[self.ldim])
        return packed[: self.ldim], eos_logit, eos_logit > self.eos_threshold

    def flow_run(self, st: LmState, noises, prev_latent=None):
        """Run `len(noises)` AR frames in ONE device call (lax.scan with
        on-device latent feedback) — bit-identical frame semantics to
        repeated flow_step, but a single dispatch + single readback.
        noises [K, ldim] → (latents [K, ldim], eos_logits [K]) np arrays.
        The state advances K frames; callers that stop at EOS mid-chunk
        simply discard the tail (causal AR: later frames never affect
        earlier ones)."""
        ks = st.kind_state
        noises = np.asarray(noises, np.float32).reshape(-1, self.ldim)
        k_frames = noises.shape[0]
        if ks["kv_pos"] + k_frames > self.max_T:
            raise LmError("KV cache full")
        prev = (np.zeros(self.ldim, np.float32) if prev_latent is None
                else np.asarray(prev_latent, np.float32))
        fn = self._run_cache.get(k_frames)
        if fn is None:
            from ..runtime.jit_weights import jit_weighted
            fn = jit_weighted(self, self._run_fn, ("w",),
                              donate_argnums=(0, 1))
            self._run_cache[k_frames] = fn
        k, v, packed = fn(
            ks["k"], ks["v"], jnp.asarray(prev),
            jnp.asarray(ks["frame"], jnp.int32),
            jnp.asarray(ks["kv_pos"], jnp.int32), jnp.asarray(noises))
        ks["k"], ks["v"] = k, v
        ks["kv_pos"] += k_frames
        ks["frame"] += k_frames
        packed = np.asarray(packed)                  # one readback
        return packed[:, : self.ldim], packed[:, self.ldim]
