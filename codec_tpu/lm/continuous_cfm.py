"""continuous_latent_cfm (VoxCPM / BlueMagpie) — whole-generation-step adaptor.

Reference: src/lm/bluemagpie_cfm.cpp + src/models/bluemagpie_blocks.cpp.
Per AR step, entirely on-device:

  h_in → tslm_adapter → FSQ → lm_hidden
  RALM(causal, KV) over fusion([lm_hidden ; prev_feedback_lm]) → residual_hidden
  mu = [lm_to_dit(lm_hidden) ; res_to_dit(residual_hidden)]
  patch = LocDiT CFM Euler (sway schedule, zero-init skip, CFG-zero-star)
  stop  = stop_head(lm_hidden) (argmax of 2 logits, min_len guard)
  LocEnc(patch) → feedback (enc_to_tslm for the backbone, enc_to_lm for RALM)

TPU design: the RALM KV cache is a functional [L, max_T, n_kv, D] array pair
carried in the state (kv_pos traced — no per-bucket recompiles); the CFM
Euler loop is unrolled in one jitted function keyed on
(n_real, primed, cfg_one). Teacher-forcing and deterministic-noise hooks
match the reference parity-test surface (codec_lm_set_teacher_patch).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..io.gguf import GGUFReader
from ..ops import norms
from .base import CodecLM, LmError, LmInfo, LmState, register_kind


def sway_schedule(n: int):
    """(t_real, dt, n_real) — sway-warped t-span with 4% zero-init skip
    (reference: step_generate, bluemagpie_cfm.cpp)."""
    ts = 1.0 - np.arange(n + 1) / n
    tspan = ts + 1.0 * (np.cos(np.pi / 2 * ts) - 1.0 + ts)
    zero_init = max(1, int((n + 1) * 0.04))
    t_real, dts = [], []
    t = tspan[0]
    dt = tspan[0] - tspan[1]
    for step in range(1, n + 1):
        if step > zero_init:
            t_real.append(t)
            dts.append(dt)
        t -= dt
        if step < n:
            dt = t - tspan[step + 1]
    return np.asarray(t_real), np.asarray(dts)


def sinusoidal(val: float, dim: int) -> np.ndarray:
    half = dim // 2
    step = np.log(10000.0) / (half - 1)
    e = 1000.0 * val * np.exp(np.arange(half) * -step)
    return np.concatenate([np.sin(e), np.cos(e)]).astype(np.float32)


@register_kind("continuous_latent_cfm")
class ContinuousLatentCfmLM(CodecLM):
    max_T = 2048

    def _load(self, r: GGUFReader) -> LmInfo:
        g = lambda n: jnp.asarray(r.get(n))
        gopt = lambda n: (jnp.asarray(r.get_or_none(n)) if r.has_tensor(n) else None)

        self.h_barbet = r.get_i32("codec.lm.hidden_dim", 1024)
        self.h_vox = r.get_i32("codec.lm.h_vox", 2048)
        self.h_enc = r.get_i32("codec.lm.h_enc", 1024)
        self.h_dit = r.get_i32("codec.lm.h_dit", 1024)
        self.latent_dim = r.get_i32("codec.lm.latent_dim", 64)
        self.patch_size = r.get_i32("codec.lm.patch_size", 4)
        self.n_mu = 2
        self.n_locenc = r.get_i32("codec.lm.n_locenc", 12)
        self.n_locdit = r.get_i32("codec.lm.n_locdit", 12)
        self.n_ralm = r.get_i32("codec.lm.n_ralm", 8)
        self.n_heads = r.get_i32("codec.lm.n_heads", 16)
        self.n_kv = r.get_i32("codec.lm.n_kv", 2)
        self.head_dim = r.get_i32("codec.lm.head_dim", 128)
        self.fsq_scale = r.get_i32("codec.lm.fsq_scale", 9)
        self.min_len = r.get_i32("codec.lm.min_len", 2)
        self.eps = r.get_f32("codec.lm.rms_eps", 1e-5)

        w: Dict[str, Any] = {}

        def lin(prefix):
            return {"w": g(prefix + ".w"), "b": gopt(prefix + ".b")}

        w["tslm_norm"] = g("lm.tslm_adapter.norm.w")
        w["tslm_proj"] = lin("lm.tslm_adapter.proj")
        w["tslm_blk_ln"] = g("lm.tslm_adapter.blk0.ln.w")
        w["tslm_gate"] = g("lm.tslm_adapter.blk0.gate.w")
        w["tslm_up"] = g("lm.tslm_adapter.blk0.up.w")
        w["tslm_down"] = g("lm.tslm_adapter.blk0.down.w")
        w["fsq_in"] = lin("lm.fsq.in_proj")
        w["fsq_out"] = lin("lm.fsq.out_proj")
        w["fusion"] = lin("lm.proj.fusion_concat")
        w["lm_to_dit"] = lin("lm.proj.lm_to_dit")
        w["res_to_dit"] = lin("lm.proj.res_to_dit")
        w["enc_to_tslm"] = lin("lm.proj.enc_to_tslm")
        w["enc_to_lm"] = lin("lm.proj.enc_to_lm")
        w["stop_proj"] = lin("lm.stop.proj")
        w["stop_head"] = {"w": g("lm.stop.head.w"), "b": None}
        w["ralm_norm"] = g("lm.ralm.norm.w")
        w["locdit_norm"] = g("lm.locdit.norm.w")
        w["locdit_in"] = lin("lm.locdit.in_proj")
        w["locdit_cond"] = lin("lm.locdit.cond_proj")
        w["locdit_out"] = lin("lm.locdit.out_proj")
        w["locenc_in"] = lin("lm.locenc.in_proj")
        w["locenc_sp"] = g("lm.locenc.special_token")
        w["locenc_norm"] = g("lm.locenc.norm.w")
        w["rope_cos"] = g("lm.rope.cos")           # [max_pos, head_dim]
        w["rope_sin"] = g("lm.rope.sin")
        for mlp in ("time_mlp", "dtime_mlp"):
            w[mlp] = {"l1": lin(f"lm.locdit.{mlp}.l1"), "l2": lin(f"lm.locdit.{mlp}.l2")}

        def block(prefix):
            blk = {"ln1": g(prefix + ".ln1.w"), "ln2": g(prefix + ".ln2.w"),
                   "o": g(prefix + ".attn_o.w"), "down": g(prefix + ".down.w")}
            qkv = gopt(prefix + ".attn_qkv.w")
            if qkv is not None:
                blk["qkv"] = qkv
            else:
                blk["q"] = g(prefix + ".attn_q.w")
                blk["k"] = g(prefix + ".attn_k.w")
                blk["v"] = g(prefix + ".attn_v.w")
            gu = gopt(prefix + ".gate_up.w")
            if gu is not None:
                blk["gate_up"] = gu
            else:
                blk["gate"] = g(prefix + ".gate.w")
                blk["up"] = g(prefix + ".up.w")
            return blk

        w["ralm"] = [block(f"lm.ralm.layers.{i}") for i in range(self.n_ralm)]
        w["locdit"] = [block(f"lm.locdit.layers.{i}") for i in range(self.n_locdit)]
        w["locenc"] = [block(f"lm.locenc.layers.{i}") for i in range(self.n_locenc)]
        self.w = w

        self._step_cache: Dict[Tuple, Any] = {}
        self._prefill_cache: Dict[int, Any] = {}
        self._sched_cache: Dict[int, Tuple] = {}   # device tsin/dtsin/dts

        return LmInfo(kind="continuous_latent_cfm", hidden_dim=self.h_barbet,
                      is_continuous=True, patch_size=self.patch_size,
                      latent_dim=self.latent_dim)

    # -- primitives --------------------------------------------------------
    def _lin(self, p, x):
        y = jnp.einsum("oi,i...->o...", p["w"], x) if x.ndim > 1 else p["w"] @ x
        if p["b"] is not None:
            y = y + (p["b"][:, None] if x.ndim > 1 else p["b"])
        return y

    def _qkv(self, blk, h):
        """h [T, hidden] → q [H, T, D], k/v [n_kv, T, D]."""
        t = h.shape[0]
        qd = self.n_heads * self.head_dim
        kd = self.n_kv * self.head_dim
        if "qkv" in blk:
            qkv = h @ blk["qkv"].T
            q, k, v = qkv[:, :qd], qkv[:, qd:qd + kd], qkv[:, qd + kd:]
        else:
            q, k, v = h @ blk["q"].T, h @ blk["k"].T, h @ blk["v"].T
        q = q.reshape(t, self.n_heads, self.head_dim).transpose(1, 0, 2)
        k = k.reshape(t, self.n_kv, self.head_dim).transpose(1, 0, 2)
        v = v.reshape(t, self.n_kv, self.head_dim).transpose(1, 0, 2)
        return q, k, v

    def _mlp(self, blk, h):
        if "gate_up" in blk:
            gu = h @ blk["gate_up"].T
            half = gu.shape[-1] // 2
            m = jax.nn.silu(gu[..., :half]) * gu[..., half:]
        else:
            m = jax.nn.silu(h @ blk["gate"].T) * (h @ blk["up"].T)
        return m @ blk["down"].T

    def _rope_ht(self, x, pos):
        """x [heads, T, D]; baked cos/sin table rope (rotate-half)."""
        cos = self.w["rope_cos"][pos][None]              # [1, T, D]
        sin = self.w["rope_sin"][pos][None]
        d = self.head_dim
        x1, x2 = x[..., : d // 2], x[..., d // 2:]
        xr = jnp.concatenate([-x2, x1], axis=-1)
        return x * cos + xr * sin

    def _minicpm(self, x, blk, causal, use_rope):
        """x [T, hidden] non-KV full block (LocDiT / LocEnc / prefill RALM)."""
        t = x.shape[0]
        h = norms.rms_norm(x, blk["ln1"], self.eps)
        q, k, v = self._qkv(blk, h)
        if use_rope:
            pos = jnp.arange(t)
            q = self._rope_ht(q, pos)
            k = self._rope_ht(k, pos)
        rep = self.n_heads // self.n_kv
        k = jnp.repeat(k, rep, axis=0)
        v = jnp.repeat(v, rep, axis=0)
        logits = jnp.einsum("hqd,hkd->hqk", q, k,
                            preferred_element_type=jnp.float32) / (self.head_dim ** 0.5)
        if causal:
            cm = jnp.where(jnp.arange(t)[None, :] <= jnp.arange(t)[:, None], 0.0, -1e30)
            logits = logits + cm
        wts = jax.nn.softmax(logits, axis=-1)
        ctx = jnp.einsum("hqk,hkd->hqd", wts, v).transpose(1, 0, 2).reshape(t, -1)
        x = x + ctx @ blk["o"].T
        h = norms.rms_norm(x, blk["ln2"], self.eps)
        return x + self._mlp(blk, h)

    def _ralm_step(self, x, blk, kc, vc, kv_pos):
        """One incremental RALM token (causal, no rope). x [hidden];
        kc/vc [max_T, n_kv, D]."""
        h = norms.rms_norm(x[None], blk["ln1"], self.eps)
        q, k, v = self._qkv(blk, h)                      # q [H,1,D], k/v [n_kv,1,D]
        kc = jax.lax.dynamic_update_slice(kc, k.transpose(1, 0, 2), (kv_pos, 0, 0))
        vc = jax.lax.dynamic_update_slice(vc, v.transpose(1, 0, 2), (kv_pos, 0, 0))
        rep = self.n_heads // self.n_kv
        keys = jnp.repeat(kc.transpose(1, 0, 2), rep, axis=0)   # [H, max_T, D]
        vals = jnp.repeat(vc.transpose(1, 0, 2), rep, axis=0)
        logits = jnp.einsum("hqd,hkd->hqk", q, keys,
                            preferred_element_type=jnp.float32) / (self.head_dim ** 0.5)
        mask = jnp.where(jnp.arange(self.max_T)[None, None] <= kv_pos, 0.0, -1e30)
        wts = jax.nn.softmax(logits + mask, axis=-1)
        ctx = jnp.einsum("hqk,hkd->hqd", wts, vals).reshape(-1)
        x = x + blk["o"] @ ctx
        h = norms.rms_norm(x[None], blk["ln2"], self.eps)
        return x + self._mlp(blk, h)[0], kc, vc

    def _tslm_adapter(self, h):
        a = norms.rms_norm(h[None], self.w["tslm_norm"], self.eps)[0]
        a = self._lin(self.w["tslm_proj"], a)
        bn = norms.rms_norm(a[None], self.w["tslm_blk_ln"], self.eps)[0]
        m = jax.nn.silu(self.w["tslm_gate"] @ bn) * (self.w["tslm_up"] @ bn)
        return a + self.w["tslm_down"] @ m

    def _fsq(self, a):
        q = jnp.tanh(self._lin(self.w["fsq_in"], a))
        q = jnp.round(q * self.fsq_scale) / self.fsq_scale
        return self._lin(self.w["fsq_out"], q)

    def _time_mlp(self, name, s_emb):
        h = jax.nn.silu(self._lin(self.w[name]["l1"], s_emb))
        return self._lin(self.w[name]["l2"], h)

    def _locdit(self, x_h, cond_h, mu_h, t_h):
        """x_h/cond_h [P, h_dit], mu_h [n_mu, h_dit], t_h [h_dit] → vel [P, D]."""
        seq = jnp.concatenate([mu_h, t_h[None], cond_h, x_h], axis=0)
        for blk in self.w["locdit"]:
            seq = self._minicpm(seq, blk, causal=False, use_rope=True)
        seq = norms.rms_norm(seq, self.w["locdit_norm"], self.eps)
        start = self.n_mu + 1 + self.patch_size
        xt = seq[start:start + self.patch_size]
        return xt @ self.w["locdit_out"]["w"].T + self.w["locdit_out"]["b"]

    def _locenc_feedback(self, patch):
        """patch [P, D] → (fb_tslm [h_barbet], fb_lm [h_vox])."""
        le = patch @ self.w["locenc_in"]["w"].T + self.w["locenc_in"]["b"]
        le = jnp.concatenate([self.w["locenc_sp"][None], le], axis=0)
        for blk in self.w["locenc"]:
            le = self._minicpm(le, blk, causal=False, use_rope=True)
        le = norms.rms_norm(le, self.w["locenc_norm"], self.eps)
        cls = le[0]
        return (self._lin(self.w["enc_to_tslm"], cls),
                self._lin(self.w["enc_to_lm"], cls))

    # -- step function -----------------------------------------------------
    def _step_fn(self, kcs, vcs, h_in, pfb_lm, prim_lm, prim_res, cond, z,
                 tsin, dtsin, dts, kv_pos, primed, cfg_value, le_src_override,
                 use_override):
        if primed:
            lm_hidden = prim_lm
            residual_hidden = prim_res
            new_kcs, new_vcs = kcs, vcs
        else:
            a = self._tslm_adapter(h_in)
            lm_hidden = self._fsq(a)
            fus = jnp.concatenate([lm_hidden, pfb_lm])
            x = self._lin(self.w["fusion"], fus)
            nk, nv = [], []
            for l, blk in enumerate(self.w["ralm"]):
                x, kc, vc = self._ralm_step(x, blk, kcs[l], vcs[l], kv_pos)
                nk.append(kc)
                nv.append(vc)
            new_kcs, new_vcs = jnp.stack(nk), jnp.stack(nv)
            residual_hidden = norms.rms_norm(x[None], self.w["ralm_norm"], self.eps)[0]

        mu1 = self._lin(self.w["lm_to_dit"], lm_hidden)
        mu2 = self._lin(self.w["res_to_dit"], residual_hidden)
        mu = jnp.stack([mu1, mu2])                       # [2, h_dit]
        mu_zero = jnp.zeros_like(mu)
        cond_h = cond @ self.w["locdit_cond"]["w"].T + self.w["locdit_cond"]["b"]
        dt_emb = self._time_mlp("dtime_mlp", dtsin)

        x = z
        n_real = tsin.shape[0]
        for s in range(n_real):
            x_h = x @ self.w["locdit_in"]["w"].T + self.w["locdit_in"]["b"]
            t_h = self._time_mlp("time_mlp", tsin[s]) + dt_emb
            pos = self._locdit(x_h, cond_h, mu, t_h)
            neg = self._locdit(x_h, cond_h, mu_zero, t_h)
            dot = jnp.sum(pos * neg)
            nn = jnp.sum(neg * neg) + 1e-8
            st = dot / nn
            neg_st = neg * st
            dphi = neg_st + cfg_value * (pos - neg_st)
            x = x - dphi * dts[s]

        sp = jax.nn.silu(self._lin(self.w["stop_proj"], lm_hidden))
        stop_logits = self.w["stop_head"]["w"] @ sp      # [2]

        le_src = jnp.where(use_override, le_src_override, x)
        fb_tslm, fb_lm = self._locenc_feedback(le_src)
        # host-visible outputs in ONE array (each readback is a relay RTT):
        # [patch.ravel() ; stop_logits ; fb_tslm]. x and fb_lm are also
        # returned as device arrays — they feed the NEXT step without ever
        # leaving the device.
        packed = jnp.concatenate([x.ravel(), stop_logits, fb_tslm])
        return new_kcs, new_vcs, x, fb_lm, packed

    # -- state / public API ------------------------------------------------
    def new_state(self) -> LmState:
        st = LmState(self)
        self._init_state(st)
        return st

    def _init_state(self, st: LmState) -> None:
        # prev_patch / prev_fb_lm / prefill_* are DEVICE arrays: they are
        # produced by one jitted step and consumed by the next, so they
        # never round-trip through the host (VERDICT #5: fewer RTTs/frame).
        shape = (self.n_ralm, self.max_T, self.n_kv, self.head_dim)
        st.kind_state.update(
            k=jnp.zeros(shape, jnp.float32), v=jnp.zeros(shape, jnp.float32),
            kv_pos=0, patch_index=0, primed=False,
            prev_patch=jnp.zeros((self.patch_size, self.latent_dim), jnp.float32),
            prev_fb_lm=jnp.zeros(self.h_vox, jnp.float32),
            fb_tslm=np.zeros(self.h_barbet, np.float32),
            prefill_lm=jnp.zeros(self.h_vox, jnp.float32),
            prefill_res=jnp.zeros(self.h_vox, jnp.float32),
            teacher=None, min_len=-1,
            rng=np.random.default_rng(0))

    def set_min_len(self, st: LmState, min_len: int) -> None:
        st.kind_state["min_len"] = int(min_len)

    def set_teacher_patch(self, st: LmState, patch: np.ndarray) -> None:
        st.kind_state["teacher"] = np.asarray(patch, np.float32).reshape(
            self.patch_size, self.latent_dim)

    def text_prefill(self, st: LmState, hiddens: np.ndarray) -> None:
        """hiddens [T, h_barbet]: prime the RALM over the prompt prefix
        (reference: codec_lm_text_prefill → build_prefill)."""
        hiddens = np.asarray(hiddens, np.float32)
        t = hiddens.shape[0]
        fn = self._prefill_cache.get(t)
        if fn is None:
            def prefill(kcs, vcs, hs):
                lm_h = jax.vmap(self._tslm_adapter)(hs)            # [T, h_vox]
                fus = jnp.concatenate([lm_h, jnp.zeros_like(lm_h)], axis=-1)
                x = fus @ self.w["fusion"]["w"].T + self.w["fusion"]["b"]
                nk, nv = [], []
                for blk in self.w["ralm"]:
                    h = norms.rms_norm(x, blk["ln1"], self.eps)
                    q, k, v = self._qkv(blk, h)
                    rep = self.n_heads // self.n_kv
                    kr = jnp.repeat(k, rep, axis=0)
                    vr = jnp.repeat(v, rep, axis=0)
                    logits = jnp.einsum("hqd,hkd->hqk", q, kr,
                                        preferred_element_type=jnp.float32) / (self.head_dim ** 0.5)
                    cm = jnp.where(jnp.arange(x.shape[0])[None, :] <= jnp.arange(x.shape[0])[:, None],
                                   0.0, -1e30)
                    wts = jax.nn.softmax(logits + cm, axis=-1)
                    ctx = jnp.einsum("hqk,hkd->hqd", wts, vr).transpose(1, 0, 2).reshape(x.shape[0], -1)
                    x = x + ctx @ blk["o"].T
                    h2 = norms.rms_norm(x, blk["ln2"], self.eps)
                    x = x + self._mlp(blk, h2)
                    nk.append(k.transpose(1, 0, 2))
                    nv.append(v.transpose(1, 0, 2))
                kcs = jax.vmap(lambda c, n_: jax.lax.dynamic_update_slice(c, n_, (0, 0, 0)))(
                    kcs, jnp.stack(nk))
                vcs = jax.vmap(lambda c, n_: jax.lax.dynamic_update_slice(c, n_, (0, 0, 0)))(
                    vcs, jnp.stack(nv))
                res = norms.rms_norm(x, self.w["ralm_norm"], self.eps)
                return kcs, vcs, lm_h[-1], res[-1]
            from ..runtime.jit_weights import jit_weighted
            fn = jit_weighted(self, prefill, ("w",), donate_argnums=(0, 1))
            self._prefill_cache[t] = fn
        ks = st.kind_state
        ks["k"], ks["v"], ks["prefill_lm"], ks["prefill_res"] = fn(
            ks["k"], ks["v"], jnp.asarray(hiddens))   # stay on device
        ks["kv_pos"] = t
        ks["primed"] = True

    def step_generate(self, st: LmState, h_in, cfg_value: float = 2.0,
                      n_timesteps: int = 10, noise=None):
        """→ (patch [P, D], stop, feedback [h_barbet])
        (reference: codec_lm_step_generate)."""
        ks = st.kind_state
        if ks["kv_pos"] >= self.max_T:
            raise LmError("RALM KV cache full")
        sched = self._sched_cache.get(n_timesteps)
        if sched is None:
            t_real, dts = sway_schedule(n_timesteps)
            sched = (jnp.asarray(np.stack([sinusoidal(t, self.h_dit)
                                           for t in t_real])),
                     jnp.asarray(sinusoidal(0.0, self.h_dit)),
                     jnp.asarray(dts.astype(np.float32)))
            self._sched_cache[n_timesteps] = sched
        tsin, dtsin, dts = sched
        n_real = tsin.shape[0]
        if noise is None:
            noise = ks["rng"].standard_normal(
                (self.patch_size, self.latent_dim)).astype(np.float32)
        noise = np.asarray(noise, np.float32).reshape(self.patch_size, self.latent_dim)

        primed = ks["primed"]
        teacher = ks["teacher"]
        key = (n_real, bool(primed))
        fn = self._step_cache.get(key)
        if fn is None:
            from ..runtime.jit_weights import jit_weighted
            fn = jit_weighted(self, self._step_fn, ("w",),
                              static_argnums=(12,), donate_argnums=(0, 1))
            self._step_cache[key] = fn
        le_override = teacher if teacher is not None else np.zeros_like(noise)
        k, v, patch_dev, fb_lm, packed = fn(
            ks["k"], ks["v"], jnp.asarray(np.asarray(h_in, np.float32)),
            ks["prev_fb_lm"], ks["prefill_lm"],
            ks["prefill_res"], jnp.asarray(ks["prev_patch"]),
            jnp.asarray(noise), tsin, dtsin, dts,
            jnp.asarray(ks["kv_pos"], jnp.int32), bool(primed),
            jnp.asarray(cfg_value, jnp.float32),
            jnp.asarray(le_override), jnp.asarray(teacher is not None))
        ks["k"], ks["v"] = k, v
        ks["prev_fb_lm"] = fb_lm                          # device-resident
        packed = np.asarray(packed)                       # one readback
        pd = self.patch_size * self.latent_dim
        patch = packed[:pd].reshape(self.patch_size, self.latent_dim)
        stop_logits = packed[pd:pd + 2]
        ks["fb_tslm"] = packed[pd + 2:]
        stop = bool(stop_logits[1] > stop_logits[0])
        min_len = ks["min_len"] if ks["min_len"] >= 0 else self.min_len
        if ks["patch_index"] <= min_len:
            stop = False
        if not primed:
            ks["kv_pos"] += 1
        ks["primed"] = False
        ks["patch_index"] += 1
        ks["prev_patch"] = (np.asarray(teacher, np.float32) if teacher is not None
                            else patch_dev)
        ks["teacher"] = None
        return patch, stop, ks["fb_tslm"]

    def step_feedback_embd(self, st: LmState) -> np.ndarray:
        return st.kind_state["fb_tslm"]
