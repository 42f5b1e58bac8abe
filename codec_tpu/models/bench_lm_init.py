"""Benchmark-scale random LM fixture GGUFs (no pretrained checkpoints in
this environment; zero egress). Shapes mirror the reference's real model
configs so timings are honest:

  - residual_depth_ar: CSM-1B depth decoder — 4 layers @ 1024 depth hidden,
    32 codebooks, vocab 2051, backbone hidden 2048
    (reference: src/lm/residual_depth_ar.cpp:27-42 "4 layers @ 1024",
    "32-codebook 2048-hidden CSM")
  - continuous_latent_cfm: BlueMagpie — LocDiT 12 layers @ 1024 (ffn 4096),
    RALM 8 layers @ 2048, patch 4, latent 64
    (reference: benchmarks/bluemagpie_cfm_baseline.json — lm.locdit.*
    424 MB F16 over 12 layers, 18 estimator passes/step)
  - flow_lm: Pocket-TTS — d_model 1024, 6 layers, 16x64 heads, ffn 4096,
    ldim 32, flow_dim 512, flow_depth 6
    (reference: src/lm/flow_lm.cpp:50-62 flow_impl comments)

Tensors are written F16 to halve fixture size; loaders upcast per their
compute dtype. Writers are deterministic in `seed`.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from ..io.gguf import GGUFWriter


def _rng_tensors(seed: int):
    rng = np.random.default_rng(seed)

    def W(*shape, s=0.02, off=0.0):
        return (rng.standard_normal(shape, dtype=np.float32) * s
                + off).astype(np.float16)
    return W


def write_rda_gguf(path, *, h=2048, dh=1024, n_cb=32, vocab=2051,
                   layers=4, heads=8, kv=2, hdim=128, inter=4096,
                   seed=0) -> Path:
    """CSM-1B-shaped residual_depth_ar adaptor fixture."""
    W = _rng_tensors(seed)
    w = GGUFWriter(path, "mimi")
    w.add_uint32("codec.sample_rate", 24000)
    w.add_bool("codec.has_decoder", True)
    w.add_bool("codec.lm.has_adaptor", True)
    w.add_string("codec.lm.kind", "residual_depth_ar")
    w.add_string("codec.lm.host_arch", "llama")
    w.add_uint32("codec.lm.hidden_dim", h)
    w.add_uint32("codec.lm.audio_embed_dim", h)
    w.add_uint32("codec.lm.n_codebook", n_cb)
    w.add_array("codec.lm.codebook_sizes", [vocab] * n_cb)
    w.add_array("codec.lm.delay_pattern", [0] * n_cb)
    w.add_uint32("codec.lm.residual.depth_layers", layers)
    w.add_uint32("codec.lm.residual.depth_hidden", dh)
    w.add_uint32("codec.lm.residual.depth_n_heads", heads)
    w.add_uint32("codec.lm.residual.depth_n_kv_heads", kv)
    w.add_uint32("codec.lm.residual.depth_head_dim", hdim)
    w.add_float32("codec.lm.residual.depth_rope_theta", 10000.0)
    w.add_float32("codec.lm.residual.depth_rms_norm_eps", 1e-5)
    w.add_bool("codec.lm.residual.depth_has_in_proj", True)
    w.add_bool("codec.lm.residual.depth_has_output_norm", True)
    w.add_bool("codec.lm.residual.depth_use_rope", True)
    w.add_string("codec.lm.residual.c0_input_modality", "audio")

    w.add_tensor("lm.c0_head.weight", W(vocab, h))
    w.add_tensor("lm.depth.in_proj.weight", W(dh, h))
    w.add_tensor("lm.depth.output_norm.weight", W(dh, s=0.02, off=1.0))
    for i in range(n_cb):
        w.add_tensor(f"lm.audio_embd_{i}.weight", W(vocab, h))
    for i in range(n_cb - 1):
        w.add_tensor(f"lm.depth.heads_{i}.weight", W(vocab, dh))
    for l in range(layers):
        p = f"lm.depth.blk_{l}"
        w.add_tensor(f"{p}.attn_norm.weight", W(dh, off=1.0))
        w.add_tensor(f"{p}.q.weight", W(heads * hdim, dh))
        w.add_tensor(f"{p}.k.weight", W(kv * hdim, dh))
        w.add_tensor(f"{p}.v.weight", W(kv * hdim, dh))
        w.add_tensor(f"{p}.o.weight", W(dh, heads * hdim))
        w.add_tensor(f"{p}.ffn_norm.weight", W(dh, off=1.0))
        w.add_tensor(f"{p}.ffn_gate.weight", W(inter, dh))
        w.add_tensor(f"{p}.ffn_up.weight", W(inter, dh))
        w.add_tensor(f"{p}.ffn_down.weight", W(dh, inter))
    w.write()
    return Path(path)


def write_cfm_gguf(path, *, hb=1024, hv=2048, he=1024, hd=1024, d=64, p=4,
                   nh=16, nkv=2, hdim=128, nl_enc=12, nl_dit=12, nl_ralm=8,
                   ffn_mult=4, fsq=9, seed=0) -> Path:
    """BlueMagpie-shaped continuous_latent_cfm adaptor fixture."""
    W = _rng_tensors(seed)
    w = GGUFWriter(path, "bluemagpie_audiovae")
    w.add_uint32("codec.sample_rate", 48000)
    w.add_bool("codec.has_decoder", True)
    w.add_bool("codec.lm.has_adaptor", True)
    w.add_string("codec.lm.kind", "continuous_latent_cfm")
    w.add_uint32("codec.lm.hidden_dim", hb)
    w.add_uint32("codec.lm.h_vox", hv)
    w.add_uint32("codec.lm.h_enc", he)
    w.add_uint32("codec.lm.h_dit", hd)
    w.add_uint32("codec.lm.latent_dim", d)
    w.add_uint32("codec.lm.patch_size", p)
    w.add_uint32("codec.lm.n_locenc", nl_enc)
    w.add_uint32("codec.lm.n_locdit", nl_dit)
    w.add_uint32("codec.lm.n_ralm", nl_ralm)
    w.add_uint32("codec.lm.n_heads", nh)
    w.add_uint32("codec.lm.n_kv", nkv)
    w.add_uint32("codec.lm.head_dim", hdim)
    w.add_uint32("codec.lm.fsq_scale", fsq)
    w.add_uint32("codec.lm.min_len", 0)

    def lin(prefix, out, inp, bias=True):
        w.add_tensor(prefix + ".w", W(out, inp))
        if bias:
            w.add_tensor(prefix + ".b", W(out))

    w.add_tensor("lm.tslm_adapter.norm.w", W(hb, off=1.0))
    lin("lm.tslm_adapter.proj", hv, hb)
    w.add_tensor("lm.tslm_adapter.blk0.ln.w", W(hv, off=1.0))
    w.add_tensor("lm.tslm_adapter.blk0.gate.w", W(ffn_mult * hv, hv))
    w.add_tensor("lm.tslm_adapter.blk0.up.w", W(ffn_mult * hv, hv))
    w.add_tensor("lm.tslm_adapter.blk0.down.w", W(hv, ffn_mult * hv))
    lin("lm.fsq.in_proj", 8, hv)
    lin("lm.fsq.out_proj", hv, 8)
    lin("lm.proj.fusion_concat", hv, 2 * hv)
    lin("lm.proj.lm_to_dit", hd, hv)
    lin("lm.proj.res_to_dit", hd, hv)
    lin("lm.proj.enc_to_tslm", hb, he)
    lin("lm.proj.enc_to_lm", hv, he)
    lin("lm.stop.proj", hv, hv)
    w.add_tensor("lm.stop.head.w", W(2, hv))
    w.add_tensor("lm.ralm.norm.w", W(hv, off=1.0))
    w.add_tensor("lm.locdit.norm.w", W(hd, off=1.0))
    lin("lm.locdit.in_proj", hd, d)
    lin("lm.locdit.cond_proj", hd, d)
    lin("lm.locdit.out_proj", d, hd)
    lin("lm.locenc.in_proj", he, d)
    w.add_tensor("lm.locenc.special_token", W(he))
    w.add_tensor("lm.locenc.norm.w", W(he, off=1.0))
    w.add_tensor("lm.rope.cos", W(4096, hdim, s=1.0))
    w.add_tensor("lm.rope.sin", W(4096, hdim, s=1.0))
    for mlp in ("time_mlp", "dtime_mlp"):
        lin(f"lm.locdit.{mlp}.l1", hd, hd)
        lin(f"lm.locdit.{mlp}.l2", hd, hd)

    def block(prefix, hidden, ffn):
        w.add_tensor(prefix + ".ln1.w", W(hidden, off=1.0))
        w.add_tensor(prefix + ".ln2.w", W(hidden, off=1.0))
        w.add_tensor(prefix + ".attn_q.w", W(nh * hdim, hidden))
        w.add_tensor(prefix + ".attn_k.w", W(nkv * hdim, hidden))
        w.add_tensor(prefix + ".attn_v.w", W(nkv * hdim, hidden))
        w.add_tensor(prefix + ".attn_o.w", W(hidden, nh * hdim))
        w.add_tensor(prefix + ".gate.w", W(ffn, hidden))
        w.add_tensor(prefix + ".up.w", W(ffn, hidden))
        w.add_tensor(prefix + ".down.w", W(hidden, ffn))

    for i in range(nl_ralm):
        block(f"lm.ralm.layers.{i}", hv, ffn_mult * hv)
    for i in range(nl_dit):
        block(f"lm.locdit.layers.{i}", hd, ffn_mult * hd)
    for i in range(nl_enc):
        block(f"lm.locenc.layers.{i}", he, ffn_mult * he)
    w.write()
    return Path(path)


def write_flow_lm_gguf(path, *, dm=1024, layers=6, heads=16, hdim=64,
                       ffn=4096, ldim=32, fdim=512, fdepth=6, nbins=4000,
                       lsd=2, seed=0) -> Path:
    """Pocket-TTS-shaped flow_lm adaptor fixture."""
    W = _rng_tensors(seed)
    w = GGUFWriter(path, "pocket_mimi")
    w.add_uint32("codec.sample_rate", 24000)
    w.add_bool("codec.has_decoder", True)
    w.add_bool("codec.lm.has_adaptor", True)
    w.add_string("codec.lm.kind", "flow_lm")
    w.add_uint32("codec.lm.d_model", dm)
    w.add_uint32("codec.lm.n_layers", layers)
    w.add_uint32("codec.lm.n_heads", heads)
    w.add_uint32("codec.lm.head_dim", hdim)
    w.add_uint32("codec.lm.ffn_dim", ffn)
    w.add_uint32("codec.lm.ldim", ldim)
    w.add_uint32("codec.lm.flow_dim", fdim)
    w.add_uint32("codec.lm.flow_depth", fdepth)
    w.add_uint32("codec.lm.n_txt_bins", nbins)
    w.add_uint32("codec.lm.lsd_decode_steps", lsd)
    w.add_bool("codec.lm.insert_bos_before_voice", True)

    w.add_tensor("lm.text.embed.w", W(nbins + 1, dm))
    w.add_tensor("lm.bos_before_voice", W(dm))
    w.add_tensor("lm.bos_emb", W(ldim))
    w.add_tensor("lm.input_linear.w", W(dm, ldim))
    w.add_tensor("lm.out_norm.w", W(dm, off=1.0))
    w.add_tensor("lm.out_norm.b", W(dm))
    w.add_tensor("lm.out_eos.w", W(1, dm))
    w.add_tensor("lm.out_eos.b", W(1))
    w.add_tensor("lm.emb_std", W(ldim, off=1.0))
    w.add_tensor("lm.emb_mean", W(ldim))
    w.add_tensor("lm.speaker_proj.w", W(dm, ldim))
    for l in range(layers):
        p = f"lm.tf.l{l}"
        w.add_tensor(p + ".inln.w", W(dm, off=1.0))
        w.add_tensor(p + ".inln.b", W(dm))
        w.add_tensor(p + ".paln.w", W(dm, off=1.0))
        w.add_tensor(p + ".paln.b", W(dm))
        w.add_tensor(p + ".attn.q_proj.w", W(dm, dm))
        w.add_tensor(p + ".attn.k_proj.w", W(dm, dm))
        w.add_tensor(p + ".attn.v_proj.w", W(dm, dm))
        w.add_tensor(p + ".attn.o_proj.w", W(dm, dm))
        w.add_tensor(p + ".mlp.fc1.w", W(ffn, dm))
        w.add_tensor(p + ".mlp.fc2.w", W(dm, ffn))
    w.add_tensor("lm.flow.input_proj.w", W(fdim, ldim))
    w.add_tensor("lm.flow.input_proj.b", W(fdim))
    w.add_tensor("lm.flow.cond_embed.w", W(fdim, dm))
    w.add_tensor("lm.flow.cond_embed.b", W(fdim))
    w.add_tensor("lm.flow.final.adaln.w", W(2 * fdim, fdim))
    w.add_tensor("lm.flow.final.adaln.b", W(2 * fdim))
    w.add_tensor("lm.flow.final.linear.w", W(ldim, fdim))
    w.add_tensor("lm.flow.final.linear.b", W(ldim))
    for i in range(2):
        p = f"lm.flow.time_embed.{i}"
        w.add_tensor(p + ".freqs", W(fdim // 2, s=1.0))
        w.add_tensor(p + ".l1.w", W(fdim, fdim))
        w.add_tensor(p + ".l1.b", W(fdim))
        w.add_tensor(p + ".l2.w", W(fdim, fdim))
        w.add_tensor(p + ".l2.b", W(fdim))
        w.add_tensor(p + ".rms.alpha", W(fdim, off=1.0))
    for b in range(fdepth):
        p = f"lm.flow.res.{b}"
        w.add_tensor(p + ".adaln.w", W(3 * fdim, fdim))
        w.add_tensor(p + ".adaln.b", W(3 * fdim))
        w.add_tensor(p + ".in_ln.w", W(fdim, off=1.0))
        w.add_tensor(p + ".in_ln.b", W(fdim))
        w.add_tensor(p + ".mlp.l1.w", W(2 * fdim, fdim))
        w.add_tensor(p + ".mlp.l1.b", W(2 * fdim))
        w.add_tensor(p + ".mlp.l2.w", W(fdim, 2 * fdim))
        w.add_tensor(p + ".mlp.l2.b", W(fdim))
    w.write()
    return Path(path)
