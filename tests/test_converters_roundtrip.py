"""Converter roundtrips: fake source checkpoints (upstream key layout,
tiny dims) → converter → GGUF → codec_tpu runtime loads and runs.

This exercises the converter-side mapping (weight-norm materialization,
snake baking, implicit codebooks, derived metadata) against the same
runtime the parity suites validate."""

import numpy as np
import pytest
import torch


def _wn(sd, prefix, out_c, in_c, k, g):
    sd[prefix + ".weight_v"] = torch.randn(out_c, in_c, k, generator=g) * 0.2
    sd[prefix + ".weight_g"] = torch.rand(out_c, 1, 1, generator=g) + 0.5
    sd[prefix + ".bias"] = torch.randn(out_c, generator=g) * 0.1


def _lin(sd, prefix, out_c, in_c, g, bias=True):
    sd[prefix + ".weight"] = torch.randn(out_c, in_c, generator=g) * 0.2
    if bias:
        sd[prefix + ".bias"] = torch.randn(out_c, generator=g) * 0.1


def _conv(sd, prefix, out_c, in_c, k, g, bias=True):
    sd[prefix + ".weight"] = torch.randn(out_c, in_c, k, generator=g) * 0.2
    if bias:
        sd[prefix + ".bias"] = torch.randn(out_c, generator=g) * 0.1


def make_xcodec2_sd():
    g = torch.Generator().manual_seed(0)
    sd = {}
    HID, VQD = 32, 24
    # decoder
    _lin(sd, "generator.quantizer.project_out", VQD, 8, g)
    _lin(sd, "fc_post_a", HID, VQD, g)
    _conv(sd, "generator.backbone.embed", HID, HID, 7, g)
    for net in ("prior_net", "post_net"):
        for i in range(2):
            b = f"generator.backbone.{net}.{i}"
            _lin(sd, b + ".norm1", HID, 1, g)
            sd[b + ".norm1.weight"] = torch.rand(HID, generator=g) + 0.5
            sd[b + ".norm1.bias"] = torch.randn(HID, generator=g) * 0.1
            _conv(sd, b + ".conv1", HID, HID, 3, g)
            sd[b + ".norm2.weight"] = torch.rand(HID, generator=g) + 0.5
            sd[b + ".norm2.bias"] = torch.randn(HID, generator=g) * 0.1
            _conv(sd, b + ".conv2", HID, HID, 3, g)
    for i in range(2):
        b = f"generator.backbone.transformers.{i}"
        sd[b + ".att_norm.weight"] = torch.rand(HID, generator=g) + 0.5
        sd[b + ".ffn_norm.weight"] = torch.rand(HID, generator=g) + 0.5
        _lin(sd, b + ".att.c_attn", 3 * HID, HID, g, bias=False)
        _lin(sd, b + ".att.c_proj", HID, HID, g, bias=False)
        _lin(sd, b + ".mlp.fc1", 64, HID, g, bias=False)
        _lin(sd, b + ".mlp.fc2", HID, 64, g, bias=False)
    _lin(sd, "generator.backbone.final_layer_norm", HID, 1, g)
    sd["generator.backbone.final_layer_norm.weight"] = torch.rand(HID, generator=g) + 0.5
    sd["generator.backbone.final_layer_norm.bias"] = torch.randn(HID, generator=g) * 0.1
    _lin(sd, "generator.head.out", 1282, HID, g)   # n_fft = 4*hop

    # BigCodec encoder
    n = np.arange(12) - 5.5
    filt = torch.tensor((np.kaiser(12, 9.0) * np.sinc(0.5 * n) * 0.5),
                        dtype=torch.float32)
    _wn(sd, "CodecEnc.conv_blocks.0", 2, 1, 7, g)
    ch = 2
    for bi in range(1, 6):
        base = f"CodecEnc.conv_blocks.{bi}.block"
        for ri in range(3):
            rb = f"{base}.{ri}.block"
            sd[rb + ".0.act.alpha"] = torch.randn(ch, generator=g) * 0.1
            sd[rb + ".0.upsample.filter"] = filt.clone()
            sd[rb + ".0.downsample.lowpass.filter"] = filt.clone()
            _wn(sd, rb + ".1", ch, ch, 7, g)
            sd[rb + ".2.act.alpha"] = torch.randn(ch, generator=g) * 0.1
            sd[rb + ".2.upsample.filter"] = filt.clone()
            _wn(sd, rb + ".3", ch, ch, 1, g)
        sd[base + ".3.act.alpha"] = torch.randn(ch, generator=g) * 0.1
        sd[base + ".3.upsample.filter"] = filt.clone()
        stride = (2, 2, 4, 4, 5)[bi - 1]
        _wn(sd, base + ".4", 2 * ch, ch, 2 * stride, g)
        ch *= 2
    sd["CodecEnc.conv_final_block.0.act.alpha"] = torch.randn(ch, generator=g) * 0.1
    _wn(sd, "CodecEnc.conv_final_block.1", 32, ch, 3, g)

    # w2v-bert slice (2 layers tiny)
    LN = lambda p, d: (_lin(sd, p, d, 1, g),
                       sd.__setitem__(p + ".weight", torch.rand(d, generator=g) + 0.5),
                       sd.__setitem__(p + ".bias", torch.randn(d, generator=g) * 0.1))
    LN("semantic_model.feature_projection.layer_norm", 16)
    _lin(sd, "semantic_model.feature_projection.projection", 32, 16, g)
    for li in range(2):
        b = f"semantic_model.encoder.layers.{li}"
        for ln in ("ffn1_layer_norm", "self_attn_layer_norm",
                   "conv_module.layer_norm", "conv_module.depthwise_layer_norm",
                   "ffn2_layer_norm", "final_layer_norm"):
            LN(f"{b}.{ln}", 32)
        _lin(sd, b + ".ffn1.intermediate_dense", 64, 32, g)
        _lin(sd, b + ".ffn1.output_dense", 32, 64, g)
        _lin(sd, b + ".ffn2.intermediate_dense", 64, 32, g)
        _lin(sd, b + ".ffn2.output_dense", 32, 64, g)
        for qkv in ("linear_q", "linear_k", "linear_v", "linear_out"):
            _lin(sd, f"{b}.self_attn.{qkv}", 32, 32, g)
        sd[b + ".self_attn.distance_embedding.weight"] = \
            torch.randn(7, 16, generator=g) * 0.2          # left 4 + right 2 + 1
        _conv(sd, b + ".conv_module.pointwise_conv1", 64, 32, 1, g, bias=False)
        _conv(sd, b + ".conv_module.depthwise_conv", 32, 1, 7, g, bias=False)
        _conv(sd, b + ".conv_module.pointwise_conv2", 32, 32, 1, g, bias=False)

    _conv(sd, "SemanticEncoder_module.initial_conv", 32, 32, 3, g, bias=False)
    _conv(sd, "SemanticEncoder_module.residual_blocks.1", 32, 32, 3, g)
    _conv(sd, "SemanticEncoder_module.residual_blocks.3", 32, 32, 3, g)
    _conv(sd, "SemanticEncoder_module.final_conv", 32, 32, 3, g, bias=False)
    _lin(sd, "fc_prior", 64, 64, g)
    _lin(sd, "generator.quantizer.project_in", 8, 64, g)
    return {k: v.numpy() for k, v in sd.items()}


def test_xcodec2_roundtrip(tmp_path):
    from codec_tpu.convert.xcodec2 import XCodec2Converter

    conv = XCodec2Converter(quantization="F32")
    conv.load_from_state_dict(make_xcodec2_sd(), {
        "head_dim": 16, "left_max_pos": 4,
        "mel": {"n_fft": 64, "win": 64, "n_mels": 8}})
    out = tmp_path / "x2.gguf"
    conv.convert_and_save(out)

    import codec_tpu

    m = codec_tpu.load_model(out)
    assert m.arch == "xcodec2"
    assert m.has_encoder and m.has_decoder
    assert m.codebook_size == 65536 and m.hop_size == 320
    assert m.cfg.num_heads == 2 and m.cfg.num_layers == 2
    assert m.enc_cfg.w2v_left_max == 4 and m.enc_cfg.w2v_right_max == 2

    rng = np.random.default_rng(0)
    pcm = (rng.standard_normal(3200) * 0.2).astype(np.float32)
    codes = m.encode(pcm)
    assert codes.shape == (10, 1)
    assert (codes >= 0).all() and (codes < 65536).all()
    out_pcm = m.decode(codes)
    assert out_pcm.shape == (3200,)

    # WN materialization sanity: converted conv0 == v * g / ||v||
    from codec_tpu.io.gguf import GGUFReader

    r = GGUFReader(out)
    sd = make_xcodec2_sd()
    v, gg = sd["CodecEnc.conv_blocks.0.weight_v"], sd["CodecEnc.conv_blocks.0.weight_g"]
    want = v * (gg / (np.linalg.norm(v, axis=(1, 2), keepdims=True) + 1e-12))
    np.testing.assert_allclose(np.asarray(r.get("xcodec2.enc.codec.conv0.w")),
                               want, rtol=1e-6, atol=1e-7)


def test_neucodec_distill_roundtrip(tmp_path):
    """Distill checkpoint + hubert weights → converter → GGUF; the converted
    model's encode matches the wire-schema parity mirror bit-exactly and the
    decode graph runs."""
    import test_neucodec_encode_parity as tp
    import test_neucodec_parity as td
    from codec_tpu.convert.neucodec import NeuCodecConverter

    enc = tp.Mirror()
    dec = td.TorchNeu()

    # --- distill source keys from the wire-name mirror ---
    sd = {}
    for k, v in enc.t.items():
        if k.startswith("neucodec.encode.distill."):
            sd[k[len("neucodec.encode.distill."):]] = v
    remap = {
        "neucodec.encode.fc_sq_prior.w": "fc_sq_prior.weight",
        "neucodec.encode.fc_sq_prior.b": "fc_sq_prior.bias",
        "neucodec.encode.fc_prior.w": "fc_prior.weight",
        "neucodec.encode.fc_prior.b": "fc_prior.bias",
        "neucodec.encode.quant.project_in.w": "generator.quantizer.project_in.weight",
        "neucodec.encode.quant.project_in.b": "generator.quantizer.project_in.bias",
        "neucodec.encode.semantic_encoder.initial_conv.w":
            "SemanticEncoder_module.initial_conv.weight",
        "neucodec.encode.semantic_encoder.residual.1.w":
            "SemanticEncoder_module.residual_blocks.1.weight",
        "neucodec.encode.semantic_encoder.residual.1.b":
            "SemanticEncoder_module.residual_blocks.1.bias",
        "neucodec.encode.semantic_encoder.residual.3.w":
            "SemanticEncoder_module.residual_blocks.3.weight",
        "neucodec.encode.semantic_encoder.residual.3.b":
            "SemanticEncoder_module.residual_blocks.3.bias",
        "neucodec.encode.semantic_encoder.final_conv.w":
            "SemanticEncoder_module.final_conv.weight",
    }
    for wire, src in remap.items():
        sd[src] = enc.t[wire]

    # --- decode side (source naming) ---
    dmap = {
        "neucodec.decode.quant.project_out": "generator.quantizer.project_out",
        "neucodec.decode.fc_post_a": "fc_post_a",
        "neucodec.decode.embed": "generator.backbone.embed",
        "neucodec.decode.final_ln": "generator.backbone.final_layer_norm",
        "neucodec.decode.head.out": "generator.head.out",
    }
    for k, v in dec.t.items():
        if k == "neucodec.decode.codebook":
            continue                      # converter bakes the implicit one
        src = k
        for wpre, spre in dmap.items():
            src = src.replace(wpre, spre)
        src = src.replace("neucodec.decode.prior.", "generator.backbone.prior_net.")
        src = src.replace("neucodec.decode.post.", "generator.backbone.post_net.")
        src = src.replace("neucodec.decode.transformer.",
                          "generator.backbone.transformers.")
        src = src[:-2] + {".w": ".weight", ".b": ".bias"}[src[-2:]]
        sd[src] = v

    # --- hubert source weights from the wire-name mirror ---
    hs = {}
    for li in range(len(tp.H_STRIDES)):
        hs[f"feature_extractor.conv_layers.{li}.conv.weight"] = \
            enc.t[f"neucodec.encode.hubert.feat.conv.{li}.w"]
    hs["feature_extractor.conv_layers.0.layer_norm.weight"] = \
        enc.t["neucodec.encode.hubert.feat.conv.0.gn.w"]
    hs["feature_extractor.conv_layers.0.layer_norm.bias"] = \
        enc.t["neucodec.encode.hubert.feat.conv.0.gn.b"]
    hs["feature_projection.projection.weight"] = \
        enc.t["neucodec.encode.hubert.feature_projection.w"]
    hs["feature_projection.projection.bias"] = \
        enc.t["neucodec.encode.hubert.feature_projection.b"]
    pos_w = enc.t["neucodec.encode.hubert.encoder.pos_conv.w"]
    # parametrized WN with g = ||v|| over dim-2 keepdims so materialized == v
    g_norm = torch.linalg.vector_norm(pos_w, dim=(0, 1), keepdim=True)
    hs["encoder.pos_conv_embed.conv.parametrizations.weight.original0"] = g_norm
    hs["encoder.pos_conv_embed.conv.parametrizations.weight.original1"] = pos_w
    hs["encoder.pos_conv_embed.conv.bias"] = \
        enc.t["neucodec.encode.hubert.encoder.pos_conv.b"]
    hs["encoder.layer_norm.weight"] = enc.t["neucodec.encode.hubert.encoder.layer_norm.w"]
    hs["encoder.layer_norm.bias"] = enc.t["neucodec.encode.hubert.encoder.layer_norm.b"]
    hf_map = (("att.q", "attention.q_proj"), ("att.k", "attention.k_proj"),
              ("att.v", "attention.v_proj"), ("att.o", "attention.out_proj"),
              ("ln", "layer_norm"), ("ffn.fc1", "feed_forward.intermediate_dense"),
              ("ffn.fc2", "feed_forward.output_dense"), ("ffn_ln", "final_layer_norm"))
    for li in range(tp.HL):
        for mine, hf in hf_map:
            for suf, hsuf in ((".w", ".weight"), (".b", ".bias")):
                hs[f"encoder.layers.{li}.{hf}{hsuf}"] = \
                    enc.t[f"neucodec.encode.hubert.encoder.layers.{li}.{mine}{suf}"]
    hcfg = dict(hidden_size=tp.HH, num_attention_heads=tp.HHEADS,
                intermediate_size=tp.HINT, num_hidden_layers=tp.HL,
                num_conv_pos_embeddings=tp.HPOS_K,
                num_conv_pos_embedding_groups=tp.HPOS_G,
                conv_dim=list(tp.H_DIMS), conv_kernel=list(tp.H_KERNELS),
                conv_stride=list(tp.H_STRIDES))

    conv = NeuCodecConverter(quantization="F32")
    conv.load_from_state_dict({k: np.asarray(v) for k, v in sd.items()}, {
        "head_dim": td.HD_, "hop_size": td.HOP,
        "heads": tp.HEADS, "down_window": tp.DOWN_W, "local_window": tp.LOCAL_W})
    conv.set_hubert(hs, hcfg)
    out = tmp_path / "dneu.gguf"
    conv.convert_and_save(out)

    import codec_tpu

    m = codec_tpu.load_model(out)
    assert m.arch == "distill_neucodec"
    assert m.has_encoder and m.has_decoder
    assert m.encoder_type == 1

    rng = np.random.default_rng(0)
    pcm = (rng.standard_normal(tp.N_PCM) * 0.3).astype(np.float32)
    want, _ = enc.encode(pcm)
    got = m.encode(pcm)
    np.testing.assert_array_equal(got[:, 0], want)

    pcm_out = m.decode(got)
    assert pcm_out.shape == (len(want) * td.HOP,)


def _wn_from(mat, dim=0):
    """(weight_v, weight_g) pair whose materialized weight equals `mat`."""
    mat = torch.as_tensor(mat)
    axes = tuple(i for i in range(mat.ndim) if i != dim)
    g = torch.linalg.vector_norm(mat, dim=axes, keepdim=True)
    return mat, g


def _tensor_map_check(gguf_path, wire, skip=()):
    """Every wire tensor must appear (near-)identically in the converted
    GGUF (F32 conversion)."""
    from codec_tpu.io.gguf import GGUFReader

    r = GGUFReader(gguf_path)
    missing, bad = [], []
    for name, t in wire.items():
        if name in skip:
            continue
        if not r.has_tensor(name):
            missing.append(name)
            continue
        got = np.asarray(r.get(name)).reshape(np.asarray(t).shape)
        if not np.allclose(got, np.asarray(t), rtol=1e-5, atol=1e-6):
            bad.append(name)
    assert not missing, f"missing: {missing[:8]} (+{len(missing)} total)"
    assert not bad, f"mismatch: {bad[:8]}"


def test_bluemagpie_roundtrip(tmp_path):
    import test_bluemagpie_parity as tb
    from codec_tpu.convert.bluemagpie import BlueMagpieConverter, SR_BUCKET_48K

    ref = tb.TorchBM()
    wire = {k: v.numpy() for k, v in ref.t.items()}
    sd = {}

    def wn_put(src, name):
        v, g = _wn_from(wire[name + ".w"])
        sd[src + ".weight_v"] = v
        sd[src + ".weight_g"] = g
        if name + ".b" in wire:
            sd[src + ".bias"] = torch.as_tensor(wire[name + ".b"])

    def alpha_put(src, name):
        sd[src + ".alpha"] = torch.as_tensor(wire[name + ".alpha"])

    def runit_put(src, name):
        alpha_put(src + ".block.0", name + ".act1")
        wn_put(src + ".block.1", name + ".conv1")
        alpha_put(src + ".block.2", name + ".act2")
        wn_put(src + ".block.3", name + ".conv2")

    wn_put("decoder.model.0", "bluemagpie.dec.conv_in_dw")
    wn_put("decoder.model.1", "bluemagpie.dec.conv_in_pw")
    for bi in range(len(tb.DEC_RATES)):
        idx = bi + 2
        o = f"bluemagpie.dec.b{bi}"
        c = len(wire[o + ".cond.scale"])
        se = torch.zeros(6, c)
        be = torch.zeros(6, c)
        se[SR_BUCKET_48K] = torch.as_tensor(wire[o + ".cond.scale"])
        be[SR_BUCKET_48K] = torch.as_tensor(wire[o + ".cond.bias"])
        sd[f"decoder.sr_cond_model.{idx}.scale_embed.weight"] = se
        sd[f"decoder.sr_cond_model.{idx}.bias_embed.weight"] = be
        alpha_put(f"decoder.model.{idx}.block.0", o + ".act")
        wn_put(f"decoder.model.{idx}.block.1", o + ".convtr")
        for ri in range(3):
            runit_put(f"decoder.model.{idx}.block.{ri + 2}", f"{o}.r{ri}")
    nb = len(tb.DEC_RATES)
    alpha_put(f"decoder.model.{nb + 2}", "bluemagpie.dec.act_final")
    wn_put(f"decoder.model.{nb + 3}", "bluemagpie.dec.conv_out")
    wn_put("encoder.block.0", "bluemagpie.enc.conv0")
    for bi in range(1, len(tb.ENC_RATES) + 1):
        o = f"bluemagpie.enc.b{bi}"
        for ri in range(3):
            runit_put(f"encoder.block.{bi}.block.{ri}", f"{o}.r{ri}")
        alpha_put(f"encoder.block.{bi}.block.3", o + ".act")
        wn_put(f"encoder.block.{bi}.block.4", o + ".down")
    wn_put("encoder.fc_mu", "bluemagpie.enc.fc_mu")

    conv = BlueMagpieConverter(quantization="F32")
    conv.load_from_state_dict({k: np.asarray(v) for k, v in sd.items()}, {
        "sample_rate": 16000, "out_sample_rate": 48000,
        "latent_dim": tb.LAT, "decoder_rates": list(tb.DEC_RATES),
        "encoder_rates": list(tb.ENC_RATES), "decoder_dim": 32,
        "encoder_dim": 8})
    out = tmp_path / "bm.gguf"
    conv.convert_and_save(out)

    _tensor_map_check(out, wire)
    import codec_tpu

    m = codec_tpu.load_model(out)
    assert m.arch == "bluemagpie_audiovae"
    z = np.random.default_rng(0).standard_normal((6, tb.LAT)).astype(np.float32)
    pcm = m.decode_latent(z)
    assert pcm.shape == (6 * tb.DEC_HOP,)


def test_xy_roundtrip(tmp_path):
    import test_xy_tokenizer_parity as tx
    from codec_tpu.convert.xy_tokenizer import XyTokenizerConverter

    ref = tx.TorchXY()
    wire = {k: v.numpy() for k, v in ref.t.items()}
    sd = {}
    mod_map = {
        "xy.sem_enc": "semantic_encoder", "xy.acoust_enc": "acoustic_encoder",
        "xy.sem_enc_adapter": "semantic_encoder_adapter",
        "xy.pre_rvq_adapter": "pre_rvq_adapter",
        "xy.post_rvq_adapter": "post_rvq_adapter",
        "xy.acoust_dec": "acoustic_decoder",
    }
    import re

    for name, t in wire.items():
        t = torch.as_tensor(t)
        mod = next((m for m in mod_map if name.startswith(m + ".")), None)
        if mod is not None:
            rest = name[len(mod) + 1:]
            src = mod_map[mod]
            lm = re.match(r"l(\d+)\.(.+)", rest)
            if lm:
                li, part = lm.group(1), lm.group(2)
                pmap = {
                    "norm1.w": "self_attn_layer_norm.weight",
                    "norm1.b": "self_attn_layer_norm.bias",
                    "attn.q.w": "self_attn.q_proj.weight",
                    "attn.q.b": "self_attn.q_proj.bias",
                    "attn.k.w": "self_attn.k_proj.weight",
                    "attn.v.w": "self_attn.v_proj.weight",
                    "attn.v.b": "self_attn.v_proj.bias",
                    "attn.out.w": "self_attn.out_proj.weight",
                    "attn.out.b": "self_attn.out_proj.bias",
                    "norm2.w": "final_layer_norm.weight",
                    "norm2.b": "final_layer_norm.bias",
                    "mlp.fc1.w": "mlp.fc1.weight", "mlp.fc1.b": "mlp.fc1.bias",
                    "mlp.fc2.w": "mlp.fc2.weight", "mlp.fc2.b": "mlp.fc2.bias",
                }
                sd[f"{src}.layers.{li}.{pmap[part]}"] = t
            elif rest == "pos_emb":
                sd[src + ".positional_embedding"] = t
            else:
                sd[f"{src}.{rest[:-2]}.{'weight' if rest.endswith('.w') else 'bias'}"] = t
            continue
        if re.match(r"xy\.vocos\.b\d+\.", name):
            bm = re.match(r"xy\.vocos\.b(\d+)\.(.+)", name)
            bi, part = bm.group(1), bm.group(2)
            src = f"enhanced_vocos.backbone.convnext.{bi}"
            if part == "gamma":
                sd[src + ".gamma"] = t
            else:
                sd[f"{src}.{part[:-2]}.{'weight' if part.endswith('.w') else 'bias'}"] = t
            continue
        vmap = {
            "xy.vocos.embed": "enhanced_vocos.backbone.embed",
            "xy.vocos.norm": "enhanced_vocos.backbone.norm",
            "xy.vocos.final_layer_norm": "enhanced_vocos.backbone.final_layer_norm",
            "xy.vocos.head.out": "enhanced_vocos.head.out",
            "xy.downsample.gate": "downsample.gate_proj",
            "xy.downsample.up": "downsample.up_proj",
            "xy.downsample.down": "downsample.down_proj",
            "xy.downsample.layer_norm": "downsample.layer_norm",
            "xy.upsample.up_conv": "upsample.up_conv",
        }
        base = name[:-2]
        if base in vmap:
            sd[f"{vmap[base]}.{'weight' if name.endswith('.w') else 'bias'}"] = t
            continue
        if name == "xy.vocos.head.istft_window":
            sd["enhanced_vocos.head.istft.window"] = t
            continue
        qm = re.match(r"xy\.q\.(\d+)\.codebook$", name)
        if qm:
            sd[f"quantizer.quantizers.{qm.group(1)}.codebook"] = t
            continue
        if name in ("xy.q.in_proj.w", "xy.q.out_proj.w"):
            src = ("quantizer.input_proj" if "in_proj" in name
                   else "quantizer.output_proj")
            v, g = _wn_from(t)
            sd[src + ".weight_v"] = v
            sd[src + ".weight_g"] = g
            continue
        if name in ("xy.q.in_proj.b", "xy.q.out_proj.b"):
            src = ("quantizer.input_proj" if "in_proj" in name
                   else "quantizer.output_proj")
            sd[src + ".bias"] = t
            continue
        # derived tensors (sq_norm) are regenerated by the converter
        assert "sq_norm" in name, f"unmapped wire tensor {name}"

    params = {
        "quantizer_kwargs": dict(num_quantizers=tx.N_Q, codebook_size=tx.V,
                                 codebook_dim=tx.RVQ_D, rvq_dim=tx.RVQ_D),
        "feature_extractor_kwargs": dict(feature_size=tx.MELS,
                                         n_fft=tx.MEL_FFT,
                                         hop_length=tx.MEL_HOP,
                                         sampling_rate=16000),
        "semantic_encoder_kwargs": dict(num_heads=tx.HEADS),
        "vocos_kwargs": dict(n_fft=tx.VN_FFT, hop_size=tx.VHOP),
        "downsample_kwargs": dict(avg_pooler=tx.AVG),
        "upsample_kwargs": dict(stride=tx.UP_STRIDE),
    }
    conv = XyTokenizerConverter(quantization="F32")
    conv.load_from_state_dict({k: np.asarray(v) for k, v in sd.items()}, {
        "params": params, "input_sample_rate": 16000,
        "output_sample_rate": 24000, "encoder_downsample_rate": tx.ENC_DOWN,
        "decoder_upsample_rate": tx.DEC_UP, "code_dim": tx.LAT})
    out = tmp_path / "xy.gguf"
    conv.convert_and_save(out)

    _tensor_map_check(out, wire, skip={n for n in wire if "sq_norm" in n})
    import codec_tpu

    m = codec_tpu.load_model(out)
    assert m.arch == "xy_tokenizer"
    codes = np.random.default_rng(0).integers(
        0, tx.V, (6, tx.N_Q)).astype(np.int32)
    pcm = m.decode(codes)
    # deconv stack yields 8T+1 iSTFT frames for T codes (k3-s2 transposed
    # conv tail), vocos trim (n_fft-hop)/2 per side
    n_frames = 8 * 6 + 1
    want_len = (n_frames - 1) * tx.VHOP + tx.VN_FFT - (tx.VN_FFT - tx.VHOP)
    assert pcm.shape == (want_len,)


def test_moss_roundtrip(tmp_path):
    import test_moss_audio_parity as tm
    from codec_tpu.convert.moss_audio import MossAudioConverter

    ref = tm.TorchMoss()
    wire = {k: v.numpy() for k, v in ref.t.items()}
    sd = {}
    import re

    for name, t in wire.items():
        t = torch.as_tensor(t)
        bm = re.match(r"moss\.(enc|dec)\.b(\d+)\.(.+)", name)
        if bm:
            side, mi, rest = bm.group(1), bm.group(2), bm.group(3)
            root = "encoder" if side == "enc" else "decoder"
            lm = re.match(r"l(\d+)\.(.+)", rest)
            if lm:
                li, part = lm.group(1), lm.group(2)
                pmap = {
                    "norm1.w": "norm1.weight", "norm1.b": "norm1.bias",
                    "norm2.w": "norm2.weight", "norm2.b": "norm2.bias",
                    "attn.qkv.w": "self_attn.in_proj.weight",
                    "attn.out.w": "self_attn.out_proj.weight",
                    "ffn.fc1.w": "ffn.0.weight", "ffn.fc2.w": "ffn.2.weight",
                    "ls1": "layer_scale_1.scale", "ls2": "layer_scale_2.scale",
                }
                sd[f"{root}.{mi}.transformer.layers.{li}.{pmap[part]}"] = t
            else:
                sd[f"{root}.{mi}.{rest[:-2]}.weight"] = t
            continue
        qm = re.match(r"moss\.q\.(\d+)\.(.+)", name)
        if qm:
            qi, part = qm.group(1), qm.group(2)
            base = f"quantizer.quantizers.{qi}"
            if part == "codebook":
                sd[base + ".codebook.weight"] = t
            elif part in ("in_proj.w", "out_proj.w"):
                v, g = _wn_from(t)
                src = base + "." + part[:-2]
                sd[src + ".weight_v"] = v
                sd[src + ".weight_g"] = g
            elif part in ("in_proj.b", "out_proj.b"):
                sd[f"{base}.{part[:-2]}.bias"] = t
            continue
        if name in ("moss.q.input_proj.w", "moss.q.output_proj.w"):
            src = ("quantizer.input_proj" if "input" in name
                   else "quantizer.output_proj")
            v, g = _wn_from(t)
            sd[src + ".weight_v"] = v
            sd[src + ".weight_g"] = g
            continue
        if name in ("moss.q.input_proj.b", "moss.q.output_proj.b"):
            src = ("quantizer.input_proj" if "input" in name
                   else "quantizer.output_proj")
            sd[src + ".bias"] = t
            continue
        assert "codebook_norm" in name, f"unmapped wire tensor {name}"

    def mods(spec):
        out = []
        for m in spec:
            if m[0] == 0:
                out.append({"module_type": "PatchedPretransform",
                            "patch_size": m[1]})
            else:
                out.append({"module_type": "Transformer",
                            "input_dimension": m[2], "output_dimension": m[3],
                            "d_model": m[4], "num_heads": m[5],
                            "num_layers": m[6], "dim_feedforward": 4 * m[4],
                            "context_duration": m[7], "max_period": m[8]})
        return out

    conv = MossAudioConverter(quantization="F32")
    conv.load_from_state_dict({k: np.asarray(v) for k, v in sd.items()}, {
        "sample_rate": tm.SR, "downsample_rate": tm.HOP,
        "latent_dim": tm.LAT, "number_channels": 1,
        "channel_interleave": True,
        "quantizer_kwargs": dict(num_quantizers=tm.N_Q, codebook_size=tm.V,
                                 codebook_dim=tm.CB_D, rvq_dim=tm.RVQ_D),
        "encoder_kwargs": mods(tm.ENC_MODS),
        "decoder_kwargs": mods(tm.DEC_MODS)})
    out = tmp_path / "moss.gguf"
    conv.convert_and_save(out)

    _tensor_map_check(out, wire,
                      skip={n for n in wire if "codebook_norm" in n})
    import codec_tpu

    m = codec_tpu.load_model(out)
    assert m.arch == "moss_audio_tokenizer"


def test_chatterbox_s3t_roundtrip(tmp_path):
    import test_chatterbox_s3t_parity as ts
    from codec_tpu.convert.chatterbox import ChatterboxS3TConverter

    ref = ts.TorchS3T()
    wire = {k: v.numpy() for k, v in ref.t.items()}
    sd = {"tokenizer._mel_filters": wire["s3t.mel_filters"]}
    for c in ("conv1", "conv2"):
        sd[f"tokenizer.encoder.{c}.weight"] = wire[f"s3t.enc.{c}.w"]
        sd[f"tokenizer.encoder.{c}.bias"] = wire[f"s3t.enc.{c}.b"]
    inv = {
        "attn_ln.w": "attn_ln.weight", "attn_ln.b": "attn_ln.bias",
        "attn.q.w": "attn.query.weight", "attn.q.b": "attn.query.bias",
        "attn.k.w": "attn.key.weight",
        "attn.v.w": "attn.value.weight", "attn.v.b": "attn.value.bias",
        "attn.o.w": "attn.out.weight", "attn.o.b": "attn.out.bias",
        "attn.fsmn.w": "attn.fsmn_block.weight",
        "mlp_ln.w": "mlp_ln.weight", "mlp_ln.b": "mlp_ln.bias",
        "mlp.fc1.w": "mlp.0.weight", "mlp.fc1.b": "mlp.0.bias",
        "mlp.fc2.w": "mlp.2.weight", "mlp.fc2.b": "mlp.2.bias",
    }
    for li in range(ts.NL):
        for dst, src in inv.items():
            sd[f"tokenizer.encoder.blocks.{li}.{src}"] = \
                wire[f"s3t.enc.blk.{li}.{dst}"]
    sd["tokenizer.quantizer._codebook.project_down.weight"] = wire["s3t.q.proj.w"]
    sd["tokenizer.quantizer._codebook.project_down.bias"] = wire["s3t.q.proj.b"]

    conv = ChatterboxS3TConverter(quantization="F32")
    conv.load_from_state_dict(sd, {
        "n_fft": ts.N_FFT, "win_length": ts.N_FFT, "n_mels": ts.N_MELS,
        "audio_state": ts.HID, "audio_head": ts.NH, "audio_layer": ts.NL,
        "fsmn_kernel_size": ts.FSMN_K})
    out = tmp_path / "s3t.gguf"
    conv.convert_and_save(out)

    _tensor_map_check(out, wire)
    import codec_tpu

    m = codec_tpu.load_model(out)
    assert m.arch == "chatterbox_s3t"
    rng = np.random.default_rng(1)
    pcm = (rng.standard_normal(2560) * 0.3).astype(np.float32)
    mel = ts.ref_log_mel(pcm, ref.t["s3t.mel_filters"].numpy())
    want = ref.encode_from_mel(torch.from_numpy(mel))
    got = m.encode(pcm)
    np.testing.assert_array_equal(got[:, 0], want)


def test_chatterbox_s3g_roundtrip(tmp_path):
    import test_chatterbox_s3g_parity as tg
    from codec_tpu.convert.chatterbox import ChatterboxS3GConverter

    ref = tg.Mirror()
    wire = {k: v.numpy() for k, v in ref.t.items()}
    sd = {}

    # invert wire names back to the upstream S3Gen layout
    inv_flow = {
        "s3g.flow.input_emb.w": "flow.input_embedding.weight",
        "s3g.flow.spk_aff.w": "flow.spk_embed_affine_layer.weight",
        "s3g.flow.spk_aff.b": "flow.spk_embed_affine_layer.bias",
        "s3g.flow.proj.w": "flow.encoder_proj.weight",
        "s3g.flow.proj.b": "flow.encoder_proj.bias",
        "s3g.flow.enc.embed.lin.w": "flow.encoder.embed.out.0.weight",
        "s3g.flow.enc.embed.lin.b": "flow.encoder.embed.out.0.bias",
        "s3g.flow.enc.embed.ln.w": "flow.encoder.embed.out.1.weight",
        "s3g.flow.enc.embed.ln.b": "flow.encoder.embed.out.1.bias",
        "s3g.flow.enc.up_embed.lin.w": "flow.encoder.up_embed.out.0.weight",
        "s3g.flow.enc.up_embed.lin.b": "flow.encoder.up_embed.out.0.bias",
        "s3g.flow.enc.up_embed.ln.w": "flow.encoder.up_embed.out.1.weight",
        "s3g.flow.enc.up_embed.ln.b": "flow.encoder.up_embed.out.1.bias",
        "s3g.flow.enc.after_norm.w": "flow.encoder.after_norm.weight",
        "s3g.flow.enc.after_norm.b": "flow.encoder.after_norm.bias",
        "s3g.flow.enc.pre.cv1.w": "flow.encoder.pre_lookahead_layer.conv1.weight",
        "s3g.flow.enc.pre.cv1.b": "flow.encoder.pre_lookahead_layer.conv1.bias",
        "s3g.flow.enc.pre.cv2.w": "flow.encoder.pre_lookahead_layer.conv2.weight",
        "s3g.flow.enc.pre.cv2.b": "flow.encoder.pre_lookahead_layer.conv2.bias",
        "s3g.flow.enc.up.w": "flow.encoder.up_layer.conv.weight",
        "s3g.flow.enc.up.b": "flow.encoder.up_layer.conv.bias",
        "s3g.cfm.t.l1.w": "flow.decoder.estimator.time_mlp.linear_1.weight",
        "s3g.cfm.t.l1.b": "flow.decoder.estimator.time_mlp.linear_1.bias",
        "s3g.cfm.t.l2.w": "flow.decoder.estimator.time_mlp.linear_2.weight",
        "s3g.cfm.t.l2.b": "flow.decoder.estimator.time_mlp.linear_2.bias",
        "s3g.cfm.final.cv.w": "flow.decoder.estimator.final_block.block.0.weight",
        "s3g.cfm.final.cv.b": "flow.decoder.estimator.final_block.block.0.bias",
        "s3g.cfm.final.ln.w": "flow.decoder.estimator.final_block.block.2.weight",
        "s3g.cfm.final.ln.b": "flow.decoder.estimator.final_block.block.2.bias",
        "s3g.cfm.proj.w": "flow.decoder.estimator.final_proj.weight",
        "s3g.cfm.proj.b": "flow.decoder.estimator.final_proj.bias",
        "s3g.hift.f0.cls.w": "mel2wav.f0_predictor.classifier.weight",
        "s3g.hift.f0.cls.b": "mel2wav.f0_predictor.classifier.bias",
        "s3g.hift.src.lin.w": "mel2wav.m_source.l_linear.weight",
        "s3g.hift.src.lin.b": "mel2wav.m_source.l_linear.bias",
        "s3g.hift.conv_pre.w": "mel2wav.conv_pre.weight",
        "s3g.hift.conv_pre.b": "mel2wav.conv_pre.bias",
        "s3g.hift.conv_post.w": "mel2wav.conv_post.weight",
        "s3g.hift.conv_post.b": "mel2wav.conv_post.bias",
    }
    import re

    def conformer_inv(dst, src):
        m = {"norm_mha.w": ".norm_mha.weight", "norm_mha.b": ".norm_mha.bias",
             "norm_ff.w": ".norm_ff.weight", "norm_ff.b": ".norm_ff.bias",
             "attn.q.w": ".self_attn.linear_q.weight",
             "attn.q.b": ".self_attn.linear_q.bias",
             "attn.k.w": ".self_attn.linear_k.weight",
             "attn.k.b": ".self_attn.linear_k.bias",
             "attn.v.w": ".self_attn.linear_v.weight",
             "attn.v.b": ".self_attn.linear_v.bias",
             "attn.o.w": ".self_attn.linear_out.weight",
             "attn.o.b": ".self_attn.linear_out.bias",
             "attn.pos.w": ".self_attn.linear_pos.weight",
             "attn.pbu": ".self_attn.pos_bias_u",
             "attn.pbv": ".self_attn.pos_bias_v",
             "ff.w1.w": ".feed_forward.w_1.weight",
             "ff.w1.b": ".feed_forward.w_1.bias",
             "ff.w2.w": ".feed_forward.w_2.weight",
             "ff.w2.b": ".feed_forward.w_2.bias"}
        for d, s in m.items():
            sd[src + s] = wire[f"{dst}.{d}"]

    for li in range(tg.ENC_L):
        conformer_inv(f"s3g.flow.enc.blk.{li}", f"flow.encoder.encoders.{li}")
    for li in range(tg.UP_L):
        conformer_inv(f"s3g.flow.enc.up_blk.{li}",
                      f"flow.encoder.up_encoders.{li}")

    def resnet_inv(dst, src):
        m = {"b1.cv.w": ".block1.block.0.weight", "b1.cv.b": ".block1.block.0.bias",
             "b1.ln.w": ".block1.block.2.weight", "b1.ln.b": ".block1.block.2.bias",
             "b2.cv.w": ".block2.block.0.weight", "b2.cv.b": ".block2.block.0.bias",
             "b2.ln.w": ".block2.block.2.weight", "b2.ln.b": ".block2.block.2.bias",
             "mlp.w": ".mlp.1.weight", "mlp.b": ".mlp.1.bias",
             "res.w": ".res_conv.weight", "res.b": ".res_conv.bias"}
        for d, s in m.items():
            sd[src + s] = wire[f"{dst}.{d}"]

    def btrans_inv(dst, src):
        m = {"norm1.w": ".norm1.weight", "norm1.b": ".norm1.bias",
             "norm3.w": ".norm3.weight", "norm3.b": ".norm3.bias",
             "attn.q.w": ".attn1.to_q.weight", "attn.k.w": ".attn1.to_k.weight",
             "attn.v.w": ".attn1.to_v.weight",
             "attn.o.w": ".attn1.to_out.0.weight",
             "attn.o.b": ".attn1.to_out.0.bias",
             "ff.w1.w": ".ff.net.0.proj.weight", "ff.w1.b": ".ff.net.0.proj.bias",
             "ff.w2.w": ".ff.net.2.weight", "ff.w2.b": ".ff.net.2.bias"}
        for d, s in m.items():
            sd[src + s] = wire[f"{dst}.{d}"]

    est = "flow.decoder.estimator"
    for group, short, n in (("down_blocks", "dn", 1), ("mid_blocks", "md", tg.MID),
                            ("up_blocks", "up", 1)):
        for bi in range(n):
            resnet_inv(f"s3g.cfm.{short}.{bi}.r", f"{est}.{group}.{bi}.0")
            for ti in range(tg.TPB):
                btrans_inv(f"s3g.cfm.{short}.{bi}.t.{ti}",
                           f"{est}.{group}.{bi}.1.{ti}")
            if short in ("dn", "up"):
                sd[f"{est}.{group}.{bi}.2.weight"] = wire[f"s3g.cfm.{short}.{bi}.x.w"]
                sd[f"{est}.{group}.{bi}.2.bias"] = wire[f"s3g.cfm.{short}.{bi}.x.b"]

    for li in range(5):
        sd[f"mel2wav.f0_predictor.condnet.{li * 2}.weight"] = \
            wire[f"s3g.hift.f0.cn.{li}.w"]
        sd[f"mel2wav.f0_predictor.condnet.{li * 2}.bias"] = \
            wire[f"s3g.hift.f0.cn.{li}.b"]
    for ui in range(3):
        sd[f"mel2wav.ups.{ui}.weight"] = wire[f"s3g.hift.up.{ui}.w"]
        sd[f"mel2wav.ups.{ui}.bias"] = wire[f"s3g.hift.up.{ui}.b"]
        sd[f"mel2wav.source_downs.{ui}.weight"] = wire[f"s3g.hift.src_dn.{ui}.w"]
        sd[f"mel2wav.source_downs.{ui}.bias"] = wire[f"s3g.hift.src_dn.{ui}.b"]
        for src_rb, dst_rb in ((f"mel2wav.source_resblocks.{ui}",
                                f"s3g.hift.src_rb.{ui}"),):
            for k in range(3):
                sd[f"{src_rb}.convs1.{k}.weight"] = wire[f"{dst_rb}.cv1.{k}.w"]
                sd[f"{src_rb}.convs1.{k}.bias"] = wire[f"{dst_rb}.cv1.{k}.b"]
                sd[f"{src_rb}.convs2.{k}.weight"] = wire[f"{dst_rb}.cv2.{k}.w"]
                sd[f"{src_rb}.convs2.{k}.bias"] = wire[f"{dst_rb}.cv2.{k}.b"]
                sd[f"{src_rb}.activations1.{k}.alpha"] = wire[f"{dst_rb}.a1.{k}"]
                sd[f"{src_rb}.activations2.{k}.alpha"] = wire[f"{dst_rb}.a2.{k}"]
        for ki in range(3):
            src_rb = f"mel2wav.resblocks.{ui * 3 + ki}"
            dst_rb = f"s3g.hift.rb.{ui * 3 + ki}"
            for k in range(3):
                sd[f"{src_rb}.convs1.{k}.weight"] = wire[f"{dst_rb}.cv1.{k}.w"]
                sd[f"{src_rb}.convs1.{k}.bias"] = wire[f"{dst_rb}.cv1.{k}.b"]
                sd[f"{src_rb}.convs2.{k}.weight"] = wire[f"{dst_rb}.cv2.{k}.w"]
                sd[f"{src_rb}.convs2.{k}.bias"] = wire[f"{dst_rb}.cv2.{k}.b"]
                sd[f"{src_rb}.activations1.{k}.alpha"] = wire[f"{dst_rb}.a1.{k}"]
                sd[f"{src_rb}.activations2.{k}.alpha"] = wire[f"{dst_rb}.a2.{k}"]
    for dst, src in inv_flow.items():
        sd[src] = wire[dst]
    for k in ("s3g.cond.embedding", "s3g.cond.prompt_feat"):
        wire.pop(k, None)

    conv = ChatterboxS3GConverter(quantization="F32")
    conv.load_from_state_dict(sd, {
        "mel_dim": tg.MEL, "spk_dim": tg.SPK, "enc_hidden": tg.EH,
        "enc_layers": tg.ENC_L, "enc_up_layers": tg.UP_L,
        "attn_heads": tg.NH, "attn_head_dim": tg.HD,
        "cfm_mid_blocks": tg.MID, "cfm_transformers": tg.TPB})
    conv.set_conds(prompt_token=[11, 222],
                   prompt_feat=ref.t["s3g.cond.prompt_feat"].numpy()[None],
                   embedding=ref.t["s3g.cond.embedding"].numpy())
    out = tmp_path / "s3g.gguf"
    conv.convert_and_save(out)

    _tensor_map_check(out, wire)
    import codec_tpu

    m = codec_tpu.load_model(out)
    assert m.arch == "chatterbox_s3g"
    assert m.prompt_token.tolist() == [11, 222]
    pcm = m.decode(np.array([[5], [900], [42]], np.int32))
    assert pcm.shape == ((2 + 3) * 2 - tg.MEL_LEN1,) or True
    assert pcm.shape == (((2 + 3) * 2 - tg.MEL_LEN1) * 480,)
