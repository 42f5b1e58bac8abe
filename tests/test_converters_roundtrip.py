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
