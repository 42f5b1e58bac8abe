"""Quantized-weights path: GGUF Q8_0/Q4_K_M models load and stay within the
reference's relaxed parity thresholds (reference: tests/e2e/runner.py:40-56 —
Q8_0 corr −0.015, Q4_K_M corr −0.20)."""

import numpy as np
import pytest
import torch


@pytest.fixture(scope="module")
def hf_mimi():
    from transformers import MimiConfig, MimiModel

    torch.manual_seed(0)
    cfg = MimiConfig(
        sampling_rate=24000, frame_rate=12.5, hidden_size=64,
        num_hidden_layers=2, num_attention_heads=2, head_dim=32,
        num_key_value_heads=2, intermediate_size=128, num_filters=8,
        num_residual_layers=1, codebook_size=64, codebook_dim=32,
        vector_quantization_hidden_dimension=32, num_quantizers=4,
        num_semantic_quantizers=1, sliding_window=250, upsample_groups=64,
        upsampling_ratios=[8, 6, 5, 4], use_causal_conv=True,
    )
    return MimiModel(cfg).eval(), cfg


def _convert(model, cfg, quant, path):
    from codec_tpu.convert import get_converter

    c = get_converter("mimi")(quantization=quant)
    c.load_from_state_dict({k: v.numpy() for k, v in model.state_dict().items()},
                           cfg.to_dict())
    c.convert_and_save(path)


@pytest.mark.parametrize("quant,min_corr", [("F16", 0.999), ("Q8_0", 0.98)])
def test_quantized_mimi_decode(hf_mimi, tmp_path, quant, min_corr):
    import codec_tpu

    model, cfg = hf_mimi
    path = tmp_path / f"mimi_{quant}.gguf"
    _convert(model, cfg, quant, path)

    ours = codec_tpu.load_model(path)
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 64, (1, 4, 7))
    with torch.no_grad():
        want = model.decode(torch.from_numpy(codes))[0].numpy()[0, 0]
    got = ours.decode(codes[0].T)
    corr = np.corrcoef(got, want)[0, 1]
    assert corr > min_corr, f"{quant}: corr={corr}"


def test_bf16_native_load(hf_mimi, tmp_path):
    """16-bit compute path: an F16 checkpoint loads WITHOUT an f32 host
    upcast (reader returns native f16), device weights are bfloat16 (half
    the HBM of f32), and decode parity stays within the F16 gate."""
    import jax
    import jax.numpy as jnp

    import codec_tpu
    from codec_tpu.io.gguf import GGML_TYPE_F16

    model, cfg = hf_mimi
    path = tmp_path / "mimi_f16.gguf"
    _convert(model, cfg, "F16", path)

    ours = codec_tpu.load_model(path, compute_dtype="bfloat16")
    assert ours.compute_dtype == jnp.bfloat16
    assert ours.reader.prefer_16bit

    # host materialization of a wire-F16 tensor stays 16-bit
    name = next(n for n, i in ours.reader.tensors.items()
                if i.ggml_type == GGML_TYPE_F16)
    assert ours.reader.get(name).dtype == np.float16

    # device weights are 16-bit (HBM halves vs the f32 path)
    leaves = [l for l in jax.tree_util.tree_leaves(ours.params)
              if isinstance(l, jax.Array)]
    n16 = sum(1 for l in leaves if l.dtype == jnp.bfloat16)
    assert n16 == len(leaves), f"{len(leaves) - n16} leaves not bf16"

    rng = np.random.default_rng(0)
    codes = rng.integers(0, 64, (1, 4, 7))
    with torch.no_grad():
        want = model.decode(torch.from_numpy(codes))[0].numpy()[0, 0]
    got = ours.decode(codes[0].T).astype(np.float32)
    corr = np.corrcoef(got, want)[0, 1]
    # bf16 compute on a random-init fixture: recorded delta vs the f32 path
    assert corr > 0.95, f"bf16: corr={corr}"


def test_auto_dtype_follows_checkpoint(hf_mimi, tmp_path):
    import jax.numpy as jnp

    import codec_tpu

    model, cfg = hf_mimi
    f16 = tmp_path / "a_f16.gguf"
    f32 = tmp_path / "a_f32.gguf"
    _convert(model, cfg, "F16", f16)
    _convert(model, cfg, "F32", f32)
    assert codec_tpu.load_model(f16, compute_dtype="auto").compute_dtype == jnp.bfloat16
    assert codec_tpu.load_model(f32, compute_dtype="auto").compute_dtype == jnp.float32


def test_auto_dtype_quantized_off_tpu_is_f32(hf_mimi, tmp_path):
    """Quantized wire off-TPU resolves to float32 under "auto" even when
    the F16 passthrough tensors dominate the byte count (e2e regression:
    Q8_0 encode crashed mixing the f32 pcm input into bf16 convs on CPU)."""
    import jax
    import jax.numpy as jnp

    import codec_tpu

    model, cfg = hf_mimi
    q8 = tmp_path / "auto_q8.gguf"
    _convert(model, cfg, "Q8_0", q8)
    ours = codec_tpu.load_model(q8, compute_dtype="auto")
    want = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    assert ours.compute_dtype == want
    # the CLI-default (auto) surface must encode, whichever dtype resolved
    pcm = (np.random.default_rng(0).standard_normal(1920) * 0.1) \
        .astype(np.float32)
    codes = ours.encode(pcm)
    assert codes.shape[1] == ours.n_q


def test_bf16_encode_casts_input(hf_mimi, tmp_path):
    """Explicit 16-bit compute: encode casts the f32 / int16 pcm input to
    the compute dtype in-graph instead of rejecting it at the first conv,
    and the codes match the f32 path closely on a short clip."""
    import codec_tpu

    model, cfg = hf_mimi
    path = tmp_path / "enc_f16.gguf"
    _convert(model, cfg, "F16", path)
    ours = codec_tpu.load_model(path, compute_dtype="bfloat16")
    ref = codec_tpu.load_model(path, compute_dtype="float32")

    pcm = (np.random.default_rng(1).standard_normal(1920) * 0.1) \
        .astype(np.float32)
    codes16 = ours.encode(pcm)
    codes32 = ref.encode(pcm)
    assert codes16.shape == codes32.shape
    # bf16 activations flip some argmin near-ties on random weights;
    # the paths must still mostly agree
    agree = float((codes16 == codes32).mean())
    assert agree > 0.5, f"bf16 vs f32 code agreement {agree}"

    i16 = np.clip(np.rint(pcm * 32767.0), -32768, 32767).astype(np.int16)
    codes_i16 = ours.encode(i16)
    assert codes_i16.shape == codes16.shape


def test_q8_file_has_quantized_tensors(hf_mimi, tmp_path):
    from codec_tpu.io.gguf import GGUFReader, GGML_TYPE_Q8_0

    model, cfg = hf_mimi
    path = tmp_path / "mimi_q8.gguf"
    _convert(model, cfg, "Q8_0", path)
    r = GGUFReader(path)
    qtypes = {i.ggml_type for i in r.tensors.values()}
    assert GGML_TYPE_Q8_0 in qtypes, "expected some Q8_0 tensors"
    # codebooks must stay full precision
    assert r.tensors["q.s.layers.0.codebook.embed"].ggml_type != GGML_TYPE_Q8_0


def test_bf16_istft_models_decode():
    """16-bit compute through an iSTFT head (WavTokenizer): complex math
    upcasts to f32 in-graph (lax.complex rejects bf16), everything else
    stays bf16 — regression for the bench wavtokenizer_bf16_b1 section."""
    import jax
    import jax.numpy as jnp

    from codec_tpu.models.bench_init import random_wt_decode_params
    from codec_tpu.models.wavtokenizer import wt_decode_fn

    wcfg, wparams = random_wt_decode_params()
    p16 = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if isinstance(a, jax.Array) and a.dtype == jnp.float32 else a,
        wparams)
    codes = jnp.asarray(np.random.default_rng(0).integers(
        0, wcfg.codebook_size, (1, 40, 1)), jnp.int32)
    y32 = np.asarray(wt_decode_fn(wparams, codes, wcfg), np.float32)
    y16 = np.asarray(wt_decode_fn(p16, codes, wcfg)).astype(np.float32)
    assert y16.shape == y32.shape
    corr = np.corrcoef(y32.ravel(), y16.ravel())[0, 1]
    assert corr > 0.995
