"""Multi-chip data parallelism through the PRODUCT path.

The reference's codec_batch loops sequences serially on one device
(src/batch/batch.cpp, src/codec.cpp:640-786). Here `CodecModel.set_mesh`
makes every decode/encode batch-shard over a device mesh; these tests run
on the 8-virtual-CPU-device mesh from conftest.py and assert (a) the jitted
graphs really execute sharded (device output sharding spans all devices)
and (b) DP results match single-device results.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from codec_tpu.io.wav import read_wav


N_DEV = 8


@pytest.fixture(scope="module")
def wt_gguf(tmp_path_factory):
    from test_wavtokenizer_parity import HOP, TorchWT
    from codec_tpu.convert import get_converter

    ref = TorchWT().eval()
    c = get_converter("wavtokenizer")(quantization="F32")
    c.load_from_state_dict(ref.source_state_dict(),
                           {"sample_rate": 24000, "hop_size": HOP,
                            "has_encoder": True, "has_decoder": True})
    path = tmp_path_factory.mktemp("par") / "wt.gguf"
    c.convert_and_save(path)
    return path


@pytest.fixture(scope="module")
def codes_batch():
    rng = np.random.default_rng(7)
    return rng.integers(0, 64, (5, 6, 1)).astype(np.int32)   # B=5 → pads to 8


def test_dp_decode_sharded_and_matches(wt_gguf, codes_batch):
    import codec_tpu
    from codec_tpu.parallel.mesh import make_mesh

    ref_model = codec_tpu.load_model(wt_gguf)
    ref = ref_model.decode(codes_batch)

    model = codec_tpu.load_model(wt_gguf, mesh=make_mesh(N_DEV))
    out = model.decode(codes_batch)

    sh = model.last_out_sharding
    assert sh is not None, "no device output recorded"
    assert len(sh.device_set) == N_DEV, sh
    assert not sh.is_fully_replicated, sh
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


def test_dp_encode_sharded_and_matches(wt_gguf):
    import codec_tpu
    from codec_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(3)
    pcm = (rng.standard_normal((3, 320 * 4)) * 0.2).astype(np.float32)

    ref = codec_tpu.load_model(wt_gguf).encode(pcm)

    model = codec_tpu.load_model(wt_gguf, mesh=make_mesh(N_DEV))
    codes = model.encode(pcm)

    sh = model.last_out_sharding
    assert sh is not None and len(sh.device_set) == N_DEV, sh
    np.testing.assert_array_equal(codes, ref)


def test_dp_weights_replicated(wt_gguf):
    import codec_tpu
    from codec_tpu.parallel.mesh import make_mesh

    model = codec_tpu.load_model(wt_gguf, mesh=make_mesh(N_DEV))
    leaves = jax.tree_util.tree_leaves(model.params)
    arrs = [l for l in leaves if isinstance(l, jax.Array)]
    assert arrs, "no array leaves"
    for a in arrs[:5]:
        assert a.sharding.is_fully_replicated
        assert len(a.sharding.device_set) == N_DEV


def test_batch_decode_cli_dp(wt_gguf, tmp_path, capsys):
    """`codec-batch-decode --dp 8`: the CLI path decodes sharded and writes
    per-sequence WAVs identical to the single-device CLI run."""
    from codec_tpu.cli.batch_decode import main

    rng = np.random.default_rng(11)
    files = []
    # equal lengths: heterogeneous lengths auto-pipeline in the non-DP
    # run (per-sequence exact-length decodes), which for the NON-causal
    # WavTokenizer legitimately differs from the DP run's pad-to-max
    # batch — equal lengths keep both runs on the same batched graph
    for i, t in enumerate((4, 4, 4)):
        f = tmp_path / f"s{i}.npy"
        np.save(f, rng.integers(0, 64, (t, 1)).astype(np.int32))
        files.append(str(f))

    ref_dir = tmp_path / "ref"
    assert main(["--model", str(wt_gguf), "--codes", *files,
                 "--out-dir", str(ref_dir)]) == 0
    dp_dir = tmp_path / "dp"
    assert main(["--model", str(wt_gguf), "--codes", *files,
                 "--out-dir", str(dp_dir), "--dp", str(N_DEV)]) == 0
    out = capsys.readouterr().out
    assert "device output sharding" in out

    for i in range(3):
        y_ref, _ = read_wav(ref_dir / f"s{i}.wav")
        y_dp, _ = read_wav(dp_dir / f"s{i}.wav")
        # WAVs are int16-quantized; float-reorder noise across the two
        # compiles can flip the LSB.
        np.testing.assert_allclose(y_dp, y_ref, atol=2.5 / 32767)


def test_dp_latent_decode_sharded(tmp_path_factory):
    """decode_latent under DP (soprano latent-only model via _run_batched)."""
    import test_soprano_parity as tsp
    from codec_tpu.convert import get_converter

    import codec_tpu
    from codec_tpu.parallel.mesh import make_mesh

    sd = tsp.make_sd()
    c = get_converter("soprano")(quantization="F32")
    c.load_from_state_dict({k: v.numpy() for k, v in sd.items()}, {
        "sample_rate": 32000, "hop_size": tsp.HOP, "n_fft": tsp.N_FFT,
        "latent_dim": tsp.LAT, "decoder_dim": tsp.DIM,
        "intermediate_dim": tsp.INTER, "num_layers": tsp.LAYERS,
        "upscale": tsp.UPSCALE, "dw_kernel": tsp.DWK,
    })
    path = tmp_path_factory.mktemp("sop_dp") / "tiny.gguf"
    c.convert_and_save(path)

    rng = np.random.default_rng(5)
    latent = (rng.standard_normal((3, 7, tsp.LAT)) * 0.5).astype(np.float32)

    ref = codec_tpu.load_model(path).decode_latent(latent)
    model = codec_tpu.load_model(path, mesh=make_mesh(N_DEV))
    out = model.decode_latent(latent)

    sh = model.last_out_sharding
    assert sh is not None and len(sh.device_set) == N_DEV, sh
    assert not sh.is_fully_replicated, sh
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


def test_dp_dac_decode_sharded_and_matches(tmp_path_factory):
    """DAC (the second bench arch) through the DP product path."""
    import torch
    from transformers import DacConfig, DacModel

    import codec_tpu
    from codec_tpu.convert import get_converter
    from codec_tpu.parallel.mesh import make_mesh

    torch.manual_seed(0)
    cfg = DacConfig(encoder_hidden_size=8, decoder_hidden_size=32,
                    downsampling_ratios=[2, 4, 5, 8],
                    upsampling_ratios=[8, 5, 4, 2], n_codebooks=4,
                    codebook_size=32, codebook_dim=4, hidden_size=64,
                    sampling_rate=24000)
    ref_torch = DacModel(cfg).eval()
    conv = get_converter("dac")(quantization="F32")
    conv.load_from_state_dict(
        {k: v.numpy() for k, v in ref_torch.state_dict().items()},
        cfg.to_dict())
    path = tmp_path_factory.mktemp("dac_dp") / "dac.gguf"
    conv.convert_and_save(path)

    rng = np.random.default_rng(9)
    codes = rng.integers(0, 32, (5, 6, 4)).astype(np.int32)

    ref = codec_tpu.load_model(path).decode(codes)
    model = codec_tpu.load_model(path, mesh=make_mesh(N_DEV))
    out = model.decode(codes)

    sh = model.last_out_sharding
    assert sh is not None and len(sh.device_set) == N_DEV, sh
    assert not sh.is_fully_replicated, sh
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


_COLLECTIVES = ("all-reduce", "all-gather", "all-to-all",
                "collective-permute", "reduce-scatter")


def test_dp_batched_lm_frame_sharded_no_collectives(tmp_path_factory):
    """A batched AR-LM frame (residual_depth_ar fused_frame_batched) runs
    data-parallel over the mesh: per-stream results identical to the
    single-stream fused frame, outputs device-sharded, and the compiled
    steady-state HLO contains ZERO collectives (pure DP — each stream is
    independent, nothing should ride the interconnect)."""
    import jax.random as jr
    from jax.sharding import NamedSharding, PartitionSpec as P

    from codec_tpu.io.gguf import GGUFReader
    from codec_tpu.lm import create_lm
    from codec_tpu.models.bench_lm_init import write_rda_gguf
    from codec_tpu.parallel.mesh import make_mesh

    p = tmp_path_factory.mktemp("rda_dp") / "rda.gguf"
    write_rda_gguf(p, h=64, dh=32, n_cb=4, vocab=64, layers=2, heads=2,
                   kv=1, hdim=16, inter=64)
    lm = create_lm(GGUFReader(p))
    mesh = make_mesh(N_DEV)

    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.standard_normal((N_DEV, lm.info.hidden_dim)),
                    jnp.float32)
    keys = jr.split(jr.PRNGKey(3), N_DEV)
    tc = jnp.zeros((N_DEV,), jnp.int32)

    sh = NamedSharding(mesh, P("dp"))
    h_s = jax.device_put(h, sh)
    keys_s = jax.device_put(keys, sh)
    tc_s = jax.device_put(tc, sh)

    batched = lm.fused_frame_batched()
    out = batched(h_s, keys_s, tc_s)
    assert len(out.sharding.device_set) == N_DEV, out.sharding
    assert not out.sharding.is_fully_replicated, out.sharding

    single = lm.fused_frame()
    want = np.stack([np.asarray(single(h[i], keys[i], tc[i]))
                     for i in range(N_DEV)])
    np.testing.assert_array_equal(np.asarray(out), want)

    hlo = batched._jit.lower(batched._weights, h_s, keys_s, tc_s
                             ).compile().as_text()
    found = [c for c in _COLLECTIVES if c in hlo]
    assert not found, f"collectives in pure-DP LM frame HLO: {found}"


def test_dp_serve_batch_decode(wt_gguf, codes_batch):
    """Concurrent serving over a DP mesh: the server-style path (one model,
    many requests batched) decodes sharded and each request's waveform
    matches its single-device decode."""
    from concurrent.futures import ThreadPoolExecutor

    import codec_tpu
    from codec_tpu.parallel.mesh import make_mesh

    ref_model = codec_tpu.load_model(wt_gguf)
    model = codec_tpu.load_model(wt_gguf, mesh=make_mesh(N_DEV))
    model.decode(codes_batch)                      # warm the batched graph

    def one(i):
        return model.decode(codes_batch[i: i + 1])[0]

    with ThreadPoolExecutor(4) as ex:
        outs = list(ex.map(one, range(codes_batch.shape[0])))
    for i, got in enumerate(outs):
        want = ref_model.decode(codes_batch[i: i + 1])[0]
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_dryrun_multichip_entry():
    """The driver's dryrun drives the public CodecModel path."""
    import __graft_entry__

    __graft_entry__.dryrun_multichip(N_DEV)


# ---------------------------------------------------------------------------
# tensor parallelism: the TTS backbone (lm/backbone.py set_mesh)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def tp_backbone_gguf(tmp_path_factory):
    """Tiny llama backbone whose head/kv/ffn dims divide the 8-device mesh
    (heads=8, kv_heads=8, ffn=64)."""
    import torch
    from transformers import LlamaConfig, LlamaModel

    from codec_tpu.convert import get_converter

    torch.manual_seed(5)
    cfg = LlamaConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=8, num_key_value_heads=8, head_dim=4,
        vocab_size=64, rms_norm_eps=1e-5, rope_theta=10000.0,
        max_position_embeddings=64)
    hf = LlamaModel(cfg).eval()
    conv = get_converter("llama_backbone")(quantization="F32")
    conv.load_from_state_dict(
        {k: v.numpy() for k, v in hf.state_dict().items()}, cfg.to_dict())
    path = tmp_path_factory.mktemp("tp") / "bb.gguf"
    conv.convert_and_save(path)
    return path


def test_tp_backbone_matches_single_and_partitions(tp_backbone_gguf):
    """Megatron-sharded backbone: prefill+step outputs match the
    single-device backbone, weights/KV are device-sharded, and the
    compiled step HLO contains the row-parallel all-reduce (proof the
    matmuls really partition over the mesh)."""
    from codec_tpu.lm.backbone import create_backbone
    from codec_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(2)
    embeds = rng.standard_normal((5, 32)).astype(np.float32) * 0.3

    ref = create_backbone(tp_backbone_gguf, max_ctx=32)
    want_prefill = ref.prefill(embeds)
    want_step = ref.step(embeds[0])

    tp = create_backbone(tp_backbone_gguf, max_ctx=32)
    tp.set_mesh(make_mesh(N_DEV, axis="tp"), axis="tp")
    q_sh = tp.params["layers"]["q"].sharding
    assert len(q_sh.device_set) == N_DEV and not q_sh.is_fully_replicated
    assert len(tp.kv.sharding.device_set) == N_DEV
    got_prefill = tp.prefill(embeds)
    got_step = tp.step(embeds[0])
    np.testing.assert_allclose(got_prefill, want_prefill, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(got_step, want_step, atol=1e-4, rtol=1e-4)

    fn = tp._fwd(1)
    hlo = fn.lower(tp.params, tp.kv, tp.pos,
                   jnp.asarray(embeds[:1], tp.dtype)).compile().as_text()
    assert "all-reduce" in hlo, "TP backbone step HLO has no all-reduce"

    # KV stays sharded across steps and reset
    assert len(tp.kv.sharding.device_set) == N_DEV
    tp.reset()
    assert len(tp.kv.sharding.device_set) == N_DEV


def test_tp_backbone_rejects_indivisible(tp_backbone_gguf):
    from codec_tpu.lm.backbone import create_backbone
    from codec_tpu.parallel.mesh import make_mesh

    bb = create_backbone(tp_backbone_gguf, max_ctx=32)
    bb.cfg.n_kv_heads = 3                      # 3 % 8 != 0
    with pytest.raises(ValueError, match="not divisible"):
        bb.set_mesh(make_mesh(N_DEV, axis="tp"), axis="tp")


def test_tp_gen_chunk_matches_unsharded(tp_backbone_gguf, tmp_path_factory):
    """The chunked on-device generation loop (lm/fused_gen.py) over a
    TP-sharded backbone: whole AR generation — LM frame + backbone step —
    runs tensor-parallel in one compiled while_loop and emits the same
    codes as the unsharded chunked run."""
    from codec_tpu.io.gguf import GGUFReader
    from codec_tpu.lm.audio_lm import AudioLM
    from codec_tpu.lm.backbone import create_backbone
    from codec_tpu.lm.tts_runner import run_codebook_ar
    from codec_tpu.models.bench_lm_init import write_rda_gguf
    from codec_tpu.ops.sample import OnDeviceSampling
    from codec_tpu.parallel.mesh import make_mesh

    p = tmp_path_factory.mktemp("tp_gen") / "rda.gguf"
    write_rda_gguf(p, h=32, dh=32, n_cb=4, vocab=64, layers=2, heads=2,
                   kv=1, hdim=16, inter=64)
    prompt = [np.full(32, 0.1, np.float32)]
    ods = OnDeviceSampling(chunk_frames=3)

    ref_bb = create_backbone(tp_backbone_gguf, max_ctx=32)
    ref = run_codebook_ar(AudioLM(GGUFReader(p)), ref_bb, prompt,
                          max_steps=5, decode=False, on_device=ods)

    tp_bb = create_backbone(tp_backbone_gguf, max_ctx=32)
    tp_bb.set_mesh(make_mesh(N_DEV, axis="tp"), axis="tp")
    got = run_codebook_ar(AudioLM(GGUFReader(p)), tp_bb, prompt,
                          max_steps=5, decode=False, on_device=ods)
    np.testing.assert_array_equal(ref.codes, got.codes)
    assert got.n_steps == ref.n_steps


# ---------------------------------------------------------------------------
# sequence parallelism: one long stream's time dim over the mesh
# ---------------------------------------------------------------------------

def test_sp_decode_sharded_and_matches(wt_gguf):
    """CodecModel.set_mesh(dim=1): a SINGLE stream decodes with its time
    dim split across the mesh (XLA inserts the conv halo exchanges).
    Output matches the single-device decode up to partitioned-reduction
    float reorder and stays time-sharded on device."""
    import codec_tpu
    from codec_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(11)
    codes = rng.integers(0, 64, (1, 48, 1)).astype(np.int32)

    ref = codec_tpu.load_model(wt_gguf).decode(codes)

    model = codec_tpu.load_model(wt_gguf)
    model.set_mesh(make_mesh(N_DEV, axis="sp"), axis="sp", dim=1)
    got = model.decode(codes)
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)
    sh = model.last_out_sharding
    assert sh is not None and len(sh.device_set) == N_DEV, sh
    assert not sh.is_fully_replicated, sh


def test_sp_dac_decode_matches(tmp_path_factory):
    """SP over a deep SEANet/Snake stack (symmetric padding, upsampling
    transposed convs): numerics match single-device."""
    import torch
    from transformers import DacConfig, DacModel

    import codec_tpu
    from codec_tpu.convert import get_converter
    from codec_tpu.parallel.mesh import make_mesh

    torch.manual_seed(0)
    cfg = DacConfig(
        encoder_hidden_size=8, decoder_hidden_size=32,
        downsampling_ratios=[2, 4, 5, 8], upsampling_ratios=[8, 5, 4, 2],
        n_codebooks=2, codebook_size=32, codebook_dim=4, hidden_size=16,
        sampling_rate=24000)
    hf = DacModel(cfg).eval()
    c = get_converter("dac")(quantization="F32")
    c.load_from_state_dict(
        {k: v.numpy() for k, v in hf.state_dict().items()}, cfg.to_dict())
    path = tmp_path_factory.mktemp("sp_dac") / "dac.gguf"
    c.convert_and_save(path)

    rng = np.random.default_rng(3)
    codes = rng.integers(0, 32, (1, 24, 2)).astype(np.int32)
    ref = codec_tpu.load_model(path).decode(codes)

    model = codec_tpu.load_model(path)
    model.set_mesh(make_mesh(N_DEV, axis="sp"), axis="sp", dim=1)
    got = model.decode(codes)
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)
    assert len(model.last_out_sharding.device_set) == N_DEV


def test_batch_decode_cli_sp(wt_gguf, tmp_path, capsys):
    """`codec-batch-decode --sp 8`: one long sequence decodes with its time
    dim sharded; WAV matches the single-device CLI run."""
    from codec_tpu.cli.batch_decode import main

    rng = np.random.default_rng(12)
    f = tmp_path / "long.npy"
    np.save(f, rng.integers(0, 64, (48, 1)).astype(np.int32))

    ref_dir = tmp_path / "ref_sp"
    assert main(["--model", str(wt_gguf), "--codes", str(f),
                 "--out-dir", str(ref_dir)]) == 0
    sp_dir = tmp_path / "sp"
    assert main(["--model", str(wt_gguf), "--codes", str(f),
                 "--out-dir", str(sp_dir), "--sp", str(N_DEV)]) == 0
    assert "sp=8: device output sharding" in capsys.readouterr().out

    y_ref, _ = read_wav(ref_dir / "long.wav")
    y_sp, _ = read_wav(sp_dir / "long.wav")
    np.testing.assert_allclose(y_sp, y_ref, atol=2.5 / 32767)


# ---------------------------------------------------------------------------
# pipeline parallelism: the TTS backbone staged over the mesh
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def pp_backbone_gguf(tmp_path_factory):
    """Tiny llama backbone with 8 layers so the full 8-device mesh gets
    one layer per stage."""
    import torch
    from transformers import LlamaConfig, LlamaModel

    from codec_tpu.convert import get_converter

    torch.manual_seed(6)
    cfg = LlamaConfig(
        hidden_size=32, intermediate_size=48, num_hidden_layers=8,
        num_attention_heads=4, num_key_value_heads=2, head_dim=8,
        vocab_size=64, rms_norm_eps=1e-5, rope_theta=10000.0,
        max_position_embeddings=64)
    hf = LlamaModel(cfg).eval()
    conv = get_converter("llama_backbone")(quantization="F32")
    conv.load_from_state_dict(
        {k: v.numpy() for k, v in hf.state_dict().items()}, cfg.to_dict())
    path = tmp_path_factory.mktemp("pp") / "bb.gguf"
    conv.convert_and_save(path)
    return path


def test_pp_backbone_matches_single_and_partitions(pp_backbone_gguf):
    """GPipe-staged backbone (set_mesh_pp): microbatched prefill + 1-token
    steps match the single-device backbone, layer weights/KV are sharded
    on the layer axis, and the compiled HLO carries the stage-to-stage
    collective-permute (proof the activations really hop the ring)."""
    from codec_tpu.lm.backbone import create_backbone
    from codec_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(4)
    embeds = rng.standard_normal((7, 32)).astype(np.float32) * 0.3

    ref = create_backbone(pp_backbone_gguf, max_ctx=32)
    want_prefill = ref.prefill(embeds)
    want_step = ref.step(embeds[0])

    pp = create_backbone(pp_backbone_gguf, max_ctx=32)
    pp.set_mesh_pp(make_mesh(N_DEV, axis="pp"), axis="pp", microbatches=4)
    q_sh = pp.params["layers"]["q"].sharding
    assert len(q_sh.device_set) == N_DEV and not q_sh.is_fully_replicated
    assert len(pp.kv.sharding.device_set) == N_DEV
    got_prefill = pp.prefill(embeds)
    got_step = pp.step(embeds[0])
    np.testing.assert_allclose(got_prefill, want_prefill, atol=1e-4,
                               rtol=1e-4)
    np.testing.assert_allclose(got_step, want_step, atol=1e-4, rtol=1e-4)

    fn = pp._fwd(1)
    hlo = fn.lower(pp.params, pp.kv, pp.pos,
                   jnp.asarray(embeds[:1], pp.dtype)).compile().as_text()
    assert "collective-permute" in hlo, \
        "PP backbone HLO has no collective-permute"

    # KV stays stage-sharded across steps and reset
    assert len(pp.kv.sharding.device_set) == N_DEV
    pp.reset()
    assert len(pp.kv.sharding.device_set) == N_DEV


def test_pp_backbone_two_stage_and_rejects(pp_backbone_gguf):
    """A 2-stage pipeline (4 layers per stage) also matches; indivisible
    layer counts are rejected."""
    from codec_tpu.lm.backbone import create_backbone
    from codec_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(5)
    embeds = rng.standard_normal((5, 32)).astype(np.float32) * 0.3

    ref = create_backbone(pp_backbone_gguf, max_ctx=32)
    want = ref.prefill(embeds)

    pp = create_backbone(pp_backbone_gguf, max_ctx=32)
    pp.set_mesh_pp(make_mesh(2, axis="pp"), axis="pp", microbatches=2)
    np.testing.assert_allclose(pp.prefill(embeds), want, atol=1e-4,
                               rtol=1e-4)

    bad = create_backbone(pp_backbone_gguf, max_ctx=32)
    bad.cfg.n_layers = 7
    with pytest.raises(ValueError, match="not divisible"):
        bad.set_mesh_pp(make_mesh(N_DEV, axis="pp"), axis="pp")


def test_pp_gen_matches_unsharded(pp_backbone_gguf, tmp_path_factory):
    """Whole AR generation through the host tts_runner loop with a
    pipeline-staged backbone emits the same codes as unsharded."""
    from codec_tpu.io.gguf import GGUFReader
    from codec_tpu.lm.audio_lm import AudioLM
    from codec_tpu.lm.backbone import create_backbone
    from codec_tpu.lm.tts_runner import run_codebook_ar
    from codec_tpu.models.bench_lm_init import write_rda_gguf
    from codec_tpu.parallel.mesh import make_mesh

    p = tmp_path_factory.mktemp("pp_gen") / "rda.gguf"
    write_rda_gguf(p, h=32, dh=32, n_cb=4, vocab=64, layers=2, heads=2,
                   kv=1, hdim=16, inter=64)
    prompt = [np.full(32, 0.1, np.float32)]

    ref_bb = create_backbone(pp_backbone_gguf, max_ctx=32)
    ref = run_codebook_ar(AudioLM(GGUFReader(p)), ref_bb, prompt,
                          max_steps=5, decode=False)

    pp_bb = create_backbone(pp_backbone_gguf, max_ctx=32)
    pp_bb.set_mesh_pp(make_mesh(N_DEV, axis="pp"), axis="pp")
    got = run_codebook_ar(AudioLM(GGUFReader(p)), pp_bb, prompt,
                          max_steps=5, decode=False)
    np.testing.assert_array_equal(ref.codes, got.codes)
    assert got.n_steps == ref.n_steps


# ---------------------------------------------------------------------------
# expert parallelism: MoE backbone experts over the mesh
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def moe_backbone_gguf(tmp_path_factory):
    """Tiny Qwen3-MoE backbone: 8 experts (one per device), top-2 routing."""
    import torch
    from transformers import Qwen3MoeConfig, Qwen3MoeModel

    from codec_tpu.convert import get_converter

    torch.manual_seed(7)
    cfg = Qwen3MoeConfig(
        hidden_size=32, intermediate_size=48, moe_intermediate_size=16,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, vocab_size=64, rms_norm_eps=1e-6, rope_theta=10000.0,
        max_position_embeddings=64, num_experts=8, num_experts_per_tok=2,
        norm_topk_prob=True, decoder_sparse_step=1, mlp_only_layers=[])
    hf = Qwen3MoeModel(cfg).eval()
    conv = get_converter("llama_backbone")(quantization="F32")
    conv.load_from_state_dict(
        {k: v.numpy() for k, v in hf.state_dict().items()}, cfg.to_dict())
    path = tmp_path_factory.mktemp("ep") / "moe.gguf"
    conv.convert_and_save(path)
    return path


def test_ep_backbone_matches_single_and_partitions(moe_backbone_gguf):
    """Expert-parallel MoE backbone (set_mesh_ep): prefill+step match the
    single-device run, expert weights are sharded on the expert axis, and
    the compiled HLO carries the per-layer combine all-reduce."""
    from codec_tpu.lm.backbone import create_backbone
    from codec_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(8)
    embeds = rng.standard_normal((5, 32)).astype(np.float32) * 0.3

    ref = create_backbone(moe_backbone_gguf, max_ctx=32)
    want_prefill = ref.prefill(embeds)
    want_step = ref.step(embeds[0])

    ep = create_backbone(moe_backbone_gguf, max_ctx=32)
    ep.set_mesh_ep(make_mesh(N_DEV, axis="ep"))
    e_sh = ep.params["layers"]["gate_exps"].sharding
    assert len(e_sh.device_set) == N_DEV and not e_sh.is_fully_replicated
    got_prefill = ep.prefill(embeds)
    got_step = ep.step(embeds[0])
    np.testing.assert_allclose(got_prefill, want_prefill, atol=1e-4,
                               rtol=1e-4)
    np.testing.assert_allclose(got_step, want_step, atol=1e-4, rtol=1e-4)

    fn = ep._fwd(1)
    hlo = fn.lower(ep.params, ep.kv, ep.pos,
                   jnp.asarray(embeds[:1], ep.dtype)).compile().as_text()
    assert "all-reduce" in hlo, "EP backbone step HLO has no all-reduce"


def test_ep_rejects_dense_and_indivisible(moe_backbone_gguf,
                                          pp_backbone_gguf):
    from codec_tpu.lm.backbone import create_backbone
    from codec_tpu.parallel.mesh import make_mesh

    dense = create_backbone(pp_backbone_gguf, max_ctx=32)
    with pytest.raises(ValueError, match="not a MoE"):
        dense.set_mesh_ep(make_mesh(N_DEV, axis="ep"))

    moe = create_backbone(moe_backbone_gguf, max_ctx=32)
    moe.cfg.n_experts = 6                  # 6 % 8 != 0
    with pytest.raises(ValueError, match="not divisible"):
        moe.set_mesh_ep(make_mesh(N_DEV, axis="ep"))


def test_tp_moe_backbone_matches(moe_backbone_gguf):
    """TP over a MoE backbone: every expert's ffn dim splits column/row-
    parallel (moe_ffn_dim=16 over a 2-chip mesh); outputs match."""
    from codec_tpu.lm.backbone import create_backbone
    from codec_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(9)
    embeds = rng.standard_normal((4, 32)).astype(np.float32) * 0.3

    ref = create_backbone(moe_backbone_gguf, max_ctx=32)
    want = ref.prefill(embeds)

    tp = create_backbone(moe_backbone_gguf, max_ctx=32)
    tp.set_mesh(make_mesh(2, axis="tp"), axis="tp")
    g_sh = tp.params["layers"]["gate_exps"].sharding
    assert not g_sh.is_fully_replicated
    np.testing.assert_allclose(tp.prefill(embeds), want, atol=1e-4,
                               rtol=1e-4)


def test_pp_moe_backbone_matches(moe_backbone_gguf):
    """PP composes with MoE for free: expert tensors ride the layer-axis
    stage sharding; a 2-stage pipelined MoE prefill matches."""
    from codec_tpu.lm.backbone import create_backbone
    from codec_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(10)
    embeds = rng.standard_normal((4, 32)).astype(np.float32) * 0.3

    ref = create_backbone(moe_backbone_gguf, max_ctx=32)
    want = ref.prefill(embeds)

    pp = create_backbone(moe_backbone_gguf, max_ctx=32)
    pp.set_mesh_pp(make_mesh(2, axis="pp"), axis="pp", microbatches=2)
    np.testing.assert_allclose(pp.prefill(embeds), want, atol=1e-4,
                               rtol=1e-4)


def test_ep_gen_chunk_matches_unsharded(moe_backbone_gguf,
                                        tmp_path_factory):
    """The chunked on-device generation loop over an EP-sharded MoE
    backbone: jit propagates the expert sharding into the while_loop and
    the emitted codes match the unsharded chunked run."""
    from codec_tpu.io.gguf import GGUFReader
    from codec_tpu.lm.audio_lm import AudioLM
    from codec_tpu.lm.backbone import create_backbone
    from codec_tpu.lm.tts_runner import run_codebook_ar
    from codec_tpu.models.bench_lm_init import write_rda_gguf
    from codec_tpu.ops.sample import OnDeviceSampling
    from codec_tpu.parallel.mesh import make_mesh

    p = tmp_path_factory.mktemp("ep_gen") / "rda.gguf"
    write_rda_gguf(p, h=32, dh=32, n_cb=4, vocab=64, layers=2, heads=2,
                   kv=1, hdim=16, inter=64)
    prompt = [np.full(32, 0.1, np.float32)]
    ods = OnDeviceSampling(chunk_frames=3)

    ref_bb = create_backbone(moe_backbone_gguf, max_ctx=32)
    ref = run_codebook_ar(AudioLM(GGUFReader(p)), ref_bb, prompt,
                          max_steps=5, decode=False, on_device=ods)

    ep_bb = create_backbone(moe_backbone_gguf, max_ctx=32)
    ep_bb.set_mesh_ep(make_mesh(N_DEV, axis="ep"))
    got = run_codebook_ar(AudioLM(GGUFReader(p)), ep_bb, prompt,
                          max_steps=5, decode=False, on_device=ods)
    np.testing.assert_array_equal(ref.codes, got.codes)
    assert got.n_steps == ref.n_steps


def test_pp_quantized_backbone_matches(tmp_path_factory):
    """PP over packed-quantized (Q8_0) backbone weights: whole layers per
    stage keep the fused dequant-matmul path intact; outputs match the
    unsharded quantized backbone."""
    import torch
    from transformers import LlamaConfig, LlamaModel

    from codec_tpu.convert import get_converter
    from codec_tpu.lm.backbone import create_backbone
    from codec_tpu.parallel.mesh import make_mesh

    torch.manual_seed(8)
    cfg = LlamaConfig(
        hidden_size=64, intermediate_size=64, num_hidden_layers=4,
        num_attention_heads=2, num_key_value_heads=2, head_dim=32,
        vocab_size=64, rms_norm_eps=1e-5, rope_theta=10000.0,
        max_position_embeddings=64)
    hf = LlamaModel(cfg).eval()
    conv = get_converter("llama_backbone")(quantization="Q8_0")
    conv.load_from_state_dict(
        {k: v.numpy() for k, v in hf.state_dict().items()}, cfg.to_dict())
    path = tmp_path_factory.mktemp("ppq") / "bb_q8.gguf"
    conv.convert_and_save(path)

    rng = np.random.default_rng(12)
    embeds = rng.standard_normal((5, 64)).astype(np.float32) * 0.3

    ref = create_backbone(path, max_ctx=32, quantized=True)
    assert isinstance(ref.params["layers"]["q"], dict), "not packed-quant"
    want_prefill = ref.prefill(embeds)
    want_step = ref.step(embeds[0])

    pp = create_backbone(path, max_ctx=32, quantized=True)
    pp.set_mesh_pp(make_mesh(4, axis="pp"), axis="pp", microbatches=2)
    qs_sh = pp.params["layers"]["q"]["qs"].sharding
    assert len(qs_sh.device_set) == 4 and not qs_sh.is_fully_replicated
    np.testing.assert_allclose(pp.prefill(embeds), want_prefill,
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(pp.step(embeds[0]), want_step,
                               atol=1e-4, rtol=1e-4)


def test_tp_batched_gen_matches_unsharded(tp_backbone_gguf,
                                          tmp_path_factory):
    """The production serving shape: B concurrent generations through ONE
    batched on-device chunk (run_codebook_ar_batch) over a TP-sharded
    backbone — batch dim rides along, every GEMM splits Megatron-style.
    Codes match the unsharded batched run stream-for-stream."""
    from codec_tpu.io.gguf import GGUFReader
    from codec_tpu.lm import create_lm
    from codec_tpu.lm.audio_lm import AudioLM
    from codec_tpu.lm.backbone import create_backbone
    from codec_tpu.lm.tts_runner import run_codebook_ar_batch
    from codec_tpu.models.bench_lm_init import write_rda_gguf
    from codec_tpu.ops.sample import OnDeviceSampling
    from codec_tpu.parallel.mesh import make_mesh

    p = tmp_path_factory.mktemp("tp_batch") / "rda.gguf"
    write_rda_gguf(p, h=32, dh=32, n_cb=4, vocab=64, layers=2, heads=2,
                   kv=1, hdim=16, inter=64)
    rng = np.random.default_rng(13)
    prompts = [[(rng.standard_normal(32) * 0.3).astype(np.float32)]
               for _ in range(3)]
    ods = OnDeviceSampling(temperature=0.8, top_k=5, seed=4, chunk_frames=3)

    def alms(n, shared):
        return [AudioLM(GGUFReader(p), lm=shared) for _ in range(n)]

    shared = create_lm(GGUFReader(p))
    ref_bb = create_backbone(tp_backbone_gguf, max_ctx=32)
    ref = run_codebook_ar_batch(alms(3, shared), ref_bb, prompts, ods,
                                max_steps=5, decode=False)

    shared2 = create_lm(GGUFReader(p))
    tp_bb = create_backbone(tp_backbone_gguf, max_ctx=32)
    tp_bb.set_mesh(make_mesh(N_DEV, axis="tp"), axis="tp")
    got = run_codebook_ar_batch(alms(3, shared2), tp_bb, prompts, ods,
                                max_steps=5, decode=False)
    for s in range(3):
        np.testing.assert_array_equal(got[s].codes, ref[s].codes)
        assert got[s].n_steps == ref[s].n_steps


def test_dp_tp_batched_gen_2d_mesh(tp_backbone_gguf, tmp_path_factory):
    """DP x TP on one 2-D mesh: 4 streams' KV/hidden/PRNG state split over
    `dp` while every backbone GEMM splits over `tp` — codes match the
    unsharded batched run stream-for-stream, and the carried KV really
    lands sharded over all 8 devices."""
    from codec_tpu.io.gguf import GGUFReader
    from codec_tpu.lm import create_lm
    from codec_tpu.lm.audio_lm import AudioLM
    from codec_tpu.lm.backbone import create_backbone
    from codec_tpu.lm.tts_runner import run_codebook_ar_batch
    from codec_tpu.models.bench_lm_init import write_rda_gguf
    from codec_tpu.ops.sample import OnDeviceSampling
    from codec_tpu.parallel.mesh import make_mesh_2d

    p = tmp_path_factory.mktemp("dptp") / "rda.gguf"
    write_rda_gguf(p, h=32, dh=32, n_cb=4, vocab=64, layers=2, heads=2,
                   kv=1, hdim=16, inter=64)
    rng = np.random.default_rng(14)
    prompts = [[(rng.standard_normal(32) * 0.3).astype(np.float32)]
               for _ in range(4)]
    ods = OnDeviceSampling(temperature=0.7, top_k=4, seed=6, chunk_frames=3)

    def alms(shared):
        return [AudioLM(GGUFReader(p), lm=shared) for _ in range(4)]

    ref_bb = create_backbone(tp_backbone_gguf, max_ctx=32)
    ref = run_codebook_ar_batch(alms(create_lm(GGUFReader(p))), ref_bb,
                                prompts, ods, max_steps=5, decode=False)

    mesh = make_mesh_2d(4, 2)                      # dp=4 x tp=2
    bb = create_backbone(tp_backbone_gguf, max_ctx=32)
    bb.set_mesh(mesh, axis="tp")
    got = run_codebook_ar_batch(alms(create_lm(GGUFReader(p))), bb,
                                prompts, ods, max_steps=5, decode=False,
                                mesh=mesh)
    for s in range(4):
        np.testing.assert_array_equal(got[s].codes, ref[s].codes)
        assert got[s].n_steps == ref[s].n_steps

    with pytest.raises(ValueError, match="not divisible"):
        run_codebook_ar_batch(
            alms(create_lm(GGUFReader(p)))[:3], bb, prompts[:3], ods,
            max_steps=2, decode=False, mesh=mesh)


def test_pp_prefill_to_cache_end(pp_backbone_gguf):
    """Regression: a PP prefill whose padded microbatches would spill past
    max_ctx (pos0 + n_mb*mb > max_ctx) must not clamp-shift KV writes.
    Prefill 1 token then 15 more into a 16-slot cache (mb rounds 15 up);
    every step output must match the dense backbone."""
    from codec_tpu.lm.backbone import create_backbone
    from codec_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(15)
    embeds = rng.standard_normal((16, 32)).astype(np.float32) * 0.3

    ref = create_backbone(pp_backbone_gguf, max_ctx=16)
    ref.prefill(embeds[:1])
    want = ref.prefill(embeds[1:])

    pp = create_backbone(pp_backbone_gguf, max_ctx=16)
    pp.set_mesh_pp(make_mesh(2, axis="pp"), axis="pp", microbatches=4)
    pp.prefill(embeds[:1])                 # pos0=1, then T=15 → mb=4, pad=1
    got = pp.prefill(embeds[1:])
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
