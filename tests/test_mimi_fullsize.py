"""Full-production-shape Mimi parity vs the HF mirror (VERDICT r3 #4).

Every other parity suite runs reduced mirrors (hidden 64, num_filters 8);
real-dim-only bugs — lane padding at 512 channels, bucketing edges at
production T, RVQ near-tie margins over 32 codebooks of 2048 entries —
had no functional gate. This test runs kyutai/mimi's actual dimensions
(hidden 512, 32 quantizers, codebook 2048, num_filters 64, 8 transformer
layers) with random weights on CPU, asserting bit-exact encode codes and
high decode correlation vs transformers.MimiModel.

Reference anchor: tests/e2e/runner.py compare_codes/compare_wav (the HF
reference vs engine comparison) at production checkpoint shapes.

~35 s on CPU — in the default suite, deselectable with `-m "not slow"`.
"""

import numpy as np
import pytest
import torch

pytestmark = [pytest.mark.slow]

# kyutai/mimi production configuration (transformers MimiConfig defaults)
T_FRAMES = 208          # ≥200 frames ≈ 16.6 s of audio at 12.5 Hz


@pytest.fixture(scope="module")
def full_mimi(tmp_path_factory):
    from transformers import MimiConfig, MimiModel

    torch.manual_seed(0)
    cfg = MimiConfig()  # defaults ARE the production kyutai/mimi shapes
    assert cfg.hidden_size == 512 and cfg.num_quantizers == 32
    assert cfg.num_filters == 64 and cfg.codebook_size == 2048
    model = MimiModel(cfg).eval()
    # Spread the quantizer codebooks: HF random init leaves embed_sum near
    # zero, which puts every RVQ argmin on a degenerate near-tie. Real
    # checkpoints have well-separated codebooks; mirror that.
    g = torch.Generator().manual_seed(7)
    with torch.no_grad():
        for name, buf in model.named_buffers():
            if name.endswith("codebook.embed_sum"):
                buf.copy_(torch.randn(buf.shape, generator=g))

    from codec_tpu.convert import get_converter

    conv = get_converter("mimi")(quantization="F32")
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    conv.load_from_state_dict(sd, cfg.to_dict())
    path = tmp_path_factory.mktemp("mimi_full") / "mimi_full.gguf"
    conv.convert_and_save(path)

    import codec_tpu

    ours = codec_tpu.load_model(path)
    return model, ours, cfg


def _first_divergence_margin(hf, pcm, want_qt, got_qt, frame, first_q):
    """Relative distance margin at the FIRST divergent RVQ stage of one
    frame, computed in f64 torch on the HF latent: rebuild the residual
    through the common code prefix, then compare the distances of HF's
    pick vs ours. A real full-dim bug shows a large margin; an f32
    reduction-order tie shows ~1e-6."""
    with torch.no_grad():
        emb = hf.encoder(torch.from_numpy(pcm)[None, None])
        emb = hf.encoder_transformer(emb.transpose(1, 2))[0].transpose(1, 2)
        lat = hf.downsample(emb)[0].T.double()[frame]
    q = hf.quantizer
    sem, aco = (q.semantic_residual_vector_quantizer,
                q.acoustic_residual_vector_quantizer)
    nsem = len(sem.layers)
    rvq, layers, base = (sem, sem.layers, 0) if first_q < nsem \
        else (aco, aco.layers, nsem)
    r = lat @ rvq.input_proj.weight.double()[:, :, 0].T \
        if rvq.input_proj is not None else lat

    def embs(layer):
        cb = layer.codebook
        return (cb.embed_sum
                / cb.cluster_usage.clamp(min=cb.epsilon)[:, None]).double()

    for li in range(first_q - base):
        r = r - embs(layers[li])[int(want_qt[base + li, frame])]
    d = ((r[None] - embs(layers[first_q - base])) ** 2).sum(-1)
    c_hf, c_ours = int(want_qt[first_q, frame]), int(got_qt[first_q, frame])
    return float((d[c_ours] - d[c_hf]).detach()
                 / d[c_hf].clamp(min=1e-12).detach())


def test_fullsize_encode_codes_exact_or_near_tie(full_mimi):
    """Codes match HF bit-for-bit except frames whose first divergent RVQ
    stage is a provable float near-tie (rel distance margin < 1e-4 —
    torch-vs-XLA f32 reduction order flips those; a residual flip then
    cascades down the remaining quantizers of that frame). Real full-dim
    bugs (lane padding, tail-frame padding semantics) show systematic
    large-margin mismatches and fail here — this gate caught the
    upfront-vs-per-layer encoder padding bug (models/mimi.py n_valid)."""
    hf, ours, cfg = full_mimi
    rng = np.random.default_rng(0)
    n = T_FRAMES * 1920 + 517        # non-frame-aligned → ceil padding
    pcm = (rng.standard_normal(n) * 0.1).astype(np.float32)
    with torch.no_grad():
        want = hf.encode(
            torch.from_numpy(pcm)[None, None]).audio_codes.numpy()[0]  # [Q,T]
    got = ours.encode(pcm)           # [T, Q]
    assert got.shape == (want.shape[1], want.shape[0])
    assert got.shape[0] >= T_FRAMES
    mism = got.T != want
    frames = np.where(mism.any(axis=0))[0]
    # at most a handful of tie-frames; anything systematic fails here
    assert len(frames) <= max(2, want.shape[1] // 100), \
        f"{len(frames)}/{want.shape[1]} frames diverge — not tie noise"
    for fr in frames:
        fq = int(mism[:, fr].argmax())
        margin = _first_divergence_margin(hf, pcm, want, got.T, int(fr), fq)
        assert abs(margin) < 1e-4, \
            f"frame {fr} q{fq}: rel margin {margin:.2e} — a real mismatch"


def test_fullsize_decode_corr(full_mimi):
    hf, ours, cfg = full_mimi
    rng = np.random.default_rng(1)
    codes = rng.integers(0, cfg.codebook_size,
                         (1, cfg.num_quantizers, T_FRAMES))
    with torch.no_grad():
        want = hf.decode(torch.from_numpy(codes))[0].numpy()[0, 0]
    got = ours.decode(codes[0].T.astype(np.int32))
    assert got.shape == want.shape == (T_FRAMES * 1920,)
    corr = float(np.corrcoef(got, want)[0, 1])
    err = float(np.abs(got - want).max())
    assert corr > 0.9999, f"full-size decode corr={corr}"
    assert err < 5e-3, f"full-size decode max abs err={err}"


def test_fullsize_partial_nq(full_mimi):
    """n_q subsetting at production shape (the serving default is 8/32)."""
    hf, ours, cfg = full_mimi
    rng = np.random.default_rng(2)
    t = 16
    codes = rng.integers(0, cfg.codebook_size,
                         (t, cfg.num_quantizers)).astype(np.int32)
    with torch.no_grad():
        want = hf.decode(torch.from_numpy(codes.T[None, :8]))[0].numpy()[0, 0]
    got = ours.decode(codes, n_q=8)
    assert float(np.corrcoef(got, want)[0, 1]) > 0.9999
