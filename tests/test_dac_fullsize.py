"""Full-production-shape DAC parity vs the HF mirror.

Companion to tests/test_mimi_fullsize.py (VERDICT r3 #4): every per-arch
parity suite runs reduced mirrors; real-dim-only bugs (lane padding at
1536 decoder channels, bucketing at production T, cosine-RVQ near-tie
margins over 9 codebooks of 1024 entries projected to 8-d) need a
functional gate at the real shapes. This runs descript/dac_24khz's
actual dimensions (encoder 64, decoder 1536, hidden 1024, 9x1024
codebooks, hop 320) with random weights on CPU, asserting encode codes
bit-exact up to provable float near-ties and high decode correlation vs
transformers.DacModel.

Reference anchor: tests/e2e/runner.py compare_codes/compare_wav at
production checkpoint shapes (reference src/models/dac.cpp init reads
these dims from the real GGUF).

DAC's codebook search is cosine in an 8-d projected space (HF
DacVectorQuantize.decode_latents: F.normalize both sides) — near-ties
are materially more common than Mimi's 256-d euclid search, so the
frame-mismatch cap is looser here while every divergence must still
prove out as a float near-tie.
"""

import numpy as np
import pytest
import torch

pytestmark = [pytest.mark.slow]

T_FRAMES = 208          # ~2.8 s at 75 Hz frame rate (hop 320 @ 24 kHz)


@pytest.fixture(scope="module")
def full_dac(tmp_path_factory):
    from transformers import DacConfig, DacModel

    torch.manual_seed(0)
    # HF defaults carry the production dims; pin the 24 kHz rate/ratios
    # (descript/dac_24khz) to match models/bench_init.py's lineup shape.
    cfg = DacConfig(sampling_rate=24000,
                    downsampling_ratios=[2, 4, 5, 8],
                    upsampling_ratios=[8, 5, 4, 2])
    assert cfg.decoder_hidden_size == 1536 and cfg.n_codebooks == 9
    assert cfg.codebook_size == 1024 and cfg.hidden_size == 1024
    model = DacModel(cfg).eval()

    from codec_tpu.convert import get_converter

    conv = get_converter("dac")(quantization="F32")
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    conv.load_from_state_dict(sd, cfg.to_dict())
    path = tmp_path_factory.mktemp("dac_full") / "dac_full.gguf"
    conv.convert_and_save(path)

    import codec_tpu

    ours = codec_tpu.load_model(path)
    return model, ours, cfg


def _first_divergence_margin(lat_frame, quantizers, want_qt, got_qt,
                             frame, first_q):
    """Relative cosine-distance margin at the FIRST divergent RVQ stage
    of one frame, in f64: rebuild the residual through the common code
    prefix (raw-codebook out_proj updates, HF DacResidualVectorQuantize
    semantics), then compare HF's pick vs ours in the normalized 8-d
    space. A real full-dim bug shows a large margin; an f32
    reduction-order tie shows ~1e-6."""
    with torch.no_grad():
        r = lat_frame.double()
        for li in range(first_q):
            q = quantizers[li]
            cbv = q.codebook.weight.double()[int(want_qt[li, frame])]
            qr = (q.out_proj.weight.double()[:, :, 0] @ cbv
                  + q.out_proj.bias.double())
            r = r - qr
        q = quantizers[first_q]
        ze = q.in_proj.weight.double()[:, :, 0] @ r + q.in_proj.bias.double()
        cb = q.codebook.weight.double()
        zn = ze / ze.norm().clamp(min=1e-12)
        cbn = cb / cb.norm(dim=1, keepdim=True).clamp(min=1e-12)
        d = ((zn[None] - cbn) ** 2).sum(-1)
        c_hf, c_ours = int(want_qt[first_q, frame]), int(got_qt[first_q, frame])
        return float((d[c_ours] - d[c_hf]).detach()
                     / d[c_hf].clamp(min=1e-12).detach())


def test_fullsize_encode_codes_exact_or_near_tie(full_dac):
    """Codes match HF bit-for-bit except frames whose first divergent
    stage is a provable near-tie (rel margin < 1e-4); a flipped code then
    legitimately cascades down that frame's remaining quantizers."""
    hf, ours, cfg = full_dac
    rng = np.random.default_rng(0)
    n = T_FRAMES * 320
    pcm = (rng.standard_normal(n) * 0.1).astype(np.float32)
    with torch.no_grad():
        want = hf.encode(
            torch.from_numpy(pcm)[None, None]).audio_codes.numpy()[0]  # [Q,T]
    got = ours.encode(pcm)           # [T, Q]
    assert got.shape == (want.shape[1], want.shape[0])
    mism = got.T != want
    frames = np.where(mism.any(axis=0))[0]
    # 8-d cosine search: a few percent of tie-frames is expected noise;
    # systematic (lane-padding-class) bugs touch far more and fail here
    assert len(frames) <= max(4, want.shape[1] // 20), \
        f"{len(frames)}/{want.shape[1]} frames diverge — not tie noise"
    if len(frames):
        with torch.no_grad():
            lat = hf.encoder(torch.from_numpy(pcm)[None, None])[0]  # [H,T]
        for fr in frames:
            fq = int(mism[:, fr].argmax())
            margin = _first_divergence_margin(
                lat[:, int(fr)], hf.quantizer.quantizers, want, got.T,
                int(fr), fq)
            assert abs(margin) < 1e-4, \
                f"frame {fr} q{fq}: rel margin {margin:.2e} — a real mismatch"


def test_fullsize_decode_corr(full_dac):
    hf, ours, cfg = full_dac
    rng = np.random.default_rng(1)
    codes = rng.integers(0, cfg.codebook_size, (1, cfg.n_codebooks, T_FRAMES))
    with torch.no_grad():
        want = hf.decode(
            audio_codes=torch.from_numpy(codes)).audio_values.numpy()[0]
    got = ours.decode(codes[0].T.astype(np.int32))
    assert got.shape == want.shape
    corr = float(np.corrcoef(got, want)[0, 1])
    err = float(np.abs(got - want).max())
    assert corr > 0.9999, f"full-size decode corr={corr}"
    assert err < 5e-3, f"full-size decode max abs err={err}"


def test_fullsize_partial_nq(full_dac):
    """n_q subsetting at production shape."""
    hf, ours, cfg = full_dac
    rng = np.random.default_rng(2)
    t = 16
    codes = rng.integers(0, cfg.codebook_size, (1, 4, t))
    with torch.no_grad():
        q = hf.quantizer.from_codes(torch.from_numpy(codes))[0]
        want = hf.decoder(q).numpy()[0, 0]
    full = np.zeros((t, cfg.n_codebooks), dtype=np.int32)
    full[:, :4] = codes[0].T
    got = ours.decode(full, n_q=4)
    assert float(np.corrcoef(got, want)[0, 1]) > 0.9999
