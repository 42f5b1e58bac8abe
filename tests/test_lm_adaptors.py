"""codec_lm adaptor tests: parallel_heads_delay + residual_depth_ar
state machines and numeric parity vs torch mirrors.

Reference strategy: tests/e2e/*_lm_smoke.py drive libcodec via ctypes and
check per-cb logits + composed embeddings; here the same checks run against
in-repo torch mirrors."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from codec_tpu.io.gguf import GGUFWriter, GGUFReader
from codec_tpu.lm import create_lm
from codec_tpu.lm.base import LmStateError

H = 32           # backbone hidden
N_CB = 4
SIZES = [50, 20, 20, 20]
DH = 24          # depth hidden
DHEADS, DKV, DHD = 2, 2, 12
DINTER = 48
DLAYERS = 2


def _write_base(writer):
    writer.add_uint32("codec.sample_rate", 24000)
    writer.add_bool("codec.has_decoder", True)


@pytest.fixture(scope="module")
def phd_gguf(tmp_path_factory):
    g = torch.Generator().manual_seed(0)
    heads = [torch.randn(v, H, generator=g) * 0.3 for v in SIZES]
    embds = [torch.randn(v, H, generator=g) * 0.5 for v in SIZES]

    path = tmp_path_factory.mktemp("phd") / "phd.gguf"
    w = GGUFWriter(path, "mimi")
    _write_base(w)
    w.add_bool("codec.lm.has_adaptor", True)
    w.add_string("codec.lm.kind", "parallel_heads_delay")
    w.add_string("codec.lm.host_arch", "qwen3")
    w.add_uint32("codec.lm.hidden_dim", H)
    w.add_uint32("codec.lm.audio_embed_dim", H)
    w.add_uint32("codec.lm.n_codebook", N_CB)
    w.add_array("codec.lm.codebook_sizes", SIZES)
    w.add_array("codec.lm.delay_pattern", [0, 1, 2, 3])
    w.add_int32("codec.lm.eos_code_c0", 7)
    w.add_int32("codec.lm.eos_min_step", 2)
    for i in range(N_CB):
        w.add_tensor(f"lm.heads_{i}.weight", heads[i].numpy())
        w.add_tensor(f"lm.audio_embd_{i}.weight", embds[i].numpy())
    w.write()
    return path, heads, embds


def test_phd_info_and_logits(phd_gguf):
    path, heads, embds = phd_gguf
    lm = create_lm(GGUFReader(path))
    assert lm is not None
    assert lm.info.kind == "parallel_heads_delay"
    assert lm.info.n_codebook == N_CB
    assert lm.info.codebook_sizes == tuple(SIZES)
    assert lm.info.delay_pattern == (0, 1, 2, 3)

    rng = np.random.default_rng(0)
    h = rng.standard_normal(H).astype(np.float32)
    st = lm.new_state()
    st.step_begin(h)
    codes = []
    for k in range(N_CB):
        logits, cb = st.step_logits()
        assert cb == k and logits.shape == (SIZES[k],)
        want = (heads[k] @ torch.from_numpy(h)).numpy()
        np.testing.assert_allclose(logits, want, rtol=1e-4, atol=1e-5)
        code = int(logits.argmax())
        st.step_push_code(code)
        codes.append(code)
    out = st.step_finish()
    assert out == codes


def test_phd_compose_and_eos(phd_gguf):
    path, heads, embds = phd_gguf
    lm = create_lm(GGUFReader(path))
    codes = [3, 5, -1, 2]
    got = lm.compose_audio_embd(codes)
    want = (embds[0][3] + embds[1][5] + embds[3][2]).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    st = lm.new_state()
    # frame 0: eos code but below min_step
    for frame, (c0, expect) in enumerate([(7, False), (3, False), (7, True)]):
        st.step_begin(np.zeros(H, np.float32))
        for k in range(N_CB):
            st.step_logits()
            st.step_push_code(c0 if k == 0 else 0)
        codes = st.step_finish()
        assert st.step_is_eos(codes) is expect, f"frame {frame}"


def test_phd_state_machine_invariants(phd_gguf):
    path, _, _ = phd_gguf
    lm = create_lm(GGUFReader(path))
    st = lm.new_state()
    with pytest.raises(LmStateError):
        st.step_logits()                       # before begin
    st.step_begin(np.zeros(H, np.float32))
    with pytest.raises(LmStateError):
        st.step_begin(np.zeros(H, np.float32))  # double begin
    st.step_logits()
    with pytest.raises(LmStateError):
        st.step_logits()                       # logits without push
    st.step_push_code(0)
    with pytest.raises(LmStateError):
        st.step_finish()                       # finish before all pushed


# ---------------------------------------------------------------------------
# residual_depth_ar (CSM-style: shared in_proj, c0_head, rope NEOX)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def rda_gguf(tmp_path_factory):
    g = torch.Generator().manual_seed(1)

    def W(*shape, s=0.3):
        return torch.randn(*shape, generator=g) * s

    tensors = {
        "lm.c0_head.weight": W(SIZES[0], H),
        "lm.depth.in_proj.weight": W(DH, H),
        "lm.depth.output_norm.weight": W(DH, s=0.2) + 1.0,
    }
    for i in range(N_CB):
        tensors[f"lm.audio_embd_{i}.weight"] = W(SIZES[i], H, s=0.5)
    for i in range(N_CB - 1):
        tensors[f"lm.depth.heads_{i}.weight"] = W(SIZES[i + 1], DH)
    for l in range(DLAYERS):
        p = f"lm.depth.blk_{l}"
        tensors[f"{p}.attn_norm.weight"] = W(DH, s=0.2) + 1.0
        tensors[f"{p}.q.weight"] = W(DHEADS * DHD, DH)
        tensors[f"{p}.k.weight"] = W(DKV * DHD, DH)
        tensors[f"{p}.v.weight"] = W(DKV * DHD, DH)
        tensors[f"{p}.o.weight"] = W(DH, DHEADS * DHD)
        tensors[f"{p}.ffn_norm.weight"] = W(DH, s=0.2) + 1.0
        tensors[f"{p}.ffn_gate.weight"] = W(DINTER, DH)
        tensors[f"{p}.ffn_up.weight"] = W(DINTER, DH)
        tensors[f"{p}.ffn_down.weight"] = W(DH, DINTER)

    path = tmp_path_factory.mktemp("rda") / "rda.gguf"
    w = GGUFWriter(path, "mimi")
    _write_base(w)
    w.add_bool("codec.lm.has_adaptor", True)
    w.add_string("codec.lm.kind", "residual_depth_ar")
    w.add_string("codec.lm.host_arch", "llama")
    w.add_uint32("codec.lm.hidden_dim", H)
    w.add_uint32("codec.lm.audio_embed_dim", H)
    w.add_uint32("codec.lm.n_codebook", N_CB)
    w.add_array("codec.lm.codebook_sizes", SIZES)
    w.add_array("codec.lm.delay_pattern", [0] * N_CB)
    w.add_uint32("codec.lm.residual.depth_layers", DLAYERS)
    w.add_uint32("codec.lm.residual.depth_hidden", DH)
    w.add_uint32("codec.lm.residual.depth_n_heads", DHEADS)
    w.add_uint32("codec.lm.residual.depth_n_kv_heads", DKV)
    w.add_uint32("codec.lm.residual.depth_head_dim", DHD)
    w.add_uint32("codec.lm.residual.depth_intermediate", DINTER)
    w.add_float32("codec.lm.residual.depth_rope_theta", 10000.0)
    w.add_float32("codec.lm.residual.depth_rms_norm_eps", 1e-5)
    w.add_bool("codec.lm.residual.depth_has_in_proj", True)
    w.add_bool("codec.lm.residual.depth_has_qk_norm", False)
    w.add_bool("codec.lm.residual.depth_has_output_norm", True)
    w.add_bool("codec.lm.residual.depth_use_rope", True)
    w.add_string("codec.lm.residual.c0_input_modality", "audio")
    for name, t in tensors.items():
        w.add_tensor(name, t.numpy())
    w.write()
    return path, tensors


def _torch_depth_logits(tensors, h, codes, k):
    """Depth logits for cb k given already-sampled codes[0..k-1]."""
    T = k + 1
    prefix = torch.zeros(T, H)
    prefix[0] = torch.from_numpy(h)
    for p in range(1, T):
        prefix[p] = tensors[f"lm.audio_embd_{p - 1}.weight"][codes[p - 1]]
    x = prefix @ tensors["lm.depth.in_proj.weight"].T          # [T, DH]

    def rms(v, w):
        return v * torch.rsqrt((v ** 2).mean(-1, keepdim=True) + 1e-5) * w

    for l in range(DLAYERS):
        p = f"lm.depth.blk_{l}"
        hn = rms(x, tensors[f"{p}.attn_norm.weight"])
        q = (hn @ tensors[f"{p}.q.weight"].T).view(T, DHEADS, DHD).transpose(0, 1)
        kk = (hn @ tensors[f"{p}.k.weight"].T).view(T, DKV, DHD).transpose(0, 1)
        v = (hn @ tensors[f"{p}.v.weight"].T).view(T, DKV, DHD).transpose(0, 1)
        inv = 1.0 / 10000.0 ** (torch.arange(0, DHD, 2) / DHD)
        ang = torch.arange(T)[:, None] * inv[None]
        cos = torch.cat([ang.cos(), ang.cos()], -1)
        sin = torch.cat([ang.sin(), ang.sin()], -1)

        def rot(z):
            z1, z2 = z[..., : DHD // 2], z[..., DHD // 2:]
            return z * cos + torch.cat([-z2, z1], -1) * sin
        q, kk = rot(q), rot(kk)
        att = F.scaled_dot_product_attention(q, kk, v, is_causal=True)
        att = att.transpose(0, 1).reshape(T, DHEADS * DHD)
        x = x + att @ tensors[f"{p}.o.weight"].T
        m = rms(x, tensors[f"{p}.ffn_norm.weight"])
        m = (F.silu(m @ tensors[f"{p}.ffn_gate.weight"].T) *
             (m @ tensors[f"{p}.ffn_up.weight"].T)) @ tensors[f"{p}.ffn_down.weight"].T
        x = x + m
    x = rms(x, tensors["lm.depth.output_norm.weight"])
    return (tensors[f"lm.depth.heads_{k - 1}.weight"] @ x[T - 1]).numpy()


def test_rda_full_step_parity(rda_gguf):
    path, tensors = rda_gguf
    lm = create_lm(GGUFReader(path))
    assert lm.info.kind == "residual_depth_ar"

    rng = np.random.default_rng(2)
    h = rng.standard_normal(H).astype(np.float32)
    st = lm.new_state()
    st.step_begin(h)
    codes = []
    for k in range(N_CB):
        logits, cb = st.step_logits()
        assert cb == k
        if k == 0:
            want = (tensors["lm.c0_head.weight"] @ torch.from_numpy(h)).numpy()
        else:
            want = _torch_depth_logits(tensors, h, codes, k)
        np.testing.assert_allclose(logits, want, rtol=1e-3, atol=2e-4)
        code = int(logits.argmax())
        st.step_push_code(code)
        codes.append(code)
    assert st.step_finish() == codes

    # second step reuses the jit cache and must produce consistent results
    st.step_begin(h)
    logits2, _ = st.step_logits()
    want0 = (tensors["lm.c0_head.weight"] @ torch.from_numpy(h)).numpy()
    np.testing.assert_allclose(logits2, want0, rtol=1e-3, atol=2e-4)


def test_rda_compose(rda_gguf):
    path, tensors = rda_gguf
    lm = create_lm(GGUFReader(path))
    codes = [1, 2, 3, 4]
    got = lm.compose_audio_embd(codes)
    want = sum(tensors[f"lm.audio_embd_{i}.weight"][c] for i, c in enumerate(codes)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_no_adaptor_returns_none(tmp_path):
    path = tmp_path / "plain.gguf"
    w = GGUFWriter(path, "mimi")
    _write_base(w)
    w.add_tensor("dummy", np.zeros((4, 4), np.float32))
    w.write()
    assert create_lm(GGUFReader(path)) is None
