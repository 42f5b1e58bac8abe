"""Chatterbox T3 helpers: punc_norm, BPE tokenizer (vs HF `tokenizers`
oracle), VoiceEncoder speaker encoder (vs torch nn.LSTM mirror),
build_prompt assembly, and the run_chatterbox CFG flow."""

import numpy as np
import pytest
import torch

from codec_tpu.io.gguf import GGUFReader, GGUFWriter
from codec_tpu.lm.chatterbox_t3 import BpeTokenizer, ChatterboxT3, punc_norm
from codec_tpu.lm.tts_runner import run_chatterbox

H = 16                   # backbone hidden
TEXT_V = 30
SPEECH_V = 20
START_SPEECH, STOP_SPEECH = 15, 16
START_TEXT, STOP_TEXT = 2, 0
N_MELS, VE_H, VE_E, VE_L = 6, 12, 10, 2
VE_NFFT, VE_HOP, PF = 32, 8, 10
SPK_E = VE_E


def test_punc_norm():
    assert punc_norm("") == "You need to add some text for me to talk."
    assert punc_norm("hello   world") == "Hello world."
    assert punc_norm("Hi there…") == "Hi there,"  # "…"→", ", rstrip, ends ","
    assert punc_norm("ok:") == "Ok,"
    assert punc_norm("done!") == "Done!"
    assert punc_norm('She said “yes”') == 'She said "yes".'


def _toy_vocab():
    # char-level base vocab + a couple of merges
    chars = list("abcdehlort_!.,?'\"-")
    vocab = {"[UNK]": 1, "[STOP]": 0, "[SPACE]": 3}
    nid = 4
    for c in chars:
        vocab[c] = nid
        nid += 1
    merges = [("h", "e"), ("l", "l"), ("he", "ll"), ("o", "r")]
    for a, b in merges:
        vocab[a + b] = nid
        nid += 1
    return vocab, merges


def test_bpe_vs_hf_tokenizers():
    from tokenizers import Tokenizer, models, pre_tokenizers

    vocab, merges = _toy_vocab()
    hf = Tokenizer(models.BPE(vocab=vocab, merges=list(merges),
                              unk_token="[UNK]"))
    hf.pre_tokenizer = pre_tokenizers.Whitespace()
    hf.add_tokens(["[SPACE]"])

    id_to_tok = [""] * (max(vocab.values()) + 1)
    for t, i in vocab.items():
        id_to_tok[i] = t
    tk = BpeTokenizer(
        id_to_tok=id_to_tok,
        tok_to_id=dict(vocab),
        merge_rank={f"{a} {b}": i for i, (a, b) in enumerate(merges)},
        added=[("[SPACE]", vocab["[SPACE]"]), ("[UNK]", 1), ("[STOP]", 0)],
        unk_id=1)
    tk.added.sort(key=lambda a: len(a[0]), reverse=True)

    for text in ("hello there", "hell or hello", "a b c!", "catch-all, dear."):
        want = hf.encode(text.replace(" ", "[SPACE]")).ids
        got = tk.encode(text)
        assert got == want, f"{text!r}: {got} vs {want}"


class TorchVE(torch.nn.Module):
    def __init__(self, seed=0):
        super().__init__()
        torch.manual_seed(seed)
        self.lstm = torch.nn.LSTM(N_MELS, VE_H, VE_L)
        self.proj = torch.nn.Linear(VE_H, VE_E)

    def forward(self, partials):
        # partials [W, PF, N_MELS] → (T, B, C)
        x = torch.as_tensor(partials).permute(1, 0, 2)
        out, _ = self.lstm(x)
        e = torch.relu(self.proj(out[-1]))
        e = e / e.norm(dim=-1, keepdim=True).clamp(min=1e-12)
        m = e.mean(0)
        return m / m.norm().clamp(min=1e-12)


@pytest.fixture(scope="module")
def tiny_cbx(tmp_path_factory):
    g = torch.Generator().manual_seed(0)
    ve = TorchVE()
    t = {}

    def P(name, *shape, s=0.25):
        t[name] = torch.randn(*shape, generator=g) * s

    # tables
    P("lm.chatterbox.text_emb.weight", TEXT_V, H)
    P("lm.chatterbox.text_pos_emb.weight", 40, H)
    P("lm.audio_embd_0.weight", SPEECH_V, H)
    P("lm.chatterbox.speech_pos_emb.weight", 64, H)
    # speech head (phd single-codebook adaptor)
    P("lm.heads_0.weight", SPEECH_V, H)
    # cond_enc + perceiver
    P("lm.chatterbox.cond.spkr_enc.weight", H, SPK_E)
    P("lm.chatterbox.cond.spkr_enc.bias", H)
    P("lm.chatterbox.cond.emotion_adv_fc.weight", H, 1)
    P("lm.chatterbox.cond.perceiver.queries", 1, 32, H)
    P("lm.chatterbox.cond.perceiver.norm.weight", H, s=0.1)
    t["lm.chatterbox.cond.perceiver.norm.weight"] += 1.0
    P("lm.chatterbox.cond.perceiver.norm.bias", H)
    for n in ("to_q", "to_k", "to_v", "proj_out"):
        P(f"lm.chatterbox.cond.perceiver.{n}.weight", H, H)
        P(f"lm.chatterbox.cond.perceiver.{n}.bias", H)
    # VE weights from the torch module
    sd = ve.state_dict()
    for l in range(VE_L):
        t[f"speaker.voice_encoder.lstm_{l}.W_ih"] = sd[f"lstm.weight_ih_l{l}"]
        t[f"speaker.voice_encoder.lstm_{l}.W_hh"] = sd[f"lstm.weight_hh_l{l}"]
        t[f"speaker.voice_encoder.lstm_{l}.b_ih"] = sd[f"lstm.bias_ih_l{l}"]
        t[f"speaker.voice_encoder.lstm_{l}.b_hh"] = sd[f"lstm.bias_hh_l{l}"]
    t["speaker.voice_encoder.proj.weight"] = sd["proj.weight"]
    t["speaker.voice_encoder.proj.bias"] = sd["proj.bias"]
    mel_basis = torch.rand(N_MELS, VE_NFFT // 2 + 1, generator=g) * 0.2
    t["speaker.voice_encoder.mel_basis"] = mel_basis
    win = torch.hann_window(VE_NFFT, periodic=True)
    t["speaker.voice_encoder.window"] = win

    path = tmp_path_factory.mktemp("cbx") / "cbx.gguf"
    w = GGUFWriter(path, "chatterbox_s3g")
    w.add_uint32("codec.sample_rate", 24000)
    w.add_bool("codec.has_decoder", False)
    w.add_bool("codec.lm.has_adaptor", True)
    w.add_string("codec.lm.kind", "parallel_heads_delay")
    w.add_uint32("codec.lm.hidden_dim", H)
    w.add_uint32("codec.lm.audio_embed_dim", H)
    w.add_uint32("codec.lm.n_codebook", 1)
    w.add_array("codec.lm.codebook_sizes", [SPEECH_V])
    w.add_array("codec.lm.delay_pattern", [0])
    # chatterbox section
    w.add_uint32("codec.lm.chatterbox.text_vocab_size", TEXT_V)
    w.add_uint32("codec.lm.chatterbox.start_text_token", START_TEXT)
    w.add_uint32("codec.lm.chatterbox.stop_text_token", STOP_TEXT)
    w.add_uint32("codec.lm.chatterbox.start_speech_token", START_SPEECH)
    w.add_uint32("codec.lm.chatterbox.stop_speech_token", STOP_SPEECH)
    w.add_bool("codec.lm.chatterbox.has_builtin_conds", True)
    w.add_array("codec.lm.chatterbox.builtin.speaker_emb",
                [0.1] * SPK_E)
    w.add_array("codec.lm.chatterbox.builtin.cond_prompt_speech_tokens",
                [1, 2, 3, 4, 5])
    w.add_float32("codec.lm.chatterbox.builtin.emotion_adv", 0.4)
    # tokenizer
    vocab, merges = _toy_vocab()
    id_to_tok = [""] * (max(vocab.values()) + 1)
    for tok_s, i in vocab.items():
        id_to_tok[i] = tok_s
    w.add_string("codec.lm.chatterbox.tokenizer.tokens", "\n".join(id_to_tok))
    w.add_string("codec.lm.chatterbox.tokenizer.merges",
                 "\n".join(f"{a} {b}" for a, b in merges))
    w.add_string("codec.lm.chatterbox.tokenizer.added",
                 "[SPACE]\t3\n[UNK]\t1\n[STOP]\t0")
    w.add_string("codec.lm.chatterbox.tokenizer.unk_token", "[UNK]")
    # speaker section
    w.add_bool("codec.speaker.has_encoder", True)
    w.add_string("codec.speaker.encoder_arch", "chatterbox_voice_encoder")
    w.add_bool("codec.speaker.needs_ref_pcm", True)
    w.add_uint32("codec.speaker.ref_sample_rate", 16000)
    w.add_uint32("codec.speaker.n_rows", 34)
    w.add_uint32("codec.speaker.hidden_dim", H)
    w.add_uint32("codec.speaker.speaker_emb_dim", SPK_E)
    w.add_uint32("codec.speaker.ve.num_mels", N_MELS)
    w.add_uint32("codec.speaker.ve.hidden_size", VE_H)
    w.add_uint32("codec.speaker.ve.num_layers", VE_L)
    w.add_uint32("codec.speaker.ve.speaker_embed_dim", VE_E)
    w.add_uint32("codec.speaker.ve.n_fft", VE_NFFT)
    w.add_uint32("codec.speaker.ve.hop_size", VE_HOP)
    w.add_uint32("codec.speaker.ve.win_size", VE_NFFT)
    w.add_uint32("codec.speaker.ve.partial_frames", PF)
    w.add_float32("codec.speaker.ve.overlap", 0.5)
    w.add_float32("codec.speaker.ve.rate", 0.0)
    w.add_float32("codec.speaker.ve.min_coverage", 0.8)

    for name, tensor in t.items():
        w.add_tensor(name, tensor.detach().numpy())
    w.write()
    return path, t, ve


def test_speaker_embed_parity(tiny_cbx):
    path, t, ve = tiny_cbx
    t3 = ChatterboxT3(GGUFReader(path))
    rng = np.random.default_rng(0)
    pcm = (rng.standard_normal(400) * 0.3).astype(np.float32)

    got = t3.speaker.embed_ref(pcm)

    # numpy mirror of the mel-partial front-end
    from codec_tpu.lm.speaker_chatterbox import ve_mel_partials

    partials = ve_mel_partials(pcm, t["speaker.voice_encoder.mel_basis"].numpy(),
                               t["speaker.voice_encoder.window"].numpy(),
                               t3.speaker.cfg)
    with torch.no_grad():
        want = ve(partials).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)
    assert abs(np.linalg.norm(got) - 1.0) < 1e-5


def test_cond_emb_shape_and_mirror(tiny_cbx):
    path, t, _ = tiny_cbx
    t3 = ChatterboxT3(GGUFReader(path))
    rng = np.random.default_rng(1)
    spk = rng.standard_normal(SPK_E).astype(np.float32)
    toks = np.array([1, 4, 9], np.int32)

    got = t3.speaker.cond_emb(spk, toks, emotion=0.7)
    assert got.shape == (34, H)

    # torch mirror of cond_enc + shared-weight perceiver
    with torch.no_grad():
        spk_t = torch.from_numpy(spk)
        cond_spkr = spk_t @ t["lm.chatterbox.cond.spkr_enc.weight"].T + \
            t["lm.chatterbox.cond.spkr_enc.bias"]
        cond_emo = 0.7 * t["lm.chatterbox.cond.emotion_adv_fc.weight"][:, 0]
        seq = t["lm.audio_embd_0.weight"][toks] + \
            t["lm.chatterbox.speech_pos_emb.weight"][:3]

        def attn(x1, x2):
            nw = t["lm.chatterbox.cond.perceiver.norm.weight"]
            nb = t["lm.chatterbox.cond.perceiver.norm.bias"]
            x1n = torch.nn.functional.layer_norm(x1, (H,), nw, nb)
            x2n = torch.nn.functional.layer_norm(x2, (H,), nw, nb)
            pw = lambda n: t[f"lm.chatterbox.cond.perceiver.{n}.weight"]
            pb = lambda n: t[f"lm.chatterbox.cond.perceiver.{n}.bias"]
            hd = H // 4
            q = (x1n @ pw("to_q").T + pb("to_q")).view(-1, 4, hd)
            k = (x2n @ pw("to_k").T + pb("to_k")).view(-1, 4, hd)
            v = (x2n @ pw("to_v").T + pb("to_v")).view(-1, 4, hd)
            sim = torch.einsum("qhd,khd->hqk", q, k) / hd ** 0.5
            o = torch.einsum("hqk,khd->qhd", sim.softmax(-1), v).reshape(-1, H)
            return x1 + o @ pw("proj_out").T + pb("proj_out")

        queries = t["lm.chatterbox.cond.perceiver.queries"].view(32, H)
        att = attn(attn(queries, seq), None) if False else None
        a1 = attn(queries, seq)
        att = attn(a1, a1)
        want = torch.cat([cond_spkr[None], att, cond_emo[None]]).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_build_prompt_layout(tiny_cbx):
    path, t, _ = tiny_cbx
    t3 = ChatterboxT3(GGUFReader(path))
    ids = t3.tokenize("hello")
    prompt = t3.build_prompt(ids, cfg_weight=0.5)
    n_wrapped = len(ids) + 2
    assert prompt.shape == (2, 34 + n_wrapped + 2, H)
    # cond block identical across lanes; text content zeroed on lane 1
    np.testing.assert_array_equal(prompt[0, :34], prompt[1, :34])
    pos0 = t["lm.chatterbox.text_pos_emb.weight"][0].numpy()
    np.testing.assert_allclose(prompt[1, 34], pos0, atol=1e-6)
    want0 = t["lm.chatterbox.text_emb.weight"][START_TEXT].numpy() + pos0
    np.testing.assert_allclose(prompt[0, 34], want0, atol=1e-6)
    # trailing two rows: BOS speech embed + speech_pos[0], twice
    bos = t["lm.audio_embd_0.weight"][START_SPEECH].numpy() + \
        t["lm.chatterbox.speech_pos_emb.weight"][0].numpy()
    np.testing.assert_allclose(prompt[0, -1], bos, atol=1e-6)
    np.testing.assert_allclose(prompt[0, -2], bos, atol=1e-6)


@pytest.fixture(scope="module")
def tiny_cbx_backbone(tmp_path_factory):
    """Tiny JAX llama backbone with hidden == the T3 fixture's H, for the
    chunked on-device CFG flow."""
    from transformers import LlamaConfig, LlamaModel

    from codec_tpu.convert import get_converter

    torch.manual_seed(5)
    cfg = LlamaConfig(hidden_size=H, intermediate_size=32,
                      num_hidden_layers=2, num_attention_heads=2,
                      num_key_value_heads=2, head_dim=8, vocab_size=32,
                      rms_norm_eps=1e-5, max_position_embeddings=256)
    hf = LlamaModel(cfg).eval()
    conv = get_converter("llama_backbone")(quantization="F32")
    conv.load_from_state_dict(
        {k: v.numpy() for k, v in hf.state_dict().items()}, cfg.to_dict())
    p = tmp_path_factory.mktemp("cbxbb") / "bb.gguf"
    conv.convert_and_save(p)
    return str(p)


def test_run_chatterbox_chunked_matches_host(tiny_cbx, tiny_cbx_backbone):
    """Chunked on-device chatterbox (both CFG lanes + T3 sampler chain in
    one lax.while_loop per K frames) matches the host loop greedily:
    same codes / steps / stop over real JAX backbone lanes. A sampled
    chunked run is per-seed deterministic and survives the penalty path."""
    from codec_tpu.lm.audio_lm import AudioLM
    from codec_tpu.lm.backbone import create_backbone
    from codec_tpu.ops.sample import OnDeviceSampling

    path, t, _ = tiny_cbx
    reader = GGUFReader(path)
    t3 = ChatterboxT3(reader)

    def lanes():
        return [create_backbone(tiny_cbx_backbone, max_ctx=128)
                for _ in range(2)]

    host = run_chatterbox(AudioLM(reader), t3, lanes(), "hello there",
                          max_frames=6, cfg_weight=0.5, decode=False,
                          sampler=lambda lg: int(np.argmax(lg)))
    dev = run_chatterbox(AudioLM(reader), t3, lanes(), "hello there",
                         max_frames=6, cfg_weight=0.5, decode=False,
                         on_device=OnDeviceSampling(chunk_frames=3))
    np.testing.assert_array_equal(dev.codes, host.codes)
    assert dev.n_steps == host.n_steps
    assert dev.stopped_by_eos == host.stopped_by_eos

    sampled = OnDeviceSampling(temperature=0.8, min_p=0.05,
                               repetition_penalty=1.2,
                               repetition_window=-1, seed=7,
                               chunk_frames=3)
    a = run_chatterbox(AudioLM(reader), t3, lanes(), "hello there",
                       max_frames=6, cfg_weight=0.5, decode=False,
                       on_device=sampled)
    b = run_chatterbox(AudioLM(reader), t3, lanes(), "hello there",
                       max_frames=6, cfg_weight=0.5, decode=False,
                       on_device=sampled)
    np.testing.assert_array_equal(a.codes, b.codes)
    assert a.n_steps == b.n_steps
    assert ((a.codes >= 0) & (a.codes < SPEECH_V)).all()


def test_run_chatterbox_batch_matches_single(tiny_cbx, tiny_cbx_backbone):
    """B concurrent chatterbox generations through the vmapped chunk:
    every stream's codes match its single-stream chunked run with seed
    `base.seed + i` — including a stream with a per-stream chain
    override (traced [B, 4] input)."""
    import dataclasses

    from codec_tpu.lm import create_lm
    from codec_tpu.lm.audio_lm import AudioLM
    from codec_tpu.lm.backbone import create_backbone
    from codec_tpu.lm.tts_runner import run_chatterbox_batch
    from codec_tpu.ops.sample import OnDeviceSampling

    reader = GGUFReader(tiny_cbx[0])
    t3 = ChatterboxT3(reader)
    shared = create_lm(reader)
    bb = create_backbone(tiny_cbx_backbone, max_ctx=128)
    base = OnDeviceSampling(temperature=0.8, min_p=0.05,
                            repetition_penalty=1.2, repetition_window=-1,
                            seed=11, chunk_frames=3)
    texts = ["hello there", "ok", "hello hello"]
    chains = [base, dataclasses.replace(base, temperature=0.0),
              dataclasses.replace(base, temperature=1.4, top_k=5)]
    alms = [AudioLM(reader, lm=shared) for _ in texts]
    got = run_chatterbox_batch(alms, t3, bb, texts, base, max_frames=6,
                               cfg_weight=0.5, decode=False,
                               sampling=chains)
    from codec_tpu.lm.tts_runner import run_chatterbox

    for i, text in enumerate(texts):
        lanes = [create_backbone(tiny_cbx_backbone, max_ctx=128)
                 for _ in range(2)]
        ref = run_chatterbox(
            AudioLM(reader), t3, lanes, text, max_frames=6,
            cfg_weight=0.5, decode=False,
            on_device=dataclasses.replace(chains[i], seed=11 + i))
        np.testing.assert_array_equal(got[i].codes, ref.codes)
        assert got[i].n_steps == ref.n_steps
        assert got[i].stopped_by_eos == ref.stopped_by_eos


def test_run_chatterbox_batch_dp(tiny_cbx, tiny_cbx_backbone):
    """Batched chatterbox with stream state sharded over a 2-device dp
    mesh: codes equal the unsharded batched run, and the lane-KV batch
    is really device-sharded."""
    from codec_tpu.lm import create_lm
    from codec_tpu.lm.audio_lm import AudioLM
    from codec_tpu.lm.backbone import create_backbone
    from codec_tpu.lm.tts_runner import run_chatterbox_batch
    from codec_tpu.ops.sample import OnDeviceSampling
    from codec_tpu.parallel.mesh import make_mesh

    reader = GGUFReader(tiny_cbx[0])
    t3 = ChatterboxT3(reader)
    shared = create_lm(reader)
    base = OnDeviceSampling(temperature=0.8, min_p=0.05,
                            repetition_penalty=1.2, repetition_window=-1,
                            seed=21, chunk_frames=3)
    texts = ["hello there", "ok"]

    def run(mesh):
        return run_chatterbox_batch(
            [AudioLM(reader, lm=shared) for _ in texts], t3,
            create_backbone(tiny_cbx_backbone, max_ctx=128), texts, base,
            max_frames=5, cfg_weight=0.5, decode=False, mesh=mesh)

    want = run(None)
    got = run(make_mesh(2, axis="dp"))
    for w, g in zip(want, got):
        np.testing.assert_array_equal(g.codes, w.codes)
        assert g.n_steps == w.n_steps


def test_run_chatterbox_flow(tiny_cbx):
    path, t, _ = tiny_cbx
    from codec_tpu.lm.audio_lm import AudioLM
    from test_audio_lm import StubBackbone

    reader = GGUFReader(path)
    t3 = ChatterboxT3(reader)
    alm = AudioLM(reader)
    backbones = [StubBackbone(H, seed=1), StubBackbone(H, seed=1)]

    # deterministic sampler that emits a few codes then EOS
    seq = iter([4, 9, 2, STOP_SPEECH])
    res = run_chatterbox(alm, t3, backbones, "hello there",
                         max_frames=10, cfg_weight=0.5,
                         sampler=lambda lg: next(seq), decode=False)
    assert res.stopped_by_eos
    assert res.codes[:, 0].tolist() == [4, 9, 2]
    assert res.n_steps == 4

    # greedy CFG path end-to-end (no EOS guarantee, just runs)
    res2 = run_chatterbox(alm, t3, [StubBackbone(H, 2), StubBackbone(H, 2)],
                          "ok", max_frames=3,
                          sampler=lambda lg: int(np.argmax(lg)), decode=False)
    assert res2.n_steps == 3
