"""Benchmark: Mimi decode realtime factor per chip (the BASELINE.json metric).

Runs full-size Mimi (512 hidden, 8-layer transformer, 32 RVQ codebooks,
num_filters=64 — identical shapes/FLOPs to kyutai/mimi) with random weights.

Methodology: the execution environment may reach the TPU through an async
relay where `block_until_ready` returns before device completion, so we time
N data-dependent decode iterations chained INSIDE one jitted `fori_loop` and
force completion with a host readback, subtracting the measured readback RTT.

Driver-survivability contract (VERDICT r3 #1): the persistent XLA compile
cache does NOT reload across processes on this VM (docs/PERF.md), so a
fresh-process run pays full remote compiles. Therefore:
  - the headline section (f32_b1) runs FIRST and its JSON line is printed
    and flushed the moment it completes;
  - every further section re-prints a COMPACT headline line when it
    finishes (the driver parses the last complete line it sees; round 4's
    ever-growing enriched line broke the driver's parser — VERDICT r4 #2).
    The full enriched record is written atomically to
    benchmarks/bench_latest.json on every milestone;
  - sections are budget-gated (env BENCH_BUDGET_S, default 2400 s): when
    the projected cost exceeds the remaining budget the section is
    recorded as "skipped (budget)" instead of running — no retries;
  - a watchdog thread hard-exits 0 with a final line at budget + 60 s
    even if a section wedges on a dropped relay connection;
  - cold_start runs by default under the budget gate (disable with
    BENCH_COLD_START=0).

Roofline: mimi/dac/wavtokenizer sections carry flops / hbm_bytes /
mfu_pct / hbm_pct from XLA's compiled cost_analysis against v5e peaks
(197 TFLOP/s bf16, 819 GB/s HBM) so the perf claims are self-auditing.

Reference point (BASELINE.md): the CPU reference decodes ~O(10x) realtime
single-stream; driver north star is >100x realtime per v5e chip.
vs_baseline = ours_xrt / 10.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

# persistent compile cache: the remote-compile path is slow (~minutes for
# the full decode graph); use the SHARED cache (~/.cache/codec_tpu/jax,
# same one codec_tpu.__init__ configures) so driver bench runs reuse
# compiles from dev/profiling sessions when the VM does keep its host.
import codec_tpu  # noqa: F401  (configures the persistent cache)

V5E_BF16_PEAK_FLOPS = 197e12
V5E_HBM_PEAK_BYTES = 819e9


def _readback_rtt() -> float:
    y = jax.block_until_ready(jnp.ones((1,)))
    ts = []
    for _ in range(3):
        t0 = time.monotonic()
        np.asarray(y)
        ts.append(time.monotonic() - t0)
    return min(ts)


def _roofline(compiled, wall_s: float, n_iters: int) -> dict:
    """flops / bytes per iteration from XLA's own cost model, expressed
    against v5e peaks (VERDICT r3 #6).

    XLA's HloCostAnalysis counts a while/fori_loop BODY ONCE regardless
    of trip count (verified on both the cpu and tpu backends: a 50-iter
    fori_loop over a matmul reports exactly 1 matmul of flops), so the
    chained graph's totals are already per-iteration — do NOT divide by
    n_iters. Rounds 4 and early 5 divided, under-reporting every MFU/HBM%
    by ~50x (BENCH_r04 "1.26% MFU" for mimi bf16 b16 is really ~63%;
    mimi f32 b1 is in fact at the HBM roofline). Weights re-read every
    iteration, which matches steady-state streaming decode."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        fl = float(ca.get("flops", 0.0))
        by = float(ca.get("bytes accessed", 0.0))
        return {
            "flops": round(fl),
            "hbm_bytes": round(by),
            "mfu_pct": round(100.0 * fl / (wall_s * V5E_BF16_PEAK_FLOPS), 2),
            "hbm_pct": round(100.0 * by / (wall_s * V5E_HBM_PEAK_BYTES), 2),
        }
    except Exception as e:  # pragma: no cover - backend-dependent
        return {"cost_error": f"{type(e).__name__}: {e}"[:100]}


def _bench_decode(cfg, params, batch: int, t_frames: int, n_iters: int = 50):
    # n_iters=50: the relay carries a ~30 ms constant per-call overhead
    # (measured: a trivial fori_loop body costs 31 ms wall regardless of
    # n); 50 chained iterations amortize it to <0.7 ms/iter so the number
    # reflects device throughput, not transport.
    from codec_tpu.models.mimi import mimi_decode_fn

    rng = np.random.default_rng(0)
    codes0 = jnp.asarray(
        rng.integers(0, cfg.codebook_size, (batch, t_frames, cfg.n_q)), jnp.int32)

    def chained(params, codes):
        def body(i, carry):
            codes, acc = carry
            pcm = mimi_decode_fn(params, codes, cfg)
            # derive next codes from the output -> serializes iterations
            nxt = (jnp.abs(pcm[:, : t_frames * cfg.n_q]).reshape(
                batch, t_frames, cfg.n_q) * 1e6).astype(jnp.int32) % cfg.codebook_size
            return nxt, acc + pcm[0, 0]
        _, acc = jax.lax.fori_loop(0, n_iters, body, (codes, jnp.float32(0)))
        return acc

    t0 = time.monotonic()
    compiled = jax.jit(chained).lower(params, codes0).compile()  # AOT: one
    compile_s = time.monotonic() - t0                            # compile,
    np.asarray(compiled(params, codes0))                         # + warm run
    rtt = _readback_rtt()
    t0 = time.monotonic()
    np.asarray(compiled(params, codes0))
    wall = max(1e-9, (time.monotonic() - t0) - rtt) / n_iters
    audio_s = batch * t_frames * cfg.hop_size / cfg.sample_rate
    return audio_s / wall, wall, compile_s, _roofline(compiled, wall, n_iters)


def _bench_generic(decode_fn, params, codes0, out_samples: int,
                   sample_rate: int, vocab: int, n_iters: int = 50):
    """Chained-iteration timing for an arbitrary decode fn (same
    methodology as _bench_decode)."""
    # params closed over (not a jit argument): these trees carry Python-int
    # kernel sizes used for static padding math.
    def chained(codes):
        def body(i, carry):
            codes, acc = carry
            pcm = decode_fn(params, codes)
            # derive next codes from the output -> serializes iterations
            per_row = codes.shape[1] * codes.shape[2]   # batch-safe slice
            nxt = (jnp.abs(pcm[:, :per_row]).reshape(codes.shape)
                   * 1e6).astype(jnp.int32) % vocab
            return nxt, acc + pcm[0, 0]
        _, acc = jax.lax.fori_loop(0, n_iters, body, (codes, jnp.float32(0)))
        return acc

    compiled = jax.jit(chained).lower(codes0).compile()
    np.asarray(compiled(codes0))
    rtt = _readback_rtt()
    t0 = time.monotonic()
    np.asarray(compiled(codes0))
    wall = max(1e-9, (time.monotonic() - t0) - rtt) / n_iters
    xrt = (out_samples / sample_rate) / wall
    return xrt, wall, _roofline(compiled, wall, n_iters)


_FIXTURE_DIR = __import__("pathlib").Path(__file__).parent / ".bench_fixtures"


def _mimi_product_ggufs():
    """Full-size (kyutai/mimi-shaped, random-init) GGUFs through the real
    converter, cached on disk: the product path under test is
    GGUF -> load_model -> CodecModel (VERDICT: bench the product surface,
    BASELINE.json configs 1/4/5)."""
    _FIXTURE_DIR.mkdir(exist_ok=True)
    paths = {q: _FIXTURE_DIR / f"mimi_full_{q}.gguf"
             for q in ("F32", "Q8_0", "Q4_K_M")}
    if all(p.exists() for p in paths.values()):
        return paths
    import torch
    from transformers import MimiConfig as HFMimiConfig, MimiModel

    torch.manual_seed(0)
    hf = MimiModel(HFMimiConfig()).eval()          # default cfg = kyutai size
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    cfg = hf.config.to_dict()
    from codec_tpu.convert import get_converter

    for q, p in paths.items():
        if not p.exists():
            conv = get_converter("mimi")(quantization=q)
            conv.load_from_state_dict(sd, cfg)
            conv.convert_and_save(p)
    return paths


def _time_calls(fn, n: int = 10, warm: int = 2) -> float:
    """Mean wall seconds per call of a host-level fn that forces its own
    readback (CodecModel.decode/encode, LM steps), RTT-corrected."""
    for _ in range(warm):                          # compile + cache warm
        fn()
    rtt = _readback_rtt()
    t0 = time.monotonic()
    for _ in range(n):
        fn()
    return max(1e-9, (time.monotonic() - t0) / n - rtt)


def _time_variants(fns: dict, n: int = 10, warm: int = 2) -> dict:
    """Interleaved round-robin timing of comparable variants, per-variant
    MEDIAN of per-round walls, RTT-corrected.

    The remote-TPU relay's throughput drifts on minute scales; timing
    variant A's n calls then variant B's n calls lets that drift flip
    orderings that are physically impossible (i16 moving half the bytes
    of f32 measuring slower — seen in the round-4 in-session product_core
    record). One call of each variant per round puts every variant under
    the same congestion, and the median discards spike rounds."""
    import statistics

    for fn in fns.values():
        for _ in range(warm):                      # compile + cache warm
            fn()
    rtt = _readback_rtt()
    walls = {k: [] for k in fns}
    for _ in range(n):
        for k, fn in fns.items():
            t0 = time.monotonic()
            fn()
            walls[k].append(time.monotonic() - t0)
    return {k: max(1e-9, statistics.median(v) - rtt)
            for k, v in walls.items()}


def _param_mb(model) -> float:
    """Device HBM held by a model's weight tree, in MB — records the
    quant/bf16 saving next to the timing it buys (VERDICT r3 #5)."""
    import jax

    tot = sum(l.nbytes for l in jax.tree_util.tree_leaves(model.params)
              if hasattr(l, "nbytes"))
    return round(tot / 1e6, 1)


def _bench_product_core(t_frames: int = 250, n: int = 10):
    """The product surface a user hits first: load_model + decode on the
    full-size Mimi GGUF — f32, i16-wire, Q8_0, and the batched
    decode_many path (one fused graph + one fetch for 8 streams)."""
    import codec_tpu

    paths = _mimi_product_ggufs()
    rng = np.random.default_rng(0)
    out = {}

    m = codec_tpu.load_model(paths["F32"])
    audio_s = t_frames * m.hop_size / m.sample_rate  # 250 -> 20 s @ 24 kHz
    codes = rng.integers(0, m.codebook_size,
                         (1, t_frames, m.n_q)).astype(np.int32)

    # f32, i16-wire, and Q8_0(auto→bf16) variants timed INTERLEAVED so
    # relay-throughput drift cannot flip their ordering. i16 converts PCM
    # to 16-bit in-graph (the CLI's WAV path) and halves the stream bytes
    # (the relay streams ~40 MB/s with a ~35 ms/op floor, so the wire —
    # not the graph — bounds product xrt). Q8_0 resolves via dtype "auto"
    # to bf16 compute on TPU (runtime/model.py resolve_compute_dtype —
    # the native analog of the reference's quantized mul_mat), paying
    # half the weight+activation HBM traffic of f32.
    mq = codec_tpu.load_model(paths["Q8_0"], compute_dtype="auto")
    walls = _time_variants({
        "f32": lambda: m.decode(codes),
        "i16": lambda: m.decode(codes, pcm_format="i16"),
        "q8_0": lambda: mq.decode(codes),
    }, n)
    out["gguf_decode_f32_b1"] = {"xrt": round(audio_s / walls["f32"], 1),
                                 "wall_ms": round(walls["f32"] * 1e3, 2)}
    out["gguf_decode_i16_b1"] = {"xrt": round(audio_s / walls["i16"], 1),
                                 "wall_ms": round(walls["i16"] * 1e3, 2)}
    out["gguf_decode_q8_0_b1"] = {
        "xrt": round(audio_s / walls["q8_0"], 1),
        "wall_ms": round(walls["q8_0"] * 1e3, 2),
        "weight_mb": _param_mb(mq), "weight_mb_f32": _param_mb(m)}

    # multi-stream surface (decode_many): same-bucket sequences fuse into
    # one batched graph + ONE batched fetch
    seqs = [rng.integers(0, m.codebook_size,
                         (t_frames, m.n_q)).astype(np.int32) for _ in range(8)]
    wall = _time_calls(lambda: m.decode_many(seqs, pcm_format="i16"),
                       n) / len(seqs)
    out["gguf_decode_i16_many8"] = {"xrt": round(audio_s / wall, 1),
                                    "wall_ms_per_stream": round(wall * 1e3, 2)}
    return out


def _bench_product_more(t_frames: int = 250, n: int = 10):
    """Second product tranche: encode, Q4_K_M, batched bf16, and the
    device-resident wall of the same GGUF-loaded weights."""
    import codec_tpu

    paths = _mimi_product_ggufs()
    rng = np.random.default_rng(0)
    out = {}

    m = codec_tpu.load_model(paths["F32"])
    audio_s = t_frames * m.hop_size / m.sample_rate
    codes = rng.integers(0, m.codebook_size,
                         (1, t_frames, m.n_q)).astype(np.int32)
    if m.has_encoder:                               # config 4: encode path
        enc_s = 10.0                                # shorter clip: the 20 s
        pcm = (rng.standard_normal(int(m.sample_rate * enc_s)) * 0.1
               ).astype(np.float32)                 # encode graph is a much
        # the CLI path: PCM16 WAVs upload int16, /32768 in-graph.
        # Interleaved with f32-in so relay drift can't flip the ordering.
        pcm16 = np.clip(np.rint(pcm * 32767.0), -32768, 32767).astype(np.int16)
        walls = _time_variants({"f32": lambda: m.encode(pcm),
                                "i16": lambda: m.encode(pcm16)}, n)
        out["gguf_encode_f32"] = {"xrt": round(enc_s / walls["f32"], 1),
                                  "wall_ms": round(walls["f32"] * 1e3, 2)}
        out["gguf_encode_i16_in"] = {"xrt": round(enc_s / walls["i16"], 1),
                                     "wall_ms": round(walls["i16"] * 1e3, 2)}

    mq = codec_tpu.load_model(paths["Q4_K_M"], compute_dtype="auto")
    wall = _time_calls(lambda: mq.decode(codes), n)
    out["gguf_decode_q4_k_m_b1"] = {"xrt": round(audio_s / wall, 1),
                                    "wall_ms": round(wall * 1e3, 2),
                                    "weight_mb": _param_mb(mq)}

    mb = codec_tpu.load_model(paths["F32"], compute_dtype="bfloat16")
    codes8 = rng.integers(0, mb.codebook_size,
                          (8, t_frames, mb.n_q)).astype(np.int32)
    wall = _time_calls(lambda: mb.decode(codes8, pcm_format="i16"), n)
    out["gguf_decode_bf16_i16_b8"] = {"xrt": round(8 * audio_s / wall, 1),
                                      "wall_ms": round(wall * 1e3, 2)}

    codes16 = rng.integers(0, mb.codebook_size,
                           (16, t_frames, mb.n_q)).astype(np.int32)
    wall = _time_calls(lambda: mb.decode(codes16, pcm_format="i16"), n)
    out["gguf_decode_bf16_i16_b16"] = {"xrt": round(16 * audio_s / wall, 1),
                                       "wall_ms": round(wall * 1e3, 2)}

    # device-resident wall of the SAME GGUF-loaded weights (chained
    # in-graph iterations, weights as jit args): isolates the graph from
    # the transport — on a locally-attached TPU the product surface runs
    # at this rate plus PCIe microseconds
    xrt, wall, _, _ = _bench_decode(m.cfg, m.params, 1, t_frames)
    out["gguf_decode_device_resident_b1"] = {
        "xrt": round(xrt, 1), "wall_ms": round(wall * 1e3, 2)}
    return out


def _bench_cold_start(t_frames: int = 250, timeout_s: float = 900.0):
    """Fresh-process time-to-first-audio on the product surface: a
    subprocess runs `codec_cli decode` on the full-size Mimi GGUF with the
    persistent compile cache DISABLED — an honest cold start (imports +
    load + compile + decode + WAV write). Env-gated (BENCH_COLD_START=1):
    an intentionally-cold section has no place in a budget-bound driver
    run (VERDICT r3 weak #1)."""
    import subprocess
    import tempfile

    paths = _mimi_product_ggufs()
    with tempfile.TemporaryDirectory() as td:
        codes = np.random.default_rng(0).integers(
            0, 2048, (t_frames, 32)).astype(np.int32)
        cpath = os.path.join(td, "c.npy")
        np.save(cpath, codes)
        env = dict(os.environ, CODEC_JAX_CACHE="0", CODEC_TIERED_JIT="fast")
        t0 = time.monotonic()
        # capture the CLI's output: bench stdout must stay JSON-only
        subprocess.run(
            [sys.executable, "-m", "codec_tpu.cli.codec_cli", "decode",
             "--model", str(paths["F32"]), "--codes", cpath,
             "--out", os.path.join(td, "o.wav")],
            check=True, env=env, cwd=str(_FIXTURE_DIR.parent),
            timeout=timeout_s, stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL)
        return {"cold_start_to_first_audio_s": round(time.monotonic() - t0, 1)}


def _bench_tts_cfm(fast: bool = False):
    """continuous_latent_cfm (BlueMagpie shape), whole step in-graph
    (BASELINE.md reference: full step 625.4 ms, RTF 3.9)."""
    from codec_tpu.io.gguf import GGUFReader
    from codec_tpu.lm import create_lm
    from codec_tpu.models.bench_lm_init import write_cfm_gguf

    _FIXTURE_DIR.mkdir(exist_ok=True)
    rng = np.random.default_rng(0)
    out = {}
    n_cfm = 2 if fast else 10
    p = _FIXTURE_DIR / ("cfm_smoke.gguf" if fast else "cfm_bluemagpie.gguf")
    if not p.exists():
        if fast:
            write_cfm_gguf(p, hb=16, hv=24, he=16, hd=16, d=4, p=2, nh=2,
                           nkv=1, hdim=8, nl_enc=1, nl_dit=1, nl_ralm=1,
                           ffn_mult=2)
        else:
            write_cfm_gguf(p)
    lm = create_lm(GGUFReader(p))
    st = lm.new_state()
    h_in = rng.standard_normal(lm.info.hidden_dim).astype(np.float32)
    noise = rng.standard_normal(
        (lm.patch_size, lm.latent_dim)).astype(np.float32)

    def cfm_step():
        lm.step_generate(st, h_in, cfg_value=2.0, n_timesteps=10, noise=noise)
    wall = _time_calls(cfm_step, n=n_cfm)
    out["cfm_step_ms"] = round(wall * 1e3, 2)
    out["cfm_rtf"] = round(wall / 0.160, 4)         # 160 ms audio per step
    out["cfm_vs_ref_625ms"] = round(625.4 / (wall * 1e3), 1)

    # transport-independent graph wall: the per-step number above is one
    # device dispatch per step, so on the relay it floats with the ~35 ms
    # per-op floor (PERF.md "Environment effects"). Chain K whole steps
    # (each 9 Euler x 2 CFG LocDiT passes + RALM KV step + feedbacks,
    # patch fed back as the next step's conditioning) inside ONE jitted
    # fori_loop with a single readback — the wall a directly-attached
    # chip would see per step.
    try:
        from codec_tpu.runtime.jit_weights import jit_weighted

        k_chain = 2 if fast else 8
        tsin, dtsin, dts = lm._sched_cache[10]
        ks = st.kind_state
        pd = lm.patch_size * lm.latent_dim
        packed_len = pd + 2 + int(np.asarray(ks["fb_tslm"]).shape[0])
        le0 = jnp.zeros((lm.patch_size, lm.latent_dim), jnp.float32)

        def chained(kcs, vcs, h, pfb, prim_lm, prim_res, cond, z, pos0,
                    cfgv):
            def body(i, c):
                kcs, vcs, pfb, cond, _ = c
                k2, v2, patch, fb, packed = lm._step_fn(
                    kcs, vcs, h, pfb, prim_lm, prim_res, cond, z,
                    tsin, dtsin, dts, pos0 + i, False, cfgv, le0,
                    jnp.asarray(False))
                return (k2, v2, fb, patch, packed)

            c0 = (kcs, vcs, pfb, cond, jnp.zeros((packed_len,), jnp.float32))
            c = jax.lax.fori_loop(0, k_chain, body, c0)
            return c[-1]

        cfn = jit_weighted(lm, chained, ("w",))
        args = (ks["k"], ks["v"], jnp.asarray(h_in), ks["prev_fb_lm"],
                ks["prefill_lm"], ks["prefill_res"],
                jnp.asarray(np.asarray(ks["prev_patch"], np.float32)),
                jnp.asarray(noise), jnp.asarray(ks["kv_pos"], jnp.int32),
                jnp.asarray(2.0, jnp.float32))
        np.asarray(cfn(*args))                       # compile + warm
        rtt = _readback_rtt()
        iters = 2 if fast else 3
        t0 = time.monotonic()
        for _ in range(iters):
            np.asarray(cfn(*args))
        gwall = max(1e-9, (time.monotonic() - t0) / iters - rtt) / k_chain
        out["cfm_graph_ms"] = round(gwall * 1e3, 2)
        out["cfm_graph_rtf"] = round(gwall / 0.160, 4)
    except Exception as e:                           # never fail the bench
        out["cfm_graph_error"] = f"{type(e).__name__}: {e}"[:120]
    return out


def _bench_tts_flow(fast: bool = False):
    """flow_lm (Pocket-TTS shape), per-frame AR step."""
    from codec_tpu.io.gguf import GGUFReader
    from codec_tpu.lm import create_lm
    from codec_tpu.models.bench_lm_init import write_flow_lm_gguf

    _FIXTURE_DIR.mkdir(exist_ok=True)
    rng = np.random.default_rng(0)
    out = {}
    n_flow = 4 if fast else 20
    p = _FIXTURE_DIR / ("flow_smoke.gguf" if fast else "flow_pocket.gguf")
    if not p.exists():
        if fast:
            write_flow_lm_gguf(p, dm=32, layers=2, heads=2, hdim=16, ffn=64,
                               ldim=8, fdim=24, fdepth=2, nbins=50)
        else:
            write_flow_lm_gguf(p)
    lm = create_lm(GGUFReader(p))
    st = lm.new_state()
    lm.flow_prefill(st, list(range(1, 24)))
    fnoise = rng.standard_normal(lm.ldim).astype(np.float32)

    def flow_step():
        lm.flow_step(st, noise=fnoise)
    wall = _time_calls(flow_step, n=n_flow)
    out["flow_step_ms"] = round(wall * 1e3, 2)      # single-frame call

    # product path (tts_cli flow loop): 16-frame chunks via flow_run —
    # one dispatch + one readback per chunk
    chunk = 16
    st2 = lm.new_state()
    lm.flow_prefill(st2, list(range(1, 24)))
    cnoise = rng.standard_normal((chunk, lm.ldim)).astype(np.float32)

    def flow_chunk():
        if st2.kind_state["kv_pos"] + chunk > lm.max_T:
            lm.flow_reset(st2)
            lm.flow_prefill(st2, list(range(1, 24)))
        lm.flow_run(st2, cnoise)
    wall = _time_calls(flow_chunk, n=n_flow) / chunk
    out["flow_frame_ms"] = round(wall * 1e3, 2)     # per frame, chunked
    out["flow_rtf"] = round(wall / 0.080, 4)        # 12.5 Hz frames
    return out


def _bench_tts_rda(fast: bool = False):
    """residual_depth_ar (CSM-1B shape), fused on-device frame."""
    import jax.random as jr

    from codec_tpu.io.gguf import GGUFReader
    from codec_tpu.lm import create_lm
    from codec_tpu.models.bench_lm_init import write_rda_gguf

    _FIXTURE_DIR.mkdir(exist_ok=True)
    rng = np.random.default_rng(0)
    out = {}
    n_rda = 4 if fast else 20
    p = _FIXTURE_DIR / ("rda_smoke.gguf" if fast else "rda_csm1b.gguf")
    if not p.exists():
        if fast:
            write_rda_gguf(p, h=64, dh=32, n_cb=4, vocab=64, layers=2,
                           heads=2, kv=1, hdim=16, inter=64)
        else:
            write_rda_gguf(p)
    lm = create_lm(GGUFReader(p))
    fn = lm.fused_frame()                           # greedy
    h = jnp.asarray(rng.standard_normal(lm.info.hidden_dim), jnp.float32)
    key = jr.PRNGKey(0)
    state = {"k": key}

    def rda_step():
        state["k"], sub = jr.split(state["k"])
        np.asarray(fn(h, sub, jnp.int32(0)))
    wall = _time_calls(rda_step, n=n_rda)
    out["rda_frame_ms"] = round(wall * 1e3, 2)
    out["rda_rtf"] = round(wall / 0.080, 4)         # 12.5 Hz frames
    return out


def _rda_chunk_fixture(fast: bool = False):
    """Shared fixture for the rda_chunked / rda_batched / prefill
    sections: CSM-1B-shaped llama backbone params + the loaded RDA lm."""
    import jax.random as jr

    from codec_tpu.io.gguf import GGUFReader
    from codec_tpu.lm import create_lm
    from codec_tpu.lm.backbone import BackboneConfig
    from codec_tpu.models.bench_lm_init import write_rda_gguf

    _FIXTURE_DIR.mkdir(exist_ok=True)
    p = _FIXTURE_DIR / ("rda_smoke.gguf" if fast else "rda_csm1b.gguf")
    if not p.exists():
        if fast:
            write_rda_gguf(p, h=64, dh=32, n_cb=4, vocab=64, layers=2,
                           heads=2, kv=1, hdim=16, inter=64)
        else:
            write_rda_gguf(p)
    lm = create_lm(GGUFReader(p))

    if fast:
        cfg = BackboneConfig(hidden=64, n_layers=2, n_heads=2, n_kv_heads=1,
                             head_dim=16, ffn_dim=64, vocab_size=8,
                             max_ctx=128)
    else:
        # Llama-1B shape (the CSM backbone): bf16 weights, 1024-slot KV
        cfg = BackboneConfig(hidden=2048, n_layers=16, n_heads=32,
                             n_kv_heads=8, head_dim=64, ffn_dim=8192,
                             vocab_size=8, max_ctx=1024)
    dtype = jnp.bfloat16
    kbox = [jr.PRNGKey(0)]

    def W(*s, off=0.0):
        kbox[0], sub = jr.split(kbox[0])
        return (jr.normal(sub, s, jnp.float32) * 0.02 + off).astype(dtype)

    L, nh, nkv, hd, ffn, hid = (cfg.n_layers, cfg.n_heads, cfg.n_kv_heads,
                                cfg.head_dim, cfg.ffn_dim, cfg.hidden)
    bb_params = {
        "freq_factors": None,
        "out_norm": W(hid, off=1.0),
        "layers": {
            "attn_norm": W(L, hid, off=1.0), "ffn_norm": W(L, hid, off=1.0),
            "q": W(L, nh * hd, hid), "k": W(L, nkv * hd, hid),
            "v": W(L, nkv * hd, hid), "o": W(L, hid, nh * hd),
            "gate": W(L, ffn, hid), "up": W(L, ffn, hid),
            "down": W(L, hid, ffn),
        },
    }
    return lm, cfg, bb_params, dtype


def _bench_tts_rda_chunked(fast: bool = False):
    """Chunked on-device generation (lm/fused_gen.py): K whole frames —
    CSM-1B-shaped llama backbone step + fused depth-AR frame + feedback
    compose — per device call, one packed fetch. This is the tts-cli
    `--on-device --chunk-frames K` path; vs the per-frame rda section it
    removes 2·K−2 dispatches per K frames."""
    import jax.random as jr

    from codec_tpu.lm.fused_gen import build_gen_chunk

    lm, cfg, bb_params, dtype = _rda_chunk_fixture(fast)
    k_frames = 4 if fast else 16
    iters = 2 if fast else 4
    L, nkv, hd, hid = cfg.n_layers, cfg.n_kv_heads, cfg.head_dim, cfg.hidden
    chunk = build_gen_chunk(lm, cfg, (0.0, 0, 1.0, 0.0), k_frames)

    kv = jnp.zeros((L, 2, nkv, cfg.max_ctx, hd), dtype)
    h = jr.normal(jr.PRNGKey(1), (hid,), jnp.float32) * 0.3
    key = jr.PRNGKey(2)
    packed, h, kv, key = chunk(bb_params, kv, np.int32(0), np.int32(0),
                               h, key, np.int32(0))
    np.asarray(packed)                               # compile + warm
    rtt = _readback_rtt()
    t0 = time.monotonic()
    for _ in range(iters):
        packed, h, kv, key = chunk(bb_params, kv, np.int32(0), np.int32(0),
                                   h, key, np.int32(0))
        np.asarray(packed)
    wall = max(1e-9, (time.monotonic() - t0) - iters * rtt) / (iters * k_frames)
    return {"rda_chunked_frame_ms": round(wall * 1e3, 2),
            "rda_chunked_rtf": round(wall / 0.080, 4),
            "rda_chunk_frames": k_frames}


def _bench_tts_rda_batched(fast: bool = False):
    """Batched multi-stream generation (serve /synthesize_batch shape):
    B streams' fused frames + backbone steps as batched GEMMs in one
    vmapped while_loop — reports the per-stream per-frame wall."""
    import jax.random as jr

    from codec_tpu.lm.fused_gen import build_gen_chunk_batched

    lm, cfg, bb_params, dtype = _rda_chunk_fixture(fast)
    k_frames = 4 if fast else 16
    iters = 2 if fast else 4
    L, nkv, hd, hid = cfg.n_layers, cfg.n_kv_heads, cfg.head_dim, cfg.hidden

    n_streams = 2 if fast else 8
    bchunk = build_gen_chunk_batched(lm, cfg, (0.0, 0, 1.0, 0.0), k_frames)
    kvb = jnp.zeros((n_streams, L, 2, nkv, cfg.max_ctx, hd), dtype)
    hb = jr.normal(jr.PRNGKey(3), (n_streams, hid), jnp.float32) * 0.3
    keysb = jax.vmap(jr.PRNGKey)(jnp.arange(n_streams, dtype=jnp.uint32))
    posb = jnp.zeros((n_streams,), jnp.int32)
    tcb = jnp.zeros((n_streams,), jnp.int32)
    doneb = np.zeros(n_streams, bool)
    packed, hb, kvb, keysb = bchunk(bb_params, kvb, posb, np.int32(0),
                                    hb, keysb, tcb, doneb)
    np.asarray(packed)                               # compile + warm
    rtt = _readback_rtt()
    t0 = time.monotonic()
    for _ in range(iters):
        packed, hb, kvb, keysb = bchunk(bb_params, kvb, posb, np.int32(0),
                                        hb, keysb, tcb, doneb)
        np.asarray(packed)
    bwall = max(1e-9, (time.monotonic() - t0) - iters * rtt) \
        / (iters * k_frames * n_streams)
    return {"rda_batched_streams": n_streams,
            "rda_batched_frame_ms_per_stream": round(bwall * 1e3, 2),
            "rda_batched_rtf_per_stream": round(bwall / 0.080, 4)}


def _bench_prefill(fast: bool = False):
    """Prompt prefill on the 1B-shaped backbone: T per-token dispatches
    (the default admission path) vs ONE bucket-padded forward
    (tts-cli/serve --prefill-bucket; tts_runner.prefill_prompt)."""
    import jax.random as jr

    from codec_tpu.lm.backbone import backbone_forward

    lm, cfg, bb_params, dtype = _rda_chunk_fixture(fast)
    iters = 2 if fast else 4
    L, nkv, hd, hid = cfg.n_layers, cfg.n_kv_heads, cfg.head_dim, cfg.hidden
    n_tok = 8 if fast else 32
    step1 = jax.jit(lambda pr, kv_, pos, x: backbone_forward(pr, kv_, pos,
                                                             x, cfg),
                    donate_argnums=(1,))
    stepN = jax.jit(lambda pr, kv_, pos, x: backbone_forward(pr, kv_, pos,
                                                             x, cfg),
                    donate_argnums=(1,))
    emb = (jr.normal(jr.PRNGKey(5), (n_tok, hid), jnp.float32) * 0.3) \
        .astype(dtype)
    kvp = jnp.zeros((L, 2, nkv, cfg.max_ctx, hd), dtype)
    hp, kvp = step1(bb_params, kvp, np.int32(0), emb[:1])     # warm t=1
    np.asarray(hp)
    hp, kvp = stepN(bb_params, kvp, np.int32(0), emb)         # warm t=N
    np.asarray(hp)
    rtt = _readback_rtt()
    t0 = time.monotonic()
    for _ in range(iters):
        for i in range(n_tok):
            hp, kvp = step1(bb_params, kvp, np.int32(i), emb[i: i + 1])
        np.asarray(hp)
    tok_wall = max(1e-9, (time.monotonic() - t0) - iters * rtt) / iters
    t0 = time.monotonic()
    for _ in range(iters):
        hp, kvp = stepN(bb_params, kvp, np.int32(0), emb)
        np.asarray(hp)
    buck_wall = max(1e-9, (time.monotonic() - t0) - iters * rtt) / iters
    return {"prefill_tokens": n_tok,
            "prefill_per_token_ms": round(tok_wall * 1e3, 2),
            "prefill_bucketed_ms": round(buck_wall * 1e3, 2),
            "prefill_speedup": round(tok_wall / buck_wall, 2)}


def _t3_fixture(fast: bool = False):
    import jax.random as jr

    from codec_tpu.lm.backbone import BackboneConfig

    v = 64 if fast else 6563
    if fast:
        cfg = BackboneConfig(hidden=64, n_layers=2, n_heads=2, n_kv_heads=1,
                             head_dim=16, ffn_dim=64, vocab_size=8,
                             max_ctx=128)
    else:
        cfg = BackboneConfig(hidden=1024, n_layers=30, n_heads=16,
                             n_kv_heads=16, head_dim=64, ffn_dim=4096,
                             vocab_size=8, max_ctx=1024)
    dtype = jnp.bfloat16
    kbox = [jr.PRNGKey(4)]

    def W(*s, off=0.0):
        kbox[0], sub = jr.split(kbox[0])
        return (jr.normal(sub, s, jnp.float32) * 0.02 + off).astype(dtype)

    L, nh, nkv, hd, ffn, hid = (cfg.n_layers, cfg.n_heads, cfg.n_kv_heads,
                                cfg.head_dim, cfg.ffn_dim, cfg.hidden)
    bb_params = {
        "freq_factors": None,
        "out_norm": W(hid, off=1.0),
        "layers": {
            "attn_norm": W(L, hid, off=1.0), "ffn_norm": W(L, hid, off=1.0),
            "q": W(L, nh * hd, hid), "k": W(L, nkv * hd, hid),
            "v": W(L, nkv * hd, hid), "o": W(L, hid, nh * hd),
            "gate": W(L, ffn, hid), "up": W(L, ffn, hid),
            "down": W(L, hid, ffn),
        },
    }
    head = jr.normal(jr.PRNGKey(5), (v, hid), jnp.float32) * 0.3
    semb = jr.normal(jr.PRNGKey(6), (v, hid), jnp.float32) * 0.2
    pemb = jr.normal(jr.PRNGKey(7), (1024, hid), jnp.float32) * 0.02
    return cfg, bb_params, head, semb, pemb, v, dtype


def _bench_t3_chunked(fast: bool = False):
    """Chatterbox T3 dual-lane CFG chunk (lm/fused_gen.
    build_chatterbox_chunk): K frames of speech-head logits for both
    lanes + CFG combine + the T3 sampler chain (full-history repetition
    penalty seen-mask, temp/min_p) + one vmapped 2-lane backbone step per
    frame, all in one device call. T3-shaped fixture: 0.5B llama
    (30L/1024h bf16), speech vocab 6563. Frame budget: 25 speech
    tokens/s → 40 ms/frame (reference runs this loop fully on the host,
    tts_runner.cpp:876)."""
    import jax.random as jr

    from codec_tpu.lm.fused_gen import build_chatterbox_chunk

    cfg, bb_params, head, semb, pemb, v, dtype = _t3_fixture(fast)
    k_frames = 4 if fast else 16
    iters = 2 if fast else 4
    L, nkv, hd, hid = cfg.n_layers, cfg.n_kv_heads, cfg.head_dim, cfg.hidden
    # stop_token=-1 disables EOS so every chunk runs the full K frames
    chunk = build_chatterbox_chunk(cfg, (0.8, 0, 1.0, 0.05), 1.2, k_frames,
                                   n_seq=2, cfg_weight=0.5, stop_token=-1,
                                   n_pos=1024)
    kv = jnp.zeros((2, L, 2, nkv, cfg.max_ctx, hd), dtype)
    h = jr.normal(jr.PRNGKey(8), (2, hid), jnp.float32) * 0.3
    key = jr.PRNGKey(9)
    seen = jnp.zeros((v,), bool)
    packed, h, kv, key, seen = chunk(bb_params, head, semb, pemb, kv,
                                     np.int32(0), np.int32(0), h, key, seen)
    np.asarray(packed)                                # compile + warm
    rtt = _readback_rtt()
    t0 = time.monotonic()
    for _ in range(iters):
        packed, h, kv, key, seen = chunk(bb_params, head, semb, pemb, kv,
                                         np.int32(0), np.int32(0), h, key,
                                         seen)
        np.asarray(packed)
    wall = max(1e-9, (time.monotonic() - t0) - iters * rtt) \
        / (iters * k_frames)
    return {"t3_chunked_frame_ms": round(wall * 1e3, 2),
            "t3_chunked_rtf": round(wall / 0.040, 4),
            "t3_chunk_frames": k_frames, "t3_lanes": 2}


def _bench_t3_batched(fast: bool = False):
    """Batched multi-stream T3: B concurrent syntheses (each 2 CFG lanes)
    through one vmapped loop (run_chatterbox_batch / /synthesize_batch
    shape; per-stream traced chains)."""
    import jax.random as jr

    from codec_tpu.lm.fused_gen import build_chatterbox_chunk_batched

    cfg, bb_params, head, semb, pemb, v, dtype = _t3_fixture(fast)
    k_frames = 4 if fast else 16
    iters = 2 if fast else 4
    L, nkv, hd, hid = cfg.n_layers, cfg.n_kv_heads, cfg.head_dim, cfg.hidden
    import jax.random as _jr

    n_streams = 2 if fast else 4
    bchunk = build_chatterbox_chunk_batched(
        cfg, k_frames, n_seq=2, cfg_weight=0.5, stop_token=-1, n_pos=1024)
    kvb = jnp.zeros((n_streams, 2, L, 2, nkv, cfg.max_ctx, hd), dtype)
    hb = jr.normal(jr.PRNGKey(10), (n_streams, 2, hid), jnp.float32) * 0.3
    keysb = jax.vmap(_jr.PRNGKey)(jnp.arange(n_streams, dtype=jnp.uint32))
    seenb = jnp.zeros((n_streams, v), bool)
    chainsb = jnp.tile(jnp.asarray([0.8, 0.0, 1.0, 0.05], jnp.float32),
                       (n_streams, 1))
    posb = jnp.zeros((n_streams,), jnp.int32)
    stepb = jnp.zeros((n_streams,), jnp.int32)
    doneb = np.zeros(n_streams, bool)
    packed, hb, kvb, keysb, seenb = bchunk(
        bb_params, head, semb, pemb, kvb, posb, stepb, hb, keysb, seenb,
        doneb, chainsb)
    np.asarray(packed)                                # compile + warm
    rtt = _readback_rtt()
    t0 = time.monotonic()
    for _ in range(iters):
        packed, hb, kvb, keysb, seenb = bchunk(
            bb_params, head, semb, pemb, kvb, posb, stepb, hb, keysb,
            seenb, doneb, chainsb)
        np.asarray(packed)
    bwall = max(1e-9, (time.monotonic() - t0) - iters * rtt) \
        / (iters * k_frames * n_streams)
    return {"t3_batched_streams": n_streams,
            "t3_batched_frame_ms_per_stream": round(bwall * 1e3, 2),
            "t3_batched_rtf_per_stream": round(bwall / 0.040, 4)}


def _bench_tts_ar(fast: bool = False):
    """All three base TTS/AR sections (kept for CPU smoke compatibility)."""
    out = {}
    out.update(_bench_tts_cfm(fast))
    out.update(_bench_tts_flow(fast))
    out.update(_bench_tts_rda(fast))
    return out


def main():
    import threading

    # Deterministic product-surface numbers: without this the background
    # best-plan upgrade (tiered jit) can swap executables between warmup
    # and the timed loop, mixing fast-tier and best-tier walls
    # run-to-run. "fast" pins the fast tier: deterministic, cheap to
    # compile on a cold cache (the best-plan b=1 graph compiles ~276 s on
    # the relay), and the product walls are transport-dominated anyway
    # (the plans' graph walls differ ~6 ms on b=1; they coincide at b>1).
    os.environ.setdefault("CODEC_TIERED_JIT", "fast")

    smoke = os.environ.get("BENCH_SMOKE") == "1"
    budget = float(os.environ.get("BENCH_BUDGET_S", "120" if smoke else "2400"))
    t_start = time.monotonic()

    def remaining() -> float:
        return budget - (time.monotonic() - t_start)

    t_frames = 25 if smoke else 250     # 20 s of 24 kHz audio per stream
    nf = 8 if smoke else 64

    extra = {"t_frames": t_frames,
             "budget_s": budget, "provenance": "driver bench.py",
             "v5e_peaks": {"bf16_flops": V5E_BF16_PEAK_FLOPS,
                           "hbm_bytes_s": V5E_HBM_PEAK_BYTES}}
    walls: dict = {}
    skipped: list = []
    extra["section_walls_s"] = walls
    extra["skipped"] = skipped
    result = {"metric": "mimi_decode_xrt_per_chip", "value": 0.0,
              "unit": "x_realtime", "vs_baseline": 0.0, "extra": extra}
    emit_lock = threading.Lock()
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "benchmarks", "bench_latest.json")

    def _get(*path):
        cur: object = extra
        for p in path:
            if not isinstance(cur, dict):
                return None
            cur = cur.get(p)
        return cur if not isinstance(cur, dict) else None

    def _summary() -> dict:
        """Small FLAT scalars for the stdout headline. Round 4's enriched
        line grew past the driver's parser (BENCH_r04 parsed=null, rc=0 —
        VERDICT r4 #2); the full record now goes to
        benchmarks/bench_latest.json and stdout stays compact."""
        s: dict = {"device": extra.get("device"),
                   "sections_done": len(walls),
                   "skipped": len(skipped),
                   "total_wall_s": extra.get("total_wall_s"),
                   "detail": "benchmarks/bench_latest.json"}
        for k, path in {
            "f32_b1_ms": ("f32_b1", "wall_ms"),
            "dac_bf16_b1_ms": ("dac_bf16_b1", "wall_ms"),
            "snac_bf16_b1_ms": ("snac_bf16_b1", "wall_ms"),
            "wt_bf16_b1_ms": ("wavtokenizer_bf16_b1", "wall_ms"),
            "serving_rtf_p50": ("serving", "per_stream_rtf", "p50"),
            "serving_ttfa_ms_p50": ("serving", "ttfa_ms", "p50"),
            "serving_xrt": ("serving", "aggregate_audio_xrt"),
            "timed_region_compiles": ("serving", "timed_region_compiles"),
            "serving_steady_state": ("serving", "steady_state"),
            "encode_bitexact": ("encode_bitexact", "bitexact"),
            "encode_diverged_frames": ("encode_bitexact",
                                       "code_mismatch_frames"),
            "cold_start_s": ("cold_start", "cold_start_to_first_audio_s"),
            "batch_knee": ("batch_sweep", "knee"),
            "batch_bound": ("batch_sweep", "bound"),
            "batch_best_xrt": ("batch_sweep", "best_xrt"),
        }.items():
            v = _get(*path)
            if v is not None:
                s[k] = v
        return s

    def emit():
        # one compact line per milestone; the driver takes the last full
        # line, so a mid-run kill still leaves a parseable result. The
        # full enriched record is written (atomically) to detail_path.
        with emit_lock:
            try:
                os.makedirs(os.path.dirname(detail_path), exist_ok=True)
                tmp = detail_path + ".tmp"
                with open(tmp, "w") as f:
                    json.dump(result, f, indent=1)
                os.replace(tmp, detail_path)
            except OSError:
                pass
            print(json.dumps(dict(result, extra=_summary())), flush=True)

    # skeleton line FIRST — before device init, weight upload, or any
    # compile touches the (possibly wedged/slow) relay. An external kill
    # at ANY later point leaves a parseable line on stdout.
    emit()

    def _watchdog():
        # belt-and-braces: if a section wedges (dropped relay connection
        # mid-compile), still exit 0 with the sections finished so far
        time.sleep(budget + 60)
        extra["watchdog_fired"] = True
        emit()
        os._exit(0)

    threading.Thread(target=_watchdog, daemon=True).start()

    from codec_tpu.models.mimi import MimiConfig
    from codec_tpu.models.mimi_init import random_mimi_params

    dev = jax.devices()[0]
    extra["device"] = str(dev)

    cfg = MimiConfig(**({"hidden": 64, "n_layers": 1, "n_heads": 2,
                         "n_q": 4} if smoke else {}))
    params32 = random_mimi_params(cfg, num_filters=nf, seed=0,
                                  dtype=jnp.float32)
    params_bf16 = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        params32)

    # --- headline first: print the moment it exists -------------------
    try:
        t0 = time.monotonic()
        xrt_f32, wall_f32, compile_s, roof = _bench_decode(
            cfg, params32, 1, t_frames)
        walls["f32_b1"] = round(time.monotonic() - t0, 1)
        extra["f32_b1"] = {"xrt": round(xrt_f32, 1),
                           "wall_ms": round(wall_f32 * 1e3, 2),
                           "roofline": roof}
        extra["first_compile_s"] = round(compile_s, 1)
        result["value"] = round(xrt_f32, 1)
        result["vs_baseline"] = round(xrt_f32 / 10.0, 2)
    except Exception as e:                            # noqa: BLE001
        extra["f32_b1"] = {"error": f"{type(e).__name__}: {e}"[:300]}
    emit()

    # --- budget-gated sections, highest value first -------------------
    # est = generous cold-compile cost on the relay (seconds). Gating
    # adapts: observed actual/est ratios rescale the estimates so a fast
    # relay day doesn't skip sections a slow estimate would forbid.
    ratios: list = []

    def run(key: str, fn, est: float, dest: dict = extra):
        sc = sorted(ratios)[len(ratios) // 2] if ratios else 1.0
        need = max(30.0, est * min(max(sc, 0.25), 3.0))
        if remaining() < need:
            dest[key] = "skipped (budget)"
            skipped.append(key)
            return
        print(f"# bench: running {key} (est {est:.0f}s, "
              f"remaining {remaining():.0f}s)", file=sys.stderr, flush=True)
        t0 = time.monotonic()
        try:
            dest[key] = fn()
            walls[key] = round(time.monotonic() - t0, 1)
            ratios.append(walls[key] / est)
        except Exception as e:                        # noqa: BLE001
            dest[key] = {"error": f"{type(e).__name__}: {e}"[:300]}
            walls[key] = round(time.monotonic() - t0, 1)
            print(f"# bench section {key} failed: {dest[key]['error']}",
                  file=sys.stderr, flush=True)
        emit()

    rng = np.random.default_rng(0)

    def dac_params(bf16: bool):
        from codec_tpu.models.bench_init import random_dac_decode_params
        dcfg, dparams = random_dac_decode_params()
        if bf16:
            dparams = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16)
                if isinstance(a, jax.Array) and a.dtype == jnp.float32 else a,
                dparams)
        t_dac = 24000 * 20 // dcfg.hop_size             # 20 s of audio
        codes = jnp.asarray(rng.integers(0, dcfg.codebook_size,
                                         (1, t_dac, dcfg.n_q)), jnp.int32)
        return dcfg, dparams, t_dac, codes

    def dac_bench(bf16: bool):
        from codec_tpu.models.dac import dac_decode_fn
        dcfg, dparams, t_dac, codes = dac_params(bf16)
        xrt, wall, roof = _bench_generic(
            lambda p, c: dac_decode_fn(p, c, dcfg), dparams, codes,
            t_dac * dcfg.hop_size, dcfg.sample_rate, dcfg.codebook_size)
        return {"xrt": round(xrt, 1), "wall_ms": round(wall * 1e3, 2),
                "roofline": roof}

    def wt_bench(bf16: bool):
        from codec_tpu.models.bench_init import random_wt_decode_params
        from codec_tpu.models.wavtokenizer import wt_decode_fn
        wcfg, wparams = random_wt_decode_params()
        if bf16:
            wparams = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16)
                if isinstance(a, jax.Array) and a.dtype == jnp.float32 else a,
                wparams)
        t_wt = 24000 * 20 // wcfg.hop_size
        codes = jnp.asarray(rng.integers(0, wcfg.codebook_size,
                                         (1, t_wt, 1)), jnp.int32)
        xrt, wall, roof = _bench_generic(
            lambda p, c: wt_decode_fn(p, c, wcfg), wparams, codes,
            t_wt * wcfg.hop_size, wcfg.sample_rate, wcfg.codebook_size)
        return {"xrt": round(xrt, 1), "wall_ms": round(wall * 1e3, 2),
                "roofline": roof}

    def snac_bench(bf16: bool):
        # 4th lineup arch vs the reference's committed baseline
        # (snac e2e 1446.7 ms on the Ryzen host, BASELINE.md): decode of
        # ~20 s at hubertsiuzdak/snac_24khz production dims
        from codec_tpu.models.bench_init import random_snac_params
        from codec_tpu.models.snac import snac_decode_fn
        scfg, sparams = random_snac_params(encoder=False)
        if bf16:
            sparams = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16)
                if isinstance(a, jax.Array) and a.dtype == jnp.float32 else a,
                sparams)
        t_sn = (24000 * 20 // scfg.hop_size) // 4 * 4   # multiple of vq_strides
        codes = jnp.asarray(rng.integers(0, scfg.codebook_size,
                                         (1, t_sn, 3)), jnp.int32)
        xrt, wall, roof = _bench_generic(
            lambda p, c: snac_decode_fn(p, c, scfg), sparams, codes,
            t_sn * scfg.hop_size, scfg.sample_rate, scfg.codebook_size)
        return {"xrt": round(xrt, 1), "wall_ms": round(wall * 1e3, 2),
                "roofline": roof}

    def mimi_bf16(batch: int, n_iters: int = 50):
        xrt, wall, _, roof = _bench_decode(cfg, params_bf16, batch, t_frames,
                                           n_iters=n_iters)
        return {"xrt": round(xrt, 1), "wall_ms": round(wall * 1e3, 2),
                "roofline": roof}

    def encode_bitexact():
        """Driver-verifiable BASELINE.md:29 north star: bit-exact RVQ code
        emission on encode at production shape (VERDICT r4 #5). Runs
        tools/tpu_parity.py --exact — CPU worker then TPU worker over the
        SAME full-size Mimi GGUF + input, CODEC_EXACT_ENCODE pinning the
        whole encode graph to f32 HIGHEST — and reports frames diverged."""
        import subprocess
        repo = os.path.dirname(os.path.abspath(__file__))
        # --reuse-cpu: the fixture dir persists the CPU worker's outputs
        # (run under --exact), so a budget-bound bench run pays only the
        # TPU worker (the round-5 first run lost this section to the CPU
        # worker + fixture build eating its timeout)
        r = subprocess.run(
            [sys.executable, os.path.join(repo, "tools", "tpu_parity.py"),
             "--exact", "--reuse-cpu"], cwd=repo, capture_output=True,
            text=True, timeout=max(120, min(900, remaining() - 30)))
        lines = [ln for ln in r.stdout.strip().splitlines()
                 if ln.startswith("{")]
        res = json.loads(lines[-1])
        if res.get("worker"):            # a worker failed before compare
            raise RuntimeError(f"tpu_parity rc={r.returncode}: {lines[-1]}")
        return {"bitexact": res["code_mismatch_frames"] == 0,
                "code_mismatch_frames": res["code_mismatch_frames"],
                "frames": res["frames"],
                "decode_corr": res["decode_corr"], "ok": res["ok"]}

    def batch_sweep():
        """MXU-saturation sweep (BASELINE.md:30 third clause, VERDICT r4
        #4): mimi + dac bf16 decode at b16→b128 with per-point wall,
        aggregate xrt, MFU%, HBM% from XLA's own cost model. `knee` is
        the last batch that still scaled xrt ≥1.3× per doubling; `bound`
        names the roofline-binding resource at the knee (arithmetic
        intensity vs the v5e machine balance ~243 flops/byte)."""
        from codec_tpu.models.dac import dac_decode_fn
        dcfg, dparams, t_dac, _ = dac_params(True)
        out: dict = {"mimi": {}, "dac": {}}
        # partial points survive a mid-sweep failure (round-5 run 2 lost
        # the whole section to one relay-side compile-helper crash)
        extra["batch_sweep_partial"] = out
        balance = V5E_BF16_PEAK_FLOPS / V5E_HBM_PEAK_BYTES

        def point(model: str, b: int, fn):
            try:
                xrt, wall, roof = fn()
                out[model][f"b{b}"] = {"xrt": round(xrt, 1),
                                       "wall_ms": round(wall * 1e3, 2),
                                       "roofline": roof}
            except Exception as e:                     # noqa: BLE001
                out[model][f"b{b}"] = {
                    "error": f"{type(e).__name__}: {e}"[:200]}
            emit()

        def mimi_pt(b):
            xrt, wall, _, roof = _bench_decode(
                cfg, params_bf16, b, t_frames, n_iters=10)
            return xrt, wall, roof

        def dac_pt(b):
            codes = jnp.asarray(rng.integers(
                0, dcfg.codebook_size, (b, t_dac, dcfg.n_q)), jnp.int32)
            return _bench_generic(
                lambda p, c: dac_decode_fn(p, c, dcfg), dparams, codes,
                b * t_dac * dcfg.hop_size, dcfg.sample_rate,
                dcfg.codebook_size, n_iters=10)

        for b in (16, 32, 64, 128):
            if remaining() < 300:
                out["truncated_at_batch"] = b
                break
            point("mimi", b, lambda b=b: mimi_pt(b))
            point("dac", b, lambda b=b: dac_pt(b))

        knees = {}
        for m in ("mimi", "dac"):
            pts = [(int(k[1:]), v) for k, v in out[m].items()
                   if "xrt" in v]
            knee = pts[0] if pts else None
            for prev, cur in zip(pts, pts[1:]):
                if cur[1]["xrt"] >= 1.3 * prev[1]["xrt"]:
                    knee = cur
                else:
                    break
            if knee:
                roof = knee[1]["roofline"]
                ai = (roof.get("flops", 0) /
                      max(1, roof.get("hbm_bytes", 1)))
                knees[m] = {"batch": knee[0], "xrt": knee[1]["xrt"],
                            "mfu_pct": roof.get("mfu_pct"),
                            "hbm_pct": roof.get("hbm_pct"),
                            "arith_intensity": round(ai, 1),
                            "bound": "hbm" if ai < balance else "mxu"}
        out["knee_per_model"] = knees
        if knees:
            out["knee"] = " ".join(f"{m}:b{k['batch']}"
                                   for m, k in knees.items())
            out["bound"] = " ".join(f"{m}:{k['bound']}"
                                    for m, k in knees.items())
            out["best_xrt"] = max(k["xrt"] for k in knees.values())
        # continuity with the round-3/4 key
        if "b16" in out["mimi"]:
            extra["bf16_b16_throughput"] = out["mimi"]["b16"]
        return out

    def streaming():
        from codec_tpu.models.mimi import (mimi_decode_stream_init,
                                           mimi_decode_stream_step)

        sstate = mimi_decode_stream_init(params32, cfg, 1)
        sstep = jax.jit(
            lambda p, s, c: mimi_decode_stream_step(p, s, c, cfg),
            donate_argnums=(1,))
        c1 = jnp.asarray(rng.integers(0, cfg.codebook_size, (1, 1, cfg.n_q)),
                         jnp.int32)
        pcm1, st = sstep(params32, sstate, c1)
        np.asarray(pcm1)
        t0 = time.monotonic()
        for _ in range(50):
            pcm1, st = sstep(params32, st, c1)
        np.asarray(pcm1)
        return round((time.monotonic() - t0 - _readback_rtt()) / 50 * 1e3, 2)

    tts = extra.setdefault("tts_ar", {})

    if smoke:
        run("bf16_b8_throughput", lambda: mimi_bf16(8), 20)
        run("streaming_frame_latency_ms", streaming, 20)
        run("cfm", lambda: _bench_tts_cfm(fast=True), 20, dest=tts)
        run("flow", lambda: _bench_tts_flow(fast=True), 20, dest=tts)
        run("rda", lambda: _bench_tts_rda(fast=True), 20, dest=tts)
        run("rda_chunked", lambda: _bench_tts_rda_chunked(fast=True), 20,
            dest=tts)
        run("t3_chunked", lambda: _bench_t3_chunked(fast=True), 20, dest=tts)
    else:
        def serving():
            # live-mix continuous-batching SLOs: p50/p95 time-to-first-
            # audio + per-stream RTF (VERDICT r3 #8; docs/SERVING.md).
            # steady_state is measured (zero timed-region compiles).
            sys.path.insert(0, str(
                __import__("pathlib").Path(__file__).parent / "tools"))
            from cont_batch_bench import run_bench
            return run_bench(slots=4, chunk=16, requests=8, base_steps=32)

        # ordered by (driver value) / (cold-compile cost); the round-4
        # findings under audit come first: serving collapse, SNAC
        # outlier, encode bit-exactness, MXU saturation, cold start
        run("bf16_b8_throughput", lambda: mimi_bf16(8), 350)
        run("dac_bf16_b1", lambda: dac_bench(True), 300)
        run("wavtokenizer_bf16_b1", lambda: wt_bench(True), 150)
        # ~650s: the fused depthwise-chain Pallas kernels (4 Mosaic
        # instances) dominate the section's fresh-process compile; the
        # decode itself is 13 ms [session r5, tools/snac_bisect.py +
        # tools/snac_bisect.py --full — 32.2 -> 11.89 ms]
        run("snac_bf16_b1", lambda: snac_bench(True), 700)
        run("serving", serving, 400)
        run("encode_bitexact", encode_bitexact, 450)
        run("batch_sweep", batch_sweep, 700)
        run("t3_chunked", lambda: _bench_t3_chunked(), 450, dest=tts)
        run("product_core", _bench_product_core, 500)
        run("streaming_frame_latency_ms", streaming, 120)
        run("rda_chunked", lambda: _bench_tts_rda_chunked(), 450, dest=tts)
        run("cfm", lambda: _bench_tts_cfm(), 300, dest=tts)
        run("flow", lambda: _bench_tts_flow(), 200, dest=tts)
        run("rda", lambda: _bench_tts_rda(), 150, dest=tts)
        run("dac_f32_b1", lambda: dac_bench(False), 300)
        run("wavtokenizer_f32_b1", lambda: wt_bench(False), 150)
        run("product_more", _bench_product_more, 450)
        run("rda_batched", lambda: _bench_tts_rda_batched(), 400, dest=tts)
        run("t3_batched", lambda: _bench_t3_batched(), 400, dest=tts)
        run("bf16_b1", lambda: mimi_bf16(1), 250)
        # LAST: an intentionally-cold child can only use residual budget
        # (run mid-list in round-5 run 2, its 900 s timeout starved 8
        # later sections on a congested-relay day)
        if os.environ.get("BENCH_COLD_START") == "0":
            extra["cold_start"] = "skipped (BENCH_COLD_START=0)"
        else:
            run("cold_start",
                lambda: _bench_cold_start(
                    timeout_s=max(120.0, remaining() - 90.0)), 150)

    extra["total_wall_s"] = round(time.monotonic() - t_start, 1)
    emit()
    # skip interpreter/jax teardown: a wedged relay connection must not
    # turn a finished bench into a timeout
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
