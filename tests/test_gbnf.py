"""GBNF grammar engine: parsing, pushdown matching, constrained sampling,
and the tts_auto_grammar analog (reference: llama.cpp llama-grammar via
common/tts_runner.cpp:134-192; auto-grammar common/audio_lm.cpp:1164)."""

import numpy as np
import pytest

from codec_tpu.lm.gbnf import (GbnfError, GrammarSampler, GrammarState,
                               gbnf_uint_range_rule, parse_gbnf,
                               tts_auto_grammar)


def _matches(g, text):
    st = GrammarState(g).accepts_text(text)
    return st is not None and st.can_stop


def test_parse_basic_literal_and_alt():
    g = parse_gbnf('root ::= "ab" | "cd"\n')
    assert _matches(g, "ab") and _matches(g, "cd")
    assert not _matches(g, "ad") and not _matches(g, "a")


def test_char_class_ranges_and_negation():
    g = parse_gbnf('root ::= [a-cx] [^0-9]\n')
    assert _matches(g, "aZ") and _matches(g, "x!")
    assert not _matches(g, "dZ") and not _matches(g, "a5")


def test_repetition_star_plus_opt():
    g = parse_gbnf('root ::= "a"* "b"+ "c"?\n')
    for ok in ("b", "ab", "aaabbbc", "bc", "aab"):
        assert _matches(g, ok), ok
    for bad in ("", "a", "ac", "cb", "abcc"):
        assert not _matches(g, bad), bad


def test_groups_and_rule_refs():
    g = parse_gbnf('root ::= greet (" " name)+\n'
                   'greet ::= "hi" | "yo"\n'
                   'name ::= [a-z] [a-z]*\n')
    assert _matches(g, "hi bob")
    assert _matches(g, "yo ann zed")
    assert not _matches(g, "hi")
    assert not _matches(g, "hello bob")


def test_escapes_and_comments():
    g = parse_gbnf('# comment line\n'
                   'root ::= "\\"" [\\t ] "\\n"   # trailing comment\n')
    assert _matches(g, '"\t\n') and _matches(g, '" \n')
    assert not _matches(g, '"x\n')


def test_parse_errors_are_clean():
    for bad in ('root ::= "unterminated\n',
                'root ::= nosuchrule\n',
                'noroot ::= "a"\n',
                'root ::= *\n',
                'root ::= []\n'):
        with pytest.raises(GbnfError):
            parse_gbnf(bad)


def test_recursive_rule():
    # balanced parens
    g = parse_gbnf('root ::= expr\nexpr ::= "(" expr ")" | "x"\n')
    assert _matches(g, "x") and _matches(g, "((x))")
    assert not _matches(g, "(x") and not _matches(g, ")x(")


def test_uint_range_rule_exact_bounds():
    for mx in (0, 7, 9, 10, 42, 99, 100, 523, 999, 1023, 2050):
        g = parse_gbnf(f"root ::= {gbnf_uint_range_rule(mx)}\n")
        for v in (0, 1, 9, 10, 99, 100, 999, 1000, 1023, 2050, mx):
            want = v <= mx
            got = _matches(g, str(v))
            assert got == want, (mx, v, got)
        assert not _matches(g, str(mx + 1)), mx
        if mx >= 1:
            assert not _matches(g, "01")       # no leading zeros


def test_uint_range_rule_large_fallback():
    """Past 9999 the reference falls back to unconstrained digits
    (audio_lm.cpp:1116); the 4-digit construction would otherwise emit
    malformed classes like [1-14]."""
    for mx in (10000, 14999, 152696):
        rule = gbnf_uint_range_rule(mx)
        assert rule == "[0-9]+"
        g = parse_gbnf(f"root ::= {rule}\n")
        for v in ("0", "9999", str(mx), str(mx + 1)):
            assert _matches(g, v)
    # 9999 itself still gets the exact construction
    g = parse_gbnf(f"root ::= {gbnf_uint_range_rule(9999)}\n")
    assert _matches(g, "9999") and not _matches(g, "10000")


def test_auto_grammar_moss_shape():
    class PI:
        cb0_from_backbone = True
        cb0_speech_range_start = 100
        cb0_speech_range_end = 1124          # 1024 speech tokens

    text = tts_auto_grammar(PI())
    assert "end_of_speech" in text
    g = parse_gbnf(text)
    assert _matches(g, "<0><512><1023><|end_of_speech|>")
    assert _matches(g, "<|end_of_speech|>")
    assert not _matches(g, "<1024><|end_of_speech|>")
    assert not _matches(g, "<5>")            # must end with the sentinel

    class NoPI:
        cb0_from_backbone = False
    assert tts_auto_grammar(NoPI()) == ""


def test_grammar_sampler_check_then_resample():
    """Fast path: base sampler's pick is kept when viable; on violation the
    full mask is applied and the base sampler re-invoked."""
    pieces = ["<", "0", "1", ">", "x", "<|end_of_speech|>"]
    gr = ('root ::= code* end\ncode ::= "<" [0-1] ">"\n'
          'end ::= "<|end_of_speech|>"\n')
    calls = []

    def greedy(logits):
        calls.append(1)
        return int(np.argmax(logits))

    s = GrammarSampler(gr, pieces, greedy, eog_tokens=())
    # at start only "<" or the sentinel are viable; "x" (idx 4) is top
    logits = np.array([0.1, 0.0, 0.0, 0.0, 9.0, 0.2], np.float32)
    tok = s(logits)
    assert tok == 5 or tok == 0              # masked resample picked viable
    assert len(calls) == 2                   # sample -> reject -> resample

    # viable top pick goes straight through (one sampler call)
    calls.clear()
    logits2 = np.array([9.0, 0, 0, 0, 0, 0.2], np.float32)
    assert s(logits2) == 0
    assert len(calls) == 1

    # accept advances state: after "<", only digits are viable
    s.accept(0)
    logits3 = np.array([9.0, 0.5, 0.4, 8.0, 7.0, 6.0], np.float32)
    tok = s(logits3)
    assert tok in (1, 2)
    s.accept(tok)
    assert s(np.array([0, 0, 0, 5.0, 9.0, 8.0], np.float32)) == 3


def test_grammar_sampler_eog_gated_on_can_stop():
    pieces = ["a", "<eos>"]
    s = GrammarSampler('root ::= "a" "a"\n', pieces,
                       lambda lg: int(np.argmax(lg)), eog_tokens=[1])
    # mid-grammar: eos not admissible yet
    lg = np.array([0.0, 9.0], np.float32)
    assert s(lg) == 0
    s.accept(0)
    assert s(lg) == 0
    s.accept(0)
    assert s(lg) == 1                        # grammar can stop -> eos allowed


def test_grammar_sampler_violation_raises():
    s = GrammarSampler('root ::= "a"\n', ["a", "b"],
                       lambda lg: int(np.argmax(lg)))
    with pytest.raises(GbnfError):
        s.accept(1)


def test_grammar_sampler_empty_piece_always_rejected():
    """A non-EOG token with an empty detokenized piece can never advance
    the grammar and is masked to -inf, even when the grammar itself could
    accept epsilon-ish continuations (llama.cpp apply semantics; the
    GrammarSampler docstring's contract)."""
    pieces = ["", "a", ""]                    # idx 0/2 empty, idx 1 real
    s = GrammarSampler('root ::= "a"*\n', pieces,
                       lambda lg: int(np.argmax(lg)), eog_tokens=[2])
    assert not s._viable(0)                   # empty non-EOG: rejected
    assert s._viable(1)
    assert s._viable(2)                       # EOG bypasses the piece check
    lg = np.array([9.0, 1.0, 0.0], np.float32)
    assert s(lg) == 1                         # top pick masked, resampled
    masked = s.mask(lg)
    assert masked[0] == -np.inf and np.isfinite(masked[1])
    s.reset()
    s.accept(0)


def test_grammar_no_admissible_token():
    s = GrammarSampler('root ::= "z"\n', ["a", "b"],
                       lambda lg: int(np.argmax(lg)))
    with pytest.raises(GbnfError):
        s(np.array([1.0, 2.0], np.float32))


def test_run_codebook_ar_with_grammar(tmp_path):
    """End-to-end: a GBNF on the cb0 sampler keeps every sampled cb0 code
    inside the grammar's "<0>".."<9>" set (reference: grammar attached to
    the backbone sampler, tts_runner.h:64-73)."""
    from codec_tpu.io.gguf import GGUFReader
    from codec_tpu.lm.audio_lm import AudioLM
    from codec_tpu.lm.tts_runner import run_codebook_ar

    import sys
    sys.path.insert(0, str(tmp_path))  # no-op; keeps imports explicit
    from test_lm_adaptors import phd_gguf  # noqa: F401
    import test_lm_adaptors as tla
    from test_audio_lm import StubBackbone

    # build the PHD fixture directly (fixtures aren't callable cross-module)
    path = tla.phd_gguf.__wrapped__(_TmpFactory(tmp_path))
    alm = AudioLM(GGUFReader(path[0]))
    pieces = [f"<{i}>" for i in range(50)]
    grammar = 'root ::= code*\ncode ::= "<" [0-9] ">"\n'
    res = run_codebook_ar(alm, StubBackbone(tla.H, seed=5),
                          [np.zeros(tla.H, np.float32)], max_steps=4,
                          decode=False, grammar=grammar,
                          token_pieces=pieces)
    assert res.codes.shape[0] >= 1
    assert (res.codes[:, 0] <= 9).all()      # cb0 constrained by grammar
    assert (res.codes[:, 1:] >= 0).all()     # other cbs unconstrained


def test_run_codebook_ar_grammar_without_pieces_raises(tmp_path):
    """grammar without token_pieces must fail loudly, not silently drop the
    constraint (the GrammarSampler branch needs both)."""
    from codec_tpu.io.gguf import GGUFReader
    from codec_tpu.lm.audio_lm import AudioLM
    from codec_tpu.lm.tts_runner import run_codebook_ar

    import test_lm_adaptors as tla
    from test_audio_lm import StubBackbone

    path = tla.phd_gguf.__wrapped__(_TmpFactory(tmp_path))
    alm = AudioLM(GGUFReader(path[0]))
    with pytest.raises(ValueError, match="token_pieces"):
        run_codebook_ar(alm, StubBackbone(tla.H, seed=5),
                        [np.zeros(tla.H, np.float32)], max_steps=2,
                        decode=False, grammar='root ::= [0-9]*\n')


class _TmpFactory:
    def __init__(self, base):
        self.base = base
        self.n = 0

    def mktemp(self, name):
        p = self.base / f"{name}{self.n}"
        self.n += 1
        p.mkdir(parents=True, exist_ok=True)
        return p
