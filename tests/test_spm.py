"""SPM unigram tokenizer: protobuf parsing + Viterbi + byte fallback."""

import struct

import pytest

from codec_tpu.lm.spm import SpmUnigram, UNDERSCORE


def _piece(piece: str, score: float, ptype: int = 1) -> bytes:
    b = piece.encode("utf-8")
    out = bytes([0x0A, len(b)]) + b                     # field 1, wire 2
    out += bytes([0x15]) + struct.pack("<f", score)     # field 2, wire 5
    out += bytes([0x18, ptype])                         # field 3, varint
    return out


def _model(pieces) -> bytes:
    out = b""
    for p in pieces:
        body = _piece(*p)
        out += bytes([0x0A, len(body)]) + body          # ModelProto field 1
    return out


@pytest.fixture(scope="module")
def spm():
    pieces = [
        ("<unk>", 0.0, 2),
        ("<s>", 0.0, 3),
        ("</s>", 0.0, 3),
        (UNDERSCORE + "hello", -2.0, 1),
        (UNDERSCORE + "world", -2.5, 1),
        (UNDERSCORE, -3.0, 1),
        ("hell", -4.0, 1),
        ("o", -1.0, 1),
        ("he", -3.0, 1),
        ("llo", -3.0, 1),
    ] + [(f"<0x{i:02X}>", -20.0, 6) for i in range(256)]
    return SpmUnigram.from_proto(_model(pieces))


def test_parse(spm):
    assert spm.vocab_size == 10 + 256
    assert spm.byte0_id == 10
    assert spm.unk_id == 0


def test_viterbi_best_path(spm):
    # "hello world" → ▁hello(-2) ▁world(-2.5) beats ▁(-3)+he+llo etc.
    ids = spm.encode("hello world")
    assert ids == [3, 4]


def test_viterbi_segmentation(spm):
    # "hellohello": ▁hello(-2) then "hell"+"o"(-5) vs "he"+"llo"(-6) → hell+o
    ids = spm.encode("hellohello")
    assert ids[0] == 3
    assert ids[1:] == [6, 7]


def test_byte_fallback(spm):
    ids = spm.encode("hello Zx")
    # "Z" and "x" are unknown → byte pieces
    assert ids[0] == 3                      # ▁hello
    assert ids[1] == 5                      # bare ▁
    assert ids[2] == spm.byte0_id + ord("Z")
    assert ids[3] == spm.byte0_id + ord("x")


def test_utf8_multibyte_fallback(spm):
    ids = spm.encode("é")                  # 2-byte utf-8, unknown
    assert len(ids) == 3                   # ▁ + 2 byte pieces
    assert ids[0] == 5
    assert ids[1] == spm.byte0_id + 0xC3
    assert ids[2] == spm.byte0_id + 0xA9


def test_matches_hf_unigram_oracle():
    """Oracle: HF `tokenizers` Unigram (Rust reimplementation of the same
    SentencePiece Viterbi) on a randomized vocab must segment identically.
    Ties are avoided by giving every piece a distinct score."""
    import random

    from tokenizers import Tokenizer
    from tokenizers.models import Unigram

    rng = random.Random(1234)
    syll = ["he", "llo", "lo", "wor", "ld", "ab", "ba", "abc", "ca", "b",
            "a", "c", "hel", "l", "o", "w", "d", "r", "e", "h"]
    vocab = [("<unk>", 0.0, 2)]
    seen = {"<unk>"}
    for s in syll + [UNDERSCORE + s for s in syll] + [UNDERSCORE]:
        if s not in seen:
            seen.add(s)
            vocab.append((s, -round(rng.uniform(1.0, 8.0), 3), 1))

    ours = SpmUnigram.from_proto(_model(vocab))
    oracle = Tokenizer(Unigram([(p, s) for p, s, _ in vocab], unk_id=0,
                               byte_fallback=False))

    words = ["hello", "world", "abba", "cab", "held", "lore", "wallow",
             "abcabc", "hollow", "bald"]
    for _ in range(50):
        text = " ".join(rng.sample(words, rng.randint(1, 5)))
        norm = UNDERSCORE + text.replace(" ", UNDERSCORE)
        got = ours.encode(text)
        want = oracle.encode(norm, add_special_tokens=False).ids
        assert got == want, (text, got, want)
