"""Byte-level BPE engine vs the HF `tokenizers` oracle (same test
pattern as tests/test_spm.py: train tiny tokenizers offline, compare
token ids exactly). Reference boundary being replaced: llama.cpp vocab
tokenization (reference common/tts_runner.cpp:1096-1113)."""

import json

import pytest

from codec_tpu.lm.bpe import GPT2_PATTERN, BpeByteLevel

LLAMA3_PATTERN = (r"(?i:'s|'t|'re|'ve|'m|'ll|'d)|[^\r\n\p{L}\p{N}]?\p{L}+"
                  r"|\p{N}{1,3}| ?[^\s\p{L}\p{N}]+[\r\n]*|\s*[\r\n]+"
                  r"|\s+(?!\S)|\s+")
QWEN2_PATTERN = (r"(?i:'s|'t|'re|'ve|'m|'ll|'d)|[^\r\n\p{L}\p{N}]?\p{L}+"
                 r"|\p{N}| ?[^\s\p{L}\p{N}]+[\r\n]*|\s*[\r\n]+"
                 r"|\s+(?!\S)|\s+")

CORPUS = [
    "Hello world! This is a test sentence for byte pair encoding. " * 4,
    "héllo wörld über naïve café 12345 67890\nnewlines\n\n  spaces   ",
    "the quick brown fox jumps over the lazy dog; Pack my box.",
    "don't can't we've I'll they'd it's 'quoted' (parens) [brackets]",
    "数字と日本語のテキスト mixed with English and 한국어",
]

TEXTS = [
    "Hello world!",
    "  leading spaces and   runs",
    "trailing spaces  ",
    "tabs\tand\nnewlines\r\n\r\nmixed",
    "don't stop me now, I'm having such a good time",
    "numbers 1 22 333 4444 55555 123456789",
    "unicode: héllo wörld — café naïve 東京 🦜 emoji",
    "punct!!! ??? ... ---- ### $100.50 (50%)",
    "",
    " ",
    "a",
    "CamelCaseAndSHOUTING lower_snake kebab-case",
]


def _train(pre, vocab_size=400, ignore_merges=False, specials=None):
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers
    from tokenizers import trainers

    tok = Tokenizer(models.BPE(unk_token=None, ignore_merges=ignore_merges))
    tok.pre_tokenizer = pre
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=vocab_size, special_tokens=list(specials or []),
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet())
    tok.train_from_iterator(CORPUS, trainer)
    return tok


@pytest.fixture(scope="module")
def gpt2_pair():
    """Bare ByteLevel(use_regex=True) — GPT-2/MOSS style."""
    from tokenizers import pre_tokenizers

    oracle = _train(pre_tokenizers.ByteLevel(add_prefix_space=False))
    ours = BpeByteLevel.from_hf_json(json.loads(oracle.to_str()))
    return oracle, ours


@pytest.fixture(scope="module")
def llama3_pair():
    """Sequence[Split(llama3 regex), ByteLevel(use_regex=False)] +
    ignore_merges + special tokens — the CSM backbone's shape."""
    from tokenizers import Regex, pre_tokenizers

    pre = pre_tokenizers.Sequence([
        pre_tokenizers.Split(Regex(LLAMA3_PATTERN), behavior="isolated",
                             invert=False),
        pre_tokenizers.ByteLevel(add_prefix_space=False, use_regex=False),
    ])
    oracle = _train(pre, ignore_merges=True,
                    specials=["<|begin_of_text|>", "<|eot_id|>"])
    ours = BpeByteLevel.from_hf_json(json.loads(oracle.to_str()))
    return oracle, ours


@pytest.fixture(scope="module")
def qwen2_pair():
    from tokenizers import Regex, pre_tokenizers

    pre = pre_tokenizers.Sequence([
        pre_tokenizers.Split(Regex(QWEN2_PATTERN), behavior="isolated",
                             invert=False),
        pre_tokenizers.ByteLevel(add_prefix_space=False, use_regex=False),
    ])
    oracle = _train(pre, specials=["<|im_start|>", "<|im_end|>",
                                   "<|endoftext|>"])
    ours = BpeByteLevel.from_hf_json(json.loads(oracle.to_str()))
    return oracle, ours


@pytest.mark.parametrize("pair_name", ["gpt2_pair", "llama3_pair",
                                       "qwen2_pair"])
@pytest.mark.parametrize("text", TEXTS)
def test_encode_matches_oracle(pair_name, text, request):
    oracle, ours = request.getfixturevalue(pair_name)
    expect = oracle.encode(text, add_special_tokens=False).ids
    got = ours.encode(text)
    assert got == expect, (text, got, expect)


@pytest.mark.parametrize("pair_name", ["llama3_pair", "qwen2_pair"])
def test_special_tokens_parse(pair_name, request):
    oracle, ours = request.getfixturevalue(pair_name)
    specials = sorted(ours.added, key=ours.added.get)
    text = f"{specials[0]}system text {specials[1]} more"
    expect = oracle.encode(text, add_special_tokens=True).ids
    got = ours.encode(text)
    assert got == expect
    assert ours.added[specials[0]] in got


@pytest.mark.parametrize("pair_name", ["gpt2_pair", "llama3_pair"])
@pytest.mark.parametrize("text", TEXTS)
def test_decode_roundtrip(pair_name, text, request):
    _, ours = request.getfixturevalue(pair_name)
    assert ours.decode(ours.encode(text)) == text


def test_zb64_roundtrip(llama3_pair):
    oracle, ours = llama3_pair
    blob = BpeByteLevel.json_to_zb64(oracle.to_str().encode())
    thawed = BpeByteLevel.from_zb64(blob)
    for text in TEXTS:
        assert thawed.encode(text) == ours.encode(text)


def test_ignore_merges_direct_vocab_hit(llama3_pair):
    """Llama-3 semantics: a pretoken already in the vocab bypasses the
    merge walk even when merges would split it differently."""
    _, ours = llama3_pair
    assert ours.ignore_merges
    # any multi-char vocab entry that is a full pretoken
    for tok, tid in ours.vocab.items():
        if len(tok) > 2 and tok.isalpha():
            assert ours._bpe(tok) == [tid]
            break


def test_non_bpe_json_rejected():
    with pytest.raises(ValueError, match="not a BPE"):
        BpeByteLevel.from_hf_json({"model": {"type": "Unigram"}})


def test_normalizer_rejected():
    with pytest.raises(ValueError, match="normalizer"):
        BpeByteLevel.from_hf_json(
            {"model": {"type": "BPE", "vocab": {}, "merges": []},
             "normalizer": {"type": "NFC"}})


def test_vocab_size(qwen2_pair):
    oracle, ours = qwen2_pair
    assert ours.vocab_size == oracle.get_vocab_size()
