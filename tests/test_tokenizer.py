"""First-party CLIP BPE tokenizer vs the transformers CLIPTokenizer oracle.

The environment is zero-egress so the real CLIP vocab is unavailable; instead
a synthetic-but-realistic vocab/merges fixture is built from a corpus (the
repo's prompt assets + punctuation/unicode edge cases) by running the actual
BPE training algorithm, then both tokenizers load the same data files and
must agree token-id-for-token-id. This validates the algorithm (regex word
split, byte->unicode map, merge order, special-token/padding/truncation
layout); with real vocab.json/merges.txt data the same code yields real CLIP
ids. Reference behavior: pipeline_flax_stable_diffusion.py:148-161.
"""

import collections
import json
import os

import numpy as np
import pytest

from ddpo_tpu.models.tokenizer import (
    CLIPBPETokenizer,
    HashTokenizer,
    get_tokenizer,
    make_uncond_ids,
)

ASSETS = os.path.join(os.path.dirname(__file__), "..", "assets")

CORPUS = [
    "a photo of a dog",
    "a cat riding a bicycle, watercolor",
    "LLaVA-style question: how many fingers?  3!",
    "the quick brown fox jumps over the lazy dog",
    "it's a dog's life; we're fine",
    "café naïve touché",  # accents (not stripped: strip_accents=False)
    "emoji 🦜 and CJK 猫 mixed",
    "trailing   whitespace\tand\nnewlines ",
    "hyphen-ated and under_scored tokens",
    "numbers 1234 and 5,678.90",
    "<|startoftext|> literal special <|endoftext|>",
    "",
]


def _load_asset_lines():
    lines = []
    for fname in ("common_animals.txt", "very_simple_animals.txt", "activities_v0.txt"):
        path = os.path.join(ASSETS, fname)
        if os.path.exists(path):
            with open(path) as f:
                lines += [line.strip() for line in f if line.strip()]
    return lines


def _train_bpe(corpus, num_merges=400):
    """Minimal BPE training: count words, repeatedly merge the most frequent
    adjacent pair. Produces (vocab, merges) in CLIP layout (</w> end marker,
    byte-alphabet base vocab, startoftext/endoftext specials)."""
    from ddpo_tpu.models.tokenizer import _basic_clean, _bytes_to_unicode, _word_pattern

    byte_enc = _bytes_to_unicode()
    words = collections.Counter()
    for text in corpus:
        for w in _word_pattern().findall(_basic_clean(text)):
            encoded = "".join(byte_enc[b] for b in w.encode("utf-8"))
            words[tuple(encoded[:-1]) + (encoded[-1] + "</w>",)] += 1

    merges = []
    for _ in range(num_merges):
        pairs = collections.Counter()
        for word, freq in words.items():
            for a, b in zip(word[:-1], word[1:]):
                pairs[(a, b)] += freq
        if not pairs:
            break
        (a, b), freq = pairs.most_common(1)[0]
        if freq < 2:
            break
        merges.append((a, b))
        new_words = collections.Counter()
        for word, wfreq in words.items():
            out, i = [], 0
            while i < len(word):
                if i < len(word) - 1 and word[i] == a and word[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            new_words[tuple(out)] += wfreq
        words = new_words

    alphabet = sorted(byte_enc.values())
    vocab_tokens = alphabet + [c + "</w>" for c in alphabet]
    vocab_tokens += [a + b for a, b in merges]
    vocab = {tok: i for i, tok in enumerate(dict.fromkeys(vocab_tokens))}
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    return vocab, merges


@pytest.fixture(scope="module")
def vocab_dir(tmp_path_factory):
    corpus = CORPUS + _load_asset_lines()
    vocab, merges = _train_bpe(corpus)
    d = tmp_path_factory.mktemp("clip_vocab")
    with open(d / "vocab.json", "w", encoding="utf-8") as f:
        json.dump(vocab, f, ensure_ascii=False)
    with open(d / "merges.txt", "w", encoding="utf-8") as f:
        f.write("#version: 0.2\n")
        f.writelines(f"{a} {b}\n" for a, b in merges)
    return str(d)


@pytest.fixture(scope="module")
def oracle(vocab_dir):
    from transformers import CLIPTokenizer

    return CLIPTokenizer.from_pretrained(vocab_dir, model_max_length=77)


def test_token_id_parity_with_transformers(vocab_dir, oracle):
    ours = CLIPBPETokenizer.from_dir(vocab_dir)
    ours.model_max_length = 77
    corpus = CORPUS + _load_asset_lines()
    theirs = oracle(
        corpus,
        padding="max_length",
        max_length=77,
        truncation=True,
        return_tensors="np",
    ).input_ids
    np.testing.assert_array_equal(ours(corpus), theirs)


def test_truncation_keeps_eos(vocab_dir, oracle):
    long_text = "a photo of a dog " * 100
    ours = CLIPBPETokenizer.from_dir(vocab_dir)
    ours.model_max_length = 77
    ids = ours([long_text])
    theirs = oracle(
        [long_text], padding="max_length", max_length=77, truncation=True,
        return_tensors="np",
    ).input_ids
    np.testing.assert_array_equal(ids, theirs)
    assert ids[0, 0] == ours.bos_id and ids[0, -1] == ours.eos_id


def test_decode_roundtrip(vocab_dir):
    tok = CLIPBPETokenizer.from_dir(vocab_dir)
    tok.model_max_length = 77
    texts = ["a photo of a dog", "the quick brown fox"]
    assert tok.decode(tok(texts)) == texts


def test_tokenizer_subdir_layout(vocab_dir, tmp_path):
    """SD checkpoint layout: vocab under <ckpt>/tokenizer/."""
    ckpt = tmp_path / "ckpt"
    (ckpt / "tokenizer").mkdir(parents=True)
    for f in ("vocab.json", "merges.txt"):
        (ckpt / "tokenizer" / f).write_bytes(
            (os.path.join(vocab_dir, f) and open(os.path.join(vocab_dir, f), "rb").read())
        )
    tok = get_tokenizer(str(ckpt))
    assert isinstance(tok, CLIPBPETokenizer)
    assert not tok.is_fallback


def test_fallback_when_no_vocab(tmp_path):
    tok = get_tokenizer(str(tmp_path))
    assert isinstance(tok, HashTokenizer)
    assert tok.is_fallback
    ids = make_uncond_ids(tok, 3)
    assert ids.shape == (3, 77)
