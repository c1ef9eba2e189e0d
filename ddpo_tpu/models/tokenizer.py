"""CLIP tokenizer: HF tokenizer when vocab files exist locally, else a
deterministic fallback for random-weight testing and benchmarking.

The reference tokenizes with transformers' CLIPTokenizer to a fixed 77 tokens
(pipeline_flax_stable_diffusion.py:148-161). In this zero-egress environment
the BPE vocab may be unavailable, so ``get_tokenizer`` degrades to a
hash-based tokenizer with the same interface and shape contract — sufficient
for everything except matching real checkpoints' text conditioning.
"""

from __future__ import annotations

import hashlib
from typing import List, Sequence, Union

import numpy as np

MODEL_MAX_LENGTH = 77
VOCAB_SIZE = 49408
BOS_ID = 49406
EOS_ID = 49407


class HashTokenizer:
    """Deterministic word-hash tokenizer with the CLIP shape contract.

    ids = [BOS, hash(word_0), ..., EOS, EOS...] padded to 77. Same string
    always maps to the same ids (so per-prompt stat tracking and caching
    behave), distinct words rarely collide.
    """

    model_max_length = MODEL_MAX_LENGTH
    vocab_size = VOCAB_SIZE
    is_fallback = True

    def __call__(self, texts: Union[str, Sequence[str]], max_length: int | None = None):
        if isinstance(texts, str):
            texts = [texts]
        max_length = max_length or self.model_max_length
        ids = np.full((len(texts), max_length), EOS_ID, dtype=np.int32)
        ids[:, 0] = BOS_ID
        for row, text in enumerate(texts):
            words = text.lower().split()[: max_length - 2]
            for col, word in enumerate(words, start=1):
                digest = hashlib.md5(word.encode()).digest()
                ids[row, col] = int.from_bytes(digest[:4], "little") % (BOS_ID - 1) + 1
        return ids

    def decode(self, ids) -> str:
        raise NotImplementedError("fallback tokenizer is not invertible")


class HFTokenizer:
    """Thin wrapper over transformers CLIPTokenizer with the array interface."""

    is_fallback = False

    def __init__(self, tokenizer):
        self._tok = tokenizer
        self.model_max_length = tokenizer.model_max_length
        self.vocab_size = tokenizer.vocab_size

    def __call__(self, texts, max_length: int | None = None):
        if isinstance(texts, str):
            texts = [texts]
        out = self._tok(
            list(texts),
            padding="max_length",
            max_length=max_length or self.model_max_length,
            truncation=True,
            return_tensors="np",
        )
        return out.input_ids

    def decode(self, ids) -> List[str]:
        return self._tok.batch_decode(ids, skip_special_tokens=True)


def get_tokenizer(path: str | None = None):
    """HF CLIPTokenizer from a local path/cache if possible, else fallback."""
    if path is not None:
        try:
            from transformers import CLIPTokenizer

            return HFTokenizer(
                CLIPTokenizer.from_pretrained(path, local_files_only=True)
            )
        except Exception:
            pass
    return HashTokenizer()


def make_uncond_ids(tokenizer, batch_size: int) -> np.ndarray:
    """Token ids for the empty (unconditional) prompt, repeated batch_size x.

    Reference: ddpo/datasets/bucket.py:66-73.
    """
    return tokenizer([""] * batch_size)
