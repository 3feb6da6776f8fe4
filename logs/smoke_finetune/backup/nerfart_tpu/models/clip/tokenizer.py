"""CLIP BPE tokenizer.

Implements the standard byte-level BPE used by OpenAI CLIP: byte->unicode
mapping, lowercase + whitespace-collapse + basic-clean, regex word split,
merge ranks from `bpe_simple_vocab_16e6.txt.gz`, and `<|startoftext|> ...
<|endoftext|>` framing with zero-padding/truncation to 77 tokens.

The merges file ships with the `clip` pip package (not vendored here). If
it is not available, `SimpleTokenizer` falls back to a deterministic
hash-based tokenizer: stable token ids in the same vocab range, adequate
for exercising the text tower with random weights (offline testing), but
NOT compatible with pretrained CLIP weights — pass `bpe_path` for real use.
"""
import gzip
import hashlib
import html
import os
import re
from functools import lru_cache
from typing import List, Optional

import numpy as np


@lru_cache()
def bytes_to_unicode():
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("\xa1"), ord("\xac") + 1))
          + list(range(ord("\xae"), ord("\xff") + 1)))
    cs = bs[:]
    n = 0
    for b in range(2 ** 8):
        if b not in bs:
            bs.append(b)
            cs.append(2 ** 8 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def get_pairs(word):
    pairs = set()
    prev = word[0]
    for ch in word[1:]:
        pairs.add((prev, ch))
        prev = ch
    return pairs


def basic_clean(text: str) -> str:
    text = html.unescape(html.unescape(text))
    return text.strip()


def whitespace_clean(text: str) -> str:
    return re.sub(r"\s+", " ", text).strip()


class SimpleTokenizer:
    CONTEXT = 77
    SOT = 49406
    EOT = 49407

    def __init__(self, bpe_path: Optional[str] = None):
        self.byte_encoder = bytes_to_unicode()
        self.pat = re.compile(
            r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"""
            r"""|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+"""
            if False else
            r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"""
            r"""|[a-zA-Z]+|[0-9]|[^\sa-zA-Z0-9]+""", re.IGNORECASE)
        self.bpe_ranks = None
        self.encoder = None
        self.cache = {"<|startoftext|>": "<|startoftext|>",
                      "<|endoftext|>": "<|endoftext|>"}
        if bpe_path and os.path.exists(bpe_path):
            merges = gzip.open(bpe_path).read().decode("utf-8").split("\n")
            merges = merges[1:49152 - 256 - 2 + 1]
            merges = [tuple(m.split()) for m in merges]
            vocab = list(bytes_to_unicode().values())
            vocab = vocab + [v + "</w>" for v in vocab]
            for merge in merges:
                vocab.append("".join(merge))
            vocab.extend(["<|startoftext|>", "<|endoftext|>"])
            self.encoder = dict(zip(vocab, range(len(vocab))))
            self.bpe_ranks = dict(zip(merges, range(len(merges))))

    @property
    def is_real(self) -> bool:
        return self.encoder is not None

    def bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = get_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if (word[i] == first and i < len(word) - 1
                        and word[i + 1] == second):
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = get_pairs(word)
        out = " ".join(word)
        self.cache[token] = out
        return out

    def _encode_real(self, text: str) -> List[int]:
        bpe_tokens: List[int] = []
        text = whitespace_clean(basic_clean(text)).lower()
        for token in re.findall(self.pat, text):
            token = "".join(self.byte_encoder[b]
                            for b in token.encode("utf-8"))
            bpe_tokens.extend(self.encoder[t]
                              for t in self.bpe(token).split(" "))
        return bpe_tokens

    def _encode_hash(self, text: str) -> List[int]:
        """Deterministic fallback: one pseudo-token per word."""
        text = whitespace_clean(basic_clean(text)).lower()
        toks = []
        for w in re.findall(self.pat, text):
            h = int(hashlib.sha1(w.encode()).hexdigest(), 16)
            toks.append(1 + h % (self.SOT - 2))
        return toks

    def encode(self, text: str) -> List[int]:
        if self.is_real:
            return self._encode_real(text)
        return self._encode_hash(text)

    def tokenize(self, texts, context_length: int = CONTEXT) -> np.ndarray:
        """texts: str or list[str] -> int32 [B, context_length]."""
        if isinstance(texts, str):
            texts = [texts]
        result = np.zeros((len(texts), context_length), np.int32)
        for i, text in enumerate(texts):
            tokens = [self.SOT] + self.encode(text) + [self.EOT]
            if len(tokens) > context_length:
                tokens = tokens[:context_length]
                tokens[-1] = self.EOT
            result[i, :len(tokens)] = tokens
        return result


def default_bpe_path() -> Optional[str]:
    """Search common locations for the CLIP merges file."""
    candidates = [
        os.environ.get("CLIP_BPE_PATH", ""),
        os.path.join(os.path.dirname(__file__), "bpe_simple_vocab_16e6.txt.gz"),
        os.path.expanduser("~/.cache/clip/bpe_simple_vocab_16e6.txt.gz"),
    ]
    try:
        import clip as _clip  # type: ignore
        candidates.append(os.path.join(
            os.path.dirname(_clip.__file__), "bpe_simple_vocab_16e6.txt.gz"))
    except ImportError:
        pass
    for c in candidates:
        if c and os.path.exists(c):
            return c
    return None
