"""CLIP byte-level BPE tokenizer (text-tower input path).

The reference app has no text path at all (its only model is torchvision
VGG16, ``/root/reference/static/models/vgg16.py:10-14``); this module exists
because the rebuild's CLIP family (BASELINE config 4) is completed with the
text tower + zero-shot similarity node, and that needs CLIP's tokenizer.

This is a fresh implementation of the standard byte-level BPE scheme used by
OpenAI CLIP: text is unicode-normalized, lower-cased, split by a regex into
word/number/punctuation pieces, each piece is mapped byte-by-byte through a
reversible byte->printable-unicode table, the final byte of each piece is
tagged with an end-of-word marker, and adjacent symbol pairs are greedily
merged in ranked order until no ranked pair remains.

The ranked merge table ships with real CLIP checkpoints
(``bpe_simple_vocab_16e6.txt.gz``). This image has no egress, so:

- ``load_merges(path)`` reads a real merges file (plain or gzip) when one is
  provided — with it, ids match the published vocabulary exactly;
- with no merges (the default), the tokenizer degenerates to pure byte-level
  encoding, which is the exact behavior of BPE when no merge rule applies.
  The vocabulary is then the deterministic 256+256+2 byte vocab. Random-init
  text towers (all we can have without egress) are indifferent to the id
  mapping; the ALGORITHM is what the tests pin (ranked-merge order, word-end
  tagging, byte fallback, special tokens).
"""

from __future__ import annotations

import functools
import gzip
import html
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np

SOT = "<|startoftext|>"
EOT = "<|endoftext|>"

# word/number/contraction splitter; \p{L}/\p{N} need the `regex` module
_PATTERN = (r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"
            r"|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+")


@functools.lru_cache(maxsize=1)
def bytes_to_unicode() -> Dict[int, str]:
    """Reversible byte -> printable unicode char table.

    Printable ASCII and the two Latin-1 printable ranges map to themselves;
    the remaining 68 byte values are displaced past U+0100 so every byte has
    a visible, non-whitespace stand-in (whitespace would collide with the
    regex splitter).
    """
    keep = (list(range(ord("!"), ord("~") + 1))
            + list(range(0xA1, 0xAD)) + list(range(0xAE, 0x100)))
    table = {b: chr(b) for b in keep}
    bump = 0
    for b in range(256):
        if b not in table:
            table[b] = chr(0x100 + bump)
            bump += 1
    return table


def _pairs(word: Sequence[str]) -> set:
    return {(word[i], word[i + 1]) for i in range(len(word) - 1)}


def load_merges(path: str, limit: Optional[int] = None) -> List[Tuple[str, str]]:
    """Read a ranked merges file (``a b`` per line; gzip or plain text).

    The published CLIP file has a version header line and trailing junk;
    mirror its slice [1 : 49152-256-2+1] (48894 merges after the header)
    when ``limit`` is None and the file carries the standard header, so
    vocab_size lands exactly at the published 49408.
    """
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt", encoding="utf-8") as f:
        lines = f.read().split("\n")
    if lines and (lines[0].startswith("#")
                  or lines[0].strip().count(" ") != 1):
        lines = lines[1:]  # version header
    stop = limit if limit is not None else 49152 - 256 - 2
    merges = []
    for ln in lines[:stop]:
        parts = ln.split()
        if len(parts) == 2:
            merges.append((parts[0], parts[1]))
    return merges


class ClipTokenizer:
    """Byte-level BPE with CLIP's vocabulary construction.

    vocab = byte symbols + byte symbols tagged ``</w>`` + one token per
    merge rule + the two specials, in that order — so with the real merges
    table the ids coincide with the published 49408-entry vocabulary.
    """

    def __init__(self, merges: Optional[Iterable[Tuple[str, str]]] = None):
        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        merges = list(merges or [])
        symbols = list(bytes_to_unicode().values())
        vocab = symbols + [s + "</w>" for s in symbols]
        vocab += ["".join(m) for m in merges]
        vocab += [SOT, EOT]
        self.encoder = {tok: i for i, tok in enumerate(vocab)}
        self.decoder = {i: tok for tok, i in self.encoder.items()}
        self.bpe_ranks = {pair: i for i, pair in enumerate(merges)}
        self.sot_id = self.encoder[SOT]
        self.eot_id = self.encoder[EOT]
        self._cache: Dict[str, List[str]] = {SOT: [SOT], EOT: [EOT]}
        import regex
        self._re = regex.compile(_PATTERN, regex.IGNORECASE)

    @property
    def vocab_size(self) -> int:
        return len(self.encoder)

    def _bpe(self, piece: str) -> List[str]:
        """Greedy ranked merging of one regex piece (already byte-mapped)."""
        if piece in self._cache:
            return self._cache[piece]
        word: Tuple[str, ...] = tuple(piece[:-1]) + (piece[-1] + "</w>",)
        while len(word) > 1:
            ranked = [(self.bpe_ranks[p], p) for p in _pairs(word)
                      if p in self.bpe_ranks]
            if not ranked:
                break
            _, (a, b) = min(ranked)
            merged: List[str] = []
            i = 0
            while i < len(word):
                if i < len(word) - 1 and word[i] == a and word[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(word[i])
                    i += 1
            word = tuple(merged)
        out = list(word)
        self._cache[piece] = out
        return out

    def _clean(self, text: str) -> str:
        # CLIP runs ftfy.fix_text + double html.unescape + whitespace
        # collapse + lowercase; ftfy is absent in this image, so fix_text
        # is gated (identity for well-formed input, which covers prompts)
        try:
            import ftfy  # noqa: F401

            text = ftfy.fix_text(text)
        except ImportError:
            pass
        text = html.unescape(html.unescape(text))
        return " ".join(text.split()).strip().lower()

    def encode(self, text: str) -> List[int]:
        ids: List[int] = []
        for piece in self._re.findall(self._clean(text)):
            if piece in (SOT, EOT):
                ids.append(self.encoder[piece])
                continue
            mapped = "".join(self.byte_encoder[b]
                             for b in piece.encode("utf-8"))
            ids.extend(self.encoder[tok] for tok in self._bpe(mapped))
        return ids

    def decode(self, ids: Iterable[int]) -> str:
        text = "".join(self.decoder[i] for i in ids
                       if i not in (self.sot_id, self.eot_id))
        raw = bytes(self.byte_decoder[c] for c in text)
        return (raw.decode("utf-8", errors="replace")
                .replace("</w>", " ").strip())

    def batch(self, prompts: Sequence[str], context_length: int = 77
              ) -> np.ndarray:
        """``[P, context_length]`` int32: sot + tokens + eot, zero-padded.

        Over-long prompts truncate with eot kept in the final slot (the
        standard CLIP ``truncate=True`` behavior) — the eot position is
        what the text tower pools, so it must survive truncation.
        """
        out = np.zeros((len(prompts), context_length), dtype=np.int32)
        for r, p in enumerate(prompts):
            ids = [self.sot_id] + self.encode(p) + [self.eot_id]
            if len(ids) > context_length:
                ids = ids[: context_length - 1] + [self.eot_id]
            out[r, : len(ids)] = ids
        return out


@functools.lru_cache(maxsize=1)
def default_tokenizer() -> ClipTokenizer:
    """Process-wide tokenizer; merges-free byte vocab (no egress)."""
    return ClipTokenizer()
