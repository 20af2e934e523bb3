"""Byte-level byte-pair-encoding tokenizer, Spark-first.

The curation layer's token counting (`functions/text.py`, `seq_pack`,
`mixture_budget`, `source_mixture_tokens`) runs on whitespace/regex
tokens — fine for relative budgets, but an LM training run bills in
SUBWORD tokens. This module adds a real BPE (Sennrich et al. 2016),
built BYTE-LEVEL the way GPT-2's tokenizer is (Radford et al. 2019):

- **Byte alphabet, no in-band marker.** Text pre-tokenizes into
  whitespace-carrying chunks (`\\s*\\S+|\\s+` — every character of the
  input belongs to exactly one chunk, so concatenating tokens
  reconstructs the text EXACTLY); each chunk's UTF-8 bytes map through
  the GPT-2 byte↔unicode table into visible stand-in characters that
  the merge loop operates on. Because the alphabet is the 256 bytes,
  decode round-trips ARBITRARY text — including a literal "</w>",
  the in-band-marker failure the previous Sennrich-style build
  documented as its one caveat (r8 verdict #3).
- **fit() is driver-side over a bounded deterministic sample** — the
  same scalability contract as the IVF centroid fit (`operators/
  ann.py:_fit_centroids`, the faiss recipe): tokenizer state is a few
  thousand merge rules (KB-scale, the class of object hnswlib keeps on
  one node), so training it on a 100 TB corpus's xxhash-selected sample
  costs one bounded collect, never a corpus scan. This is also how
  production tokenizers are actually made (GPT-2's BPE was fit on a
  sample, applied to everything).
- **encode is the distributed part**: one Arrow `mapInPandas` pass with
  the merge-rank dict in the task closure, a per-batch chunk cache
  (real corpora repeat words heavily — each distinct chunk pays the
  merge loop once per batch), and no shuffle. At 100 TB this is a
  narrow map stage, exactly like the assignment pass of the IVF build.

`lowercase=True` (the default — token BUDGETS, the operators' use,
conventionally case-fold) makes decode∘encode return the LOWERCASED
text; with `lowercase=False` the round-trip is the exact identity on
any unicode string (fuzzed in tests/test_properties.py with no
excluded inputs).

No SQL oracle can express iterative BPE merges, so the registry entry
(`doc_bpe_subword`) is rows-only; correctness is gated by
tests/test_bpe.py instead: the classic Sennrich fixture with
hand-computed merges, driver-vs-distributed encode parity, exact
round-trip decode, token-count parity with the marker construction,
and determinism.
"""

from __future__ import annotations

import json
import os
import re
from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# every character of any text belongs to exactly one chunk, so the
# concatenation of chunks IS the text (the exact-round-trip invariant);
# a word carries its leading whitespace (the GPT-2 " word" idea), a
# trailing whitespace run forms its own chunk
_PRETOK_RE = re.compile(r"\s*\S+|\s+")


def _bytes_to_unicode() -> dict[int, str]:
    """GPT-2's byte↔unicode table (the public construction from the
    gpt-2 encoder): printable single-byte ranges map to themselves,
    every other byte shifts into 256+n — so each of the 256 bytes is a
    distinct, visible, non-whitespace character and merge symbols
    concatenate without collisions or in-band markers."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, (chr(c) for c in cs)))


_BYTE_TO_CHAR = _bytes_to_unicode()
_CHAR_TO_BYTE = {c: b for b, c in _BYTE_TO_CHAR.items()}


def _to_chars(chunk: str) -> str:
    """UTF-8 bytes of a pre-token chunk, as byte-stand-in characters.
    surrogatepass: Python str can carry lone surrogates (e.g. from
    os.fsdecode or broken upstream decoders) — strict utf-8 would crash
    encode_text on them, and a tokenizer must accept any str."""
    return "".join(
        _BYTE_TO_CHAR[b]
        for b in chunk.encode("utf-8", errors="surrogatepass")
    )


def _chunk_freqs(texts, lowercase: bool) -> Counter:
    freqs: Counter = Counter()
    for t in texts:
        if not t:
            continue
        if lowercase:
            t = t.lower()
        freqs.update(_PRETOK_RE.findall(t))
    return freqs


def _merge_word(
    word: tuple[str, ...], pair: tuple[str, str], joined: str
) -> tuple[str, ...]:
    out = []
    i = 0
    while i < len(word):
        if (
            i + 1 < len(word)
            and word[i] == pair[0]
            and word[i + 1] == pair[1]
        ):
            out.append(joined)
            i += 2
        else:
            out.append(word[i])
            i += 1
    return tuple(out)


def _encode_chars(chars: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges in rank order (the standard BPE encode): repeatedly
    merge the lowest-ranked adjacent pair until none applies. Operates
    on byte-stand-in characters; returns merge-space token strings."""
    syms = list(chars)
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_i = i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


class BPETokenizer:
    """Sample-fit, Arrow-applied byte-level BPE (module docstring)."""

    def __init__(
        self,
        vocab_size: int = 512,
        lowercase: bool = True,
        sample_docs: int = 2_000,
    ) -> None:
        self.vocab_size = vocab_size
        self.lowercase = lowercase
        self.sample_docs = sample_docs
        self.merges: list[tuple[str, str]] = []
        self._fitted_on = 0

    # ------------------------------------------------------------------ fit

    def fit(
        self, df: DataFrame, text_col: str = "text", id_col: str | None = None
    ) -> "BPETokenizer":
        """Learn merges from a bounded deterministic sample: xxhash-ordered
        `sample_docs` rows collect to the driver (one bounded job — at
        100 TB still `sample_docs` rows), then the classic greedy pair-
        merge loop over the chunk-frequency dict. Ties break
        lexicographically so the fit is reproducible across runs and
        engines."""
        order = (
            F.xxhash64(F.col(id_col).cast("string"))
            if id_col is not None
            else F.xxhash64(F.col(text_col))
        )
        rows = (
            df.select(F.col(text_col).alias("t"), order.alias("__o"))
            .orderBy("__o", "t")
            .limit(self.sample_docs)
            .collect()
        )
        freqs = _chunk_freqs([r.t for r in rows], self.lowercase)
        words: dict[tuple[str, ...], int] = {
            tuple(_to_chars(w)): c for w, c in freqs.items()
        }
        charset = {s for w in words for s in w}
        self.merges = []
        budget = max(0, self.vocab_size - len(charset))
        for _ in range(budget):
            pairs: Counter = Counter()
            for w, c in words.items():
                for i in range(len(w) - 1):
                    pairs[(w[i], w[i + 1])] += c
            if not pairs:
                break
            # deterministic: max count, then lexicographically smallest
            best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            joined = best[0] + best[1]
            words = {
                _merge_word(w, best, joined): c for w, c in words.items()
            }
            self.merges.append(best)
        self._fitted_on = len(rows)
        return self

    def ranks(self) -> dict[tuple[str, str], int]:
        return {p: i for i, p in enumerate(self.merges)}

    # --------------------------------------------------------------- encode

    def encode_word(self, word: str) -> list[str]:
        if self.lowercase:
            word = word.lower()
        return _encode_chars(_to_chars(word), self.ranks())

    def encode_text(self, text: str) -> list[str]:
        ranks = self.ranks()
        if self.lowercase:
            text = text.lower()
        out: list[str] = []
        for w in _PRETOK_RE.findall(text):
            out.extend(_encode_chars(_to_chars(w), ranks))
        return out

    def _encode_schema(self, df: DataFrame, counts_only: bool):
        extra = (
            [T.StructField("n_bpe_tokens", T.IntegerType())]
            if counts_only
            else [
                T.StructField(
                    "bpe_tokens", T.ArrayType(T.StringType())
                ),
                T.StructField("n_bpe_tokens", T.IntegerType()),
            ]
        )
        return T.StructType(list(df.schema.fields) + extra)

    def _encode_df(
        self, df: DataFrame, text_col: str, counts_only: bool
    ) -> DataFrame:
        """ONE Arrow map pass; merge ranks ride the task closure (KB-scale,
        like IVF centroids); a per-batch chunk cache pays the merge loop
        once per distinct chunk. Narrow stage: no join, no shuffle."""
        ranks = self.ranks()
        lower = self.lowercase
        schema = self._encode_schema(df, counts_only)

        def encode_batches(batches):
            cache: dict[str, list[str]] = {}

            def enc(text):
                if text is None:
                    return []
                if lower:
                    text = text.lower()
                out: list[str] = []
                for w in _PRETOK_RE.findall(text):
                    toks = cache.get(w)
                    if toks is None:
                        toks = _encode_chars(_to_chars(w), ranks)
                        cache[w] = toks
                    out.extend(toks)
                return out

            for pdf in batches:
                toks = [enc(t) for t in pdf[text_col]]
                if not counts_only:
                    pdf["bpe_tokens"] = toks
                pdf["n_bpe_tokens"] = [len(t) for t in toks]
                yield pdf

        return df.mapInPandas(encode_batches, schema=schema)

    def encode(self, df: DataFrame, text_col: str = "text") -> DataFrame:
        """All columns + `bpe_tokens` (array<string>) + `n_bpe_tokens`."""
        return self._encode_df(df, text_col, counts_only=False)

    def count_tokens(self, df: DataFrame, text_col: str = "text") -> DataFrame:
        """All columns + `n_bpe_tokens` only — the token-budget fast path
        (no token arrays cross Arrow)."""
        return self._encode_df(df, text_col, counts_only=True)

    @staticmethod
    def decode(tokens: list[str]) -> str:
        """EXACT inverse of encode_text (modulo the constructor's
        lowercasing): tokens concatenate back to the byte-stand-in
        stream, which maps 1:1 to the original UTF-8 bytes."""
        data = bytes(_CHAR_TO_BYTE[c] for c in "".join(tokens))
        try:
            # surrogatepass makes decode the exact inverse even for
            # strings carrying lone surrogates (encode uses it too)
            return data.decode("utf-8", errors="surrogatepass")
        except UnicodeDecodeError:
            # partial token lists can split a multi-byte sequence;
            # degrade per-character instead of raising
            return data.decode("utf-8", errors="replace")

    # ---------------------------------------------------------- persistence

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w", encoding="utf-8") as f:
            json.dump(
                {
                    "format": "byte-level",
                    "vocab_size": self.vocab_size,
                    "lowercase": self.lowercase,
                    "sample_docs": self.sample_docs,
                    "fitted_on": self._fitted_on,
                    "merges": [list(p) for p in self.merges],
                },
                f,
            )

    @classmethod
    def load(cls, path: str) -> "BPETokenizer":
        with open(path, encoding="utf-8") as f:
            meta = json.load(f)
        if meta.get("format") != "byte-level":
            raise ValueError(
                "unsupported tokenizer save format (expected 'byte-level'; "
                "marker-style saves from older builds must be refit)"
            )
        tok = cls(
            vocab_size=meta["vocab_size"],
            lowercase=meta["lowercase"],
            sample_docs=meta["sample_docs"],
        )
        tok.merges = [tuple(p) for p in meta["merges"]]
        tok._fitted_on = meta["fitted_on"]
        return tok
