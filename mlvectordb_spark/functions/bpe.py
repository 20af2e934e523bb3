"""Byte-pair-encoding tokenizer, Spark-first.

The curation layer's token counting (`functions/text.py`, `seq_pack`,
`mixture_budget`, `source_mixture_tokens`) runs on whitespace/regex
tokens — fine for relative budgets, but an LM training run bills in
SUBWORD tokens. This module adds a real BPE (Sennrich et al. 2016):

- **fit() is driver-side over a bounded deterministic sample** — the
  same scalability contract as the IVF centroid fit (`operators/
  ann.py:_fit_centroids`, the faiss recipe): tokenizer state is a few
  thousand merge rules (KB-scale, the class of object hnswlib keeps on
  one node), so training it on a 100 TB corpus's xxhash-selected sample
  costs one bounded collect, never a corpus scan. This is also how
  production tokenizers are actually made (GPT-2's BPE was fit on a
  sample, applied to everything).
- **encode is the distributed part**: one Arrow `mapInPandas` pass with
  the merge-rank dict in the task closure, a per-batch word cache (real
  corpora repeat words heavily — each distinct word pays the merge loop
  once per batch), and no shuffle. At 100 TB this is a narrow map
  stage, exactly like the assignment pass of the IVF build.

Known limitation (shared by every Sennrich-style marker BPE): the
end-of-word marker is IN-BAND, so a text containing the literal "</w>"
substring does not round-trip through decode() (byte-level BPE is the
standard fix; out of scope here — token COUNTS, the operators' use,
are unaffected).

No SQL oracle can express iterative BPE merges, so the registry entry
(`doc_bpe_subword`) is rows-only; correctness is gated by
tests/test_bpe.py instead: the classic Sennrich fixture with
hand-computed merges, driver-vs-distributed encode parity, round-trip
decode, and determinism.
"""

from __future__ import annotations

import json
import os
import re
from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_EOW = "</w>"
_WORD_RE = re.compile(r"\S+")


def _word_freqs(texts, lowercase: bool) -> Counter:
    freqs: Counter = Counter()
    for t in texts:
        if not t:
            continue
        if lowercase:
            t = t.lower()
        freqs.update(_WORD_RE.findall(t))
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


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges in rank order (the standard BPE encode): repeatedly
    merge the lowest-ranked adjacent pair until none applies."""
    syms = list(word) + [_EOW]
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
    """Sample-fit, Arrow-applied byte-pair encoder (module docstring)."""

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
        merge loop over the word-frequency dict. Ties break
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
        freqs = _word_freqs([r.t for r in rows], self.lowercase)
        words: dict[tuple[str, ...], int] = {
            tuple(w) + (_EOW,): c for w, c in freqs.items()
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
        return _encode_word(word, self.ranks())

    def encode_text(self, text: str) -> list[str]:
        ranks = self.ranks()
        if self.lowercase:
            text = text.lower()
        out: list[str] = []
        for w in _WORD_RE.findall(text):
            out.extend(_encode_word(w, ranks))
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
        like IVF centroids); a per-batch word cache pays the merge loop
        once per distinct word. Narrow stage: no join, no shuffle."""
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
                for w in _WORD_RE.findall(text):
                    toks = cache.get(w)
                    if toks is None:
                        toks = _encode_word(w, ranks)
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
        """Inverse of encode_text up to whitespace normalization."""
        return "".join(tokens).replace(_EOW, " ").strip()

    # ---------------------------------------------------------- persistence

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w", encoding="utf-8") as f:
            json.dump(
                {
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
        tok = cls(
            vocab_size=meta["vocab_size"],
            lowercase=meta["lowercase"],
            sample_docs=meta["sample_docs"],
        )
        tok.merges = [tuple(p) for p in meta["merges"]]
        tok._fitted_on = meta["fitted_on"]
        return tok
