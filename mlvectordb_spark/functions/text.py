"""Text-analysis kernels for the LLM-data-pipeline layer.

All pure Catalyst column expressions (split / filter / transform /
aggregate over arrays) — no Python in the hot path, so a 100 TB documents
scan stays inside whole-stage codegen. Every kernel has an exactly
equivalent ANSI-SQL formulation (used by the DuckDB oracle in
__spark_entry__.py), which is why hashing is done via md5 hex strings
(identical across engines) rather than engine-specific hash functions.

Covers: tokenization, token counting, word shingles, char n-grams,
language-ID (stopword-marker heuristic), quality scoring, document
fingerprinting (md5 + min-shingle), minhash signatures (string-min over
seeded md5), and simhash (nibble-high-bit majority).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from mlvectordb_spark.functions.vector import ColumnOrName, _c

# Stopword-marker sets for the language-ID heuristic. Deliberately tiny and
# deterministic; the DuckDB oracle re-states exactly these lists.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "is", "of", "and"),
    "de": ("der", "die", "das", "und", "ist"),
    "es": ("el", "los", "que", "es", "una"),
    "fr": ("le", "les", "et", "est", "une"),
    "zh": ("de5", "shi4", "le5", "zai4", "he2"),  # pinyin-ish markers
}
# Fixed preference order for argmax ties (checked in this order).
LANG_ORDER: tuple[str, ...] = ("en", "de", "es", "fr", "zh")

STOPWORDS: tuple[str, ...] = tuple(
    sorted({w for ws in LANG_MARKERS.values() for w in ws})
)


def tokens(text: ColumnOrName) -> Column:
    """Whitespace tokenization (array<string>), dropping empty tokens.

    Single-space split (matching the oracle's string_split(text, ' ')) —
    measurably faster than a \\s+ regex split and equivalent on
    space-separated corpora."""
    return F.filter(F.split(_c(text), " "), lambda t: t != F.lit(""))


def token_count(text: ColumnOrName) -> Column:
    return F.size(tokens(text))


# GPT-2-pretokenizer-shaped segmentation: common English contraction tails,
# then space-prefixed letter runs, digit runs, and punctuation runs. No
# lookaround/backreferences, so Java regex (Spark) and RE2 (DuckDB) match
# identically — the engine-portable subset of the real BPE pre-tokenizer.
BPE_TOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"


def bpe_token_count(text: ColumnOrName) -> Column:
    """BPE-ish token count: segments text the way a GPT-style byte-pair
    pre-tokenizer does (contractions split off, letters/digits/punctuation
    in separate runs), which tracks real tokenizer budgets far better than
    whitespace counting on punctuation-heavy or number-heavy text. A true
    BPE vocab merge is model-specific; the pre-tokenizer segmentation is
    the model-free part and the standard cheap estimator."""
    return F.size(F.regexp_extract_all(_c(text), F.lit(BPE_TOKEN_RE), F.lit(0)))


def word_shingles(toks: ColumnOrName, k: int) -> Column:
    """k-word shingles joined by single spaces; empty array when len < k.

    Built as zip_with over k-1 shifted copies of the token array — linear
    work per row. (The obvious transform(sequence(...), i -> slice(toks,
    i, k)) form is interpreted per element and goes quadratic: higher-order
    functions don't enter codegen, and slice copies per shingle.) zip_with
    null-pads to the longer input, so the tail is trimmed with one final
    slice; short docs are special-cased to an empty array (NB: Spark's
    sequence(1, 0) DESCENDS — never build index ranges unguarded)."""
    t = _c(toks)
    if k == 1:
        return t
    n = F.size(t)
    sh = t
    for j in range(1, k):
        shifted = F.slice(t, j + 1, F.greatest(n - F.lit(j), F.lit(0)))
        sh = F.zip_with(sh, shifted, lambda a, b: F.concat(a, F.lit(" "), b))
    sh = F.slice(sh, 1, F.greatest(n - F.lit(k - 1), F.lit(0)))
    return F.when(n >= F.lit(k), sh).otherwise(F.array().cast("array<string>"))


def char_ngrams(text: ColumnOrName, n: int) -> Column:
    """Character n-grams of a string; empty array when len < n."""
    s = _c(text)
    ln = F.length(s)
    grams = F.transform(
        F.sequence(F.lit(1), ln - F.lit(n - 1)),
        lambda i: F.substring(s, i, n),  # type: ignore[arg-type]
    )
    return F.when(ln >= F.lit(n), grams).otherwise(F.array().cast("array<string>"))


def _marker_score(toks: Column, markers: tuple[str, ...]) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(*markers)))


def lang_id_expr(text: ColumnOrName) -> Column:
    """Deterministic stopword-marker language ID.

    Scores each language by marker-token count; argmax with the fixed
    LANG_ORDER preference; 'und' (undetermined) when no marker hits.
    The reference has no text surface at all — this belongs to the
    LLM-pipeline extension layer.
    """
    t = tokens(text)
    scores = {lang: _marker_score(t, LANG_MARKERS[lang]) for lang in LANG_ORDER}
    best = F.greatest(*scores.values())
    result = F.lit("und")
    # build reversed so earlier languages win ties
    for lang in reversed(LANG_ORDER):
        result = F.when(scores[lang] == best, F.lit(lang)).otherwise(result)
    return F.when(best > F.lit(0), result).otherwise(F.lit("und"))


def quality_score(text: ColumnOrName, decimals: int = 4) -> Column:
    """Composite document-quality score in [0, 1].

    0.4 · min(1, n_tokens/50)        (length credit)
    + 0.4 · distinct_tokens/n_tokens (lexical diversity)
    + 0.2 · (1 − stopword_ratio)     (content density)
    Rounded for oracle-stable hashing.
    """
    t = tokens(text)
    n = F.size(t).cast("double")
    distinct_ratio = F.size(F.array_distinct(t)).cast("double") / n
    stop_ratio = F.size(F.filter(t, lambda x: x.isin(*STOPWORDS))).cast("double") / n
    raw = (
        F.lit(0.4) * F.least(F.lit(1.0), n / F.lit(50.0))
        + F.lit(0.4) * distinct_ratio
        + F.lit(0.2) * (F.lit(1.0) - stop_ratio)
    )
    score = F.when(n > 0, raw).otherwise(F.lit(0.0))
    return F.round(score, decimals)


def doc_fingerprint(text: ColumnOrName) -> Column:
    """Exact content fingerprint: md5 hex (engine-portable)."""
    return F.md5(_c(text))


def min_shingle_fingerprint(text: ColumnOrName, k: int = 3) -> Column:
    """Near-dup-stable fingerprint: lexicographic min of md5(shingle).

    A 1-seed minhash; docs sharing any min shingle hash collide."""
    sh = word_shingles(tokens(text), k)
    hashed = F.transform(sh, lambda s: F.md5(s))
    return F.array_min(hashed)


def minhash_signature(text: ColumnOrName, num_hashes: int, k: int = 3) -> Column:
    """Minhash signature as array<string>: per seed i, min(md5(i || ':' || shingle)).

    String-min over seeded md5 keeps Spark and any SQL oracle bit-identical
    (no integer-hash portability problems). Empty-shingle docs get nulls.
    """
    sh = word_shingles(tokens(text), k)

    # NB: F.transform treats a 2-arg lambda as (element, index) — seed must
    # be captured via a closure factory, never a default arg.
    def seeded(i: int):
        return lambda s: F.md5(F.concat(F.lit(f"{i}:"), s))

    return F.array(
        *[F.array_min(F.transform(sh, seeded(i))) for i in range(num_hashes)]
    )


def minhash_bands(signature: ColumnOrName, bands: int, rows_per_band: int) -> Column:
    """LSH band keys: md5 of each contiguous signature slice (array<string>)."""
    sig = _c(signature)
    return F.array(
        *[
            F.md5(
                F.concat_ws("|", F.slice(sig, b * rows_per_band + 1, rows_per_band))
            )
            for b in range(bands)
        ]
    )


_HEX = "0123456789abcdef"


def _nibble_high_bit(h: Column, pos: int) -> Column:
    """High bit of hex nibble `pos` (1-based) of an md5 hex string → ±1."""
    nib_val = F.instr(F.lit(_HEX), F.substring(h, pos, 1)) - F.lit(1)
    return F.when(nib_val >= 8, F.lit(1)).otherwise(F.lit(-1))


def simhash16(text: ColumnOrName, k: int = 2) -> Column:
    """16-bit simhash over k-word shingles.

    Bit p = majority over shingles of the high bit of md5 nibble p.
    Small (16 bits) by design: bit arithmetic stays portable across
    engines; hamming distance = bit_count(xor) for near-dup clustering.
    """
    sh = word_shingles(tokens(text), k)

    def bit_of(p: int):
        # closure factory — a 2-arg lambda would receive the array index
        return lambda s: _nibble_high_bit(F.md5(s), p + 1)

    bit_terms = []
    for p in range(16):
        ssum = F.aggregate(
            F.transform(sh, bit_of(p)),
            F.lit(0),
            lambda acc, x: acc + x,
        )
        bit_terms.append(
            F.when(ssum > 0, F.lit(1 << p)).otherwise(F.lit(0))
        )
    total = bit_terms[0]
    for t in bit_terms[1:]:
        total = total + t
    return total
