"""Byte-level BPE tokenizer: no SQL oracle can express iterative merges,
so the gates live here — the classic Sennrich fixture with hand-computed
merges, driver-vs-distributed encode parity, EXACT round-trip decode
(no excluded inputs — the byte alphabet has no in-band marker),
token-count parity with the marker construction it replaced,
determinism, and persistence."""

from __future__ import annotations

import pytest

from mlvectordb_spark.functions.bpe import BPETokenizer

# the Sennrich et al. (2016) worked example
_CORPUS = (
    ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
)


@pytest.fixture(scope="module")
def corpus_df(spark):
    rows = [(i, w) for i, w in enumerate(_CORPUS)]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_sennrich_merges(spark, corpus_df):
    """First merges of the canonical example, hand-computed for the
    byte-level (marker-free) construction: (e,s) at freq 9, then (es,t)
    at 9, then the (l,o)/(o,w) tie at 7 broken lexicographically."""
    tok = BPETokenizer(vocab_size=30).fit(corpus_df, id_col="doc_id")
    assert tok.merges[0] == ("e", "s")
    assert tok.merges[1] == ("es", "t")
    assert tok.merges[2] == ("l", "o")


def test_encode_word_and_roundtrip(spark, corpus_df):
    tok = BPETokenizer(vocab_size=30).fit(corpus_df, id_col="doc_id")
    toks = tok.encode_word("newest")
    assert "".join(toks) == "newest"  # no in-band marker
    text = "the newest lowest thing"
    assert BPETokenizer.decode(tok.encode_text(text)) == text
    # whitespace shape survives exactly — not just normalized
    spaced = "  the\tnewest\n\nlowest "
    assert BPETokenizer.decode(tok.encode_text(spaced)) == spaced
    # the literal end-of-word marker of the OLD construction is just
    # bytes now (the r8 verdict's one caveat, removed)
    marked = "code with a literal </w> marker </w></w>"
    assert BPETokenizer.decode(tok.encode_text(marked)) == marked


def test_distributed_encode_matches_driver(spark, corpus_df):
    """The Arrow map pass must agree with the driver-side encoder token
    for token (same merges, same ranks, same regex)."""
    tok = BPETokenizer(vocab_size=30).fit(corpus_df, id_col="doc_id")
    rows = tok.encode(corpus_df, "text").orderBy("doc_id").collect()
    for r in rows:
        assert list(r.bpe_tokens) == tok.encode_text(r.text)
        assert r.n_bpe_tokens == len(r.bpe_tokens)


def test_count_tokens_fast_path(spark, corpus_df):
    tok = BPETokenizer(vocab_size=30).fit(corpus_df, id_col="doc_id")
    counted = tok.count_tokens(corpus_df, "text").orderBy("doc_id")
    assert "bpe_tokens" not in counted.columns
    full = tok.encode(corpus_df, "text").orderBy("doc_id").collect()
    for a, b in zip(counted.collect(), full):
        assert a.n_bpe_tokens == b.n_bpe_tokens


def test_fit_deterministic_and_bounded(spark, sf_dir):
    from mlvectordb_spark.sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents")
    a = BPETokenizer(vocab_size=200, sample_docs=100).fit(
        docs, id_col="doc_id"
    )
    b = BPETokenizer(vocab_size=200, sample_docs=100).fit(
        docs, id_col="doc_id"
    )
    assert a.merges == b.merges
    assert a._fitted_on <= 100
    # more vocab → fewer tokens on the same text (merges only ever join)
    small = BPETokenizer(vocab_size=60, sample_docs=100).fit(
        docs, id_col="doc_id"
    )
    sample_text = docs.select("text").head()[0]
    assert len(a.encode_text(sample_text)) <= len(small.encode_text(sample_text))


def test_token_count_parity_with_marker_construction(spark, sf_dir):
    """Rebasing on byte-level must not change what the OPERATORS consume
    — token counts — beyond the constructions' structural differences
    (the marker build spends a symbol per word on '</w>', the byte
    build on the attached leading space). A compact reimplementation of
    the replaced Sennrich-marker encoder anchors the comparison: total
    corpus counts within ±25% on the real documents table."""
    import re
    from collections import Counter

    from mlvectordb_spark.functions.bpe import _merge_word
    from mlvectordb_spark.sources.testdata import load_table

    eow = "</w>"
    word_re = re.compile(r"\S+")

    def legacy_fit(texts, vocab_size):
        freqs = Counter()
        for t in texts:
            freqs.update(word_re.findall(t.lower()))
        words = {tuple(w) + (eow,): c for w, c in freqs.items()}
        charset = {s for w in words for s in w}
        merges = []
        for _ in range(max(0, vocab_size - len(charset))):
            pairs = Counter()
            for w, c in words.items():
                for i in range(len(w) - 1):
                    pairs[(w[i], w[i + 1])] += c
            if not pairs:
                break
            best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            words = {
                _merge_word(w, best, best[0] + best[1]): c
                for w, c in words.items()
            }
            merges.append(best)
        return {p: i for i, p in enumerate(merges)}

    def legacy_count(text, ranks):
        n = 0
        for w in word_re.findall(text.lower()):
            syms = list(w) + [eow]
            while len(syms) > 1:
                cand = [
                    (ranks[(syms[i], syms[i + 1])], i)
                    for i in range(len(syms) - 1)
                    if (syms[i], syms[i + 1]) in ranks
                ]
                if not cand:
                    break
                _, i = min(cand)
                syms[i : i + 2] = [syms[i] + syms[i + 1]]
            n += len(syms)
        return n

    docs = load_table(spark, sf_dir, "documents")
    texts = [r.text for r in docs.select("text").limit(100).collect()]
    ranks = legacy_fit(texts, 300)
    old_total = sum(legacy_count(t, ranks) for t in texts)
    tok = BPETokenizer(vocab_size=300, sample_docs=100).fit(
        docs, id_col="doc_id"
    )
    new_total = sum(len(tok.encode_text(t)) for t in texts)
    assert old_total > 0
    assert 0.75 <= new_total / old_total <= 1.25, (new_total, old_total)


def test_save_load_roundtrip(tmp_path, spark, corpus_df):
    tok = BPETokenizer(vocab_size=30).fit(corpus_df, id_col="doc_id")
    p = str(tmp_path / "bpe.json")
    tok.save(p)
    back = BPETokenizer.load(p)
    assert back.merges == tok.merges
    assert back.encode_text("newest low") == tok.encode_text("newest low")


def test_load_rejects_marker_format(tmp_path):
    import json

    p = str(tmp_path / "old.json")
    with open(p, "w") as f:
        json.dump(
            {"vocab_size": 30, "lowercase": True, "sample_docs": 10,
             "fitted_on": 5, "merges": [["e", "s"]]},
            f,
        )
    with pytest.raises(ValueError, match="byte-level"):
        BPETokenizer.load(p)


def test_registry_entry_shape(spark, sf_dir):
    from mlvectordb_spark.queries import QUERIES

    out = QUERIES["doc_bpe_subword"](spark, sf_dir)
    rows = out.collect()
    assert rows
    assert set(out.columns) == {"source", "docs", "bpe_tokens", "ws_tokens"}
    for r in rows:
        # subword tokens can only exceed whitespace words
        assert r.bpe_tokens >= r.ws_tokens


def test_lone_surrogates_roundtrip_exactly():
    """Python str can carry lone surrogates (os.fsdecode artifacts,
    broken upstream decoders); encode must not crash and decode must be
    the exact inverse (surrogatepass both ways)."""
    from mlvectordb_spark.functions.bpe import BPETokenizer

    tok = BPETokenizer(vocab_size=300, lowercase=False)
    tok.merges = []
    for s in ("bad\ud800sur", "\udfff", "a😀b", "x \ud800 y"):
        assert BPETokenizer.decode(tok.encode_text(s)) == s
