"""BPE tokenizer: no SQL oracle can express iterative merges, so the
gates live here — the classic Sennrich fixture with hand-computed
merges, driver-vs-distributed encode parity, round-trip decode,
determinism, and persistence."""

from __future__ import annotations

import pytest

from mlvectordb_spark.functions.bpe import _EOW, BPETokenizer

# the Sennrich et al. (2016) worked example
_CORPUS = (
    ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
)


@pytest.fixture(scope="module")
def corpus_df(spark):
    rows = [(i, w) for i, w in enumerate(_CORPUS)]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_sennrich_merges(spark, corpus_df):
    """First merges of the canonical example: (e,s) at freq 9, then
    (es,t) at 9, then (est,</w>) at 9 — hand-computable."""
    tok = BPETokenizer(vocab_size=30).fit(corpus_df, id_col="doc_id")
    assert tok.merges[0] == ("e", "s")
    assert tok.merges[1] == ("es", "t")
    assert tok.merges[2] == ("est", _EOW)


def test_encode_word_and_roundtrip(spark, corpus_df):
    tok = BPETokenizer(vocab_size=30).fit(corpus_df, id_col="doc_id")
    toks = tok.encode_word("newest")
    assert toks[-1].endswith(_EOW)
    assert "".join(toks) == "newest" + _EOW
    text = "the newest lowest thing"
    assert BPETokenizer.decode(tok.encode_text(text)) == text


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


def test_save_load_roundtrip(tmp_path, spark, corpus_df):
    tok = BPETokenizer(vocab_size=30).fit(corpus_df, id_col="doc_id")
    p = str(tmp_path / "bpe.json")
    tok.save(p)
    back = BPETokenizer.load(p)
    assert back.merges == tok.merges
    assert back.encode_text("newest low") == tok.encode_text("newest low")


def test_registry_entry_shape(spark, sf_dir):
    from mlvectordb_spark.queries import QUERIES

    out = QUERIES["doc_bpe_subword"](spark, sf_dir)
    rows = out.collect()
    assert rows
    assert set(out.columns) == {"source", "docs", "bpe_tokens", "ws_tokens"}
    for r in rows:
        # subword tokens can only exceed whitespace words
        assert r.bpe_tokens >= r.ws_tokens
