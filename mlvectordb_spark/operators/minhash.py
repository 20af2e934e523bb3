"""MinHash signature/band construction — one kernel, two consumers: the
batch near-dup query (`queries.q_dedup_minhash`, DuckDB-oracle-checked) and
ingest-time streaming dedup (`streaming/dedup.py`), which must hash
incoming documents IDENTICALLY to the corpus they are screened against.

Signature family: TWO md5s per shingle (256 bits) chopped into eight 32-bit
hex chunks — md5 bits are uniform, so the chunks act as 8 independent hash
functions at a quarter of the md5 cost of seeding each function separately.
Lexicographic min of fixed-width hex equals numeric min, and DuckDB mirrors
the exact construction for the oracle.

Physical shape: explode shingles to ROWS so md5/substring run inside
whole-stage codegen, then groupBy(id).agg(min c_i). The HOF form
(array_min∘transform per hash) is interpreted, and CollapseProject re-inlines
the shared md5 projection into every lambda — measured 4-5× slower. At
100 TB the partial (map-side) mins shrink the explode back to one row per
doc, and the band table carries only (id, band_idx, band_hash) — ~100
bytes/row regardless of document size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mlvectordb_spark.functions import text as TX

NUM_MINHASHES = 8
MINHASH_BANDS = 4
MINHASH_ROWS = 2
SHINGLE_K = 3


def shingle_table(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = SHINGLE_K,
) -> DataFrame:
    """(id, sh): distinct k-word shingle set per doc; docs too short to
    shingle are dropped (they cannot near-dup by this definition)."""
    return docs.select(
        F.col(id_col),
        F.array_distinct(TX.word_shingles(TX.tokens(text_col), k)).alias("sh"),
    ).filter(F.size("sh") > 0)


def bands_from_shingles(
    sh_df: DataFrame, id_col: str = "doc_id", sh_col: str = "sh"
) -> DataFrame:
    """(id, band_idx, band_hash): LSH band table from a shingle-set table.
    Two docs are near-dup CANDIDATES iff they share any (band_idx,
    band_hash) — the bands×rows split (4×2 over 8 minhashes) sets the
    similarity threshold of the collision curve."""
    hh = F.concat(
        F.md5(F.concat(F.lit("0:"), F.col("s"))),
        F.md5(F.concat(F.lit("1:"), F.col("s"))),
    )
    chunked = sh_df.select(F.col(id_col), F.explode(sh_col).alias("s")).select(
        id_col,
        *[
            F.substring(hh, i * 8 + 1, 8).alias(f"c{i}")
            for i in range(NUM_MINHASHES)
        ],
    )
    sig_row = chunked.groupBy(id_col).agg(
        *[F.min(f"c{i}").alias(f"m{i}") for i in range(NUM_MINHASHES)]
    )
    sig = F.array(*[F.col(f"m{i}") for i in range(NUM_MINHASHES)])
    band_arr = F.array(
        *[
            F.md5(
                F.concat_ws("|", F.slice(sig, b * MINHASH_ROWS + 1, MINHASH_ROWS))
            )
            for b in range(MINHASH_BANDS)
        ]
    )
    return sig_row.select(
        F.col(id_col), F.posexplode(band_arr).alias("band_idx", "band_hash")
    )
