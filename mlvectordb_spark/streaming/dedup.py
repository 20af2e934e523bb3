"""Ingest-time near-duplicate rejection — dedup as documents ARRIVE.

Batch near-dup (queries.q_dedup_minhash) answers "which existing docs
duplicate each other"; a production corpus also needs the streaming twin:
screen each incoming micro-batch against everything already accepted, so
the corpus never requires re-deduplication from scratch. This is the
standard accumulating-LSH-index design:

- the ACCEPTED corpus is represented ONLY by its band table
  (id, band_idx, band_hash — ~100 bytes × MINHASH_BANDS per doc, regardless
  of document size), persisted as parquet and grown per batch;
- an incoming doc is rejected iff any of its bands collides with the index
  (the LSH candidate rule — bands×rows sets the similarity threshold; a
  stricter pipeline would exact-verify jaccard against the colliding doc,
  trading a text lookup per candidate for precision);
- within a batch, the smallest id per colliding band survives (the same
  min-id-survivor convention as the batch dedup family).

Hashing is `operators/minhash.py` — the SAME kernel as the batch query, so
a doc rejected at ingest is exactly a doc the batch pipeline would have
flagged as a candidate.

Scale shape: per batch, work is |batch| shingle kernels + one semi-join of
|batch|×BANDS rows against the band index (AQE-sized — the batch side is
small, the index side grows with the corpus; at 100 TB the index join is a
shuffle on band_hash, never a broadcast of the index). Writes are
per-batch-subdirectory OVERWRITES (`batch=<id>/`), so a retried micro-batch
rewrites its own output instead of duplicating it — idempotent under the
checkpoint's batch-id replay, which is what foreachBatch actually
guarantees.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mlvectordb_spark.operators.minhash import bands_from_shingles, shingle_table


def screen(
    batch_df: DataFrame,
    existing: DataFrame | None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """One dedup screening pass against an (optional) existing band table:
    returns (survivors, survivor_bands). Pure DataFrame logic (no reads or
    writes) — shared by the streaming path, the oracle-checked batch twin
    (`queries.q_dedup_ingest_screen`), and tests."""
    bands_new = bands_from_shingles(
        shingle_table(batch_df, text_col, id_col), id_col
    ).cache()
    if existing is not None:
        hit = (
            bands_new.join(existing, ["band_idx", "band_hash"], "left_semi")
            .select(id_col)
            .distinct()
        )
        clean = bands_new.join(hit, id_col, "left_anti")
    else:
        clean = bands_new
    # in-batch collisions: min id per band survives
    keeper = clean.groupBy("band_idx", "band_hash").agg(
        F.min(id_col).alias("__keeper")
    )
    rejected = (
        clean.join(keeper, ["band_idx", "band_hash"])
        .filter(F.col(id_col) != F.col("__keeper"))
        .select(id_col)
        .distinct()
    )
    survivor_bands = clean.join(rejected, id_col, "left_anti")
    survivors = batch_df.join(
        survivor_bands.select(id_col).distinct(), id_col, "left_semi"
    )
    return survivors, survivor_bands


def screen_batch(
    batch_df: DataFrame,
    bands_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """`screen` against the band index persisted at `bands_path` (absent on
    the first batch)."""
    spark = batch_df.sparkSession
    try:
        existing = spark.read.parquet(bands_path).select("band_idx", "band_hash")
    except Exception:  # noqa: BLE001 — first batch: no index yet
        existing = None
    return screen(batch_df, existing, id_col, text_col)


def start_dedup_ingest(
    stream: DataFrame,
    bands_path: str,
    out_path: str,
    checkpoint_dir: str,
    query_name: str,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Attach a document stream to the accumulating dedup index. Survivors
    land under `out_path/batch=<id>/`, their bands under
    `bands_path/batch=<id>/`; both are overwritten on batch replay
    (idempotent). Docs too short to shingle are dropped (they carry no
    near-dup signal and would bypass screening). Returns the
    StreamingQuery."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        survivors, survivor_bands = screen_batch(
            batch_df, bands_path, id_col, text_col
        )
        survivors.write.mode("overwrite").parquet(f"{out_path}/batch={batch_id}")
        survivor_bands.write.mode("overwrite").parquet(
            f"{bands_path}/batch={batch_id}"
        )

    return (
        stream.writeStream.foreachBatch(write_batch)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
