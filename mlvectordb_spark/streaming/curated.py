"""Curated streaming ingest — the composed corpus front door.

A production pretraining pipeline doesn't run quality filtering and
deduplication as separate offline sweeps over an already-landed corpus; it
gates documents as they ARRIVE. This module stacks the two screens the repo
already verifies independently into one exactly-once foreachBatch:

1. **Quality gate** (`operators/curation.gopher_rules` — the batch-twin
   oracle is `doc_gopher`): rule failures are not discarded but land under
   `reject_path/batch=<id>/` WITH their per-rule flags — the audit trail a
   data-quality review needs ("why was this doc dropped?").
2. **Near-dup screen** (`streaming/dedup.screen_and_write` — the batch twin
   is `dedup_ingest_screen`): survivors of the quality gate are screened
   against the accumulating LSH band index; only novel docs land under
   `out_path/batch=<id>/` and contribute bands.

Ordering matters at scale: the quality gate is a zero-shuffle per-row
filter, the dedup screen is a semi-join against a corpus-sized index —
running the cheap gate first shrinks the join input AND keeps junk
documents from ever claiming band buckets.

Replay safety is inherited: every write is a per-batch-subdir overwrite and
the band-index read excludes the in-flight batch id, so a crashed-and-
replayed batch reproduces byte-identical outputs instead of duplicating or
losing them.

Reference analog: none (the reference's only write path is row-at-a-time
REST inserts, `api/rest_api.py:96-161`); this is the LLM-pipeline extension
layer composed with Structured Streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mlvectordb_spark.operators.curation import gopher_rules
from mlvectordb_spark.streaming.dedup import screen_and_write


def quality_split(
    batch_df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """(passed, rejected_with_flags): the Gopher rule gate as a splitter.
    `rejected` carries every rule column so the reject store is
    self-explaining; `passed` carries the original document columns."""
    flags = gopher_rules(batch_df, text_col=text_col, id_col=id_col)
    passed_ids = flags.filter(F.col("passes_gopher")).select(id_col)
    passed = batch_df.join(passed_ids, id_col, "left_semi")
    rejected = flags.filter(~F.col("passes_gopher"))
    return passed, rejected


def start_curated_ingest(
    stream: DataFrame,
    bands_path: str,
    out_path: str,
    reject_path: str,
    checkpoint_dir: str,
    query_name: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    compact_every: int = 16,
):
    """Attach a document stream to the composed quality+dedup front door.
    Accepted docs land under `out_path/batch=<id>/`, quality rejects (with
    per-rule flags) under `reject_path/batch=<id>/`, surviving bands
    accumulate under `bands_path`. Returns the StreamingQuery."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        passed, rejected = quality_split(batch_df, id_col, text_col)
        rejected.write.mode("overwrite").parquet(
            f"{reject_path}/batch={batch_id}"
        )
        screen_and_write(
            passed, batch_id, bands_path, out_path,
            id_col=id_col, text_col=text_col, compact_every=compact_every,
        )

    return (
        stream.writeStream.foreachBatch(write_batch)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
