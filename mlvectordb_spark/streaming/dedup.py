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
rewrites its own output instead of duplicating it.

Replay safety: foreachBatch replays the last batch whose checkpoint didn't
commit. If the prior attempt already wrote `bands_path/batch=<id>/`, the
replayed docs would collide with their OWN bands and the whole batch would
be silently rejected — so the index read EXCLUDES the current batch id
(the `batch` partition column discovered from the directory layout).

Index maintenance: one subdirectory per batch is an unbounded small-file
tree whose listing eventually dominates the screen. `compact_bands` folds
committed batch dirs into a single negative-id generation dir
(write-then-delete: a crash between the two leaves benign duplicate band
rows, which a left-semi screen ignores and the next compaction removes);
`start_dedup_ingest` invokes it every `compact_every` batches, always
excluding the in-flight batch so replay exclusion keeps working.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mlvectordb_spark.operators.minhash import bands_from_shingles, shingle_table


def _hadoop_fs(spark: SparkSession, path_str: str):
    """(FileSystem, Path) for any Hadoop-supported URI — local or object
    store; keeps compaction free of os.* so it works wherever Spark writes."""
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(path_str)
    return path.getFileSystem(spark._jsc.hadoopConfiguration()), path


def _list_batch_ids(spark: SparkSession, bands_path: str) -> list[int]:
    """Batch ids present as `batch=<id>/` subdirs (empty if no index yet)."""
    fs, root = _hadoop_fs(spark, bands_path)
    if not fs.exists(root):
        return []
    ids = []
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith("batch="):
            try:
                ids.append(int(name.split("=", 1)[1]))
            except ValueError:
                continue
    return ids


def read_bands_index(
    spark: SparkSession, bands_path: str, exclude_batch: int | None = None
) -> DataFrame | None:
    """The accumulated band index, or None if absent. `exclude_batch` drops
    that batch's own subdir — a replayed micro-batch must never be screened
    against bands a failed prior attempt of ITSELF wrote (it would collide
    with its own bands, reject everything, then overwrite both outputs with
    empty sets — silent loss of the batch)."""
    if not _list_batch_ids(spark, bands_path):
        return None
    idx = spark.read.parquet(bands_path)
    if exclude_batch is not None:
        # `batch` is the discovered partition column -> partition pruning,
        # the excluded subdir's files are never opened.
        idx = idx.filter(F.col("batch") != F.lit(exclude_batch))
    return idx.select("band_idx", "band_hash")


def _screen_bands(
    batch_df: DataFrame,
    bands_new: DataFrame,
    existing: DataFrame | None,
    id_col: str,
) -> tuple[DataFrame, DataFrame]:
    """Screening core on a prebuilt batch band table (caller controls its
    persistence): reject on index collision, then min-id per band in-batch."""
    if existing is not None:
        hit = (
            bands_new.join(existing, ["band_idx", "band_hash"], "left_semi")
            .select(id_col)
            .distinct()
        )
        clean = bands_new.join(hit, id_col, "left_anti")
    else:
        clean = bands_new
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


def screen(
    batch_df: DataFrame,
    existing: DataFrame | None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """One dedup screening pass against an (optional) existing band table:
    returns (survivors, survivor_bands). Pure DataFrame logic (no reads,
    writes, or caching) — shared by the streaming path, the oracle-checked
    batch twin (`queries.q_dedup_ingest_screen`), and tests."""
    bands_new = bands_from_shingles(
        shingle_table(batch_df, text_col, id_col), id_col
    )
    return _screen_bands(batch_df, bands_new, existing, id_col)


def screen_batch(
    batch_df: DataFrame,
    bands_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    exclude_batch: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """`screen` against the band index persisted at `bands_path` (absent on
    the first batch). Pass the in-flight batch id as `exclude_batch` when
    replay is possible (see `read_bands_index`)."""
    existing = read_bands_index(
        batch_df.sparkSession, bands_path, exclude_batch=exclude_batch
    )
    return screen(batch_df, existing, id_col, text_col)


def compact_bands(
    spark: SparkSession,
    bands_path: str,
    protect_batch: int | None = None,
    min_sources: int = 2,
    target_files: int = 8,
) -> int:
    """Fold committed `batch=<id>/` subdirs into one compacted generation
    dir `batch=-(protect_batch+1)` (ids only grow, so the generation id is
    fresh; negative ids never collide with real batches and are never the
    replay-excluded id). Write-then-delete ordering makes every crash
    window benign: target written but sources not yet deleted leaves
    duplicate band rows, which the left-semi screen is insensitive to and
    the NEXT compaction folds away. Returns the number of dirs folded.

    Same maintenance contract as `VectorStore.optimize`
    (`operators/store.py`) — bounded listing, bin-packed files — applied to
    the band index (reference analog: index rebuild,
    `implementations/index.py:66-79`)."""
    current = _list_batch_ids(spark, bands_path)
    gen = -((protect_batch if protect_batch is not None else max(current, default=0)) + 1)
    fold = [i for i in current if i != protect_batch and i != gen]
    if len(fold) < min_sources:
        return 0
    folded = (
        spark.read.parquet(bands_path)
        .filter(F.col("batch").isin(fold))
        .drop("batch")
        .coalesce(target_files)
    )
    folded.write.mode("overwrite").parquet(f"{bands_path}/batch={gen}")
    fs, _ = _hadoop_fs(spark, bands_path)
    jvm = spark._jvm
    for i in fold:
        fs.delete(jvm.org.apache.hadoop.fs.Path(f"{bands_path}/batch={i}"), True)
    return len(fold)


def screen_and_write(
    batch_df: DataFrame,
    batch_id: int,
    bands_path: str,
    out_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    compact_every: int = 16,
) -> None:
    """One micro-batch of the accumulating-index dedup: maintenance
    (periodic band compaction), screen against the index EXCLUDING the
    in-flight batch id (replay safety), then the two per-batch-subdir
    overwrites. Shared by `start_dedup_ingest` and the curated-ingest
    composition (`streaming/curated.py`)."""
    spark = batch_df.sparkSession
    if compact_every and batch_id > 0 and batch_id % compact_every == 0:
        compact_bands(spark, bands_path, protect_batch=batch_id)
    # One band table feeds two writes -> cache for the batch, always
    # release (a long-running stream must not accumulate executor blocks).
    bands_new = bands_from_shingles(
        shingle_table(batch_df, text_col, id_col), id_col
    ).cache()
    try:
        existing = read_bands_index(spark, bands_path, exclude_batch=batch_id)
        survivors, survivor_bands = _screen_bands(
            batch_df, bands_new, existing, id_col
        )
        survivors.write.mode("overwrite").parquet(
            f"{out_path}/batch={batch_id}"
        )
        survivor_bands.write.mode("overwrite").parquet(
            f"{bands_path}/batch={batch_id}"
        )
    finally:
        bands_new.unpersist()


def start_dedup_ingest(
    stream: DataFrame,
    bands_path: str,
    out_path: str,
    checkpoint_dir: str,
    query_name: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    compact_every: int = 16,
):
    """Attach a document stream to the accumulating dedup index. Survivors
    land under `out_path/batch=<id>/`, their bands under
    `bands_path/batch=<id>/`; both are overwritten on batch replay and the
    index read excludes the in-flight batch, so replay is idempotent even
    after a crash between the bands write and the checkpoint commit. Docs
    too short to shingle are dropped (they carry no near-dup signal and
    would bypass screening). Every `compact_every` batches the band index
    is folded (`compact_bands`). Returns the StreamingQuery."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        screen_and_write(
            batch_df, batch_id, bands_path, out_path,
            id_col=id_col, text_col=text_col, compact_every=compact_every,
        )

    return (
        stream.writeStream.foreachBatch(write_batch)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
