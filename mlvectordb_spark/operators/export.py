"""Training-data export: deterministic global shuffle into sized shards.

A pretraining run wants (a) a uniform random permutation of the corpus
that is REPRODUCIBLE — the same salt replays the same order for a resumed
run, a new salt gives an independent permutation for the next epoch — and
(b) output files sized for the trainer's data loader (~256 MB), not
whatever partitioning the upstream pipeline happened to leave behind.

Spark-first shape: the permutation key is a salted md5 of the document key,
computed executor-side and engine-portable (the DuckDB oracle states the
identical expression — see `queries.py` `train_shuffle`). The shard is an
EXPLICIT column — pmod(wide-md5-bucket(key, salt), n) — so shard membership
is a pure function of (salt, key): one hash shuffle on the shard column +
`sortWithinPartitions` lays out the permutation, and the write enumerates
it shard by shard via `partitionBy("shard")`.

Why not `rand()`/`orderBy(rand(seed))`: rand is seeded per-partition-index,
so the permutation silently changes whenever the upstream partition layout
does — and a retried task re-rolls its rows, so a partial executor failure
during the write can duplicate/misplace rows across shards. A pure
key-hash permutation is idempotent under retries: the same row always
sorts to the same place. (Same argument as curation.py's hash sampling
vs sampleBy.)

Why not `repartitionByRange` on the hash key (the round-3 defect): range
boundaries come from a reservoir sample that depends on the INPUT PARTITION
LAYOUT, so the same salt over a re-partitioned (or retried, or
differently-compacted) input cut the shards at different points — shard
files were not reproducible even though the global order was. The explicit
pmod shard has no sampled state at all.

At 100 TB: the one hash shuffle is the unavoidable cost of a global
permutation (every permutation of n rows moves ~all bytes once). The wide
hash (8 nibbles, ~4.3e9 values) is uniform by construction, so shards are
balanced regardless of corpus skew — no salting needed — and the shard
count can exceed 256 (a 100 TB corpus at 256 MB/file wants ~400k shards,
which two-nibble hash_bucket could not index).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from mlvectordb_spark.operators.curation import hash_bucket, hash_bucket_wide


def shuffle_key(key: Column, salt: str) -> Column:
    """Salted md5 hex of the row key — the permutation order. Uniform on
    [0x00.., 0xff..], deterministic per (salt, key) on any engine."""
    return F.md5(F.concat(F.lit(salt), key.cast("string")))


def shard_of(key: Column, salt: str, n_shards: int) -> Column:
    """The shard a row belongs to: a pure function of (salt, key) — no
    sampled boundaries, no partition-layout dependence, idempotent under
    task retries. 8 md5 nibbles (~4.3e9 values) before the pmod, so shard
    counts far beyond 256 stay uniform."""
    return F.pmod(
        hash_bucket_wide(key, salt + "|shard:", nibbles=8), F.lit(int(n_shards))
    ).cast("int")


def global_shuffle(
    df: DataFrame,
    key_col: str,
    salt: str = "epoch0:",
    n_shards: int | None = None,
    keep_shard: bool = False,
) -> DataFrame:
    """Globally pseudorandom, reproducible row order: an explicit
    deterministic shard column (pmod of a wide salted hash), one hash
    shuffle on it, and a within-partition sort by (shard, hash, key).
    Ties (identical hashes can only come from identical keys) break on the
    key itself, keeping the order total and deterministic. With
    `keep_shard` the shard column is retained for a partitioned write."""
    n = n_shards or df.sparkSession.sparkContext.defaultParallelism
    k = shuffle_key(F.col(key_col), salt)
    out = (
        df.withColumn("__shuffle_key", k)
        .withColumn("shard", shard_of(F.col(key_col), salt, int(n)))
        .repartition(int(n), F.col("shard"))
        .sortWithinPartitions("shard", "__shuffle_key", key_col)
        .drop("__shuffle_key")
    )
    return out if keep_shard else out.drop("shard")


def pack_sequences(
    df: DataFrame,
    key_col: str,
    token_count_col: str,
    seq_len: int = 2048,
    n_shards: int = 8,
    salt: str = "pack:",
) -> DataFrame:
    """Greedy concat-and-chunk sequence packing: documents are laid out in
    a deterministic pseudorandom order and the token stream is cut every
    `seq_len` tokens — the standard pretraining batch-construction step
    (GPT-style packing). Returns the input keys with `shard`, `seq` (the
    sequence index the doc's first token lands in) and `seq_off` (offset of
    that token within the sequence); a doc whose tokens cross a boundary
    continues into the next sequence, so `seq`/`seq_off` fully determine
    the layout given the token counts.

    Scale shape: a GLOBAL token prefix-sum would be a single-reducer
    window, so packing is per-shard — docs hash into `n_shards`
    independent shards (uniform by construction) and the running sum is a
    window within each shard: n_shards-way parallel, one shuffle. Real
    loaders consume shard files independently, so per-shard sequence
    numbering is the layout they want. Same salt = same layout; a new
    salt repacks for the next epoch."""
    k = shuffle_key(F.col(key_col), salt)
    shard = F.pmod(hash_bucket(F.col(key_col), salt), F.lit(n_shards))
    w = Window.partitionBy("shard").orderBy("__k", key_col)
    start = F.sum(token_count_col).over(w) - F.col(token_count_col)
    return (
        df.withColumn("__k", k)
        .withColumn("shard", shard)
        .withColumn("__start", start)
        .select(
            key_col,
            "shard",
            token_count_col,
            F.floor(F.col("__start") / seq_len).cast("bigint").alias("seq"),
            F.pmod(F.col("__start"), F.lit(seq_len))
            .cast("bigint")
            .alias("seq_off"),
        )
    )


def estimate_shards(
    df: DataFrame,
    target_file_bytes: int = 256 << 20,
    parquet_ratio: float = 3.0,
    sample_rows: int = 2048,
) -> int:
    """Shard count from a bounded size probe: average in-memory bytes/row
    over a `sample_rows` head sample (Arrow transfer — one tiny job),
    scaled by the corpus row count and divided by the parquet compression
    ratio. The probe cost is constant no matter the corpus size; pass a
    measured `parquet_ratio` for your schema when file sizes must land
    close to target."""
    pdf = df.limit(sample_rows).toPandas()
    if len(pdf) == 0:
        return 1
    bytes_per_row = float(pdf.memory_usage(deep=True).sum()) / len(pdf)
    total = df.count() * bytes_per_row / parquet_ratio
    return max(1, math.ceil(total / target_file_bytes))


def export_shards(
    df: DataFrame,
    path: str,
    key_col: str,
    salt: str = "epoch0:",
    n_shards: int | None = None,
    target_file_bytes: int = 256 << 20,
    fmt: str = "parquet",
) -> int:
    """Write the shuffled corpus as `n_shards` shard directories
    (`shard=K/`, one sorted file each — every shard lives wholly in one
    task after the repartition, sized via estimate_shards when not given).
    A data loader enumerates shard dirs in order; re-running with the same
    salt reproduces every shard byte-for-byte regardless of how the input
    happened to be partitioned. `fmt` = "parquet" (columnar, the default)
    or "json" (JSONL shards — the format simple text-corpus loaders
    stream without a parquet reader; same layout, same determinism).
    Returns the shard count."""
    if fmt not in ("parquet", "json"):
        raise ValueError("fmt must be 'parquet' or 'json'")
    n = n_shards or estimate_shards(df, target_file_bytes)
    writer = (
        global_shuffle(df, key_col, salt, n, keep_shard=True)
        .write.mode("overwrite")
        .partitionBy("shard")
    )
    getattr(writer, fmt)(path)
    return n
