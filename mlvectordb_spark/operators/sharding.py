"""D1/D2: the reference's declared-only distribution interfaces
(README:142-155 — ShardingManager / ReplicationManager Protocols with zero
implementation), realized with Spark's own distribution machinery.

On Spark these are *thin*: a shard is a hash partition, shard routing is a
column expression (`pmod(hash(id), n)`), and replication/reconciliation is
the storage layer's job (HDFS/S3 replication; compaction as reconcile).
The classes exist so a reference user finds the same surface; the
docstrings say what each maps to at cluster scale.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class ShardingManager:
    """D1 (README:150-155): deterministic shard routing.

    `shard_expr` is the distributed form — the same function Spark's
    HashPartitioner family plays during `repartition(n, col)`; rows land on
    their shard with no driver involvement. The scalar helpers mirror the
    declared per-item API (shard_for_id) for serving-layer routing.
    """

    def __init__(self, num_shards: int) -> None:
        if num_shards < 1:
            raise ValueError("num_shards must be >= 1")
        self.num_shards = num_shards

    def shard_expr(self, id_col: str = "id") -> Column:
        """Column expression: shard id ∈ [0, num_shards) for every row."""
        return F.pmod(F.xxhash64(F.col(id_col)), F.lit(self.num_shards)).cast("int")

    def shard_for_id(self, vector_id: str, namespace: str = "default") -> str:
        """Declared scalar routing (shard_for_id) — stable md5-based hash so
        driver-side routing agrees across processes and languages."""
        h = int.from_bytes(
            hashlib.md5(str(vector_id).encode()).digest()[:8], "big"
        )
        return f"shard-{h % self.num_shards}"

    def shard_for_id_expr(self, id_col: str = "id") -> Column:
        """The distributed form of `shard_for_id` — the SAME md5 routing
        as a column expression (first 8 digest bytes big-endian, i.e.
        the first 16 hex chars, mod num_shards), so serving-layer scalar
        routing and cluster-side bulk assignment agree row-for-row.
        Unlike `shard_expr`'s xxhash64 fast path this is cross-engine
        reproducible (md5 is md5 everywhere), which is what lets an
        external system — or a SQL oracle — recompute the routing
        table. All JVM-side built-ins (md5/conv), no UDF.

        Contract: ids are non-null strings or numerics (the shapes the
        scalar API sees). A NULL id yields a NULL shard here (no row
        should route nowhere silently — filter or default upstream),
        while `shard_for_id(None)` would hash the literal 'None';
        booleans also stringify differently ('true' vs 'True'). The
        row-for-row agreement test pins the supported shapes."""
        hex16 = F.substring(F.md5(F.col(id_col).cast("string")), 1, 16)
        h = F.conv(hex16, 16, 10).cast("decimal(20,0)")
        return F.pmod(h, F.lit(self.num_shards)).cast("int")

    def shard_for_vector(self, values, namespace: str = "default") -> str:
        """Declared shard_for_vector: route by content hash of the values."""
        payload = ",".join(repr(float(x)) for x in values).encode()
        h = int.from_bytes(hashlib.md5(payload).digest()[:8], "big")
        return f"shard-{h % self.num_shards}"

    def all_shards(self) -> list[str]:
        return [f"shard-{i}" for i in range(self.num_shards)]

    def assign(self, df: DataFrame, id_col: str = "id") -> DataFrame:
        """Attach shard_id and co-locate rows with their shard — the
        distributed materialization of the routing table (repartition by the
        shard expression ⇒ one shuffle, then every downstream stage is
        shard-local)."""
        with_shard = df.withColumn("shard_id", self.shard_expr(id_col))
        return with_shard.repartition(self.num_shards, F.col("shard_id"))


class ReplicationManager:
    """D2 (README:142-148): declared replicate_write/replicate_delete/
    reconcile/members.

    At cluster scale replication is delegated to the storage substrate
    (HDFS block replication / S3 durability / a transactional table
    format's log) — re-implementing it engine-side would fight the
    platform. This manager therefore implements the declared surface as
    N-path mirrored writes for environments without replicated storage,
    and reconcile() as a content diff between replicas.
    """

    def __init__(self, spark, replica_paths: list[str]) -> None:
        if not replica_paths:
            raise ValueError("at least one replica path required")
        self.spark = spark
        self.replica_paths = list(replica_paths)

    def members(self) -> list[str]:
        return list(self.replica_paths)

    def replicate_write(self, df: DataFrame) -> None:
        """Mirror an append to every replica (storage-substrate stand-in)."""
        for p in self.replica_paths:
            df.write.mode("append").parquet(p)

    def reconcile(self, key_col: str = "id") -> dict[str, int]:
        """Rows missing per replica vs the union of all replicas."""
        frames = [
            self.spark.read.parquet(p).select(key_col) for p in self.replica_paths
        ]
        union = frames[0]
        for f in frames[1:]:
            union = union.union(f)
        all_keys = union.distinct()
        return {
            p: all_keys.join(f, key_col, "left_anti").count()
            for p, f in zip(self.replica_paths, frames)
        }
