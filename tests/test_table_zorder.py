"""Z-ordered MergedTable layout: frozen cuts persisted in the meta,
within-file Morton clustering across CoW merges (operators/layout.py
keys inside streaming/merge_sink.py writes)."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from mlvectordb_spark.streaming.merge_sink import MergedTable, apply_merge_batch

SCHEMA = "id long, x double, y double, seq long"


def _rows(spark, n, seed_mult, seq):
    return spark.range(n).select(
        (F.col("id") + seed_mult * 1_000_000).alias("id"),
        ((F.col("id") * 37 % 101).cast("double")).alias("x"),
        ((F.col("id") * 53 % 97).cast("double")).alias("y"),
        F.lit(seq).cast("long").alias("seq"),
    )


def test_zorder_cuts_frozen_and_files_clustered(spark, tmp_path):
    t = MergedTable(
        spark, str(tmp_path / "t"), n_buckets=4, zorder_cols=["x", "y"]
    )
    apply_merge_batch(t, _rows(spark, 2000, 0, 1), 0, "id", "seq")
    cuts_after_v0 = dict(t.zorder_cuts)
    assert set(cuts_after_v0) == {"x", "y"} and all(
        len(v) > 0 for v in cuts_after_v0.values()
    )
    # a later merge reuses the FROZEN cuts (no re-derivation)
    apply_merge_batch(t, _rows(spark, 100, 1, 2), 1, "id", "seq")
    assert t.zorder_cuts == cuts_after_v0
    # reopen adopts the layout + cuts from the meta
    t2 = MergedTable(spark, str(tmp_path / "t"))
    assert t2.zorder_cols == ["x", "y"]
    assert t2.zorder_cuts == cuts_after_v0
    # every written file is sorted along the Morton key: recompute the
    # key per file with the persisted cuts and assert monotone order
    from mlvectordb_spark.operators.layout import zorder_key

    vdir = t._vdir(t.current_version())
    files = glob.glob(os.path.join(vdir, "**", "*.parquet"), recursive=True)
    assert files
    for f in files:
        df = spark.read.parquet(f)
        zs = [
            r[0]
            for r in df.select(
                zorder_key(df, ["x", "y"], cuts_after_v0)
            ).collect()
        ]
        assert zs == sorted(zs), f"file {f} not z-clustered"
    # table contents unaffected by the layout
    assert t.df().count() == 2100


def test_zorder_and_sort_cols_mutually_exclusive(spark, tmp_path):
    with pytest.raises(ValueError, match="mutually exclusive"):
        MergedTable(
            spark,
            str(tmp_path / "t"),
            sort_cols=["x"],
            zorder_cols=["x", "y"],
        )


def test_zorder_empty_bootstrap_defers_cuts(spark, tmp_path):
    t = MergedTable(spark, str(tmp_path / "t"), zorder_cols=["x", "y"])
    empty = spark.createDataFrame([], SCHEMA)
    t.write_version(empty, 0)
    assert t.zorder_cuts == {}  # nothing to freeze yet
    t.write_version(_rows(spark, 500, 0, 1), 1)
    assert set(t.zorder_cuts) == {"x", "y"}  # first data freezes them


def test_optimize_refreshes_cuts_and_preserves_content(spark, tmp_path):
    """optimize() re-packs the snapshot into a new version: z cuts are
    re-derived over the full data (drifted bins re-balance), content is
    byte-identical, the CDC diff across the boundary is empty, and the
    pre-optimize version stays time-travelable."""
    from mlvectordb_spark.streaming.merge_sink import table_changes

    t = MergedTable(
        spark, str(tmp_path / "t"), n_buckets=4, zorder_cols=["x", "y"]
    )
    apply_merge_batch(t, _rows(spark, 1000, 0, 1), 0, "id", "seq")
    cuts_v0 = dict(t.zorder_cuts)
    # a heavily skewed second batch drifts the value distribution far
    # from the frozen bins
    skew = spark.range(5000).select(
        (F.col("id") + 9_000_000).alias("id"),
        (F.col("id").cast("double") * 0.001 + 1000.0).alias("x"),
        (F.col("id").cast("double") * 0.001 + 2000.0).alias("y"),
        F.lit(2).cast("long").alias("seq"),
    )
    apply_merge_batch(t, skew, 1, "id", "seq")
    assert t.zorder_cuts == cuts_v0  # merges keep the frozen cuts
    before = {(r["id"], r["x"], r["y"]) for r in t.df().collect()}
    v = t.optimize()
    assert v == 2 and t.current_version() == 2
    assert t.zorder_cuts != cuts_v0  # re-derived over the full snapshot
    assert {(r["id"], r["x"], r["y"]) for r in t.df().collect()} == before
    # CDC across the boundary: no row changed
    assert table_changes(t, 1, 2, on="id").count() == 0
    # pre-optimize version still readable (until vacuumed)
    assert t.df_at(1).count() == 6000
    t.vacuum(retain_last=1)
    assert t.versions() == [2] and t.df().count() == 6000


def test_optimize_rejects_stale_target(spark, tmp_path):
    t = MergedTable(spark, str(tmp_path / "t"), n_buckets=2)
    with pytest.raises(ValueError, match="no published versions"):
        t.optimize()
    apply_merge_batch(t, _rows(spark, 10, 0, 1), 0, "id", "seq")
    with pytest.raises(ValueError, match="must exceed"):
        t.optimize(version=0)


def test_optimize_does_not_swallow_later_batches(spark, tmp_path):
    """The critical guard interaction: optimize() advances the version
    counter past the stream's batch ids, but batch idempotency rides the
    pointer's last_batch_id watermark — so the batch AFTER an optimize
    still applies (and a replay of an applied batch still skips)."""
    t = MergedTable(spark, str(tmp_path / "t"), n_buckets=4)
    apply_merge_batch(t, _rows(spark, 100, 0, 1), 0, "id", "seq")
    apply_merge_batch(t, _rows(spark, 10, 1, 2), 1, "id", "seq")
    assert (t.current_version(), t.last_batch_id()) == (1, 1)
    v = t.optimize()
    assert (v, t.last_batch_id()) == (2, 1)  # watermark carried, not consumed
    # next micro-batch (batch_id=2 == current version) MUST apply
    apply_merge_batch(t, _rows(spark, 5, 2, 3), 2, "id", "seq")
    assert (t.current_version(), t.last_batch_id()) == (3, 2)
    assert t.df().count() == 115
    # replay of the applied batch skips (idempotent)
    apply_merge_batch(t, _rows(spark, 5, 2, 3), 2, "id", "seq")
    assert (t.current_version(), t.last_batch_id()) == (3, 2)
    assert t.df().count() == 115


def test_optimize_preserves_composed_cdf_catchup(spark, tmp_path):
    """A recorded-feed consumer checkpointed BEFORE an optimize catches
    up across the boundary via composition — the optimize version carries
    an empty recording, so zero table bytes are diffed."""
    from mlvectordb_spark.streaming.merge_sink import table_changes

    t = MergedTable(spark, str(tmp_path / "t"), n_buckets=4)
    apply_merge_batch(
        t, _rows(spark, 50, 0, 1), 0, "id", "seq", record_changes=True
    )
    apply_merge_batch(
        t, _rows(spark, 5, 1, 2), 1, "id", "seq", record_changes=True
    )
    t.optimize()  # v2, empty recording
    apply_merge_batch(
        t, _rows(spark, 3, 2, 3), 2, "id", "seq", record_changes=True
    )  # publishes v3
    assert t.versions() == [0, 1, 2, 3]
    assert all(t.has_recorded_changes(v) for v in (1, 2, 3))
    feed = table_changes(t, 0, 3, on="id", preimage=True)
    # composed across the optimize: exactly the 8 inserted rows net
    got = {(r["id"], r["_change_type"]) for r in feed.collect()}
    assert len(got) == 8 and all(c == "insert" for _, c in got)


def test_crashed_optimize_orphan_recording_is_ignored(spark, tmp_path):
    """A legacy (pre-staging-protocol) crash left an orphan recording
    under version cur+1; after a record_changes=False merge publishes
    real changes under that version, table_changes must NOT serve the
    stale empty feed — the commit sidecar's recorded flag gates both the
    adjacent and composed recorded paths, so the orphan is ignored and
    the transition falls through to the snapshot diff. (The old
    behavior DELETED the orphan pre-merge, but under the staged
    protocol a dir at the final _cdir can also be a committed winner's
    activated feed, which a losing writer must never touch.)"""
    from mlvectordb_spark.streaming.merge_sink import table_changes

    t = MergedTable(spark, str(tmp_path / "t"), n_buckets=4)
    apply_merge_batch(t, _rows(spark, 50, 0, 1), 0, "id", "seq")
    # simulate the crashed optimize: empty recording at v1, no flip
    (
        t.df_at(0)
        .limit(0)
        .withColumn("_change_type", F.lit("insert"))
        .write.mode("overwrite")
        .parquet(t._cdir(1))
    )
    assert t.has_recorded_changes(1) and t.current_version() == 0
    apply_merge_batch(t, _rows(spark, 5, 1, 2), 1, "id", "seq")
    feed = table_changes(t, 0, 1, on="id")
    assert feed.count() == 5  # the real inserts, not the stale empty feed
