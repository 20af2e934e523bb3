"""MergedTable optimistic concurrency: the staging-rename commit protocol
(streaming/merge_sink.py). Two interleaved writers -> exactly one wins,
the loser raises ConcurrentWriteError, no version-dir or staging leaks,
recorded feeds stay consistent, and crash-recovery replays are
idempotent. This is the atomicity story the reference lacks entirely
(src/mlvectordb/services/query_processor.py:16-19 writes storage and
index non-atomically) and the analog of Delta's commit conflict check."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mlvectordb_spark.streaming.merge_sink import (
    ConcurrentWriteError,
    MergedTable,
    apply_merge_batch,
    table_changes,
)


def _batch(spark, rows):
    return spark.createDataFrame(rows, "id long, val double, seq long")


def _staging_dirs(path: str) -> list[str]:
    return [n for n in os.listdir(path) if n.startswith(".staging_")]


def _bootstrap(spark, path, n_buckets=4, record_changes=False):
    t = MergedTable(spark, path, n_buckets=n_buckets)
    apply_merge_batch(
        t,
        _batch(spark, [(1, 10.0, 1), (2, 20.0, 1), (3, 30.0, 1)]),
        batch_id=1,
        on="id",
        order_col="seq",
        record_changes=record_changes,
    )
    return t


def test_second_writer_of_same_version_loses(spark, tmp_path):
    """Both writers allocate version 2 against base 1; the first rename
    wins, the second raises, the table is exactly the winner's, and the
    loser leaves no version dirs or staging debris behind."""
    path = str(tmp_path / "t")
    t1 = _bootstrap(spark, path)
    apply_merge_batch(
        t1, _batch(spark, [(2, 21.0, 2)]), batch_id=2, on="id",
        order_col="seq",
    )
    assert t1.current_version() == 2
    # writer B staged against the stale base (it "read" v1 before A
    # committed) and now tries to publish the same version number
    t2 = MergedTable(spark, path)
    with pytest.raises(ConcurrentWriteError):
        t2.write_version(
            _batch(spark, [(9, 99.0, 2)]).withColumn(
                "__bucket", F.lit(0)
            ),
            2,
            batch_id=99,
        )
    # winner's content intact
    got = {r["id"]: r["val"] for r in t1.df().collect()}
    assert got == {1: 10.0, 2: 21.0, 3: 30.0}
    assert t1._published() == (2, 2)
    assert t1.versions() == [1, 2]
    assert _staging_dirs(path) == []


def test_optimize_losing_to_merge_aborts_cleanly(spark, tmp_path):
    """optimize() reads base 1, records its empty (1->2) feed, then a
    merge commits v2 first: optimize must raise, clear its orphan
    recording (the merge did not record a feed), and leave the merge's
    version as the table."""
    path = str(tmp_path / "t")
    t1 = _bootstrap(spark, path)
    t2 = MergedTable(spark, path)

    orig = t2.write_version

    def delayed(df, version, **kw):
        # the interleave: the merge publishes v2 while optimize is
        # between its base read and its commit
        apply_merge_batch(
            t1, _batch(spark, [(2, 22.0, 2)]), batch_id=2, on="id",
            order_col="seq",
        )
        return orig(df, version, **kw)

    t2.write_version = delayed
    with pytest.raises(ConcurrentWriteError):
        t2.optimize()
    assert t1.current_version() == 2
    got = {r["id"]: r["val"] for r in t1.df().collect()}
    assert got == {1: 10.0, 2: 22.0, 3: 30.0}
    # optimize's empty recording for v2 must be gone: a recorded empty
    # feed for a version that actually changed rows would make every
    # incremental consumer silently skip the merge's changes
    assert not t1.has_recorded_changes(2)
    assert _staging_dirs(path) == []


def test_optimize_losing_to_recording_merge_keeps_winner_feed(
    spark, tmp_path
):
    """When the winning merge RECORDED its own feed at the contested
    version, the losing optimize's cleanup must leave it alone — the
    winner's parquet overwrite already replaced the orphan."""
    path = str(tmp_path / "t")
    t1 = _bootstrap(spark, path, record_changes=True)
    t2 = MergedTable(spark, path)

    orig = t2.write_version

    def delayed(df, version, **kw):
        apply_merge_batch(
            t1, _batch(spark, [(2, 23.0, 2)]), batch_id=2, on="id",
            order_col="seq", record_changes=True,
        )
        return orig(df, version, **kw)

    t2.write_version = delayed
    with pytest.raises(ConcurrentWriteError):
        t2.optimize()
    assert t1.current_version() == 2
    assert t1.has_recorded_changes(2)
    feed = table_changes(t1, 1, 2)
    ups = {
        r["id"]: r["val"]
        for r in feed.filter(F.col("_change_type") == "update").collect()
    }
    assert ups == {2: 23.0}


def test_replay_of_own_commit_is_idempotent(spark, tmp_path):
    """Crash between the commit rename and the pointer/checkpoint update:
    the replay finds its own batch id in the commit sidecar, repairs the
    pointer forward, and returns success instead of raising."""
    path = str(tmp_path / "t")
    t1 = _bootstrap(spark, path)
    apply_merge_batch(
        t1, _batch(spark, [(4, 40.0, 2)]), batch_id=2, on="id",
        order_col="seq",
    )
    assert t1._published() == (2, 2)
    # simulate the crash: roll the pointer back to v1 (the commit of v2
    # happened; the pointer update did not)
    t1._write_pointer(1, 1)
    assert t1._published() == (1, 1)
    # the foreachBatch replay recomputes version 2 for batch 2 and
    # re-applies — must succeed silently and repair the pointer
    apply_merge_batch(
        t1, _batch(spark, [(4, 40.0, 2)]), batch_id=2, on="id",
        order_col="seq",
    )
    assert t1._published() == (2, 2)
    got = {r["id"]: r["val"] for r in t1.df().collect()}
    assert got[4] == 40.0
    assert _staging_dirs(path) == []


def test_conflict_repairs_stale_pointer_forward(spark, tmp_path):
    """A DIFFERENT writer conflicting on a committed-but-unpointed
    version rolls the pointer forward (self-healing) before raising —
    the table can never wedge behind a crashed writer's missing pointer
    update."""
    path = str(tmp_path / "t")
    t1 = _bootstrap(spark, path)
    apply_merge_batch(
        t1, _batch(spark, [(5, 50.0, 2)]), batch_id=2, on="id",
        order_col="seq",
    )
    t1._write_pointer(1, 1)  # crashed before the pointer update
    t2 = MergedTable(spark, path)
    with pytest.raises(ConcurrentWriteError):
        t2.write_version(
            _batch(spark, [(6, 60.0, 9)]).withColumn("__bucket", F.lit(0)),
            2,
            batch_id=9,
        )
    assert t1._published() == (2, 2)


def test_sequential_writers_do_not_conflict(spark, tmp_path):
    """Writers that re-read the table between commits allocate distinct
    versions and all succeed — the check only fires on a genuine race."""
    path = str(tmp_path / "t")
    t1 = _bootstrap(spark, path)
    t2 = MergedTable(spark, path)
    apply_merge_batch(
        t1, _batch(spark, [(7, 70.0, 2)]), batch_id=2, on="id",
        order_col="seq",
    )
    apply_merge_batch(
        t2, _batch(spark, [(8, 80.0, 3)]), batch_id=3, on="id",
        order_col="seq",
    )
    v = t2.optimize()
    assert t1.versions() == [1, 2, 3, v]
    got = {r["id"]: r["val"] for r in t2.df().collect()}
    assert {7, 8} <= set(got)


def test_parallel_os_thread_writers_one_wins(spark, tmp_path):
    """TWO OS THREADS commit merges to the same table at the same time
    (Spark local mode supports concurrent driver-side job submission).
    A barrier holds both until each has its own handle; both then read
    base v1, stage v2 concurrently, and race the commit rename: exactly
    one ConcurrentWriteError, no version gaps, the winner's feed is the
    recorded one, and a re-read retry lands the loser's row at v3."""
    import threading

    path = str(tmp_path / "t")
    _bootstrap(spark, path, record_changes=True)

    barrier = threading.Barrier(2, timeout=60)
    outcome: dict[str, BaseException | None] = {}

    def writer(tag: str, row, batch_id: int) -> None:
        t = MergedTable(spark, path)
        barrier.wait()
        try:
            apply_merge_batch(
                t, _batch(spark, [row]), batch_id=batch_id, on="id",
                order_col="seq", record_changes=True,
            )
            outcome[tag] = None
        except BaseException as exc:  # noqa: BLE001 — recorded, asserted below
            outcome[tag] = exc

    rows = {"a": (100, 1.0, 2), "b": (200, 2.0, 2)}
    threads = [
        threading.Thread(target=writer, args=(tag, rows[tag], bid))
        for tag, bid in (("a", 2), ("b", 3))
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=300)
    assert not any(th.is_alive() for th in threads)

    losers = {t for t, e in outcome.items() if e is not None}
    assert len(losers) == 1, f"expected exactly one loser, got {outcome}"
    loser = losers.pop()
    assert isinstance(outcome[loser], ConcurrentWriteError)
    winner = ({"a", "b"} - {loser}).pop()

    t = MergedTable(spark, path)
    # gapless: bootstrap v1 + exactly one committed racer v2
    assert t.versions() == [1, 2]
    assert t._published()[0] == 2
    got = {r["id"] for r in t.df().collect()}
    assert rows[winner][0] in got and rows[loser][0] not in got
    assert _staging_dirs(path) == []
    # the recorded v2 feed describes the WINNER's insert only
    feed = table_changes(t, 1, 2)
    ins = {
        r["id"]
        for r in feed.filter(F.col("_change_type") == "insert").collect()
    }
    assert ins == {rows[winner][0]}

    # the loser retries against a fresh read and lands cleanly at v3
    apply_merge_batch(
        t, _batch(spark, [rows[loser]]), batch_id=4, on="id",
        order_col="seq", record_changes=True,
    )
    assert t.versions() == [1, 2, 3]
    got = {r["id"] for r in t.df().collect()}
    assert {rows["a"][0], rows["b"][0]} <= got


def test_replay_activates_feed_if_original_crashed_before_activation(
    spark, tmp_path
):
    """Crash window between the commit rename and the feed activation:
    the version dir exists but _changes/vN does not. The foreachBatch
    replay (same batch id) must re-activate its recomputed staged feed —
    and a replay when the ORIGINAL activation survived must keep the
    original feed and discard the duplicate staged dir."""
    import os

    path = str(tmp_path / "t")
    t = _bootstrap(spark, path, record_changes=True)
    apply_merge_batch(
        t, _batch(spark, [(4, 44.0, 2)]), batch_id=2, on="id",
        order_col="seq", record_changes=True,
    )
    assert t.has_recorded_changes(2)
    # simulate the crash: activation undone, pointer rolled back
    import shutil

    shutil.rmtree(t._cdir(2))
    t._write_pointer(1, 1)
    apply_merge_batch(
        t, _batch(spark, [(4, 44.0, 2)]), batch_id=2, on="id",
        order_col="seq", record_changes=True,
    )
    assert t._published() == (2, 2)
    assert t.has_recorded_changes(2)
    feed = table_changes(t, 1, 2)
    ins = {
        r["id"]
        for r in feed.filter(F.col("_change_type") == "insert").collect()
    }
    assert ins == {4}
    # replay with the original feed INTACT: duplicate staged dir removed
    t._write_pointer(1, 1)
    apply_merge_batch(
        t, _batch(spark, [(4, 44.0, 2)]), batch_id=2, on="id",
        order_col="seq", record_changes=True,
    )
    assert t._published() == (2, 2)
    changes_dir = os.path.join(path, "_changes")
    assert [n for n in os.listdir(changes_dir) if ".w-" in n] == []


def test_losing_merge_clears_its_orphan_recording(spark, tmp_path):
    """A record_changes merge that loses the race to a non-recording
    winner must remove the feed it staged — otherwise table_changes
    would serve a feed describing changes that never committed."""
    path = str(tmp_path / "t")
    t1 = _bootstrap(spark, path)
    t2 = MergedTable(spark, path)

    import mlvectordb_spark.streaming.merge_sink as MS

    orig = MergedTable.write_version
    fired = {"done": False}

    def delayed(self, df, version, **kw):
        if self is t2 and not fired["done"]:
            fired["done"] = True
            # winner: plain (non-recording) merge commits v2 first
            apply_merge_batch(
                t1, _batch(spark, [(2, 25.0, 2)]), batch_id=2, on="id",
                order_col="seq",
            )
        return orig(self, df, version, **kw)

    MS.MergedTable.write_version = delayed
    try:
        with pytest.raises(ConcurrentWriteError):
            apply_merge_batch(
                t2, _batch(spark, [(3, 35.0, 2)]), batch_id=7, on="id",
                order_col="seq", record_changes=True,
            )
    finally:
        MS.MergedTable.write_version = orig
    assert not t1.has_recorded_changes(2)
    got = {r["id"]: r["val"] for r in t1.df().collect()}
    assert got == {1: 10.0, 2: 25.0, 3: 30.0}
    assert _staging_dirs(path) == []
