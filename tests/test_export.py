"""Training-data export: deterministic shuffle, sized shards, epoch
independence."""

from __future__ import annotations

import os

from mlvectordb_spark.operators.export import (
    estimate_shards,
    export_shards,
    global_shuffle,
)


def _read_orders(spark, path):
    """Per-shard row sequences, keyed by shard number (the `shard=K/`
    directory enumeration a data loader would use)."""
    out = []
    for d in sorted(
        (d for d in os.listdir(path) if d.startswith("shard=")),
        key=lambda d: int(d.split("=", 1)[1]),
    ):
        out.append(
            [r.doc_id for r in spark.read.parquet(os.path.join(path, d)).collect()]
        )
    return out


def test_export_is_reproducible_and_salt_independent(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(1000)], "doc_id long, text string"
    )
    p1, p2, p3 = (str(tmp_path / d) for d in ("a", "b", "c"))
    export_shards(df, p1, "doc_id", salt="epoch0:", n_shards=4)
    # same salt on a differently-partitioned input -> byte-identical shards
    export_shards(df.repartition(13), p2, "doc_id", salt="epoch0:", n_shards=4)
    # new salt -> an unrelated permutation
    export_shards(df, p3, "doc_id", salt="epoch1:", n_shards=4)
    s1, s2, s3 = _read_orders(spark, p1), _read_orders(spark, p2), _read_orders(spark, p3)
    assert s1 == s2
    assert s1 != s3
    flat1 = [i for shard in s1 for i in shard]
    flat3 = [i for shard in s3 for i in shard]
    assert sorted(flat1) == list(range(1000)) == sorted(flat3)
    # uniform wide hash pmod n -> shards are balanced within ~3x
    sizes = [len(s) for s in s1]
    assert len(sizes) == 4 and max(sizes) <= 3 * max(1, min(sizes))
    # not the identity order (it's a shuffle)
    assert flat1 != list(range(1000))


def test_global_shuffle_orders_by_salted_hash(spark):
    import hashlib

    df = spark.createDataFrame(
        [(i,) for i in range(200)], "doc_id long"
    )
    got = [r.doc_id for r in global_shuffle(df, "doc_id", "s:", 1).collect()]
    want = sorted(
        range(200),
        key=lambda i: hashlib.md5(f"s:{i}".encode()).hexdigest(),
    )
    assert got == want


def test_estimate_shards_scales_with_bytes(spark):
    df = spark.createDataFrame(
        [(i, "x" * 1000) for i in range(2000)], "doc_id long, text string"
    )
    n_small_target = estimate_shards(df, target_file_bytes=64 << 10, parquet_ratio=1.0)
    n_big_target = estimate_shards(df, target_file_bytes=1 << 30, parquet_ratio=1.0)
    assert n_big_target == 1
    assert n_small_target > n_big_target


def test_pack_sequences_tiles_the_token_stream(spark):
    from pyspark.sql import functions as F

    from mlvectordb_spark.operators.export import pack_sequences

    df = spark.createDataFrame(
        [(i, 1 + (i * 7) % 90) for i in range(500)],
        "doc_id long, n_tokens long",
    )
    out = pack_sequences(df, "doc_id", "n_tokens", seq_len=128, n_shards=4)
    rows = out.collect()
    assert sorted(r.doc_id for r in rows) == list(range(500))
    by_shard: dict[int, list] = {}
    for r in rows:
        assert 0 <= r.shard < 4
        assert 0 <= r.seq_off < 128
        by_shard.setdefault(r.shard, []).append(r)
    assert len(by_shard) == 4
    for shard_rows in by_shard.values():
        # reconstruct the layout: consecutive docs tile the stream exactly
        shard_rows.sort(key=lambda r: (r.seq, r.seq_off))
        pos = 0
        for r in shard_rows:
            assert r.seq * 128 + r.seq_off == pos
            pos += r.n_tokens
    # determinism: a repartitioned input yields the identical layout
    again = pack_sequences(
        df.repartition(13), "doc_id", "n_tokens", seq_len=128, n_shards=4
    )
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))


def test_export_shards_jsonl_matches_parquet_layout(spark, tmp_path):
    """fmt='json' writes the identical shard membership and order as the
    parquet form — a loader switching formats sees the same corpus."""
    import json as _json
    from pathlib import Path

    from mlvectordb_spark.operators.export import export_shards
    from mlvectordb_spark.sources.testdata import load_table

    from pyspark.sql import functions as F

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    n = export_shards(docs, str(tmp_path / "pq"), "doc_id", n_shards=4)
    n2 = export_shards(
        docs, str(tmp_path / "jl"), "doc_id", n_shards=4, fmt="json"
    )
    assert n == n2 == 4
    # one file per shard -> the scan preserves the written (shuffled) order
    pq = {
        s: [r.doc_id for r in spark.read.parquet(
            str(tmp_path / "pq") + f"/shard={s}").collect()]
        for s in range(4)
    }
    for s in range(4):
        files = sorted(Path(str(tmp_path / "jl") + f"/shard={s}").glob("*.json"))
        rows = []
        for f in files:
            rows += [
                _json.loads(line)["doc_id"]
                for line in f.read_text().splitlines() if line
            ]
        assert rows == pq[s], f"shard {s} diverged between formats"
