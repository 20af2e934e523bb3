"""Graph-ANN scale probe: build the partitioned NSW index at 100x the
sf0.1 embeddings size and measure what matters at scale (results recorded
in SCALING.md):

- build wall time (the per-block construction runs in parallel — the
  dial is n_blocks, i.e. rows-per-block, since one block = one task);
- steady-state beam-search latency vs the exact brute-force scan and the
  IVF probe on the SAME data (the two families' serving cost, side by
  side);
- recall@10 of the bounded beam at several (ef, nprobe) points, measured
  against brute force over held-out-style self-queries.

Data is synthesized executor-side with a clustered structure (KMeans
routing over uniform noise would make every block equidistant — real
embedding corpora are clustered, and nprobe-recall depends on it).

Usage: python tools/graph_probe.py [n_vectors] [n_blocks] [--no-maintenance]
(--no-maintenance skips the CoW fold / full-rebuild section — for runs
that only need the serving latency + recall grid)
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from mlvectordb_spark.operators.ann import IVFIndex, recall_at_k
from mlvectordb_spark.operators.graph_ann import GraphANNIndex
from mlvectordb_spark.operators.knn import knn
from mlvectordb_spark.session import get_spark
from tools.scale_probe import synth_clustered_embeddings

K = 10


def main() -> None:
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(pos[0]) if len(pos) > 0 else 200_000
    n_blocks = int(pos[1]) if len(pos) > 1 else 16
    spark = get_spark("graph-probe")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, object] = {"n": n, "n_blocks": n_blocks}

    emb = synth_clustered_embeddings(spark, n).localCheckpoint()
    qrows = emb.filter(F.col("vec_id") % (n // 8) == 3).limit(8).collect()
    queries = [(r.vec_id, [float(x) for x in r.embedding]) for r in qrows]

    # ---- build + persist (ingest-time) ----
    t0 = time.time()
    gidx = GraphANNIndex(n_blocks=n_blocks, m=8, ef_construction=64)
    gidx.build(emb)
    path = tempfile.mkdtemp(prefix="graph_probe_")
    gidx.save(path)
    out["graph_build_save_sec"] = round(time.time() - t0, 1)
    gidx = GraphANNIndex.load(spark, path)

    t0 = time.time()
    ivf = IVFIndex(n_clusters=n_blocks, seed=42)
    ivf.build(emb)
    ipath = tempfile.mkdtemp(prefix="graph_probe_ivf_")
    ivf.save(ipath)
    out["ivf_build_save_sec"] = round(time.time() - t0, 1)
    ivf = IVFIndex.load(spark, ipath)

    # ---- serving latency + recall, same queries through all paths ----
    lat: dict[str, list[float]] = {}
    rec: dict[str, list[float]] = {}

    def run(tag: str, fn) -> None:
        for _vid, qv in queries:
            exact = knn(emb, qv, K, metric="l2")
            t0 = time.time()
            approx = fn(qv)
            got = {r.vec_id for r in approx.select("vec_id").collect()}
            lat.setdefault(tag, []).append(time.time() - t0)
            exact_ids = {r.vec_id for r in exact.select("vec_id").collect()}
            rec.setdefault(tag, []).append(
                len(got & exact_ids) / max(1, len(exact_ids))
            )

    run("exact_scan", lambda qv: knn(emb, qv, K, metric="l2"))
    run("graph_ef64_np2", lambda qv: gidx.search(qv, K, ef=64, nprobe=2))
    run("graph_ef128_np4", lambda qv: gidx.search(qv, K, ef=128, nprobe=4))
    if n_blocks >= 16:
        # separate ROUTING loss (too few probed blocks) from in-block
        # beam quality: widen nprobe at fixed ef (r8 verdict #10 — the
        # 1M numbers at nprobe=2/4 of 32 conflated the two)
        run(
            "graph_ef128_np8",
            lambda qv: gidx.search(qv, K, ef=128, nprobe=8),
        )
        run(
            "graph_ef128_np16",
            lambda qv: gidx.search(qv, K, ef=128, nprobe=16),
        )
    run("ivf_np2", lambda qv: ivf.search(qv, K, nprobe=2))
    run("ivf_np4", lambda qv: ivf.search(qv, K, nprobe=4))
    for tag in lat:
        out[f"{tag}_sec"] = round(sum(lat[tag]) / len(lat[tag]), 3)
        out[f"{tag}_recall"] = round(sum(rec[tag]) / len(rec[tag]), 3)

    # ---- batch serving: all 8 queries in one pass ----
    qdf = spark.createDataFrame(
        [(v, q) for v, q in queries], "query_id long, embedding array<float>"
    )
    t0 = time.time()
    gidx.search_batch(qdf, K, ef=64, nprobe=2).collect()
    out["graph_batch8_sec"] = round(time.time() - t0, 3)

    if "--no-maintenance" in sys.argv:
        print(json.dumps(out))
        return

    # ---- maintenance: CoW tail fold vs full rebuild on a 1% tail ----
    gidx.indexed = gidx.indexed.localCheckpoint()
    tail_n = max(1, n // 100)
    # a hot-spot tail (one source cluster) — the realistic ingest shape,
    # and the one where CoW folding pays: few blocks touched
    tail = emb.filter(F.col("label") == 0).limit(tail_n).select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding", "label"
    )
    gidx.add(tail)
    blocks_before = gidx.indexed.select("block_id").distinct().count()
    t0 = time.time()
    gidx.fold_pending()
    gidx.indexed.write.format("noop").mode("overwrite").save()
    out["fold_1pct_sec"] = round(time.time() - t0, 1)
    out["fold_touched_blocks"] = gidx.last_fold_touched
    out["n_blocks_total"] = blocks_before
    t0 = time.time()
    gidx.rebuild()
    gidx.indexed.write.format("noop").mode("overwrite").save()
    out["full_rebuild_sec"] = round(time.time() - t0, 1)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
