"""Scale probe: run core operators at 100-1000x the sf0.1 sizes locally to
measure how the plans behave as data grows (results recorded in SCALING.md).

Synthesizes data executor-side (spark.range + deterministic hash-based
columns — no driver materialization), so N scales to memory, not driver
heap. Usage: python tools/scale_probe.py [n_vectors] [n_events]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from mlvectordb_spark.operators.ann import IVFIndex
from mlvectordb_spark.operators.knn import knn, knn_join
from mlvectordb_spark.operators.skew import salted_count_sum
from mlvectordb_spark.session import get_spark


def synth_embeddings(spark, n: int, dim: int = 64):
    """Deterministic pseudo-random unit-ish vectors, generated executor-side."""
    df = spark.range(n).select(F.col("id").alias("vec_id"))
    comps = F.array(
        *[
            (F.pmod(F.xxhash64(F.col("vec_id"), F.lit(i)), F.lit(10_000)) / 5_000.0
             - F.lit(1.0)).cast("float")
            for i in range(dim)
        ]
    )
    return df.withColumn("embedding", comps).withColumn(
        "label", F.pmod(F.col("vec_id"), F.lit(10)).cast("int")
    )


def synth_clustered_embeddings(spark, n: int, dim: int = 64, n_centers: int = 32):
    """Well-separated Gaussian-ish clusters (center spread ~±10, noise
    ~±0.1) — the regime where certified cluster pruning actually prunes."""
    df = spark.range(n).select(F.col("id").alias("vec_id"))
    c = F.pmod(F.col("vec_id"), F.lit(n_centers))
    comps = F.array(
        *[
            (
                (F.pmod(F.xxhash64(c, F.lit(i)), F.lit(2_000)) / 100.0 - F.lit(10.0))
                + (F.pmod(F.xxhash64(F.col("vec_id"), F.lit(i + dim)), F.lit(200))
                   / 1_000.0 - F.lit(0.1))
            ).cast("float")
            for i in range(dim)
        ]
    )
    return df.withColumn("embedding", comps).withColumn(
        "label", c.cast("int")
    )


def synth_documents(spark, n: int, n_tokens: int = 40, vocab: int = 5_000):
    """Deterministic synthetic corpus, generated executor-side: each doc is
    `n_tokens` hash-drawn vocab words; every 50th doc is an exact copy of
    its predecessor (planted duplicates so the dedup paths do real work)."""
    df = spark.range(n).select(F.col("id").alias("doc_id"))
    base = F.when(
        F.pmod(F.col("doc_id"), F.lit(50)) == 1, F.col("doc_id") - 1
    ).otherwise(F.col("doc_id"))
    words = F.array(
        *[
            F.concat(
                F.lit("w"),
                F.pmod(F.xxhash64(base, F.lit(i)), F.lit(vocab)).cast("string"),
            )
            for i in range(n_tokens)
        ]
    )
    return df.withColumn("text", F.concat_ws(" ", words)).withColumn(
        "source", F.concat(F.lit("s"), F.pmod(F.col("doc_id"), F.lit(20)).cast("string"))
    )


def synth_events(spark, n: int):
    df = spark.range(n).select(F.col("id").alias("event_id"))
    return (
        df.withColumn(
            "ts",
            F.timestamp_seconds(
                F.lit(1704067200) + F.pmod(F.xxhash64("event_id"), F.lit(30 * 86400))
            ),
        )
        .withColumn("user_id", F.pmod(F.xxhash64("event_id", F.lit(1)), F.lit(50_000)))
        .withColumn(
            "value", (F.pmod(F.xxhash64("event_id", F.lit(2)), F.lit(100_000)) / 100.0)
        )
    )


def timed(name, fn, out):
    t0 = time.time()
    n = fn()
    dt = round(time.time() - t0, 2)
    out[name] = {"sec": dt, "rows": n}
    print(f"  {name}: {dt}s ({n} rows)", flush=True)


def main():
    n_vec = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_ev = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000_000
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"n_vectors": n_vec, "n_events": n_ev}

    emb = synth_embeddings(spark, n_vec).localCheckpoint(eager=True)
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]

    timed("exact_knn_top10", lambda: len(knn(emb, qvec, 10, metric="l2").collect()), out)

    def ivf():
        idx = IVFIndex(n_clusters=64, seed=42)
        idx.build(emb)
        out["ivf_build_only_sec"] = round(time.time() - t_ivf0, 2)
        return len(idx.search(qvec, 10, nprobe=8, metric="l2").collect())

    t_ivf0 = time.time()
    timed("ivf_build_plus_probe", ivf, out)

    queries = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    timed(
        "knn_join_16q_top5",
        lambda: knn_join(emb, queries, 5, metric="l2").count(),
        out,
    )

    # The pruned batch serving shape vs the brute-force broadcast join.
    # Uniform data is the certified path's honest WORST case (nothing can
    # be pruned without risking exactness), so measure both regimes:
    idx_u = IVFIndex(n_clusters=64, seed=42)
    idx_u.build(emb)  # ingest-time work, excluded from the timing
    timed(
        "ivf_batch_exact_16q_top5_uniform",
        lambda: len(idx_u.knn_join_exact(queries, 5).collect()),
        out,
    )

    embc = synth_clustered_embeddings(spark, n_vec).localCheckpoint(eager=True)
    queries_c = embc.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    timed(
        "knn_join_16q_top5_clustered",
        lambda: knn_join(embc, queries_c, 5, metric="l2").count(),
        out,
    )
    idx_c = IVFIndex(n_clusters=32, seed=42)
    idx_c.build(embc)
    timed(
        "ivf_batch_exact_16q_top5_clustered",
        lambda: len(idx_c.knn_join_exact(queries_c, 5).collect()),
        out,
    )

    # CDC maintenance through the built index: ~2% churn feed (1% vector
    # overwrites + 1% deletes) applied without rebuild — the serving-index
    # freshness loop (IVFIndex.apply_changes)
    churn = (
        emb.filter(F.pmod("vec_id", F.lit(100)) == 0)
        .select(
            "vec_id", "embedding", "label",
            F.lit("upsert").alias("change_type"),
            F.lit(2).alias("write_version"),
        )
        .unionByName(
            emb.filter(F.pmod("vec_id", F.lit(101)) == 0).select(
                "vec_id", "embedding", "label",
                F.lit("delete").alias("change_type"),
                F.lit(3).alias("write_version"),
            )
        )
    )
    timed(
        "ivf_apply_changes_2pct_churn",
        lambda: (idx_u.apply_changes(churn), idx_u.indexed.count())[1],
        out,
    )
    timed(
        "ivf_exact_search_post_churn",
        lambda: len(idx_u.search_exact(qvec, 10).collect()),
        out,
    )

    # --- the 100 TB serving path at 1M x 64d (round-5 verdict #7): IVF+PQ
    # build + single probe + batch probe + CDC maintenance cycle. Clustered
    # data is the regime the layout is built for; n_serve defaults to 1M
    # regardless of the smaller operator-probe size above.
    n_serve = int(sys.argv[3]) if len(sys.argv) > 3 else 1_000_000
    if n_serve:
        from mlvectordb_spark.operators.ann import IVFPQIndex

        out["n_serve"] = n_serve
        embs = synth_clustered_embeddings(spark, n_serve).localCheckpoint(
            eager=True
        )
        qv = embs.filter(F.col("vec_id") == 5).select("embedding").head()[0]
        pq = IVFPQIndex(n_clusters=64, m=8, k_sub=64, seed=42)
        timed(
            "ivfpq_build_1m",
            lambda: (pq.build(embs), pq.indexed.count())[1],
            out,
        )

        # serving reads run against the SAVED layout (parquet partitioned by
        # cluster_id — probes become physical partition pruning); an
        # in-memory build would re-run the assign+encode lineage per search
        def save_load():
            import tempfile

            path = tempfile.mkdtemp(prefix="probe_ivfpq_")
            pq.save(path)
            out["_ivfpq_path"] = path
            return 1

        timed("ivfpq_save_1m", save_load, out)
        pq2 = IVFPQIndex.load(spark, out.pop("_ivfpq_path"))
        timed(
            "ivfpq_search_exact_top10",
            lambda: len(pq2.search_exact(qv, 10).collect()),
            out,
        )
        qs = embs.filter(F.col("vec_id") < 16).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        timed(
            "ivfpq_batch_exact_16q_top5",
            lambda: len(pq2.knn_join_exact(qs, 5).collect()),
            out,
        )
        churn_pq = (
            embs.filter(F.pmod("vec_id", F.lit(100)) == 0)
            .select(
                "vec_id", "embedding", "label",
                F.lit("upsert").alias("change_type"),
                F.lit(2).alias("write_version"),
            )
            .unionByName(
                embs.filter(F.pmod("vec_id", F.lit(101)) == 0).select(
                    "vec_id", "embedding", "label",
                    F.lit("delete").alias("change_type"),
                    F.lit(3).alias("write_version"),
                )
            )
        )
        # the maintenance loop's real shape (streaming/ingest.py): apply the
        # feed, then truncate the anti-join/union/re-encode lineage with a
        # localCheckpoint — without it every later search re-executes the
        # churn plan (measured ~11 s/search at 1M before checkpointing)
        timed(
            "ivfpq_apply_changes_2pct_churn",
            lambda: (pq2.apply_changes(churn_pq), pq2.indexed.count())[1],
            out,
        )
        timed(
            "ivfpq_churn_checkpoint",
            lambda: (
                setattr(pq2, "indexed", pq2.indexed.localCheckpoint()),
                1,
            )[1],
            out,
        )
        timed(
            "ivfpq_search_exact_post_churn",
            lambda: len(pq2.search_exact(qv, 10).collect()),
            out,
        )

        # store-ROUTED serving at the same scale: the full find_similar
        # path = certified IVF probe + enrichment against the store. The
        # r7 enrichment pushes the ≤k hit ids into the store scan as an
        # IN-list (parquet row-group skipping) instead of broadcast-
        # joining against a full-namespace scan — this stage is the
        # before/after evidence for that hot-path read.
        import tempfile

        from mlvectordb_spark.operators.store import VectorStore

        store = VectorStore(
            spark, tempfile.mkdtemp(prefix="probe_store_"),
            rebuild_threshold=0.95,
        )
        dto = embs.select(
            F.concat(F.lit("v"), F.col("vec_id")).alias("id"),
            F.col("embedding").alias("values"),
        )
        timed(
            "store_ingest_1m",
            lambda: store.upsert_df(dto, namespace="serve",
                                    assume_unique_ids=True),
            out,
        )
        timed(
            "store_build_attach_ivf64",
            lambda: (
                store.build_index(
                    "serve",
                    factory=lambda: IVFIndex(n_clusters=64, seed=42),
                ),
                1,
            )[1],
            out,
        )
        qlist = [float(x) for x in qv]
        timed(
            "store_find_similar_indexed_top10",
            lambda: len(
                store.find_similar(
                    qlist, 10, namespace="serve", metric="l2",
                    mode="indexed",
                )
            ),
            out,
        )
        timed(
            "store_find_similar_indexed_top10_repeat",
            lambda: len(
                store.find_similar(
                    qlist, 10, namespace="serve", metric="l2",
                    mode="indexed",
                )
            ),
            out,
        )
        # batch serving: 16 queries through ONE certified pruned scan +
        # one broadcast enrichment (find_similar_batch) — compare against
        # 16× the single routed read above
        bqs = {
            f"q{r.vec_id}": [float(x) for x in r.embedding]
            for r in embs.filter(F.col("vec_id") < 16)
            .select("vec_id", "embedding")
            .collect()
        }
        timed(
            "store_batch_16q_top5",
            lambda: store.find_similar_batch(
                bqs, 5, namespace="serve", metric="l2", mode="indexed"
            ).count(),
            out,
        )

    # Text-dedup pipeline at synthetic-corpus scale (planted 2% exact dups)
    n_docs = max(100_000, n_vec)
    docs = synth_documents(spark, n_docs).localCheckpoint(eager=True)

    def exact_dedup():
        from pyspark.sql import Window as W

        w = W.partitionBy(F.md5("text")).orderBy("doc_id")
        return (
            docs.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .count()
        )

    timed("exact_dedup_survivors", exact_dedup, out)

    def minhash_candidates():
        from mlvectordb_spark.operators.minhash import (
            band_candidate_pairs,
            bands_from_shingles,
            shingle_table,
        )

        return band_candidate_pairs(
            bands_from_shingles(shingle_table(docs))
        ).count()

    timed("minhash_lsh_candidates", minhash_candidates, out)

    def decontaminate_1pct_eval():
        from mlvectordb_spark.operators.curation import decontaminate

        return decontaminate(
            docs.filter(F.pmod("doc_id", F.lit(100)) != 0),
            docs.filter(F.pmod("doc_id", F.lit(100)) == 0),
        ).count()

    timed("decontaminate_1pct_eval", decontaminate_1pct_eval, out)

    ev = synth_events(spark, n_ev)

    def sessionize():
        from pyspark.sql import Window

        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        gap = F.col("ts").cast("double") - F.lag(F.col("ts").cast("double")).over(w)
        new_sess = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
        return (
            ev.withColumn("ns", new_sess)
            .groupBy("user_id")
            .agg(F.sum("ns").alias("n_sessions"))
            .count()
        )

    timed("events_sessionize", sessionize, out)

    skewed = ev.withColumn(
        "k", F.when(F.pmod("event_id", F.lit(10)) < 8, F.lit(7)).otherwise(F.pmod("event_id", F.lit(1000)))
    )
    timed(
        "salted_agg_80pct_hot_key",
        lambda: salted_count_sum(skewed, ["k"], "value").count(),
        out,
    )
    timed(
        "plain_agg_same_skew",
        lambda: skewed.groupBy("k").agg(F.count("*"), F.sum("value")).count(),
        out,
    )

    # Heavy hitters where the distinct-value long tail dominates (the
    # 100 TB shape): 10% of occurrences come from 100 hot values, the
    # rest are one-off — the plain groupBy shuffles every distinct
    # value, the CMS-certified prune shuffles only candidates.
    import tempfile

    n_tok = max(2_000_000, 2 * n_vec)
    toks = (
        spark.range(n_tok)
        .select(
            F.when(
                F.pmod("id", F.lit(10)) == 0,
                F.concat(
                    F.lit("hot"),
                    F.pmod(F.xxhash64("id"), F.lit(100)).cast("string"),
                ),
            )
            .otherwise(F.concat(F.lit("t"), F.col("id").cast("string")))
            .alias("token")
        )
        .localCheckpoint(eager=True)
    )
    hh_min = n_tok // 10 // 100 // 2  # half the expected hot count
    timed(
        "heavyhitters_plain_groupby",
        lambda: toks.groupBy("token")
        .count()
        .filter(F.col("count") >= hh_min)
        .count(),
        out,
    )

    def hh_cms():
        from mlvectordb_spark.operators.sketches import heavy_hitters

        return heavy_hitters(toks, "token", hh_min, width=4096, depth=3).count()

    timed("heavyhitters_cms_pruned", hh_cms, out)

    # Z-order layout: multi-column skipping on a corpus-scale rewrite.
    from mlvectordb_spark.operators.layout import (
        optimize_layout,
        pruning_stats,
        read_box,
        write_linear,
    )

    n_rows = max(2_000_000, n_vec)
    tbl = spark.range(n_rows).select(
        F.col("id"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(10_000)).alias("a"),
        F.pmod(F.xxhash64("id", F.lit(2)), F.lit(10_000)).alias("b"),
        (F.pmod(F.xxhash64("id", F.lit(3)), F.lit(100_000)) / 100.0).alias("v"),
    )
    zdir = tempfile.mkdtemp(prefix="probe_zorder_")
    ldir = tempfile.mkdtemp(prefix="probe_linear_")
    timed(
        "zorder_rewrite",
        lambda: (optimize_layout(tbl, ["a", "b"], zdir, n_files=64, bits=6), n_rows)[1],
        out,
    )
    write_linear(tbl, "a", ldir, n_files=64)
    box2d = {"a": (1000, 2000), "b": (1000, 3000)}  # 10% x 20% box
    slab = {"b": (1000, 3000)}  # secondary-column-only slab
    out["zorder_read_fraction_2d"] = pruning_stats(zdir, box2d)["read_fraction"]
    out["linear_read_fraction_2d"] = pruning_stats(ldir, box2d)["read_fraction"]
    out["zorder_read_fraction_slab"] = pruning_stats(zdir, slab)["read_fraction"]
    out["linear_read_fraction_slab"] = pruning_stats(ldir, slab)["read_fraction"]
    timed(
        "zorder_box_count",
        lambda: read_box(spark, zdir, box2d).count(),
        out,
    )
    timed(
        "linear_box_count",
        lambda: read_box(spark, ldir, box2d).count(),
        out,
    )

    print(json.dumps(out))


if __name__ == "__main__":
    main()
