"""Media decode throughput probe: how the multimodal pipeline scales
across executor threads (the 100 TB axis — parallelism is rows-across-
workers; per-image entropy decode is inherently serial).

Generates an n-row synthetic corpus (REAL WAV/BMP/PNG-8/PNG-16/JPEG
payloads), then times `real_feature_extract` (decode + signal features,
Arrow-batched mapInPandas) end-to-end and reports rows/s and decoded
MB/s at 1, 8, and 32 local cores. Results go to SCALING.md.

Run: python tools/media_probe.py [n_rows]   (default 2000)
Don't run concurrently with pytest or bench.
"""

from __future__ import annotations

import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def run_at(cores: int, n: int) -> None:
    from mlvectordb_spark import multimodal as MM

    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"media_probe_{cores}")
        .config("spark.sql.shuffle.partitions", str(cores))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    # deterministic cost-balanced decode partitions (each holds the same
    # per-format mix — see partition_by_format's measured rationale);
    # ties round-robin on this interleaved corpus, and stays balanced on
    # format-clustered inputs where round-robin re-clusters
    # sub_splits=1: the probe corpora are small enough that one rank
    # window per format is fine, and the exact ≤1-row balance is what
    # the timing methodology wants (the salted default's ≤sub_splits
    # skew bound can exceed the per-(format,partition) share here)
    media = MM.partition_by_format(
        MM.synthetic_media_df(spark, n=n), cores * 4, sub_splits=1
    )
    media = media.cache()
    total_bytes = media.agg(
        F.sum(F.length("payload"))
    ).collect()[0][0]
    media.count()  # materialize the cache so decode time excludes gen
    t0 = time.time()
    MM.real_feature_extract(media).write.format("noop").mode(
        "overwrite"
    ).save()
    dt = time.time() - t0
    print(
        f"PROBE cores={cores} rows={n} payload_mb="
        f"{total_bytes / 1e6:.1f} sec={dt:.2f} rows_s={n / dt:.0f} "
        f"mb_s={total_bytes / 1e6 / dt:.2f}"
    )
    spark.stop()


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    for cores in (1, 8, 32):
        run_at(cores, n)


if __name__ == "__main__":
    main()
