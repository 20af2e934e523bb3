"""Per-entry Spark-job profile: run ONE bench entry with the UI enabled
and dump every Spark job it launched (duration, stages, tasks, shuffle
bytes) from the REST API — the guide §1 "where does the time actually
go" measurement for entries whose cost is spread over many small jobs
(store probes, merge entries) rather than one big query.

Usage: python tools/entry_profile.py <entry> [sf_dir] [--repeat N]

The session mirrors bench.py's (same env contract) except the UI is on;
the FIRST run of the entry warms the JVM exactly like the bench's
pass-0, and the profile reports the jobs of the LAST run only.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    entry = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 and not sys.argv[2].startswith("--") \
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeat = 2
    if "--repeat" in sys.argv:
        repeat = int(sys.argv[sys.argv.index("--repeat") + 1])

    os.environ.setdefault("SPARK_GRAFT_UI", "1")
    from pyspark.sql import SparkSession

    from mlvectordb_spark.session import get_spark

    # same config as the engine session, UI flipped on for the REST API
    base = get_spark  # build via the factory, then override ui
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = SparkSession.builder.appName("entry-profile").master(
        f"local[{cpus}]"
    )
    import mlvectordb_spark.session as sess_mod

    # reuse the factory's config list by monkey-free reconstruction:
    spark = base("entry-profile")
    conf = dict(spark.sparkContext.getConf().getAll())
    spark.stop()
    SparkSession.builder._options = {}
    b = SparkSession.builder.appName("entry-profile").master(conf["spark.master"])
    for k, v in conf.items():
        if k.startswith("spark.sql.") or k in (
            "spark.driver.memory", "spark.sql.shuffle.partitions",
        ):
            b = b.config(k, v)
    b = b.config("spark.ui.enabled", "true").config("spark.ui.port", "4055")
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from mlvectordb_spark.queries import QUERIES

    app_id = spark.sparkContext.applicationId

    def jobs_now() -> list[dict]:
        url = f"http://localhost:4055/api/v1/applications/{app_id}/jobs?status=succeeded"
        with urllib.request.urlopen(url) as r:
            return json.loads(r.read())

    t_runs = []
    marker = 0
    for i in range(repeat):
        before = {j["jobId"] for j in jobs_now()}
        spark.sparkContext.setJobDescription(f"{entry} run {i}")
        t0 = time.time()
        df = QUERIES[entry](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        spark.catalog.clearCache()
        t_runs.append(dt)
        after = jobs_now()
        new = [j for j in after if j["jobId"] not in before]
        if i == repeat - 1:
            new.sort(key=lambda j: j["jobId"])
            total_job_ms = 0
            print(f"\n=== {entry} run {i}: {dt:.3f}s wall, {len(new)} jobs ===")
            for j in new:
                from datetime import datetime

                st = datetime.fromisoformat(j["submissionTime"].replace("GMT", "+00:00"))
                ct = datetime.fromisoformat(j["completionTime"].replace("GMT", "+00:00"))
                ms = (ct - st).total_seconds() * 1000
                total_job_ms += ms
                desc = (j.get("description") or j["name"])[:100]
                print(
                    f"  job {j['jobId']:>4}  {ms:8.0f} ms  "
                    f"tasks={j['numCompletedTasks']:<5} {desc}"
                )
            print(f"  sum(job wall) = {total_job_ms/1000:.3f}s  "
                  f"gap (driver/python) = {dt - total_job_ms/1000:.3f}s")
    print(f"\nruns: {[round(t,3) for t in t_runs]}")


if __name__ == "__main__":
    main()
