"""Round-7 optimization measurement harness (bench.py is FROZEN; this
file carries the noop-sink isolation runs per guide §1.4 and the
per-stage breakdowns cited in OPTIMIZATION_r07.md).

Usage:
    python bench_extra.py [sf_dir] [query ...]

Times each named query (default: the heavy ones) with the exact bench
protocol — noop sink, median of 3, caches released between reps — on
the same session config bench.py uses, and optionally dumps
explain("formatted") to plans/r07/.
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("SPARK_GRAFT_CPUS", "32")


def build(cpus: int | None = None):
    from enhydris_autoprocess_spark.session import build_session

    cpus = cpus or int(os.environ["SPARK_GRAFT_CPUS"])
    extra = {"spark.ui.showConsoleProgress": "false"}
    if os.path.isdir("/dev/shm"):
        extra["spark.local.dir"] = "/dev/shm/spark-bench-tmp"
    s = build_session(
        app_name="bench_extra", master=f"local[{cpus}]", extra_conf=extra
    )
    s.sparkContext.setLogLevel("ERROR")
    return s


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def time_query(spark, fn, sf_dir, name, reps=3, explain_to=None):
    from enhydris_autoprocess_spark.cache import release_caches

    times = []
    for i in range(reps):
        spark.sparkContext.setJobDescription(f"{name} rep{i}")
        t0 = time.time()
        df = fn(spark, sf_dir)
        noop(df)
        times.append(time.time() - t0)
        if explain_to and i == 0:
            with open(explain_to, "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        release_caches(df)
        spark.sparkContext.setJobDescription(None)
    med = sorted(times)[reps // 2]
    print(f"{name}: median {med:.3f}s  reps {[round(t, 3) for t in times]}",
          flush=True)
    return med


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1.0"
    import __spark_entry__ as entry
    import bench

    qs = {**entry.queries(), **bench._extra_queries()}
    names = sys.argv[2:] or [
        "minhash_dedup", "simhash_dedup", "embedding_near_dup_lsh",
    ]
    spark = build()
    # same warmup as bench
    from pyspark.sql import functions as F
    spark.range(100000).select(F.sum("id")).write.format("noop").mode(
        "overwrite").save()
    warm_udf = F.pandas_udf(lambda s: s * 2, "long")
    spark.range(1000).select(warm_udf("id")).write.format("noop").mode(
        "overwrite").save()
    total = 0.0
    for n in names:
        total += time_query(spark, qs[n], sf_dir, n)
    print(f"TOTAL {total:.3f}s over {len(names)} queries", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
