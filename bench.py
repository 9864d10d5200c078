"""Bench harness (driver contract + scaling evidence).

Default: runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and the full
transcript rollup pipeline on a seeded synthetic table, then prints
ONE JSON line:

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "pipeline": {...}, "scaling": {...}}

Scaling evidence (BASELINE.json: efficiency >= 0.8 from N to 4N
executors; no real cluster in this sandbox): the same rollup job runs
in two fresh subprocess JVMs at local[8] and local[32] on the same
input; efficiency = (throughput_32 / throughput_8) / 4. Disable with
SPARK_GRAFT_SCALING=0 (it adds ~1-2 min).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_CONVS = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", "8000"))

HEADLINE = [
    "range_check",
    "rocc_check",
    "curve_interp",
    "agg_hourly",
    "gapfill_10min",
    "rollup_hourly",
    "tier_1d_from_1h",
    "dedup_exact",
    "minhash_dedup",
    "cosine_topk",
]


def _build(cpus: int):
    from enhydris_autoprocess_spark.session import build_session

    s = build_session(
        app_name="bench",
        master=f"local[{cpus}]",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    s.sparkContext.setLogLevel("ERROR")
    return s


def run_rollup_job(spark, n_convs: int) -> dict:
    """The scaling workload: generate transcripts -> checks -> 3 rollup
    tiers; returns rolled-up points + wall seconds."""
    from pyspark.sql import functions as F

    from enhydris_autoprocess_spark.config import (
        PipelineConfig,
        RangeCheckConfig,
        RateOfChangeConfig,
        RoccThreshold,
    )
    from enhydris_autoprocess_spark.operators import run_checks
    from enhydris_autoprocess_spark.rollup import build_tiers
    from enhydris_autoprocess_spark.schema import transcripts_to_series
    from enhydris_autoprocess_spark.synth import generate_transcripts

    cfg = PipelineConfig(
        range_check=RangeCheckConfig(0, 3000, 5, 2500),
        rate_of_change=RateOfChangeConfig((RoccThreshold("10min", 2000.0),)),
    )
    transcripts = generate_transcripts(spark, n_convs=n_convs, seed=42).persist()
    n_turns = transcripts.count()  # materialize input outside the timed window
    t0 = time.time()
    checked = run_checks(transcripts_to_series(transcripts), cfg)
    n_checked = checked.count()
    tiers = build_tiers(transcripts)
    points = 0
    for name, df in tiers.items():
        points += df.count()
    secs = time.time() - t0
    transcripts.unpersist()
    return {
        "turns": n_turns,
        "checked_rows": n_checked,
        "rolled_up_points": points,
        "seconds": round(secs, 3),
        "points_per_sec": round(points / secs, 1),
        "turns_per_sec": round(n_turns / secs, 1),
    }


def _worker(cpus: int, n_convs: int) -> None:
    spark = _build(cpus)
    out = run_rollup_job(spark, n_convs)
    spark.stop()
    print("WORKER_RESULT " + json.dumps(out))


def _spawn_worker(cpus: int, n_convs: int) -> dict:
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--rollup-worker",
         str(cpus), str(n_convs)],
        capture_output=True,
        text=True,
        timeout=1800,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    for line in proc.stdout.splitlines():
        if line.startswith("WORKER_RESULT "):
            return json.loads(line[len("WORKER_RESULT "):])
    raise RuntimeError(
        f"worker local[{cpus}] failed: {proc.stdout[-2000:]} {proc.stderr[-2000:]}"
    )


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--rollup-worker":
        _worker(int(sys.argv[2]), int(sys.argv[3]))
        return

    import __spark_entry__ as entrymod

    spark = _build(CPUS)
    qs = entrymod.queries()
    times: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.time()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        dt = round(time.time() - t0, 3)
        times[name] = dt
        total += dt
    spark.stop()

    result = {
        "metric": "headline_queries_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": times,
        "sf": SF_DIR,
        "cpus": CPUS,
    }

    if os.environ.get("SPARK_GRAFT_SCALING", "1") != "0":
        lo = _spawn_worker(8, BENCH_CONVS)
        hi = _spawn_worker(32, BENCH_CONVS)
        eff = (hi["points_per_sec"] / lo["points_per_sec"]) / 4.0
        result["pipeline"] = hi
        result["scaling"] = {
            "convs": BENCH_CONVS,
            "throughput_points_per_sec_local8": lo["points_per_sec"],
            "throughput_points_per_sec_local32": hi["points_per_sec"],
            "turns_per_sec_local8": lo["turns_per_sec"],
            "turns_per_sec_local32": hi["turns_per_sec"],
            "efficiency_n_to_4n": round(eff, 3),
        }

    print(json.dumps(result))


if __name__ == "__main__":
    main()
