"""Benchmark harness (driver contract).

Runs the headline queries from ``__spark_entry__.queries()`` against
``$SPARK_GRAFT_SF_DIR`` (default ``/root/testdata/sf0.1``) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q": sec, ...}, "sf": ..., "triples_per_sec": ...}

Each query is forced end-to-end with a count over a fully-materialized
projection (``df.cache()`` is deliberately NOT used — every number is a
cold plan execution). The flagship KG metric (BASELINE.json: triples/sec)
is derived from the ``kg_triples`` timing and its emitted-triple count.

Env knobs:
  SPARK_GRAFT_SF_DIR   input dir            (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[] parallelism  (default 32)
  BENCH_QUERIES        comma-list subset    (default: all)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F


def _run_one(df) -> int:
    """Force full materialization of every column (not just count(*))."""
    # xxhash64 over all columns defeats column pruning so the timing reflects
    # the real work of producing the full result; bit_xor reduces JVM-side
    # without ANSI overflow.
    return df.select(
        F.bit_xor(F.xxhash64(*[F.col(c) for c in df.columns])).alias("h"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]["n"]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)

    import __spark_entry__ as entrymod
    from json_ld_spark.session import get_spark

    spark = get_spark(app_name="bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm-up: fork all Python workers (pandas/pyarrow import per worker)
    # and exercise codegen once, so the first timed query isn't charged
    # one-time session costs that a long-lived cluster job never sees.
    def _identity(batches):
        yield from batches

    spark.range(cpus * 4).repartition(cpus).mapInPandas(
        _identity, "id long"
    ).count()

    qs = entrymod.queries()
    subset = os.environ.get("BENCH_QUERIES")
    if subset:
        keep = {s.strip() for s in subset.split(",") if s.strip()}
        qs = {k: v for k, v in qs.items() if k in keep}

    timings: dict[str, float] = {}
    counts: dict[str, int] = {}
    for name, fn in qs.items():
        t0 = time.perf_counter()
        try:
            counts[name] = _run_one(fn(spark, sf_dir))
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # noqa: BLE001 - bench must report, not die
            timings[name] = -1.0
            print(f"# FAIL {name}: {exc}", file=sys.stderr)

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    # operator-vs-job split comes from the __spark_entry__.jobs() contract
    # (end-to-end job benchmarks reported separately from single-operator
    # timings, so job-bench weather can't mask operator regressions)
    job_queries = set(getattr(entrymod, "jobs", dict)())
    job_total = round(
        sum(t for q, t in timings.items() if q in job_queries and t >= 0), 3
    )
    kg_t = timings.get("kg_triples", -1.0)
    kg_n = counts.get("kg_triples", 0)
    out = {
        "metric": "suite_total_runtime",
        "value": total,
        "unit": "sec",
        "suite_operator_runtime": round(total - job_total, 3),
        "suite_job_runtime": job_total,
        "queries": timings,
        "sf": sf_dir,
        "cpus": cpus,
        "triples_per_sec": round(kg_n / kg_t, 1) if kg_t > 0 else None,
    }
    # The driver records only the last ~2KB of stdout; keep the contract
    # line compact (row counts live in the side file, not the stdout JSON)
    # and make it the final thing printed.
    full = dict(out, rows=counts)
    bench_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH")
    os.makedirs(bench_dir, exist_ok=True)
    with open(os.path.join(bench_dir, "last_run.json"), "w") as fh:
        json.dump(full, fh, indent=1)
    spark.stop()
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
