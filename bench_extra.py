"""Round-7 optimization harness — NOT the driver bench (bench.py is
frozen for measurement; guide §1.4).

Isolates individual registry queries with the noop sink, prints
per-query best-of-N wall times as one JSON line, and (with --plans DIR)
writes each query's .explain("formatted") to DIR/<query>_<tag>.txt so
plan-shape claims in OPTIMIZATION_r07.md are reproducible.

Usage:
  python bench_extra.py --sf /root/testdata/sf1.0 --repeat 2 q1 q2 ...
  python bench_extra.py --sf ... --plans plans/r07 --tag before q1 q2
  (no query names = the bench.py HEADLINE list)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyobo_spark import queries as Q  # noqa: E402
from pyobo_spark.session import get_spark  # noqa: E402


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def warm_inputs(spark, sf_dir: str) -> None:
    import glob

    for pq in sorted(glob.glob(f"{sf_dir}/*.parquet")):
        force(spark.read.parquet(pq))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int, default=int(
        os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument("--plans", default=None,
                    help="directory to write explain('formatted') files")
    ap.add_argument("--tag", default="before",
                    help="suffix for plan files (<query>_<tag>.txt)")
    ap.add_argument("--no-warm", action="store_true")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    from bench import HEADLINE

    names = args.queries or HEADLINE
    spark = get_spark("bench_extra", cores=args.cpus,
                      shuffle_partitions=max(args.cpus, 8))
    if not args.no_warm:
        warm_inputs(spark, args.sf)
        # python-worker warmup
        from pyspark.sql import functions as F

        def _w(it):
            for pdf in it:
                yield pdf.head(0)
        (spark.range(args.cpus * 8).repartition(args.cpus * 8)
         .withColumn("x", F.lit("x"))
         .mapInPandas(_w, schema="id long, x string")
         .write.format("noop").mode("overwrite").save())

    from scaling_bench import _canary_gbps, _steal_pct, _steal_ticks

    st0 = _steal_ticks()
    canary_before = _canary_gbps()
    times: dict[str, float] = {}
    for name in names:
        df = Q.QUERIES[name](spark, args.sf)
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted")
            )
            with open(os.path.join(
                    args.plans, f"{name}_{args.tag}.txt"), "w") as fh:
                fh.write(txt)
        best = None
        for _ in range(args.repeat):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            force(Q.QUERIES[name](spark, args.sf))
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        spark.sparkContext.setJobDescription(None)
        times[name] = round(best, 3)
        print(f"##Q {name} {times[name]}", flush=True)
    print("##RESULT " + json.dumps(
        {"sf_dir": args.sf, "cpus": args.cpus, "total": round(
            sum(times.values()), 3), "queries": times,
         "host": {"steal_pct": _steal_pct(st0, _steal_ticks()),
                  "canary_gbps_before": canary_before,
                  "canary_gbps_after": _canary_gbps()}}))


if __name__ == "__main__":
    main()
