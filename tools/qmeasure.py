"""Measure one or more registered queries: wall time with the noop sink
(guide §1.4 — times the computation, not the sink) and the formatted
physical plan, written to plans/r09/<query>_<tag>.txt.

Usage: python tools/qmeasure.py [--tag before|after] [--sf SFDIR] [--reps N] q...  [--plan-only]

Prints one line per query: name, median noop-sink seconds over reps,
and the count()-action seconds (the bench methodology) for comparison.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flightdb_spark.queries import load_registry
from flightdb_spark.session import get_spark


def main() -> int:
    args = sys.argv[1:]
    tag = "before"
    sf_dir = "/root/testdata/sf0.1"
    reps = 1
    plan_only = False
    names = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--tag":
            tag = args[i + 1]; i += 2
        elif a == "--sf":
            sf_dir = args[i + 1]; i += 2
        elif a == "--reps":
            reps = int(args[i + 1]); i += 2
        elif a == "--plan-only":
            plan_only = True; i += 1
        else:
            names.append(a); i += 1

    registry = load_registry()
    spark = get_spark("qmeasure")
    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", os.environ.get("QMEASURE_ROUND", "r10"),
    )
    os.makedirs(plans_dir, exist_ok=True)

    # same warm-up as bench.py so first-query codegen cost is not billed
    from flightdb_spark.tables import load_table
    for t in ("lineitem", "orders", "events", "documents", "embeddings"):
        try:
            load_table(spark, sf_dir, t).count()
        except Exception:
            pass
    from pyspark.sql import Window as _W
    from pyspark.sql import functions as _F
    rng = spark.range(10000).select((_F.col("id") % 7).alias("k"), _F.col("id").alias("v"))
    rng.groupBy("k").agg(_F.sum("v"), _F.avg("v"), _F.count("*")).count()
    rng.withColumn("lagv", _F.lag("v").over(_W.partitionBy("k").orderBy("v"))).count()
    dim = spark.range(7).select(_F.col("id").alias("k"))
    rng.join(_F.broadcast(dim), "k").count()

    for name in names:
        qd = registry.get(name)
        if qd is None:
            print(f"{name}: NOT FOUND")
            continue
        spark.sparkContext.setJobDescription(f"{name} [{tag}]")
        df = qd.fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(plan)
        n_exch = plan.count("Exchange")
        n_py = plan.count("EvalPython") + plan.count("MapInPandas") + plan.count("FlatMapGroupsInPandas")
        if plan_only:
            print(f"{name} [{tag}]: plan saved ({n_exch} Exchange, {n_py} py-nodes)")
            continue
        noop_times = []
        for _ in range(reps):
            df = qd.fn(spark, sf_dir)
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            noop_times.append(time.time() - t0)
        t0 = time.time()
        cnt = qd.fn(spark, sf_dir).count()
        count_s = time.time() - t0
        print(
            f"{name} [{tag}]: noop={statistics.median(noop_times):.3f}s "
            f"count={count_s:.3f}s rows={cnt} exch={n_exch} py={n_py}"
        )
        spark.sparkContext.setJobDescription(None)
        # Same inter-query isolation as bench.py: release this query's
        # localCheckpoint blocks so multi-query measurement sessions
        # don't accumulate pinned state.
        try:
            for prdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                prdd.unpersist()
            spark.catalog.clearCache()
        except Exception as exc:  # noqa: BLE001
            print(f"# post-{name} release failed: {exc}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
