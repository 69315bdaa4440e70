"""Physical-plan lint regression: every registry query stays free of
CartesianProduct, row-at-a-time Python UDFs, and non-allowlisted
global windows (tools/planlint.py)."""

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from tools.planlint import (
    BNLJ_EXISTINGRDD_ALLOWED,
    GLOBAL_WINDOW_ALLOWED,
    _bnlj_over_existing_rdd,
    _windowspec_args,
    is_global_spec,
    lazy_checkpoints,
)


def _global_specs(plan: str) -> list:
    return [args for args in _windowspec_args(plan) if is_global_spec(args)]


def test_detector_shapes(spark):
    g = spark.range(10).withColumn("r", F.row_number().over(W.orderBy("id")))
    assert _global_specs(g._jdf.queryExecution().executedPlan().toString())
    p = spark.range(10).withColumn(
        "r", F.row_number().over(W.partitionBy(F.col("id") % 2).orderBy("id"))
    )
    assert not _global_specs(p._jdf.queryExecution().executedPlan().toString())
    u = spark.range(10).withColumn(
        "c", F.count(F.lit(1)).over(W.partitionBy(F.col("id") % 2))
    )
    assert not _global_specs(u._jdf.queryExecution().executedPlan().toString())
    # unordered GLOBAL window (partitionBy with no args) must fire too
    g2 = spark.range(10).withColumn("c", F.count(F.lit(1)).over(W.partitionBy()))
    assert _global_specs(g2._jdf.queryExecution().executedPlan().toString())


def test_registry_plans_clean(spark, sf_dir):
    from flightdb_spark.queries import load_registry

    bad = []
    # lazy_checkpoints: lint the staged plan SHAPES without executing
    # every staging job (r10 — the eager sweep alone blew the driver's
    # pytest window; plan strings are shape-identical under eager=False)
    with lazy_checkpoints():
        for name, qd in sorted(load_registry().items()):
            plan = (
                qd.fn(spark, sf_dir)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
            if "CartesianProduct" in plan:
                bad.append((name, "CartesianProduct"))
            if "BatchEvalPython" in plan:
                bad.append((name, "BatchEvalPython"))
            if name not in GLOBAL_WINDOW_ALLOWED and _global_specs(plan):
                bad.append((name, "global window"))
            if (
                name not in BNLJ_EXISTINGRDD_ALLOWED
                and _bnlj_over_existing_rdd(plan)
            ):
                bad.append((name, "BNLJ over Scan ExistingRDD"))
    assert not bad, bad
