"""Invariant checks for batch 48 (q342-q344): every detector must
find EXACTLY the planted corruption set."""

from pyspark.sql import functions as F

from flightdb_spark.queries import load_registry
from flightdb_spark.queries.safety import INJ_MOD, SECRET_MOD, ZW_MOD
from flightdb_spark.tables import load_table

REGISTRY = load_registry()


def _planted_count(spark, sf_dir, mod):
    return (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % mod == 0)
        .count()
    )


def test_secret_scan_finds_exactly_planted(spark, sf_dir):
    out = REGISTRY["q342_secret_scan"].fn(spark, sf_dir).toPandas()
    planted = _planted_count(spark, sf_dir, SECRET_MOD)
    assert out.n_flagged.sum() == planted
    assert out.n_secrets.sum() == planted  # one secret per planted doc
    assert (out.flag_rate <= 1.0).all()


def test_unicode_audit_finds_exactly_planted(spark, sf_dir):
    out = REGISTRY["q343_unicode_sanitation"].fn(spark, sf_dir).toPandas()
    planted = _planted_count(spark, sf_dir, ZW_MOD)
    assert out.n_dirty_docs.sum() == planted
    # one zero-width char per original space in each planted doc
    docs = load_table(spark, sf_dir, "documents")
    n_spaces = (
        docs.filter(F.col("doc_id") % ZW_MOD == 0)
        .select(
            F.sum(
                F.length("text")
                - F.length(F.regexp_replace("text", " ", ""))
            ).alias("s")
        )
        .collect()[0]["s"]
    )
    assert out.n_zero_width.sum() == n_spaces


def test_injection_scan_finds_exactly_planted(spark, sf_dir):
    out = REGISTRY["q344_injection_scan"].fn(spark, sf_dir).toPandas()
    planted = _planted_count(spark, sf_dir, INJ_MOD)
    # the canary carries both patterns; clean word-salad has neither
    assert out.n_injection.sum() == planted
    assert out.n_exfil.sum() == planted
    assert out.n_flagged.sum() == planted
    assert out.n_docs.sum() == load_table(spark, sf_dir, "documents").count()
