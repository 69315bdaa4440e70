"""Invariant checks for batch 51 (q350): funnel monotonicity and
stage consistency with the standalone gate queries."""

from flightdb_spark.queries import load_registry
from flightdb_spark.tables import load_table

REGISTRY = load_registry()


def test_funnel_monotone_and_consistent(spark, sf_dir):
    out = (
        REGISTRY["q350_curation_funnel"].fn(spark, sf_dir)
        .orderBy("stage")
        .toPandas()
    )
    assert list(out.stage) == [
        "a_raw",
        "b_exact_dedup",
        "c_norm_dedup",
        "d_quality",
        "e_lang_consistent",
        "f_length_band",
    ]
    # survivors never increase; drops reconcile
    assert (out.n_surviving.diff().dropna() <= 0).all()
    assert (out.n_dropped.iloc[1:] >= 0).all()
    recon = out.n_surviving.iloc[0] - out.n_dropped.iloc[1:].sum()
    assert recon == out.n_surviving.iloc[-1]
    # stage 1 = corpus size; stage 2 = q28's distinct raw-hash count
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert out.n_surviving.iloc[0] == n_docs
    q28 = REGISTRY["q28_dedup_exact"].fn(spark, sf_dir)
    from pyspark.sql import functions as F

    distinct_raw = (
        load_table(spark, sf_dir, "documents")
        .select(F.md5("text"))
        .distinct()
        .count()
    )
    assert out.n_surviving.iloc[1] == distinct_raw
