"""Semantic checks for the round-4 pipeline queries (q61-q67) beyond
the DuckDB value-parity gate: ratio/shape properties a refactor could
silently break while still matching a co-refactored oracle."""

from pyspark.sql import functions as F

from flightdb_spark.queries import load_registry

REGISTRY = load_registry()


def test_tfidf_rare_terms_outrank_common(spark, sf_dir):
    """A term appearing in every doc has idf=ln(1)=0, so it can never
    be a top TF-IDF term unless nothing rarer exists in the doc."""
    out = REGISTRY["q61_tfidf_topterms"].fn(spark, sf_dir)
    assert out.filter(F.col("rk") == 1).filter(F.col("tfidf") < 0).count() == 0
    # every doc with >= 3 distinct terms gets exactly 3 ranked rows
    per_doc = out.groupBy("doc_id").count()
    assert per_doc.filter(F.col("count") > 3).count() == 0


def test_pii_redaction_scrubs_everything(spark, sf_dir):
    """Every doc the query emits had PII planted; after redaction the
    regexes must find zero residual matches (scrub is idempotent).
    Injection/redaction come from the SAME shared builders the query
    uses (operators/textprep.py) so the test tracks the query."""
    from flightdb_spark.operators.textprep import inject_pii, redact_pii
    from flightdb_spark.queries.textops import _EMAIL_RE, _PHONE_RE, _docs

    docs = _docs(spark, sf_dir)
    redacted = redact_pii(inject_pii())
    residue = docs.select(
        (
            F.size(F.regexp_extract_all(redacted, F.lit(_EMAIL_RE), 0))
            + F.size(F.regexp_extract_all(redacted, F.lit(_PHONE_RE), 0))
        ).alias("n")
    )
    assert residue.agg(F.sum("n")).collect()[0][0] == 0
    # and the query reports at least one hit per emitted row
    out = REGISTRY["q62_pii_redaction"].fn(spark, sf_dir)
    assert out.filter((F.col("n_emails") + F.col("n_phones")) == 0).count() == 0


def test_split_assignment_ratios(spark, sf_dir):
    """Hash-based 80/10/10: each split within 6 points of its target
    (the corpus is small; the bound just catches a broken bucket cut)."""
    out = REGISTRY["q64_split_assignment"].fn(spark, sf_dir)
    totals = dict(
        out.groupBy("split").agg(F.sum("n_docs").alias("n")).collect()
    )
    n = sum(totals.values())
    assert set(totals) == {"train", "val", "test"}
    assert abs(totals["train"] / n - 0.80) < 0.06
    assert abs(totals["val"] / n - 0.10) < 0.06
    assert abs(totals["test"] / n - 0.10) < 0.06


def test_percentile_filter_trims_tails(spark, sf_dir):
    """The kept per-language band must be a strict subset of the raw
    min/max range whenever the language has enough docs to trim."""
    from flightdb_spark.queries.textops import _docs

    docs = _docs(spark, sf_dir)
    raw = {
        r["lang"]: (r["lo"], r["hi"], r["n"])
        for r in docs.groupBy("lang")
        .agg(
            F.min("n_chars").alias("lo"),
            F.max("n_chars").alias("hi"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    out = REGISTRY["q65_percentile_filter"].fn(spark, sf_dir)
    for r in out.collect():
        lo, hi, n = raw[r["lang"]]
        assert r["n_kept"] <= n
        assert r["min_chars"] >= lo and r["max_chars"] <= hi
        if n >= 40:  # enough mass for both tails to be non-empty
            assert r["n_kept"] < n


def test_bm25_scores_positive_and_ranked(spark, sf_dir):
    out = REGISTRY["q66_bm25_topk"].fn(spark, sf_dir).orderBy("rk").collect()
    assert 0 < len(out) <= 20
    scores = [r["bm25"] for r in out]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)


def test_label_centroids_bounded(spark, sf_dir):
    """Centroid of unit-range synthetic embeddings stays within the
    min/max envelope of the member vectors per (label, dim)."""
    from flightdb_spark.queries.vector import _emb

    e = _emb(spark, sf_dir)
    env = (
        e.select("label", F.posexplode("v").alias("pos", "val"))
        .withColumn("dim", F.col("pos") + 1)
        .filter(F.col("dim") <= 8)
        .groupBy("label", "dim")
        .agg(F.min("val").alias("lo"), F.max("val").alias("hi"))
    )
    out = REGISTRY["q67_label_centroids"].fn(spark, sf_dir)
    joined = out.join(env, ["label", "dim"])
    bad = joined.filter(
        (F.col("centroid_val") < F.col("lo") - 1e-6)
        | (F.col("centroid_val") > F.col("hi") + 1e-6)
    )
    assert bad.count() == 0


def test_kmeans_recovers_planted_clusters(spark):
    """Lloyd's loop on three well-separated planted clusters: every
    member lands with its plant-mates, centroids converge to the plant
    means, and the loop exits before max_iters."""
    from flightdb_spark.operators.vectors import kmeans

    # 60 vectors in R^4: 3 groups of 20 around corners spaced 10 apart,
    # deterministic jitter in [-0.5, 0.5)
    df = spark.range(60).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(0, 3), d -> "
            "  cast(10 * (id div 20) * (case when d = 0 then 1 else 0 end) "
            "  + 10 * (id div 20) * (case when d = 1 then 1 else 0 end) "
            "  + (pmod(id * 37 + d * 11, 100) / 100.0 - 0.5) as double))"
        ).alias("v"),
    )
    assigned, cents = kmeans(df, 3, max_iters=10)
    rows = assigned.collect()
    # purity: group by planted cluster (vec_id div 20); each planted
    # group maps to exactly one learned cluster, and the three differ
    by_plant = {}
    for r in rows:
        by_plant.setdefault(r["vec_id"] // 20, set()).add(r["cluster"])
    assert all(len(v) == 1 for v in by_plant.values())
    assert len({next(iter(v)) for v in by_plant.values()}) == 3
    # centroids: first two coords near 0/10/20, jitter mean ~0
    got = sorted(round(r["cv"][0]) for r in cents.collect())
    assert got == [0, 10, 20]
