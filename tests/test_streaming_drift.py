"""Streaming PSI drift monitor: frozen reference bins, per-micro-batch
scoring through the exactly-once sink, drifted batches alarm higher."""

from pyspark.sql import functions as F

from flightdb_spark.streaming.drift import PsiDriftMonitor
from flightdb_spark.tables import load_table


def test_batch_score_matches_q128_shape(spark, sf_dir):
    """Scoring the q128 'current' window against the q128 'reference'
    window with the monitor must reproduce the q128 PSI value."""
    from flightdb_spark.queries import load_registry

    reg = load_registry()
    ev = load_table(spark, sf_dir, "events")
    split = F.lit("2024-01-16 00:00:00").cast("timestamp")
    mon = PsiDriftMonitor(n_bins=10).fit(ev.filter(F.col("ts") < split))
    n, psi = mon.score(ev.filter(F.col("ts") >= split))
    q128 = reg["q128_psi_drift"].fn(spark, sf_dir).collect()[0]
    assert abs(psi - q128["psi"]) < 1e-4
    assert n == ev.filter(F.col("ts") >= split).count()


def test_stream_monitor_flags_drifted_batch(spark, sf_dir, tmp_path):
    """Two files -> two micro-batches: one drawn from the reference
    distribution, one value-shifted. The shifted batch's PSI must be
    decisively higher, and redelivery must not duplicate score rows."""
    ev = load_table(spark, sf_dir, "events").select("value")
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "scores")

    # batch 0: same distribution; batch 1: shifted by 3x
    ev.limit(400).coalesce(1).write.mode("append").parquet(src)
    ev.limit(400).select((F.col("value") * 3).alias("value")).coalesce(
        1
    ).write.mode("append").parquet(src)

    mon = PsiDriftMonitor(n_bins=10).fit(ev)
    q = (
        spark.readStream.schema("value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(mon.foreach_batch(out))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    scores = {
        r["batch_id"]: r
        for r in PsiDriftMonitor.read_scores(spark, out).collect()
    }
    assert len(scores) == 2
    psis = sorted(r["psi"] for r in scores.values())
    assert psis[0] < 0.1 < psis[1], psis  # stable vs actionable drift
    for r in scores.values():
        assert r["n_rows"] == 400

    # redelivery of an already-committed batch id is a no-op
    fn = mon.foreach_batch(out)
    fn(ev.limit(10), min(scores))
    assert len(PsiDriftMonitor.read_scores(spark, out).collect()) == 2
