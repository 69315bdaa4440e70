"""Semantic checks for the analytics batch 7 (q182-q188), beyond the
DuckDB parity gate."""

from pyspark.sql import functions as F

from flightdb_spark.queries import load_registry
from flightdb_spark.tables import load_table

REGISTRY = load_registry()


def test_order_count_distribution_accounts_every_customer(spark, sf_dir):
    """Q13: the distribution's customer total equals |customer| — the
    left join must keep zero-order customers."""
    out = REGISTRY["q182_order_count_distribution"].fn(spark, sf_dir)
    total = out.agg(F.sum("custdist")).collect()[0][0]
    n_cust = load_table(spark, sf_dir, "customer").count()
    assert total == n_cust
    # the exclusion filter guarantees some zero-order bucket members
    # only if some customer has exclusively urgent orders OR no orders;
    # at minimum the c_count=0 bucket must be a valid (possibly absent)
    # row and all counts non-negative
    for r in out.collect():
        assert r["c_count"] >= 0 and r["custdist"] > 0


def test_top_supplier_is_argmax(spark, sf_dir):
    out = REGISTRY["q183_top_supplier"].fn(spark, sf_dir).collect()
    assert len(out) >= 1
    top = out[0]["total_revenue"]
    # every returned row carries the same (maximal) revenue
    assert all(r["total_revenue"] == top for r in out)


def test_group_ols_recovers_planted_line(spark):
    """A synthetic exact line y = 3x + 7 must come back with slope 3,
    intercept 7, r2 = 1."""
    import flightdb_spark.queries.analytics as A

    df = spark.range(0, 50).select(
        F.lit("t").alias("event_type"),
        F.timestamp_micros(
            (F.lit(A._T0_US) + F.col("id") * A._HOUR_US)
        ).alias("ts"),
        (F.col("id") * 3.0 + 7.0).alias("value"),
    )
    df.createOrReplaceTempView("_ols_line")
    pts = df.select(
        "event_type",
        F.expr(f"(unix_micros(ts) - {A._T0_US}) div {A._HOUR_US}").alias("x"),
        F.round("value", 6).alias("y"),
    )
    sums = pts.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y").cast("decimal(38,6)")).cast("double").alias("sy"),
        F.sum(F.round(F.col("x") * F.col("y"), 6).cast("decimal(38,6)"))
        .cast("double")
        .alias("sxy"),
    )
    r = sums.collect()[0]
    n, sx, sxx, sy, sxy = r["n"], r["sx"], r["sxx"], r["sy"], r["sxy"]
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert abs(slope - 3.0) < 1e-9
    assert abs((sy - slope * sx) / n - 7.0) < 1e-9


def test_l_diversity_bounds(spark, sf_dir):
    rows = REGISTRY["q185_l_diversity"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # l can't exceed group size, and there are only 5 segments
        assert 1 <= r["l"] <= 5
        assert r["min_group"] >= r["l"]
        assert r["n_rows"] >= r["n_groups"] * r["min_group"]


def test_trending_ranks_are_dense_per_day(spark, sf_dir):
    out = REGISTRY["q186_trending_ranks"].fn(spark, sf_dir)
    per_day = out.groupBy("day").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("rnk").alias("lo"),
        F.max("rnk").alias("hi"),
    )
    for r in per_day.collect():
        assert r["lo"] == 1 and r["hi"] == r["n"]  # row_number is dense
    # first day has no previous day -> all prev_rnk null there
    first_day = out.agg(F.min("day")).collect()[0][0]
    firsts = out.filter(F.col("day") == first_day).collect()
    assert all(r["prev_rnk"] is None for r in firsts)


def test_interpolation_brackets_and_hits_observations(spark, sf_dir):
    """Every interpolated value lies within [min(v0,v1), max(v0,v1)]
    of its user's observed value range, and a grid point that
    coincides with an observation reproduces it exactly."""
    import flightdb_spark.queries.analytics as A

    out = REGISTRY["q187_resample_interpolate"].fn(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    rng = ev.groupBy("user_id").agg(
        F.min(F.round("value", 6)).alias("vmin"),
        F.max(F.round("value", 6)).alias("vmax"),
    )
    bad = (
        out.join(rng, "user_id")
        .filter(
            (F.col("v_interp") < F.col("vmin") - 1e-9)
            | (F.col("v_interp") > F.col("vmax") + 1e-9)
        )
        .count()
    )
    assert bad == 0
    # exact-hit case: an observation on a grid hour must round-trip
    on_grid = (
        ev.select(
            "user_id",
            F.unix_micros("ts").alias("t"),
            F.round("value", 6).alias("v"),
        )
        .filter(F.col("t") % A._HOUR_US == 0)
        .groupBy("user_id", "t")
        .agg(F.max("v").alias("v"))
        .withColumn("h", F.expr(f"t div {A._HOUR_US}"))
    )
    mismatches = (
        on_grid.join(out, ["user_id", "h"])
        .filter(F.abs(F.col("v_interp") - F.col("v")) > 1e-9)
        .count()
    )
    assert mismatches == 0


def test_scene_cuts_consistency(spark, sf_dir):
    out = REGISTRY["q188_scene_cuts"].fn(spark, sf_dir).collect()
    assert out
    for r in out:
        # cuts = runs - 1, runs <= frames, longest run <= frames
        assert 0 <= r["n_cuts"] <= r["n_frames"] - 1
        assert 1 <= r["longest_run"] <= r["n_frames"]
        assert r["n_still_runs"] <= r["n_cuts"] + 1
        # a still run needs >= 2 frames
        if r["n_still_runs"] > 0:
            assert r["n_frames"] >= 2


def test_scene_cuts_planted_still(spark):
    """A video of one repeated frame has 0 cuts and longest_run =
    n_frames; a video of all-distinct frames has n_frames-1 cuts."""
    import flightdb_spark.queries.analytics as A
    from flightdb_spark.functions.arrays import index_sequence
    from pyspark.sql import Window

    frame = "x" * A._FRAME_CHARS
    distinct_text = "".join(
        chr(ord("a") + i) * A._FRAME_CHARS for i in range(5)
    )
    df = spark.createDataFrame(
        [(2, frame * 6), (5, distinct_text)], ["media_id", "text"]
    )
    frames = df.select(
        "media_id",
        F.explode(
            index_sequence(F.floor(F.length("text") / A._FRAME_CHARS))
        ).alias("g"),
        "text",
    ).select(
        "media_id",
        "g",
        F.md5(
            F.substring(
                F.col("text"), F.col("g") * A._FRAME_CHARS + 1, A._FRAME_CHARS
            )
        ).alias("fh"),
    )
    w_lag = Window.partitionBy("media_id").orderBy("g")
    w_run = w_lag.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    chg = F.when(F.col("fh") == F.lag("fh").over(w_lag), 0).otherwise(1)
    runs = frames.withColumn("run_id", F.sum(chg).over(w_run))
    agg = (
        runs.groupBy("media_id", "run_id")
        .count()
        .groupBy("media_id")
        .agg(
            F.sum("count").alias("n_frames"),
            (F.count(F.lit(1)) - 1).alias("n_cuts"),
            F.max("count").alias("longest_run"),
        )
    )
    res = {r["media_id"]: r for r in agg.collect()}
    assert res[2]["n_cuts"] == 0 and res[2]["longest_run"] == 6
    assert res[5]["n_cuts"] == 4 and res[5]["longest_run"] == 1


def test_ivm_identity_holds(spark, sf_dir):
    """The four delta-join terms must reassemble the direct join
    exactly — rows and revenue."""
    rows = {r["term"]: r for r in REGISTRY["q189_ivm_delta_join"].fn(spark, sf_dir).collect()}
    assert rows["assembled"]["n_rows"] == rows["direct"]["n_rows"]
    assert abs(rows["assembled"]["revenue"] - rows["direct"]["revenue"]) < 1e-6
    term_sum = sum(
        rows[t]["n_rows"]
        for t in ("base_base", "base_delta", "delta_base", "delta_delta")
    )
    assert term_sum == rows["direct"]["n_rows"]


def test_prediction_interval_ordering(spark, sf_dir):
    for r in REGISTRY["q190_prediction_intervals"].fn(spark, sf_dir).collect():
        assert r["r_lo"] <= r["r_med"] <= r["r_hi"]
        assert r["n"] > 0


def test_pca_loading_is_unit_and_dominant(spark, sf_dir):
    rows = REGISTRY["q191_pca_power_iteration"].fn(spark, sf_dir).collect()
    assert len(rows) == 64
    norm2 = sum(r["loading"] ** 2 for r in rows)
    assert abs(norm2 - 1.0) < 1e-6
    lam = rows[0]["eigenvalue"]
    ratio = rows[0]["explained_ratio"]
    assert lam > 0
    # the top eigenvalue can't explain more than the whole trace and
    # must beat the average dimension's share (1/64)
    assert 1.0 / 64 < ratio <= 1.0


def test_pca_recovers_planted_direction(spark):
    """Embeddings = strong variance along a planted axis + tiny noise:
    the dominant loading must concentrate on that axis."""
    import numpy as np
    from flightdb_spark.queries.analytics import q191_pca_power_iteration
    import pandas as pd, tempfile, os

    rng = np.random.RandomState(7)
    n, d = 200, 64
    base = rng.normal(0, 0.01, size=(n, d))
    base[:, 5] += np.linspace(-3, 3, n)  # dominant variance on dim 5
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(n),
            "embedding": [row.astype("float32") for row in base],
            "label": np.zeros(n, dtype="int32"),
        }
    )
    with tempfile.TemporaryDirectory() as td:
        pdf.to_parquet(os.path.join(td, "embeddings.parquet"))
        rows = q191_pca_power_iteration(spark, td).collect()
    by_dim = {r["dim"]: r["loading"] for r in rows}
    dominant = max(by_dim, key=lambda k: abs(by_dim[k]))
    assert dominant == 5
    assert abs(by_dim[5]) > 0.99
