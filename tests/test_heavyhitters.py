"""Space-Saving heavy hitters: sketch guarantees, stream==batch, and
exactness at full capacity."""

import pandas as pd
from pyspark.sql import functions as F

from flightdb_spark.streaming.heavyhitters import (
    _topk,
    _update,
    heavy_hitters_stream,
    spacesaving_batch,
)
from flightdb_spark.tables import load_table


def test_sketch_guarantees_pure():
    """Items with count > n/capacity must be present; estimates are
    within the recorded error; exact at full capacity."""
    items = ["a"] * 50 + ["b"] * 30 + ["c"] * 5 + [f"x{i}" for i in range(20)]
    n, cap = len(items), 8
    sk = _update({}, items, cap)
    exact = pd.Series(items).value_counts()
    for it, true in exact.items():
        if true > n / cap:
            assert it in sk, it
    for it, (c, e) in sk.items():
        true = int(exact.get(it, 0))
        assert true <= c <= true + e

    exact_sk = _update({}, items, 1000)
    for it, (c, e) in exact_sk.items():
        assert c == int(exact.get(it, 0)) and e == 0


def test_batch_topk_exact_at_capacity(spark, sf_dir):
    """With capacity >= distinct items per group, the sketch's top-k
    equals the exact per-group top-k."""
    ev = load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("grp"), F.col("user_id").cast("string").alias("item")
    )
    got = spacesaving_batch(
        ev, grp_col="grp", item_col="item", capacity=10_000, k=3
    ).toPandas()
    exact = (
        ev.groupBy("grp", "item")
        .agg(F.count(F.lit(1)).alias("c"))
        .toPandas()
    )
    for grp, sub in got.groupby("grp"):
        ex = exact[exact.grp == grp].sort_values(
            ["c", "item"], ascending=[False, True]
        ).head(3)
        assert list(sub.sort_values(["est_count", "item"], ascending=[False, True])["item"]) == list(ex["item"])
        assert (sub["max_err"] == 0).all()


def test_stream_matches_single_pass(spark, tmp_path):
    """Two micro-batches through the stateful sketch equal one
    Space-Saving pass over the concatenation (same order)."""
    rows1 = [("en", f"t{i % 7}") for i in range(40)]
    rows2 = [("en", f"t{i % 13}") for i in range(40)]
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(rows1, "grp string, item string").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    spark.createDataFrame(rows2, "grp string, item string").coalesce(1).write.mode(
        "append"
    ).parquet(src)

    out = []
    q = (
        heavy_hitters_stream(
            spark.readStream.schema("grp string, item string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src),
            grp_col="grp",
            item_col="item",
            capacity=5,
            k=5,
        )
        .writeStream.outputMode("update")
        .foreachBatch(lambda df, bid: out.append((bid, df.toPandas())))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert len(out) == 2
    final = max(out)[1].sort_values("item").reset_index(drop=True)

    # the operator feeds each micro-batch to the sketch in item-sorted
    # order (no order_col given): replicate batch-by-batch
    ref = _update({}, sorted(i for _, i in rows1), 5)
    ref = _update(ref, sorted(i for _, i in rows2), 5)
    ref_rows = (
        pd.DataFrame(
            [(it, c, e) for it, (c, e) in ref.items()],
            columns=["item", "est_count", "max_err"],
        )
        .sort_values("item")
        .reset_index(drop=True)
    )
    got = final[["item", "est_count", "max_err"]]
    assert list(got.item) == list(ref_rows.item)
    assert list(got.est_count) == list(ref_rows.est_count)
