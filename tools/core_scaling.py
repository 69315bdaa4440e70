"""sf1 core-scaling rehearsal (r9 VERDICT item 1): local[8] vs
local[32] per query at sf1, FRESH JVM per (query, core-count) run.

The r9 round's regressive keeps (q751/q762/q312) and its 40-family
restaging were defended as "wins at 100 TB", but every driver artifact
is sf0.1 where the whole 292-query suite ran *faster* on 8 cores than
32 (402.7 s vs 411.5 s — per-query fixed cost dominates and cores
cannot show). This tool produces the missing evidence: per-query
8-core/32-core wall ratios at sf1 (10x rows via the deterministic
key-shifted replication from tools/scale_rehearsal.py), where compute
is large enough for parallelism to be measurable.

ratio = c8_sec / c32_sec. 1.0 = pure fixed cost; 4.0 = ideal scaling.
A restaged query with ratio >= ~2 where untouched controls sit near 1
validates the structural claims; a kept regression with ratio ~1 at
sf1 refutes its keep.

Usage:
  python tools/core_scaling.py             # full panel -> CORE_SCALING_SF1.json
  python tools/core_scaling.py --one QNAME --cpus N   # child: one query, prints JSON
  python tools/core_scaling.py --queries a,b,c        # restrict the panel
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARTIFACT = os.path.join(REPO, "CORE_SCALING_SF1.json")
SF1_DIR = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/sfscale/sf1")
REPS = 2  # per (query, cores): take the min (cuts scheduler noise)

# Top r9-close bench queries (BENCH_LOCAL.json order) + the three kept
# regressions (q751/q762/q312) + controls untouched by the r9 round
# (q187/q92/q637/q516/q629 — plus q86/q93/q310 which were examined and
# deliberately left unchanged, serving as measured controls too).
PANEL = [
    "q749_user_recommendation",
    "q91_prefix_jaccard_join",
    "q819_attack_percolation",
    "q872_composite_scores",
    "q51_dedup_clusters",
    "q229_spearman",
    "q191_pca_power_iteration",
    "q312_hits_authorities",
    "q217_python_datasource",
    "q93_triangle_count",
    "q762_hedonic_index",
    "q387_label_propagation",
    "q267_item_similarity_topk",
    "q86_pagerank",
    "q259_bounded_sssp",
    "q48_lsh_near_dup",
    "q81_dup_spans",
    "q224_trajectory_clusters",
    "q107_simhash_hamming_pairs",
    "q198_bfs_hops",
    "q310_clustering_coefficient",
    "q728_irv_rounds",
    "q99_split_leakage",
    "q571_bitemporal_snapshot",
    "q223_theil_sen",
    "q90_audio_energy",
    "q109_minhash_jaccard_est",
    "q797_stable_matching",
    "q582_maximal_frequent_pairs",
    "q481_dawid_skene_quality",
    # kept regression not already above
    "q751_bullwhip_index",
    # untouched controls
    "q187_resample_interpolate",
    "q92_resample_ffill",
    "q637_systematic_sample",
    "q516_hierarchy_depths",
    "q629_depth2_tree",
]

CONTROLS = {
    "q187_resample_interpolate", "q92_resample_ffill",
    "q637_systematic_sample", "q516_hierarchy_depths", "q629_depth2_tree",
    "q86_pagerank", "q93_triangle_count", "q310_clustering_coefficient",
}


def run_one(name: str, cpus: int) -> None:
    """Child: one query at sf1 on local[cpus], fresh JVM (this
    process). Same methodology as bench.py: table + codegen warmup,
    then time the count() action; REPS reps, min reported."""
    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    from flightdb_spark.queries import load_registry
    from flightdb_spark.session import get_spark
    from flightdb_spark.tables import load_table

    registry = load_registry()
    spark = get_spark(f"core_scaling_{name}_{cpus}")
    for t in ("lineitem", "orders", "events", "documents", "embeddings"):
        try:
            load_table(spark, SF1_DIR, t).count()
        except Exception as exc:  # noqa: BLE001
            print(f"# warmup {t} failed: {exc}", file=sys.stderr)
    from pyspark.sql import Window as _W
    from pyspark.sql import functions as _F

    rng = spark.range(10000).select((_F.col("id") % 7).alias("k"), _F.col("id").alias("v"))
    rng.groupBy("k").agg(_F.sum("v"), _F.avg("v"), _F.count("*")).count()
    rng.withColumn("lagv", _F.lag("v").over(_W.partitionBy("k").orderBy("v"))).count()
    rng.join(_F.broadcast(spark.range(7).select(_F.col("id").alias("k"))), "k").count()

    qd = registry.get(name)
    if qd is None:
        print(json.dumps({"err": "not found"}))
        return
    times = []
    try:
        for _ in range(REPS):
            t0 = time.time()
            qd.fn(spark, SF1_DIR).count()
            times.append(round(time.time() - t0, 3))
            for prdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                prdd.unpersist()
            spark.catalog.clearCache()
    except Exception as exc:  # noqa: BLE001
        print(json.dumps({"err": str(exc).split("\n", 1)[0][:200], "times": times}))
        return
    print(json.dumps({"sec": min(times), "times": times}))


def main() -> int:
    args = sys.argv[1:]
    if "--one" in args:
        name = args[args.index("--one") + 1]
        cpus = int(args[args.index("--cpus") + 1])
        run_one(name, cpus)
        return 0

    panel = list(PANEL)
    if "--queries" in args:
        panel = args[args.index("--queries") + 1].split(",")

    # ensure the sf1 fixture exists (deterministic, reused across rounds)
    from tools import scale_rehearsal

    scale_rehearsal.generate()

    out: dict = {"sf1_dir": SF1_DIR, "reps": REPS, "queries": {}}
    if os.path.exists(ARTIFACT):
        with open(ARTIFACT) as fh:
            out.update(json.load(fh))
    for name in panel:
        row = out["queries"].get(name, {})
        for cpus, key in ((8, "c8_sec"), (32, "c32_sec")):
            if row.get(key):
                continue
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--one", name, "--cpus", str(cpus)]
            env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
            t0 = time.time()
            try:
                proc = subprocess.run(
                    cmd, capture_output=True, text=True, timeout=1800, env=env
                )
                last = proc.stdout.strip().split("\n")[-1]
                res = json.loads(last)
            except Exception as exc:  # noqa: BLE001
                res = {"err": f"{type(exc).__name__}: {exc}"[:200]}
            if "sec" in res:
                row[key] = res["sec"]
            else:
                row.setdefault("err", {})[key] = res.get("err", "?")
            print(f"# {name} cpus={cpus}: {res} "
                  f"(wall {time.time() - t0:.0f}s)", file=sys.stderr)
        if row.get("c8_sec") and row.get("c32_sec"):
            row["ratio"] = round(row["c8_sec"] / row["c32_sec"], 2)
        row["control"] = name in CONTROLS
        out["queries"][name] = row
        with open(ARTIFACT, "w") as fh:
            json.dump(out, fh, indent=1, sort_keys=True)
    done = [r for r in out["queries"].values() if "ratio" in r]
    print(f"# {len(done)} queries with ratios -> {ARTIFACT}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
