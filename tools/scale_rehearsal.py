"""Scale rehearsal: synthesize an sf1 dataset (10x sf0.1) and time the
bench headline set on it, to catch NONLINEAR blowups the per-round
sf0.1 bench cannot reveal (pair-generation families — q51/q91/q225 —
can pass at sf0.1 and explode quadratically one decade up).

sf1 is derived from the read-only driver testdata by deterministic
key-shifted replication (copy k of 10 shifts every surrogate key by
k * span, preserving all FK relationships), written to a scratch dir.
Document texts get a per-copy tag token appended so replicas are
near-duplicates (realistic dedup pressure) instead of 10 exact copies
of every doc; embeddings perturb one dimension per copy. Events shift
user_id and event_id but keep the time axis (10x concurrency per hour —
the realistic stress for sessionization/windows).

Output: SCALE_REHEARSAL.json at the repo root —
  {query: {"sf01_sec", "sf1_sec", "ratio"}} + flagged list (ratio > 10,
  i.e. worse than linear in rows).

THIS IS A GATE (r7 VERDICT item 1): the default invocation rehearses
EVERY bench headliner that is missing from the artifact or recorded as
an error, running batches in FRESH SUBPROCESSES (one SparkSession per
batch — r7's only rehearsal error was session resource contention
after ~120 queries x 2 SFs in one JVM), retries any errored row once
standalone, and exits NONZERO if any headliner still lacks a clean
ratio. A crashed rehearsal can no longer ship as a green gate.

Usage:
  python tools/scale_rehearsal.py              # gate mode: fill + verify all headliners
  python tools/scale_rehearsal.py --all        # gate mode, re-run everything from scratch
  python tools/scale_rehearsal.py --queries q51_dedup_clusters,...   # child: run just these in-process
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARTIFACT = os.path.join(REPO, "SCALE_REHEARSAL.json")
SRC = "/root/testdata/sf0.1"
DST = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/sfscale/sf1")
COPIES = 10
BATCH = 30  # queries per subprocess (fresh SparkSession per batch)

# Key spans chosen >= max key in sf0.1 so shifted copies never collide.
SPANS = {
    "orderkey": 10_000_000,
    "custkey": 1_000_000,
    "partkey": 1_000_000,
    "suppkey": 100_000,
    "event_id": 10_000_000,
    "user_id": 1_000_000,
    "doc_id": 1_000_000,
    "vec_id": 1_000_000,
}


def _gen_sql(table: str, k: int) -> str:
    src = f"read_parquet('{SRC}/{table}.parquet')"
    if table == "lineitem":
        return f"""SELECT l_orderkey + {k * SPANS['orderkey']} AS l_orderkey,
            l_partkey + {k * SPANS['partkey']} AS l_partkey,
            l_suppkey + {k * SPANS['suppkey']} AS l_suppkey,
            l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
            l_returnflag, l_linestatus, l_shipdate FROM {src}"""
    if table == "orders":
        return f"""SELECT o_orderkey + {k * SPANS['orderkey']} AS o_orderkey,
            o_custkey + {k * SPANS['custkey']} AS o_custkey,
            o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM {src}"""
    if table == "customer":
        return f"""SELECT c_custkey + {k * SPANS['custkey']} AS c_custkey,
            c_name || '_{k}' AS c_name, c_nationkey, c_acctbal, c_mktsegment
            FROM {src}"""
    if table == "part":
        return f"""SELECT p_partkey + {k * SPANS['partkey']} AS p_partkey,
            p_name, p_brand, p_type, p_size, p_retailprice FROM {src}"""
    if table == "supplier":
        return f"""SELECT s_suppkey + {k * SPANS['suppkey']} AS s_suppkey,
            s_name || '_{k}' AS s_name, s_nationkey, s_acctbal FROM {src}"""
    if table == "events":
        return f"""SELECT event_id + {k * SPANS['event_id']} AS event_id, ts,
            user_id + {k * SPANS['user_id']} AS user_id, event_type, value,
            props FROM {src}"""
    if table == "documents":
        # per-copy tag token: replicas become near-duplicates (high but
        # not perfect Jaccard) — realistic dedup pressure at 10x
        return f"""SELECT doc_id + {k * SPANS['doc_id']} AS doc_id,
            text || ' rep{k}tag' AS text, lang, source,
            n_chars + {len(f' rep{k}tag')} AS n_chars FROM {src}"""
    if table == "embeddings":
        return f"""SELECT vec_id + {k * SPANS['vec_id']} AS vec_id,
            list_transform(embedding,
              x -> CAST(x + {k} * 0.001 AS FLOAT)) AS embedding,
            label FROM {src}"""
    # dims (region, nation) stay as-is
    return f"SELECT * FROM {src}"


def generate() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    tables = [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]
    for t in tables:
        out = f"{DST}/{t}.parquet"
        if os.path.exists(out):
            continue
        if t in ("region", "nation"):
            q = _gen_sql(t, 0)
        else:
            q = " UNION ALL ".join(_gen_sql(t, k) for k in range(COPIES))
        con.execute(f"COPY ({q}) TO '{out}' (FORMAT PARQUET)")
        n = con.sql(f"SELECT COUNT(*) FROM read_parquet('{out}')").fetchone()[0]
        print(f"# generated {t}: {n} rows", file=sys.stderr)


def _load_artifact() -> dict:
    out = {"copies": COPIES, "flagged_over_10x": [], "queries": {}}
    if os.path.exists(ARTIFACT):
        with open(ARTIFACT) as fh:
            out.update(json.load(fh))
    return out


def _save_artifact(out: dict) -> None:
    with open(ARTIFACT, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)


def run_child(names: list[str]) -> None:
    """Run the named queries in-process (ONE SparkSession) and merge
    results into the artifact. Called per-batch by gate mode so each
    batch gets a fresh JVM."""
    from flightdb_spark.queries import load_registry
    from flightdb_spark.session import get_spark
    from flightdb_spark.tables import load_table

    registry = load_registry()
    spark = get_spark("scale_rehearsal")
    for t in ("lineitem", "orders", "events", "documents", "embeddings"):
        load_table(spark, SRC, t).count()
        load_table(spark, DST, t).count()

    results: dict[str, dict] = {}
    flagged: list[str] = []
    for name in names:
        qd = registry.get(name)
        if qd is None:
            continue
        row: dict = {}
        for label, d in (("sf01_sec", SRC), ("sf1_sec", DST)):
            t0 = time.time()
            try:
                qd.fn(spark, d).count()
                row[label] = round(time.time() - t0, 3)
            except Exception as exc:  # noqa: BLE001
                row[label] = None
                row["err"] = str(exc).split("\n", 1)[0][:200]
                break
        if row.get("sf01_sec") and row.get("sf1_sec"):
            row["ratio"] = round(row["sf1_sec"] / row["sf01_sec"], 2)
            if row["ratio"] > 10:
                flagged.append(name)
        results[name] = row
        print(f"# {name}: {row}", file=sys.stderr)
        # Same inter-query isolation as bench.py: drop the
        # localCheckpoint blocks this query pinned (queries rebuild
        # their views per call) so one query's materialized state
        # doesn't skew the next ratios within the 30-query batch.
        try:
            for prdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                prdd.unpersist()
            spark.catalog.clearCache()
        except Exception as exc:  # noqa: BLE001
            print(f"# post-{name} release failed: {exc}", file=sys.stderr)

    # MERGE into the existing artifact: a batch run must not clobber
    # earlier rehearsal rows, flags, or plan notes.
    out = _load_artifact()
    out["queries"].update(results)
    out["flagged_over_10x"] = sorted(
        set(out["flagged_over_10x"]) - set(results) | set(flagged)
    )
    _save_artifact(out)
    print(f"# batch done: {len(results)} queries, {len(flagged)} over 10x")


def _spawn(names: list[str]) -> int:
    """One batch = one subprocess = one fresh SparkSession/JVM."""
    cmd = [sys.executable, os.path.abspath(__file__), "--queries", ",".join(names)]
    return subprocess.run(cmd, cwd=REPO).returncode


def run_gate(rerun_all: bool) -> int:
    """Fill the artifact for EVERY headliner, retry errors standalone,
    exit nonzero if any headliner still lacks a clean ratio."""
    from bench import HEADLINE

    art = _load_artifact()
    if rerun_all:
        pending = list(HEADLINE)
    else:
        pending = [
            n for n in HEADLINE
            if n not in art["queries"] or "err" in art["queries"][n]
        ]
    print(f"# gate: {len(pending)} of {len(HEADLINE)} headliners to rehearse")

    for i in range(0, len(pending), BATCH):
        batch = pending[i : i + BATCH]
        print(f"# batch {i // BATCH + 1}: {len(batch)} queries")
        rc = _spawn(batch)
        if rc != 0:
            print(f"# batch subprocess exited {rc}; rows it completed are merged",
                  file=sys.stderr)

    # retry every errored row ONCE, standalone (one query per JVM):
    # r7's only error was session contention, which a solo run clears.
    art = _load_artifact()
    errs = [n for n in HEADLINE
            if n not in art["queries"] or "err" in art["queries"][n]]
    for n in errs:
        print(f"# standalone retry: {n}")
        _spawn([n])

    # final verdict
    art = _load_artifact()
    bad = [n for n in HEADLINE
           if n not in art["queries"] or "err" in art["queries"][n]]
    flagged = [n for n in art["flagged_over_10x"] if n in set(HEADLINE)]
    noted = set(art.get("plan_notes", {}))
    unexplained = [n for n in flagged if n not in noted]
    print(f"# headliners: {len(HEADLINE)}; clean ratios: "
          f"{len(HEADLINE) - len(bad)}; errors/missing: {bad}")
    print(f"# flagged >10x: {flagged} (without plan note: {unexplained})")
    if bad:
        print("SCALE_REHEARSAL GATE: FAIL (errored/missing headliners)")
        return 1
    if unexplained:
        print("SCALE_REHEARSAL GATE: FAIL (flagged >10x without a plan note "
              "in SCALE_REHEARSAL.json plan_notes)")
        return 1
    print("SCALE_REHEARSAL GATE: PASS")
    return 0


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--queries":
        generate()
        run_child(sys.argv[2].split(","))
        sys.exit(0)
    generate()
    sys.exit(run_gate(rerun_all="--all" in sys.argv[1:]))
