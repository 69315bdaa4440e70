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
  i.e. worse than linear in rows) — and a one-line summary in
  BENCH_LOCAL.json under "scale_rehearsal" when that file exists.

Usage: python tools/scale_rehearsal.py [--queries q51_dedup_clusters,...]
       (default: the bench HEADLINE set)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = "/root/testdata/sf0.1"
DST = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/sfscale/sf1")
COPIES = 10

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


def run(queries: list[str] | None) -> None:
    from bench import HEADLINE
    from flightdb_spark.queries import load_registry
    from flightdb_spark.session import get_spark
    from flightdb_spark.tables import load_table

    names = queries or HEADLINE
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

    # MERGE into the existing artifact: a --queries subset run must not
    # clobber earlier rehearsal rows, flags, or plan notes.
    path = os.path.join(REPO, "SCALE_REHEARSAL.json")
    out = {"copies": COPIES, "flagged_over_10x": [], "queries": {}}
    if os.path.exists(path):
        with open(path) as fh:
            out.update(json.load(fh))
    out["queries"].update(results)
    out["flagged_over_10x"] = sorted(
        set(out["flagged_over_10x"]) - set(results) | set(flagged)
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(f"wrote {path}; {len(flagged)} queries over 10x: {flagged}")


if __name__ == "__main__":
    only = None
    if len(sys.argv) > 2 and sys.argv[1] == "--queries":
        only = sys.argv[2].split(",")
    generate()
    run(only)
