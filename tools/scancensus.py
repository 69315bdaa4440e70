"""Registry-wide physical-plan census: for every registered query,
count FileScan/Exchange/Join/Python-boundary nodes in the optimized
plan at a small SF and write one TSV row per query.

The scan count is the systematic detector for the round-9 P3 pattern
(a corpus CTE re-expanded per reference under Catalyst inlining): a
query whose minimum is one pass per base table but whose plan holds
N scans of the same table is a re-expansion candidate, found without
timing anything (guide section 1: measure the plan, then the clock).

Usage: python tools/scancensus.py [sf_dir] [out_tsv] [startswith ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flightdb_spark.queries import load_registry
from flightdb_spark.session import get_spark
from tools.planlint import lazy_checkpoints


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    out = args[1] if len(args) > 1 else "/tmp/scancensus.tsv"
    prefixes = tuple(args[2:])

    spark = get_spark()
    registry = load_registry()
    rows = []
    for name, q in sorted(registry.items()):
        if prefixes and not name.startswith(prefixes):
            continue
        try:
            # lazy checkpoints: census the plan shapes without running
            # every staging job (see tools/planlint.lazy_checkpoints)
            with lazy_checkpoints():
                df = q.fn(spark, sf_dir)
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
        except Exception as e:  # noqa: BLE001 - census must not die mid-sweep
            rows.append((name, -1, -1, -1, -1, -1, f"ERR:{type(e).__name__}"))
            continue
        # formatted plans put the table path on a separate Location line
        tables = re.findall(r"Location:[^\n]*?([a-z_0-9]+)\.parquet", plan)
        per_table: dict[str, int] = {}
        for t in tables:
            per_table[t] = per_table.get(t, 0) + 1
        n_scan = plan.count("Scan parquet")
        n_exch = plan.count("Exchange")
        n_smj = plan.count("SortMergeJoin")
        n_py = (
            plan.count("BatchEvalPython")
            + plan.count("ArrowEvalPython")
            + plan.count("FlatMapGroupsInPandas")
            + plan.count("PythonMapInArrow")
            + plan.count("MapInPandas")
        )
        max_dup = max(per_table.values(), default=0)
        detail = ",".join(f"{t}:{c}" for t, c in sorted(per_table.items()))
        rows.append((name, n_scan, max_dup, n_exch, n_smj, n_py, detail))
        # release any per-query checkpoint blocks (bench.py discipline)
        try:
            for (_id, rdd) in spark.sparkContext._jsc.getPersistentRDDs().items():
                rdd.unpersist()
            spark.catalog.clearCache()
        except Exception:  # noqa: BLE001
            pass

    with open(out, "w") as f:
        f.write("query\tscans\tmax_dup_scan\texchanges\tsmj\tpy\tdetail\n")
        for r in rows:
            f.write("\t".join(str(x) for x in r) + "\n")
    print(f"wrote {len(rows)} rows to {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
