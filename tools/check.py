"""Local mimic of the driver's t2 correctness gate.

Runs every registered query on Spark AND its DuckDB oracle over the same
parquet tables, then compares row count, column names, and an
order-insensitive canonical value hash (rows sorted, columns sorted by
name). Reports exact-match / value-drift per query so float-precision
issues surface locally before the driver sees them.

Usage: python tools/check.py [sf_dir] [query_name ...]

A FULL run (no query filter) also writes CORRECTNESS_LOCAL.json at the
repo root — one row per registered query with the same fields as the
driver's CORRECTNESS_r{N}.json (rows/schema/hash match + counts), so
every round ships a machine-readable full-registry correctness artifact
(the driver itself samples only the first 50).
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

from flightdb_spark.queries import load_registry
from flightdb_spark.session import get_spark
from flightdb_spark.tables import TABLE_NAMES


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: timestamps -> iso strings, floats -> repr
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            s = s.astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(s):
            s = s.map(lambda v: repr(float(v)) if pd.notna(v) else "NaN")
        elif pd.api.types.is_integer_dtype(s):
            s = s.astype("int64")
        out[c] = s
    res = pd.DataFrame(out)
    res = res.sort_values(by=list(res.columns), kind="mergesort").reset_index(drop=True)
    return res


def value_hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for _, row in df.iterrows():
        h.update("|".join(str(v) for v in row).encode())
    return h.hexdigest()[:16]


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--merge"]
    merge = "--merge" in sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    only = set(args[1:]) if len(args) > 1 else (set(args) if args and not os.path.isdir(args[0]) else None)

    registry = load_registry()
    spark = get_spark("check")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    n_pass = n_fail = n_rows_only = 0
    results: dict[str, dict] = {}
    for name, qd in sorted(registry.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = qd.fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            results[name] = {"rows_match": False, "schema_match": False,
                             "hash_match": False, "spark_rows": None,
                             "oracle_rows": None, "err": f"spark: {e}"[:300]}
            n_fail += 1
            continue
        if qd.oracle is None:
            print(f"ROWS  {name}: {len(sdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            results[name] = {"rows_match": None, "schema_match": None,
                             "hash_match": None, "spark_rows": len(sdf),
                             "oracle_rows": None, "err": None,
                             "rows_only": True}
            n_rows_only += 1
            continue
        try:
            odf = con.execute(qd.oracle).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            results[name] = {"rows_match": False, "schema_match": False,
                             "hash_match": False, "spark_rows": len(sdf),
                             "oracle_rows": None, "err": f"duckdb: {e}"[:300]}
            n_fail += 1
            continue

        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} vs {len(odf)}")
        scols, ocols = sorted(sdf.columns), sorted(odf.columns)
        if scols != ocols:
            problems.append(f"cols {scols} vs {ocols}")
        if not problems:
            cs, co = canonicalize(sdf), canonicalize(odf)
            hs, ho = value_hash(cs), value_hash(co)
            if hs != ho:
                # locate first differing cell for diagnosis
                diff_note = "hash mismatch"
                try:
                    neq = (cs != co) & ~(cs.isna() & co.isna())
                    loc = neq.stack()
                    loc = loc[loc]
                    if len(loc):
                        (i, c) = loc.index[0]
                        diff_note += f"; first diff row{i} col={c}: {cs.at[i, c]!r} vs {co.at[i, c]!r} ({int(neq.values.sum())} cells)"
                except Exception as e:  # noqa: BLE001
                    diff_note += f" (diff locate failed: {e})"
                problems.append(diff_note)
        results[name] = {
            "rows_match": len(sdf) == len(odf),
            "schema_match": scols == ocols,
            "hash_match": not problems,
            "spark_rows": len(sdf),
            "oracle_rows": len(odf),
            "err": "; ".join(problems) if problems else None,
        }
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)} [{time.time()-t0:.1f}s]")
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(sdf)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    if only and merge:
        # Delta mode: fold the filtered results into the existing
        # full-registry artifact (counts recomputed from the union).
        artifact = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "CORRECTNESS_LOCAL.json",
        )
        import json

        with open(artifact) as fh:
            prior = json.load(fh)
        if prior.get("sf_dir") and prior["sf_dir"] != sf_dir:
            print(
                f"REFUSED merge: delta ran at {sf_dir} but {artifact} "
                f"records {prior['sf_dir']} — rerun the delta at the "
                "artifact's scale (or do a full run to rebase)"
            )
            return 1
        prior["queries"].update(results)
        qs = prior["queries"]
        prior["n_rows_only"] = sum(1 for v in qs.values() if v.get("rows_only"))
        prior["n_fail"] = sum(
            1 for v in qs.values()
            if not v.get("rows_only") and not v.get("hash_match")
        )
        prior["n_pass"] = len(qs) - prior["n_fail"] - prior["n_rows_only"]
        with open(artifact, "w") as fh:
            json.dump(prior, fh, indent=1, sort_keys=True)
        print(f"merged {len(results)} results into {artifact}")
    if not only:
        artifact = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "CORRECTNESS_LOCAL.json",
        )
        import json

        with open(artifact, "w") as fh:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "n_pass": n_pass,
                    "n_fail": n_fail,
                    "n_rows_only": n_rows_only,
                    "queries": results,
                },
                fh,
                indent=1,
                sort_keys=True,
            )
        print(f"wrote {artifact}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
