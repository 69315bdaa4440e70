"""Check-digit / data-integrity batch 187 (q1002-q1006) — the classic
key-integrity codes every ingestion layer validates at the boundary:
Luhn (ISO/IEC 7812, payment cards), EAN-13 (GS1 barcodes), ISO 7064
mod 97-10 (IBAN), and Damm (quasigroup, 2004) — each computed over
FIXED-WIDTH digit payloads derived from the TPC-H surrogate keys, plus
a comparative error-detection sweep over a literal corruption grid.

Everything is exact integer arithmetic on digits of zero-padded
payloads: a fixed-width payload means every scheme unrolls to a flat
expression over SUBSTR(s, i, 1) digit extractions — no folds, no
Python, bit-identical across engines. The Damm scheme's quasigroup is
carried as a 100-character literal string indexed by state*10+digit
(the table from Damm's dissertation as popularized; totally
antisymmetric, so all single substitutions AND all adjacent
transpositions are detected — an invariant the tests pin).

- q1002 Luhn check digit over 9-digit order payloads: per-digit
  census + doubled-digit sum distribution;
- q1003 EAN-13 check digit over '30' + 10-digit part payloads,
  census by brand;
- q1004 ISO 7064 mod 97-10 check pair over 12-digit customer
  payloads: check-value census + the (n*100+c) % 97 == 1 identity
  asserted as a computed column;
- q1005 Damm check digit via 9 unrolled quasigroup lookups: census +
  adjacent-transposition detection (always caught — the scheme's
  defining property, verified on data);
- q1006 comparative detection power: single-digit substitutions and
  adjacent transpositions from a literal (position, delta) grid,
  detection rate per scheme — Luhn's known 09<->90 transposition
  blind spot emerges from the data.

100 TB shape: each query is ONE pass over its fact table with
map-side literal-grid crosses; every aggregate is a bounded census
(<= 100 groups). No joins between fact tables, no windows over facts.

Determinism: integer digit arithmetic end-to-end; terminal doubles
only for rates (same integer division in both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

# Damm's totally antisymmetric quasigroup on {0..9} (row = state,
# col = next digit) — the standard published table, as one string.
DAMM = (
    "0317598642"
    "7092154863"
    "4206871359"
    "1750983426"
    "6123045978"
    "3674209581"
    "5869720134"
    "8945362017"
    "9438617205"
    "2581436790"
)


def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        ensure_parallelism(load_table(spark, sf_dir, n)).createOrReplaceTempView(n)


def _digit(s: str, i: int) -> str:
    """1-indexed digit i of string expression s, as INT (both dialects)."""
    return f"CAST(SUBSTR({s}, {i}, 1) AS INT)"


def _luhn_sum(s: str, width: int) -> str:
    """Luhn weighted sum of a WIDTH-digit payload string expression,
    with the check digit appended at the right: counting from the
    right of the payload, positions 1,3,5,... are doubled (2d -> 2d-9
    when 2d > 9, i.e. d >= 5). Unrolled — width is a literal."""
    terms = []
    for i in range(1, width + 1):
        pos_from_right = width - i + 1
        d = _digit(s, i)
        if pos_from_right % 2 == 1:
            terms.append(f"(2 * {d} - CASE WHEN {d} >= 5 THEN 9 ELSE 0 END)")
        else:
            terms.append(d)
    return " + ".join(terms)


def _ean13_sum(s: str) -> str:
    """EAN-13 weighted sum of a 12-digit payload (positions 1..12 left
    to right weighted 1,3,1,3,...)."""
    terms = []
    for i in range(1, 13):
        w = 1 if i % 2 == 1 else 3
        terms.append(f"{w} * {_digit(s, i)}")
    return " + ".join(terms)


def _damm_state(s: str, width: int) -> str:
    """Final Damm quasigroup state after folding WIDTH digits of s:
    state_{k+1} = T[state_k][d_k], unrolled as nested SUBSTR lookups
    into the 100-char literal table."""
    state = "0"
    for i in range(1, width + 1):
        state = f"CAST(SUBSTR('{DAMM}', ({state}) * 10 + {_digit(s, i)} + 1, 1) AS INT)"
    return state


def _q1002_sql(d: str) -> str:
    pay = "LPAD(CAST(o_orderkey AS VARCHAR), 9, '0')"
    if d == "spark":
        pay = "LPAD(CAST(o_orderkey AS STRING), 9, '0')"
    return f"""
    WITH coded AS (
      SELECT o_orderkey,
             ({_luhn_sum("p.pay", 9)}) AS luhn_sum
      FROM (SELECT o_orderkey, {pay} AS pay FROM orders) p
    )
    SELECT CAST((10 - luhn_sum % 10) % 10 AS INT) AS check_digit,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(MIN(luhn_sum) AS INT) AS min_sum,
           CAST(MAX(luhn_sum) AS INT) AS max_sum,
           CAST(SUM(luhn_sum) AS BIGINT) AS total_sum
    FROM coded
    GROUP BY (10 - luhn_sum % 10) % 10
    ORDER BY check_digit
    """


@query("q1002_luhn_checkdigits", oracle=_q1002_sql("duckdb"))
def q1002_luhn_checkdigits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Luhn check digits over zero-padded 9-digit order payloads: the
    per-digit census with weighted-sum extremes. The doubling rule
    unrolls to a flat 9-term integer expression (fixed payload width),
    so one scan + a 10-group census is the whole plan."""
    _views(spark, sf_dir, "orders")
    return spark.sql(_q1002_sql("spark"))


def _q1003_sql(d: str) -> str:
    cast = "VARCHAR" if d != "spark" else "STRING"
    pay = f"'30' || LPAD(CAST(p_partkey AS {cast}), 10, '0')"
    return f"""
    WITH coded AS (
      SELECT p_brand, ({_ean13_sum("p.pay")}) AS wsum
      FROM (SELECT p_brand, {pay} AS pay FROM part) p
    )
    SELECT p_brand,
           CAST((10 - wsum % 10) % 10 AS INT) AS check_digit,
           CAST(COUNT(*) AS BIGINT) AS n_parts
    FROM coded
    GROUP BY p_brand, (10 - wsum % 10) % 10
    ORDER BY p_brand, check_digit
    """


@query("q1003_ean13_checkdigits", oracle=_q1003_sql("duckdb"))
def q1003_ean13_checkdigits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EAN-13 check digits for GS1-style article numbers ('30' prefix +
    10-digit part payload): check-digit census by brand — the
    barcode-integrity profile of the catalog. One scan, 50-group
    census."""
    _views(spark, sf_dir, "part")
    return spark.sql(_q1003_sql("spark"))


def _q1004_sql(d: str) -> str:
    return """
    WITH coded AS (
      SELECT c_custkey,
             CAST(c_custkey AS BIGINT) * 1000003 + 7 AS payload
      FROM customer
    ),
    checked AS (
      SELECT c_custkey, payload,
             CAST(98 - (payload * 100) % 97 AS INT) AS check_pair
      FROM coded
    )
    SELECT check_pair,
           CAST(COUNT(*) AS BIGINT) AS n_accounts,
           CAST(SUM(CASE WHEN (payload * 100 + check_pair) % 97 = 1
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_identity_ok
    FROM checked
    GROUP BY check_pair
    ORDER BY check_pair
    """


@query("q1004_mod97_checkpairs", oracle=_q1004_sql("duckdb"))
def q1004_mod97_checkpairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ISO 7064 mod 97-10 (IBAN-style) two-digit check pairs over
    account payloads derived from customer keys: check-value census
    with the defining identity (payload*100 + check) % 97 == 1
    verified as a column (n_identity_ok must equal n_accounts —
    pinned in tests). Pure bigint arithmetic, one scan, 97 groups."""
    _views(spark, sf_dir, "customer")
    return spark.sql(_q1004_sql("spark"))


def _q1005_sql(d: str) -> str:
    cast = "VARCHAR" if d != "spark" else "STRING"
    pay = f"LPAD(CAST(o_orderkey AS {cast}), 9, '0')"
    # swap adjacent positions 8 and 9 of the payload (the varying tail
    # digits at every SF), recompute state
    swapped = (
        f"SUBSTR(p.pay, 1, 7) || SUBSTR(p.pay, 9, 1) || SUBSTR(p.pay, 8, 1)"
    )
    return f"""
    WITH coded AS (
      SELECT o_orderkey,
             ({_damm_state("p.pay", 9)}) AS damm_digit,
             ({_damm_state(f"({swapped})", 9)}) AS damm_swapped,
             SUBSTR(p.pay, 8, 1) <> SUBSTR(p.pay, 9, 1) AS swap_changes
      FROM (SELECT o_orderkey, {pay} AS pay FROM orders) p
    )
    SELECT damm_digit,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CASE WHEN swap_changes AND damm_swapped = damm_digit
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_transposition_missed,
           CAST(SUM(CASE WHEN swap_changes THEN 1 ELSE 0 END) AS BIGINT)
             AS n_transposed
    FROM coded
    GROUP BY damm_digit
    ORDER BY damm_digit
    """


@query("q1005_damm_checkdigits", oracle=_q1005_sql("duckdb"))
def q1005_damm_checkdigits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Damm check digits via nine unrolled quasigroup lookups into the
    100-char literal table: per-digit census plus the scheme's
    defining guarantee measured on data — swapping two UNEQUAL
    adjacent payload digits always changes the check digit
    (n_transposition_missed must be 0; pinned in tests)."""
    _views(spark, sf_dir, "orders")
    return spark.sql(_q1005_sql("spark"))


def _q1006_sql(d: str) -> str:
    cast = "VARCHAR" if d != "spark" else "STRING"
    pay = f"LPAD(CAST(o_orderkey AS {cast}), 9, '0')"
    # literal corruption grid: substitutions at positions 1..9 with
    # delta 1..3, and adjacent transpositions at positions 1..8 —
    # ONE generic corruption expression over (kind, pos, delta)
    # columns, not per-cell UNION branches (35 branches would inline
    # the scan + checksum trees 35x in both engines)
    grid = ", ".join(
        [f"('substitution', {p}, {dl})" for p in range(1, 10) for dl in (1, 2, 3)]
        + [f"('transposition', {p}, 0)" for p in range(1, 9)]
    )
    sub_digit = f"CAST((CAST(SUBSTR(pay, pos, 1) AS INT) + delta) % 10 AS {cast})"
    return f"""
    WITH pays AS (
      SELECT {pay} AS pay, CAST(o_orderkey AS BIGINT) AS payload
      FROM orders
      WHERE o_orderkey % 20 = 0
    ),
    grid(err_kind, pos, delta) AS (VALUES {grid}),
    errs AS (
      SELECT err_kind, pos, delta, pay, payload,
             CASE WHEN err_kind = 'substitution'
               THEN SUBSTR(pay, 1, pos - 1)
                    || {sub_digit}
                    || SUBSTR(pay, pos + 1, 9 - pos)
               ELSE SUBSTR(pay, 1, pos - 1)
                    || SUBSTR(pay, pos + 1, 1) || SUBSTR(pay, pos, 1)
                    || SUBSTR(pay, pos + 2, 8 - pos)
             END AS cpay
      FROM pays CROSS JOIN grid
      WHERE (err_kind = 'substitution'
             AND CAST(SUBSTR(pay, pos, 1) AS INT) + delta < 10)
         OR (err_kind = 'transposition'
             AND SUBSTR(pay, pos, 1) <> SUBSTR(pay, pos + 1, 1))
    ),
    checked AS (
      SELECT err_kind,
             ({_luhn_sum("pay", 9)}) % 10 AS luhn_ref,
             ({_luhn_sum("cpay", 9)}) % 10 AS luhn_err,
             ({_damm_state("pay", 9)}) AS damm_ref,
             ({_damm_state("cpay", 9)}) AS damm_err,
             payload % 97 AS mod97_ref,
             CASE WHEN err_kind = 'substitution'
               THEN (payload + CAST(delta AS BIGINT)
                     * CAST(POWER(10, 9 - pos) AS BIGINT)) % 97
               ELSE 0 END AS mod97_err
      FROM errs
    )
    SELECT err_kind,
           CAST(COUNT(*) AS BIGINT) AS n_errors,
           CAST(SUM(CASE WHEN luhn_err <> luhn_ref THEN 1 ELSE 0 END)
             AS BIGINT) AS luhn_detected,
           CAST(SUM(CASE WHEN damm_err <> damm_ref THEN 1 ELSE 0 END)
             AS BIGINT) AS damm_detected,
           CAST(SUM(CASE WHEN err_kind = 'substitution'
                         AND mod97_err <> mod97_ref
                    THEN 1 ELSE 0 END) AS BIGINT) AS mod97_detected
    FROM checked
    GROUP BY err_kind
    ORDER BY err_kind
    """


@query("q1006_detection_power", oracle=_q1006_sql("duckdb"))
def q1006_detection_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Comparative error-detection power: a literal corruption grid
    (27 single-digit substitutions + 8 adjacent transpositions per
    sampled payload) replayed against Luhn, Damm, and mod-97. Damm
    detects every grid error by construction; Luhn detects all
    substitutions of delta<5-compatible pairs but NOT every
    transposition (the 09<->90 blind spot shows up as
    luhn_detected < n_errors on the transposition row). One scan of
    the 5% payload sample crossed map-side with the 35-branch
    literal grid."""
    _views(spark, sf_dir, "orders")
    return spark.sql(_q1006_sql("spark"))
