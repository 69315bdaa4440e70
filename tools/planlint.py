"""Physical-plan lint: sweep every registry query and flag scale
antipatterns in the optimized plan.

Checks (each a known 100 TB failure mode):
- CartesianProduct          unbounded pair blow-up
- BatchEvalPython           row-at-a-time Python UDF in the plan
- global Window             `Window` with an empty partition spec moves
                            ALL rows to one task (allowed only where a
                            query's contract is a global order/top-k and
                            the input is provably bounded — allowlist)
- PythonMapInArrow absent   informational: Arrow batching is the only
                            sanctioned Python boundary

Usage: python tools/planlint.py [sf_dir]
Exit 1 if any non-allowlisted finding.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flightdb_spark.queries import load_registry
from flightdb_spark.session import get_spark

# Queries whose contract REQUIRES a global-order window, with the reason
# the single partition is bounded.
GLOBAL_WINDOW_ALLOWED = {
    # global top-k over already-aggregated scored docs (<= corpus docs
    # containing a query term; WindowGroupLimit pre-truncates per
    # partition before the single-task final ranking)
    "q66_bm25_topk",
    # global deterministic orderBy().limit(k) compiles to TakeOrdered,
    # but the k-row ranked projection that follows is a global window
    "q07_recent_topk",
    # frequency ranking runs over the AGGREGATED vocab — bounded by
    # distinct tokens, not corpus rows
    "q76_vocab_ids",
    # one-day-lag over the DAILY aggregate — the global window runs on
    # ~calendar-days rows (already reduced), never the fact table
    "q339_granger_f",
    # the funnel lag runs on the 6-row stage table (each stage already
    # a count aggregate), never document rows
    "q350_curation_funnel",
    # the 6-hour trailing window runs on the HOURLY aggregate —
    # bounded by calendar hours, never the event stream
    "q351_slo_burn_rate",
    # cumulative reach = running sum over the DAILY new-user counts —
    # bounded by calendar days, never the event stream
    "q354_reach_curve",
    # argmin rank over the literal slope grid — never fact rows
    "q356_quantile_regression_grid",
    # 1/7-day lags over the DAILY aggregate (q339 bounded-window class)
    "q364_forecast_metrics",
    # day-rank over the DISTINCT-day table (q339 bounded class)
    "q442_obf_boundaries",
    # centered 7-day MA over the DAILY aggregate (q339 bounded class)
    "q403_stl_decomposition",
    # backlog running sum over the bounded day table (q351 class)
    "q371_backlog_curve",
    # WIP running sum over the bounded daily delta table (q371 class)
    "q886_wip_over_time",
    # per-frequency return lags over BOUNDED sampled-bucket tables
    # (calendar buckets at 1/5/15/60 min — q339 class)
    "q904_volatility_signature",
    # NTILE over the per-user AGGREGATED table (one row per user, the
    # q66 aggregated-spine class — never event rows)
    "q960_rank_movement",
    # ECDF cumulative runs over the <= KS_BINS-row bin aggregate only
    "q131_ks_binned",
    # same bounded-bins class: cumulative over <= 101 value bins
    "q434_wasserstein_1d",
    "q436_cvm_test",
    # risk-set and log-survival scans run over the distinct-hour key
    # table, bounded by calendar hours in the era, not corpus size
    "q204_kaplan_meier",
    # same class: at-risk scan over the distinct-duration table only
    "q407_logrank_test",
    # pooled-index scan runs over DISTINCT length values, bounded by
    # the max document length (value domain), not corpus size
    "q210_quantile_normalize",
    # row_number ranks two bounded top-RRF_DEPTH lists (TakeOrdered
    # pre-truncates before the window)
    "q137_rrf_fusion",
    # same shape: Borda ranks two bounded top-FUSION_DEPTH lists
    # (TakeOrdered pre-truncates before the window)
    "q394_borda_fusion",
    # CUSUM scan runs over the bounded daily aggregate only
    "q138_cusum_changepoint",
    # cumulative share over the <=7-row weekly lag-bucket aggregate
    "q573_knowledge_lag",
    # nonparametric trend tests: rank/LAG/LEAD windows over the bounded
    # DAILY aggregate or the <= days^2/2 pairwise-slope table (q339/q356
    # class — calendar-bounded, never corpus rows)
    "q591_sen_slope",
    "q592_runs_test",
    "q593_turning_points",
    "q595_rank_von_neumann",
    # rank/position windows over <= RRF_DEPTH-row truncated run lists
    "q144_ndcg",
    # adstock lags / growth cumulative: ordered windows over the
    # AGGREGATED daily calendar table (~30 rows) — calendar-bounded
    "q277_adstock_transform",
    "q278_growth_accounting",
    # anomaly ensemble: rank/median selection and CUSUM cumulative over
    # the AGGREGATED ~30-row daily calendar table — calendar-bounded
    "q293_anomaly_ensemble",
    # frequency rank over the AGGREGATED vocabulary — q76's bounded class
    "q155_vocab_coverage",
    # exposure rank over the AGGREGATED item table — q76's bounded class
    "q421_rec_popularity_bias",
    # median-of-16 rank runs over the 16-row sketch table — bounded by
    # the sketch count constant, never corpus rows
    "q451_ams_f2",
    # ranking-eval batch: every window ranks TakeOrdered-truncated runs
    # (<= RRF_DEPTH rows) or their intersection — q137/q144's bounded
    # class
    "q456_err",
    "q457_rbo",
    "q458_alpha_ndcg",
    "q459_clarity_score",
    "q460_tau_ap",
    # top-k + median-of-5 ranks over the AGGREGATED user-count table —
    # q76's vocab-bounded class (the med window partitions by user)
    "q454_countsketch_heavy",
    # spectral/structural TS batch: every window (prefix sums, argmax
    # ranks, lag/lead) runs over the 28-row daily calendar aggregate —
    # q339's calendar-bounded class
    "q477_binary_segmentation",
    "q478_hurst_exponent",
    "q479_spectral_entropy",
    "q480_turning_points",
    # survival batch 2: every window is a prefix scan over the
    # DISTINCT-duration (hour-bounded) table — q204's class
    "q491_nelson_aalen",
    "q492_weibull_mrr",
    "q493_competing_risks",
    "q494_rmst",
    "q495_conditional_survival",
    # queueing batch: rank/island/trailing windows over the 720-row
    # hourly calendar aggregate — q339's calendar-bounded class
    "q498_capacity_headroom",
    "q499_burst_episodes",
    "q500_autoscaling_sim",
    # theta forecast: OLS/SES over the 28-row daily calendar aggregate
    "q505_theta_forecast",
    # newsvendor: rank selection over the ~1,100-row daily-demand
    # calendar aggregate
    "q509_newsvendor",
    # gaps-and-islands over the 80-row recursive month spine
    "q519_calendar_spine",
    # tercile cutpoints: cumulative over the 2-dp ROUNDED-score bin
    # table (bounded by the score range) — q131's bin class
    "q527_ccnet_buckets",
    # MoM/YoY lags over the 80-row month spine — calendar-bounded
    "q531_mom_yoy",
    # rank/cumulative over the AGGREGATED vocabulary — q76's class
    "q536_vocab_size_sweep",
    # the null-ordering battery's global windows ARE its subject
    # (explicit NULLS FIRST/LAST rank positions); single-scan input
    "q544_null_ordering",
    # multiple-testing batch: Holm/BH rank windows run over the
    # AGGREGATED hypothesis table (event_type x 64 buckets — a few
    # hundred rows bounded by construction) — q76's class
    "q556_bonferroni_holm",
    "q557_benjamini_hochberg",
    "q559_fdr_threshold_sweep",
    "q560_family_structured_testing",
    # cost-allocation batch: every global window (rank, Shapley prefix
    # sum, core prefix) runs over the 25-row per-nation cost aggregate
    # — bounded by the nation dim, never fact rows
    "q962_airport_shapley",
    "q963_shapley_vs_prorata",
    "q966_core_check_prorata",
    # Elo batch: the match-index window runs over the one-match-per-
    # hour log (calendar-bounded, q339's class); the replay itself is
    # a single bounded applyInPandas group
    "q967_match_log",
    "q968_elo_final",
    "q969_elo_trajectory",
    "q970_elo_k_sensitivity",
    "q971_elo_winrate_concordance",
    # SPC batch: runs-rule windows ride the one-row-per-hour subgroup
    # aggregate — calendar-bounded (q339's class)
    "q976_western_electric",
    # auction batch: the day-over-day lag rides the ~30-row daily
    # uncross table — calendar-bounded (q339's class)
    "q981_clearing_price_moves",
    # revenue management: the bid-price first difference lags over the
    # 11-row LITERAL seat grid — bounded by construction
    "q986_bid_price_curve",
    # changepoint batch: every prefix/rank window rides the ~720-row
    # hourly calendar aggregate (q339's class)
    "q987_binary_split",
    "q988_cusum_location",
    "q989_page_hinkley",
    "q990_shift_magnitude",
    "q991_split_variance_ratio",
    # revenue management: exact order-stat ranks over the (class, day)
    # calendar aggregate
    "q982_demand_profile",
    "q983_littlewood_rule",
    "q984_emsrb_protection",
    # CPM batch: project-total window / WIP cumulative + LEAD over the
    # LITERAL 10-activity network (<= 20 rows by construction)
    "q1020_pert_estimates",
    "q1021_resource_histogram",
    # adoption cumulative over the ~350-row weekly calendar aggregate
    # (q339 calendar-bounded class)
    "q1022_adoption_curve",
    # life-table suffix scans over the <= ~90-row lifetime-month
    # census (calendar-bounded, q339 class)
    "q1032_decrement_table",
    "q1033_life_expectancy",
    "q1034_discounted_lifetime",
    # tornado batch: rank/LAG over <= 11-row LITERAL driver/step grids
    "q1037_tornado_swings",
    "q1040_scenario_waterfall",
    "q1041_elasticity_ranking",
}


# BroadcastNestedLoopJoin nodes whose ExistingRDD input is PROVABLY
# bounded (a checkpointed aggregate whose row count is fixed by the
# value domain / calendar, not corpus size) AND whose join is an
# intentional bounded cross/non-equi join. Every entry must say why.
BNLJ_EXISTINGRDD_ALLOWED: set[str] = set()


def _bnlj_over_existing_rdd(plan: str) -> bool:
    """True when a BroadcastNestedLoopJoin node has a Scan ExistingRDD
    anywhere in its subtree (tree-indent scan over the executedPlan
    toString): the signature of a staged localCheckpoint view feeding a
    nested-loop join because its LogicalRDD size estimate blocked the
    hash/broadcast strategies."""
    lines = plan.split("\n")

    def depth(s: str) -> int:
        return len(s) - len(s.lstrip(" :+-"))

    for i, line in enumerate(lines):
        if "BroadcastNestedLoopJoin" not in line:
            continue
        d = depth(line)
        for nxt in lines[i + 1:]:
            if nxt.strip() and depth(nxt) <= d:
                break
            if "Scan ExistingRDD" in nxt:
                return True
    return False


class lazy_checkpoints:
    """Context manager: force every DataFrame.localCheckpoint to
    eager=False while building plans for LINTING.

    The staged queries checkpoint bounded tables eagerly inside their
    fn(), so a registry-wide plan sweep used to EXECUTE every staging
    job (the r9 full-suite planlint/pytest gate ran for the better part
    of an hour — the driver's pytest window expired at 6%). A lazy
    checkpoint still wraps the plan in the same LogicalRDD node, so the
    executed-plan STRING the lint inspects is shape-identical (verified:
    Scan ExistingRDD present, join strategies unchanged) while no
    staging job runs. Only valid for plan inspection — never for
    executing results."""

    def __enter__(self):
        import pyspark.sql

        self._orig = pyspark.sql.DataFrame.localCheckpoint

        def _lazy(df, eager=True):  # noqa: ARG001 - signature mirror
            return self._orig(df, eager=False)

        pyspark.sql.DataFrame.localCheckpoint = _lazy
        return self

    def __exit__(self, *exc):
        import pyspark.sql

        pyspark.sql.DataFrame.localCheckpoint = self._orig
        return False


def _windowspec_args(plan: str) -> list[list[str]]:
    """Top-level comma-split args of every windowspecdefinition(...) in
    the plan string (balanced-paren scan — frame specs nest two deep,
    past what a regex comfortably matches)."""
    out = []
    marker = "windowspecdefinition("
    i = 0
    while True:
        i = plan.find(marker, i)
        if i < 0:
            break
        j = i + len(marker)
        depth, cur, args = 0, "", []
        while j < len(plan):
            ch = plan[j]
            if ch == "(":
                depth += 1
            elif ch == ")":
                if depth == 0:
                    break
                depth -= 1
            elif ch == "," and depth == 0:
                args.append(cur.strip())
                cur = ""
                j += 1
                continue
            cur += ch
            j += 1
        args.append(cur.strip())
        out.append(args)
        i = j
    return out


def is_global_spec(args: list[str]) -> bool:
    """True when a windowspecdefinition's top-level args describe a
    partition-less window: only ORDER-BY entries (`col ASC/DESC ...`)
    before the frame spec, or nothing but the frame spec at all (an
    unordered global window — e.g. count().over(Window.partitionBy())).
    Partitioned windows list at least one bare partition column.

    Structural exemption: a global window ordered by the bucketed
    prefix-scan's internal bucket id (operators/prefix.py) runs over the
    <= n_buckets-row PER-BUCKET TOTALS table — bounded by construction
    (one row per approx-percentile bucket), never by data volume — so it
    is not a scale hazard and is auto-allowed without a name allowlist
    entry."""
    spec = [a for a in args if not a.startswith("specifiedwindowframe")]
    if any("__cumsum_bucket" in a for a in spec):
        return False
    return all(" ASC" in a or " DESC" in a for a in spec)


def lint(sf_dir: str) -> int:
    spark = get_spark("planlint")
    reg = load_registry()
    failures = []
    for name, qd in sorted(reg.items()):
        try:
            with lazy_checkpoints():
                df = qd.fn(spark, sf_dir)
                plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # pragma: no cover - lint harness guard
            failures.append((name, f"explain failed: {exc}"))
            continue
        if "CartesianProduct" in plan:
            failures.append((name, "CartesianProduct in plan"))
        if "BatchEvalPython" in plan:
            failures.append((name, "row-at-a-time Python UDF (BatchEvalPython)"))
        # r10 (r9 VERDICT item 4): a localCheckpoint's LogicalRDD reports
        # the default (huge) size estimate, so auto-broadcast never fires
        # downstream of a staged view — q645 silently planned a
        # CartesianProduct until a manual hint was added. A
        # BroadcastNestedLoopJoin fed by a Scan ExistingRDD is the same
        # hazard one notch earlier (at scale the "broadcast" side is the
        # unbounded one); flag the combination so the q645 class cannot
        # recur silently. A hinted BroadcastHashJoin never matches this.
        if name not in BNLJ_EXISTINGRDD_ALLOWED and _bnlj_over_existing_rdd(plan):
            failures.append(
                (name, "BroadcastNestedLoopJoin over Scan ExistingRDD "
                       "(unhinted staged view — q645 hazard class)")
            )
        # global window: windowspecdefinition(args..., frame) whose args
        # before the frame are ONLY order specs (`col ASC/DESC ...`) —
        # a partitioned window lists at least one bare partition column
        # first; a partitioned-unordered window lists only bare columns.
        if name not in GLOBAL_WINDOW_ALLOWED:
            for inner in _windowspec_args(plan):
                if is_global_spec(inner):
                    failures.append((name, "global Window (no partition spec)"))
                    break
    for name, why in failures:
        print(f"FLAG  {name}: {why}")
    print(f"{len(reg) - len({n for n, _ in failures})} clean, {len(failures)} flagged")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(lint(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"))
