"""Query registry — the correctness-gated surface of the engine.

Every operator from SURVEY.md §2 that we claim as implemented has an
entry here: a callable ``(spark, sf_dir) -> DataFrame`` plus (where the
semantics are SQL-expressible) an equivalent ANSI-SQL oracle string the
driver runs on DuckDB over the same parquet tables. Names and aliases
match between the two sides — the driver's compare hashes values after
sorting columns by name.

This mirrors the reference's report registry (report/registry.go:19-37):
self-registering analysis functions keyed by name.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None -> rows-only check
    doc: str = ""


REGISTRY: dict[str, QueryDef] = {}

_MODULES = [
    "relational",
    "relational2",
    "layout",
    "warehouse",
    "governance",
    "windows",
    "geo",
    "textops",
    "vector",
    "multimodal",
    "extras",
    "training",
    "simjoin",
    "curation",
    "evalops",
    "stats",
    "analytics",
    "stattests",
    "mining",
    "mining2",
    "mining3",
    "relational3",
    "learning",
    "enginesurface",
    "audit",
    "forecast",
    "multimodal2",
    "ops",
    "integrity2",
    "intervals",
    "growth",
    "mdm",
    "econ",
    "novelty",
    "graphstats",
    "evalops2",
    "trajmetrics",
    "ltv",
    "assortment",
    "fitstats",
    "kpi",
    "calibration",
    "preference",
    "causal",
    "graphstats2",
    "demand",
    "weaklabel",
    "offpolicy",
    "analyst",
    "behavior",
    "opsdesign",
    "experiment",
    "flightops",
    "stats2",
    "finance",
    "safety",
    "quality2",
    "sketches",
    "pipeline",
    "reliability",
    "audience",
    "ranking",
    "vector2",
    "correction",
    "enginesurface2",
    "design",
    "dataops",
    "attribution2",
    "optstats",
    "serving",
    "annotation",
    "graphlink",
    "retrieval",
    "valuation",
    "tsdiag",
    "causal2",
    "fairness",
    "mixing",
    "optstats2",
    "embedops",
    "disttests",
    "linkage",
    "experiment2",
    "streamaudit",
    "estimation",
    "ranking3",
    "robust",
    "causal3",
    "texteval",
    "tsspectral",
    "labelmodel",
    "layout2",
    "survival2",
    "queueing",
    "rankcentral",
    "revenueops",
    "encoding",
    "recursive",
    "embedgeom",
    "pretrainrules",
    "metricslayer",
    "designsweeps",
    "nullsemantics",
    "flightops2",
    "spatialstats",
    "multitest",
    "seqmining",
    "splits",
    "bitemporal",
    "hmm",
    "assocrules",
    "motifs",
    "trendnp",
    "wavelets",
    "inequality",
    "armodels",
    "synthcontrol",
    "scorecard",
    "distsys",
    "treesplits",
    "behavior2",
    "sampling2",
    "robust2",
    "slacalendar",
    "invindex",
    "indexnumbers",
    "reserving",
    "auctions",
    "extremes",
    "credibility",
    "forensic",
    "tradeecon",
    "cacheops",
    "seqtesting",
    "mobility",
    "panel",
    "fluctuation",
    "metaanalysis",
    "capital",
    "socialchoice",
    "portfolio",
    "coding",
    "fifocost",
    "itemcf",
    "supplychain",
    "queuereplay",
    "hedonic",
    "copula",
    "lexgrowth",
    "diffusion",
    "paradoxes",
    "records",
    "realoptions",
    "matching",
    "reliagrowth",
    "qsketch",
    "markovattr",
    "netrobust",
    "scheduling",
    "kalman",
    "stopping",
    "bandits",
    "crossprice",
    "selection",
    "adstock",
    "psychometrics",
    "capturerecapture",
    "lmoments",
    "composite",
    "jlprojection",
    "procmining",
    "apportionment",
    "saxpaa",
    "quadkey",
    "microstructure",
    "ledgerops",
    "clustervalidity",
    "psmatching",
    "diffindiff",
    "goodturing",
    "clickmodels",
    "knapsack",
    "properscoring",
    "texttiling",
    "forgetting",
    "shrinkage",
    "costalloc",
    "ratings",
    "spc",
    "clearing",
    "revmgmt",
    "changepoint",
    "stringsim",
    "decisioncurve",
    "checkdigits",
    "diversity",
    "methodcomp",
    "cpm",
    "diffusion2",
    "readability",
    "lifetable",
    "tornado",
    "delivery",
]


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query with its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = QueryDef(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def load_registry() -> dict[str, QueryDef]:
    """Import all query modules (side effect: registration) and return the registry."""
    for mod in _MODULES:
        importlib.import_module(f"{__package__}.{mod}")
    return REGISTRY


def queries() -> dict[str, QueryFn]:
    return {name: qd.fn for name, qd in load_registry().items()}


def oracle_sql() -> dict[str, str]:
    return {name: qd.oracle for name, qd in load_registry().items() if qd.oracle is not None}
