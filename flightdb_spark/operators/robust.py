"""Robust statistics operators with exact and sketch execution modes.

The registry queries pin EXACT percentile anchors (q74, q116, q118) and
their plan notes all say the same thing: "swap approx_percentile at
100 TB". This module is that swap, made concrete — one operator, two
modes, so the scale path is tested code rather than a comment:

- ``exact=True``: Spark's `percentile` (sort-within-group buffer) —
  the anchor; group buffers must fit an executor.
- ``exact=False``: `approx_percentile` (KLL-style quantile sketch,
  fixed-size mergeable buffers — the only viable shape when a group's
  values don't fit anywhere). ``accuracy`` trades buffer size for
  error exactly as Spark documents.

tests/test_robust.py pins the two modes against each other on the
driver corpus (identical flags at accuracy=10000).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAD_Z_CUT = 3.5  # Iglewicz & Hoaglin's modified-z cutoff
MAD_SCALE = 0.6745  # Φ⁻¹(0.75): makes MAD consistent with σ for normals


def mad_outliers(
    df: DataFrame,
    *,
    value_col: str = "value",
    group_col: str = "event_type",
    id_cols: tuple[str, ...] = ("event_id",),
    z_cut: float = MAD_Z_CUT,
    exact: bool = True,
    accuracy: int = 10000,
) -> DataFrame:
    """Median-absolute-deviation outliers per group (modified z-score
    > ``z_cut``). Two bounded aggregate passes — group medians, then
    MAD — broadcast back over the stream; the stream itself never
    shuffles. ``exact`` picks the percentile implementation (see module
    docstring)."""
    if exact:
        med_agg = F.expr(f"percentile({value_col}, 0.5)")
        mad_agg = F.expr(f"percentile(abs({value_col} - med), 0.5)")
    else:
        med_agg = F.expr(f"approx_percentile({value_col}, 0.5, {accuracy})")
        mad_agg = F.expr(
            f"approx_percentile(abs({value_col} - med), 0.5, {accuracy})"
        )
    med = df.groupBy(group_col).agg(med_agg.alias("med"))
    mad = (
        df.join(F.broadcast(med), group_col)
        .groupBy(group_col)
        .agg(mad_agg.alias("mad"))
    )
    z = MAD_SCALE * (F.col(value_col) - F.col("med")) / F.col("mad")
    return (
        df.join(F.broadcast(med), group_col)
        .join(F.broadcast(mad), group_col)
        .filter((F.col("mad") > 0) & (F.abs(z) > z_cut))
        .select(
            *id_cols,
            group_col,
            value_col,
            F.round(z, 6).alias("robust_z"),
        )
    )
