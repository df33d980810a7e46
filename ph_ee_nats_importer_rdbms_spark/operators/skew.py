"""Skew-resistant aggregation (SCALE.md): salted two-phase groupBy.

AQE's skew-join handling covers joins, but a groupBy on a hot key still
funnels that key's every row to one reducer. The classic fix is salting:
phase 1 aggregates on (key, salt) — the hot key's rows spread over
``buckets`` reducers and map-side partial aggregation shrinks them — then
phase 2 merges the per-salt partials on the real key, now at most
``buckets`` rows per key.

Only algebraic aggregates can be merged this way; supported ops and their
merge functions:

    count -> sum of partial counts        sum -> sum
    min   -> min                          max -> max

(avg = sum/count composed by the caller.) The salt is a deterministic
row hash, so retries and replays salt identically.

The import pipeline itself needs none of this — instance keys are
Zeebe-generated uniform longs — but analytics over user-supplied keys
(tenant, language, URL host, ...) hit this shape constantly at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_MERGE = {
    "count": F.sum,
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: list[tuple[str, str, str]],
    buckets: int = 16,
) -> DataFrame:
    """``aggs`` entries are ``(column, op, alias)`` with op in
    count|sum|min|max. Returns exactly what
    ``df.groupBy(keys).agg(...)`` would, via the two-phase salted plan.
    """
    for _, op, _ in aggs:
        if op not in _MERGE:
            raise ValueError(f"unsupported op {op!r}; use {sorted(_MERGE)}")

    salt: Column = F.pmod(F.abs(F.hash(F.struct(*df.columns))), F.lit(buckets))
    partial = [
        (F.count(c) if op == "count" else getattr(F, op)(c)).alias(f"_p_{alias}")
        for c, op, alias in aggs
    ]
    phase1 = df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(*partial)
    merged = [
        _MERGE[op](f"_p_{alias}").alias(alias) for _, op, alias in aggs
    ]
    return phase1.groupBy(*keys).agg(*merged)
