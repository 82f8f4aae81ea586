"""Declarative data-quality constraint checking (SURVEY P10 generalized:
the reference pre-flight checks — exactly-2-identities,
`social_behaviour_detection.py:111-112,494-495`; >2-instances error — are
instances of table constraints; Deequ popularized the declarative
one-pass form).

Every rule compiles to aggregate EXPRESSIONS over one scan: a suite of N
rules costs one aggregation job regardless of N (codegen, map-side
partials), not N table passes. At 100 TB that is the difference between a
constraint suite being routine and being a nightly batch."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["check_constraints", "assert_constraints"]


def _rule_exprs(rule: dict, idx: int) -> tuple[Column, Column]:
    """rule → (metric expression, passed expression), both aggregates."""
    kind = rule["kind"]
    n = F.count(F.lit(1))
    if kind == "not_null":
        m = F.count(rule["column"]) / n
        return m, m >= rule.get("threshold", 1.0)
    if kind == "unique":
        cols = rule["columns"]
        m = F.count_distinct(*[F.col(c) for c in cols]) / n
        return m, m == 1.0
    if kind == "min":
        m = F.min(rule["column"]).cast("double")
        return m, m >= rule["lo"]
    if kind == "max":
        m = F.max(rule["column"]).cast("double")
        return m, m <= rule["hi"]
    if kind == "between":
        c = F.col(rule["column"])
        m = F.sum(
            (c.between(rule["lo"], rule["hi"])).cast("long")
        ) / F.count(rule["column"])
        return m, m >= rule.get("threshold", 1.0)
    if kind == "accepted_values":
        c = F.col(rule["column"])
        m = F.sum(c.isin(*rule["values"]).cast("long")) / F.count(rule["column"])
        return m, m >= rule.get("threshold", 1.0)
    if kind == "row_count_min":
        m = n.cast("double")
        return m, m >= rule["n"]
    raise ValueError(f"unknown constraint kind {kind!r}")


def check_constraints(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Evaluate a constraint suite in ONE aggregation over ``df``.

    Each rule is a dict with ``name``, ``kind`` and kind-specific params:

    - ``not_null``: column [threshold=1.0] — metric = non-null fraction
    - ``unique``: columns — metric = distinct/total over the key
    - ``min`` / ``max``: column, lo/hi — metric = the extreme itself
    - ``between``: column, lo, hi [threshold=1.0] — metric = in-range
      fraction of the NON-NULL values
    - ``accepted_values``: column, values [threshold] — in-set fraction
    - ``row_count_min``: n — metric = row count

    Returns one row per rule: (rule, metric, passed) — failures are
    REPORTED, not raised (``assert_constraints`` raises). Metrics are
    rounded to 6 decimals. One scan, one aggregation job, no UDF."""
    metric_cols, pass_cols = [], []
    for i, rule in enumerate(rules):
        m, p = _rule_exprs(rule, i)
        metric_cols.append(F.round(m, 6).alias(f"__m{i}"))
        pass_cols.append(F.coalesce(p, F.lit(False)).alias(f"__p{i}"))
    one = df.agg(*metric_cols, *pass_cols)
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(rule["name"]).alias("rule"),
                    F.col(f"__m{i}").alias("metric"),
                    F.col(f"__p{i}").alias("passed"),
                )
                for i, rule in enumerate(rules)
            ]
        )
    )
    return one.select(rows.alias("__r")).select("__r.*")


def assert_constraints(df: DataFrame, rules: list[dict]) -> None:
    """Pre-flight gate (the reference's usage pattern): raise ValueError
    naming every failed rule and its metric."""
    failed = [
        (r["rule"], r["metric"])
        for r in check_constraints(df, rules).collect()
        if not r["passed"]
    ]
    if failed:
        raise ValueError(
            "constraint(s) failed: "
            + ", ".join(f"{name} (metric={m})" for name, m in failed)
        )
