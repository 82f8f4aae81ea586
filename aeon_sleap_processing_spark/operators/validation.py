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

__all__ = ["check_constraints", "check_constraints_fast", "assert_constraints"]


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


def check_constraints_fast(
    df: DataFrame, rules: list[dict], rsd: float = 0.02
) -> DataFrame:
    """Monitoring-cadence variant of :func:`check_constraints`: ``unique``
    rules use ``approx_count_distinct`` (HLL, relative std dev ``rsd``)
    in the same single aggregation, so the happy path — keys actually
    unique — stays ONE scan at 100 TB instead of paying an exact
    count-distinct every monitoring tick.

    Soundness contract: a unique rule passes the fast path when its
    approx ratio >= 1 - 3*rsd (an approx read cannot land that low if the
    key truly is unique, up to the HLL tail). When the approx ratio falls
    BELOW that threshold — a suspected violation — ONE exact confirmation
    aggregation runs over all suspicious unique rules together, and the
    exact metric/verdict replaces the approximate one: reported failures
    are never false alarms. The documented tradeoff: violations smaller
    than the 3*rsd margin (e.g. 99.9% uniqueness at rsd=0.02) can pass
    the fast path — use :func:`check_constraints` (exact, the default
    everywhere else) for gates; this is for recurring monitors.

    Materializes the (one-row-per-rule) result eagerly and returns it as
    a DataFrame for API parity."""
    spark = df.sparkSession
    metric_cols, pass_cols = [], []
    unique_idx = []
    for i, rule in enumerate(rules):
        if rule["kind"] == "unique":
            n = F.count(F.lit(1))
            # null-gate the key struct: the exact path's count_distinct
            # (*cols) DROPS any-null tuples, while a bare struct() is
            # never null and would be counted — for a null-heavy key
            # column the approx ratio would read ~1.0 while the exact
            # metric is ~0, a false PASS that skips the exact
            # confirmation. approx_count_distinct ignores nulls, so
            # gating with when(all non-null) restores exact semantics.
            key_nonnull = F.lit(True)
            for c in rule["columns"]:
                key_nonnull = key_nonnull & F.col(c).isNotNull()
            m = F.approx_count_distinct(
                F.when(
                    key_nonnull,
                    F.struct(*[F.col(c) for c in rule["columns"]]),
                ),
                rsd,
            ) / n
            p = m >= 1.0 - 3.0 * rsd
            unique_idx.append(i)
        else:
            m, p = _rule_exprs(rule, i)
        metric_cols.append(F.round(m, 6).alias(f"__m{i}"))
        pass_cols.append(F.coalesce(p, F.lit(False)).alias(f"__p{i}"))
    row = df.agg(*metric_cols, *pass_cols).collect()[0]  # one row — bounded
    results = [
        [rule["name"], min(float(row[f"__m{i}"]), 1.0)
         if i in unique_idx and row[f"__m{i}"] is not None
         else row[f"__m{i}"],
         bool(row[f"__p{i}"])]
        for i, rule in enumerate(rules)
    ]
    suspicious = [i for i in unique_idx if not row[f"__p{i}"]]
    if suspicious:
        exact_cols = []
        for i in suspicious:
            m, p = _rule_exprs(rules[i], i)
            exact_cols += [
                F.round(m, 6).alias(f"__m{i}"),
                F.coalesce(p, F.lit(False)).alias(f"__p{i}"),
            ]
        exact = df.agg(*exact_cols).collect()[0]
        for i in suspicious:
            results[i][1] = exact[f"__m{i}"]
            results[i][2] = bool(exact[f"__p{i}"])
    return spark.createDataFrame(
        [tuple(r) for r in results], "rule string, metric double, passed boolean"
    )


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
