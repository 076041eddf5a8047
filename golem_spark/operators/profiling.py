"""Data-quality validation and column profiling — the Deequ-style
(Schelter et al., VLDB'18 "Automating Large-Scale Data Quality
Verification") operational layer a 100 TB lake runs before training
jobs consume a table.

Both operators reduce the table in ONE combinable aggregation pass
(conditional sums / min / max / approx-distinct), so the cost is a
single scan regardless of how many checks ride along — the property
that makes continuous validation affordable at scale. No collects
inside the pass; results are check-count- or column-count-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def expectation_report(df: DataFrame,
                       rules: list[tuple[str, str]]) -> DataFrame:
    """Evaluate declarative expectations in one scan: ``rules`` is a
    list of (name, SQL boolean expression); a row VIOLATES a rule when
    the expression is NOT true (false or NULL — SQL's null-aware
    semantics would otherwise let null rows pass every check
    silently). Returns one row per rule, in the given order:
    (rule_idx, rule, n_rows, n_violations, violation_rate, passed).

    Plan shape: every rule compiles to a conditional-sum aggregate in
    the SAME single aggregation (map-side combinable); adding a check
    never adds a scan.
    """
    if not rules:
        raise ValueError("at least one rule is required")
    names = [n for n, _ in rules]
    if len(set(names)) != len(names):
        raise ValueError("rule names must be unique")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for name, expr in rules:
        viol = F.when(F.expr(expr), F.lit(0)).otherwise(F.lit(1))
        aggs.append(F.sum(viol).cast("long").alias(f"__v_{name}"))
    row = df.agg(*aggs)
    per_rule = [
        F.struct(F.lit(i).alias("rule_idx"), F.lit(name).alias("rule"),
                 F.col("n_rows").alias("n_rows"),
                 F.col(f"__v_{name}").alias("n_violations"))
        for i, (name, _) in enumerate(rules)]
    return (row.select(F.explode(F.array(*per_rule)).alias("r"))
            .select("r.rule_idx", "r.rule", "r.n_rows", "r.n_violations",
                    F.round(F.col("r.n_violations")
                            / F.greatest(F.col("r.n_rows"), F.lit(1)), 6)
                    .alias("violation_rate"),
                    (F.col("r.n_violations") == 0).alias("passed")))


def profile_columns(df: DataFrame, columns: list[str]) -> DataFrame:
    """Per-column profile in one scan: null count/fraction, exact
    distinct count, min/max (as strings, so heterogeneous column types
    share one report schema). One row per requested column.

    Exact distincts are computed with count_distinct inside the single
    aggregate — Spark expands multiple distinct aggregates with one
    Expand node (rows x |columns|), still a single scan and combinable
    partials. For a quick profile where exact distincts don't matter,
    swap in approx_count_distinct (HLL) — same plan shape minus the
    Expand.
    """
    if not columns:
        raise ValueError("at least one column is required")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in columns:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("long")
            .alias(f"__nn_{c}"),
            F.count_distinct(F.col(c)).alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__mx_{c}"),
        ]
    row = df.agg(*aggs)
    per_col = [
        F.struct(F.lit(i).alias("col_idx"), F.lit(c).alias("column"),
                 F.col("n_rows").alias("n_rows"),
                 F.col(f"__nn_{c}").alias("n_nulls"),
                 F.col(f"__nd_{c}").alias("n_distinct"),
                 F.col(f"__mn_{c}").alias("min_value"),
                 F.col(f"__mx_{c}").alias("max_value"))
        for i, c in enumerate(columns)]
    return (row.select(F.explode(F.array(*per_col)).alias("r"))
            .select("r.col_idx", "r.column", "r.n_rows", "r.n_nulls",
                    F.round(F.col("r.n_nulls")
                            / F.greatest(F.col("r.n_rows"), F.lit(1)), 6)
                    .alias("null_rate"),
                    "r.n_distinct", "r.min_value", "r.max_value"))
