"""Table profiling and expectation checks — the data-quality layer an
ingest pipeline runs before anything downstream trusts a refresh.

Both operators are ONE aggregation pass regardless of how many columns /
rules they cover (every statistic is a conditional aggregate in the same
groupBy-less agg), so profiling a 100 TB table costs one scan, not one
scan per column.

Versus the reference: the closest counterpart is ad-hoc ``print(df.shape)``
/ dropna debugging; a declarative expectation gate has no analogue —
engine charter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, approx_rsd: float = 0.02) -> DataFrame:
    """One row per column: (column, dtype, n_rows, n_nulls, null_ratio,
    n_distinct_approx, min, max) — min/max/distinct for orderable types,
    NULL otherwise. All statistics come from a SINGLE agg (HLL++ for the
    distinct estimate — exact distinct per column would be one shuffle per
    column); the per-column rows are assembled driver-side from that one
    result row, bounded by the schema width."""
    orderable = {
        "string", "int", "bigint", "smallint", "tinyint", "float", "double",
        "decimal", "date", "timestamp", "boolean",
    }
    aggs = [F.count(F.lit(1)).alias("__n")]
    cols = []
    for f in df.schema.fields:
        base = f.dataType.simpleString().split("(")[0]
        cols.append((f.name, f.dataType.simpleString(), base in orderable))
        aggs.append(
            F.sum(F.col(f.name).isNull().cast("long")).alias(f"__nulls_{f.name}")
        )
        if base in orderable:
            aggs.append(
                F.approx_count_distinct(f.name, rsd=approx_rsd).alias(
                    f"__dist_{f.name}"
                )
            )
            aggs.append(F.min(f.name).cast("string").alias(f"__min_{f.name}"))
            aggs.append(F.max(f.name).cast("string").alias(f"__max_{f.name}"))
    row = df.agg(*aggs).collect()[0]
    n = row["__n"]
    out = []
    for name, dtype, ordb in cols:
        nulls = row[f"__nulls_{name}"]
        out.append(
            (
                name,
                dtype,
                n,
                nulls,
                round(nulls / n, 6) if n else None,
                row[f"__dist_{name}"] if ordb else None,
                row[f"__min_{name}"] if ordb else None,
                row[f"__max_{name}"] if ordb else None,
            )
        )
    return df.sparkSession.createDataFrame(
        out,
        "column string, dtype string, n_rows long, n_nulls long, "
        "null_ratio double, n_distinct_approx long, min string, max string",
    )


def check_expectations(
    df: DataFrame, rules: dict[str, Column]
) -> DataFrame:
    """Declarative data-quality gate: ``rules`` maps a rule name to a
    boolean Column that must hold for every row (NULL counts as a
    violation — an unknown is not a pass). Returns one row per rule:
    (rule, n_rows, n_violations, pass) — ALL rules evaluated in one scan.

    Gate pattern::

        report = check_expectations(batch, RULES)
        if report.filter("NOT pass").count(): abort_the_load()
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    for name, cond in rules.items():
        aggs.append(
            F.sum((~F.coalesce(cond, F.lit(False))).cast("long")).alias(
                f"__viol_{name}"
            )
        )
    row = df.agg(*aggs).collect()[0]
    n = row["__n"]
    out = [
        (name, n, row[f"__viol_{name}"], row[f"__viol_{name}"] == 0)
        for name in rules
    ]
    return df.sparkSession.createDataFrame(
        out, "rule string, n_rows long, n_violations long, pass boolean"
    )
