"""Approximate/sketch aggregates (SURVEY §2.4 'not present in reference,
free in Spark'): HLL++ distinct counts and quantile sketches — sanity-bound
against exact answers on the driver tables. These are the scale path where
exact distinct/quantile would shuffle too much state."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_approx_count_distinct_within_rsd(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    exact = li.select(F.countDistinct("l_partkey").alias("n")).collect()[0].n
    approx = li.select(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("n")
    ).collect()[0].n
    assert abs(approx - exact) / exact < 0.1


def test_percentile_approx_close_to_exact(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    row = li.select(
        F.median("l_extendedprice").alias("exact"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("approx"),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact < 0.01


# ------------------------------------------------- mergeable sketch silver
def test_sketch_silver_rollup_matches_exact(spark):
    """Build the fine-grained sketch table once, then answer three coarser
    questions purely from it — each within HLL tolerance of the exact
    answer computed from raw data."""
    from crossbar_data_process_spark.operators.sketches import (
        distinct_sketch_table,
        rollup_distinct,
    )

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    silver = distinct_sketch_table(
        li, ["l_returnflag", "l_linestatus"], "l_partkey"
    ).localCheckpoint()

    def exact(keys):
        if keys:
            return {
                tuple(r[k] for k in keys): r.n
                for r in li.groupBy(*keys)
                .agg(F.countDistinct("l_partkey").alias("n"))
                .collect()
            }
        return {(): li.select(F.countDistinct("l_partkey")).collect()[0][0]}

    for keys in (["l_returnflag", "l_linestatus"], ["l_returnflag"], []):
        got = {
            tuple(r[k] for k in keys): r.distinct_est
            for r in (
                rollup_distinct(silver, keys).collect()
                if keys
                else [rollup_distinct(silver, []).collect()[0]]
            )
        }
        want = exact(keys)
        assert set(got) == set(want)
        for cell in want:
            assert abs(got[cell] - want[cell]) / max(want[cell], 1) < 0.05, (
                keys, cell, got[cell], want[cell],
            )


def test_sketch_union_is_order_independent(spark):
    """Merging is commutative/associative: rollups from a shuffled,
    re-partitioned silver table give the identical estimate."""
    from crossbar_data_process_spark.operators.sketches import (
        distinct_sketch_table,
        rollup_distinct,
    )

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    silver = distinct_sketch_table(li, ["l_returnflag", "l_linestatus"], "l_partkey")
    a = rollup_distinct(silver.repartition(1), []).collect()[0].distinct_est
    b = rollup_distinct(silver.repartition(7), []).collect()[0].distinct_est
    assert a == b


def test_sketch_rows_not_resent(spark):
    """The silver row count is bounded by the key-space cardinality — the
    whole point: rollups read cells, not corpus rows."""
    from crossbar_data_process_spark.operators.sketches import distinct_sketch_table

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    silver = distinct_sketch_table(li, ["l_returnflag", "l_linestatus"], "l_partkey")
    assert silver.count() <= 6  # 3 flags x 2 statuses in TPC-H


def test_histogram_quantiles_within_bin_error(spark):
    """Log-histogram quantile sketch: per-key quantiles read from the bin
    silver must be within one bin width (factor 10^(1/B)) ABOVE the exact
    quantile (the sketch reports the bin's upper edge, so it never
    under-reports by more than float noise)."""
    import math

    from crossbar_data_process_spark.operators.sketches import (
        histogram_sketch_table,
        rollup_quantiles,
    )

    B = 20
    rows = []
    for src in ("a", "b"):
        for i in range(2000):
            # deterministic heavy-tailed positive values, distinct per src
            v = math.exp((i % 97) / 12.0) * (1.0 if src == "a" else 3.7)
            rows.append((src, v))
    df = spark.createDataFrame(rows, "source string, val double")
    hist = histogram_sketch_table(df, ["source"], "val", bins_per_decade=B)
    got = {
        r.source: (r.q_0_5, r.q_0_95, r.n)
        for r in rollup_quantiles(
            hist, ["source"], [0.5, 0.95], bins_per_decade=B
        ).collect()
    }
    import numpy as np

    arr = {s: np.sort([v for t, v in rows if t == s]) for s in ("a", "b")}
    width = 10 ** (1.0 / B)
    for s in ("a", "b"):
        n = len(arr[s])
        assert got[s][2] == n
        for q, est in (((0.5), got[s][0]), ((0.95), got[s][1])):
            exact = arr[s][int(math.ceil(q * n)) - 1]
            assert exact <= est * 1.0000001, (s, q, exact, est)
            assert est <= exact * width * 1.0000001, (s, q, exact, est)


def test_histogram_sketch_is_mergeable(spark):
    """The silver contract: sketching two halves and rolling them up
    together equals sketching the whole — bin counts are exactly
    additive, so late partitions just union in (same property the HLL
    silver has, but for distributions)."""
    from crossbar_data_process_spark.operators.sketches import (
        histogram_sketch_table,
        rollup_quantiles,
    )

    df = spark.range(0, 5000).select(
        (F.col("id") % 3).alias("k"),
        (F.pow(F.lit(1.01), F.col("id") % 700)).alias("val"),
    )
    whole = histogram_sketch_table(df, ["k"], "val")
    halves = histogram_sketch_table(
        df.filter(F.col("id") % 2 == 0), ["k"], "val"
    ).unionByName(
        histogram_sketch_table(df.filter(F.col("id") % 2 == 1), ["k"], "val")
    )
    a = {
        (r.k,): (r.n, r.q_0_5, r.q_0_99)
        for r in rollup_quantiles(whole, ["k"], [0.5, 0.99]).collect()
    }
    b = {
        (r.k,): (r.n, r.q_0_5, r.q_0_99)
        for r in rollup_quantiles(halves, ["k"], [0.5, 0.99]).collect()
    }
    assert a == b and len(a) == 3


def test_histogram_nonpositive_and_global_rollup(spark):
    """Values ≤ 0 land in the reserved bin: counted in n/n_nonpositive,
    and a quantile landing inside them reports NULL; the keys=[] global
    rollup works."""
    from crossbar_data_process_spark.operators.sketches import (
        histogram_sketch_table,
        rollup_quantiles,
    )

    rows = [(-1.0,)] * 60 + [(0.0,)] * 40 + [(10.0,)] * 100
    df = spark.createDataFrame(rows, "val double")
    hist = histogram_sketch_table(df, [], "val")
    out = rollup_quantiles(hist, [], [0.25, 0.9]).collect()[0]
    assert out.n == 200 and out.n_nonpositive == 100
    assert out.q_0_25 is None  # rank 50 falls inside the nonpositive mass
    assert out.q_0_9 is not None and abs(out.q_0_9 - 10.0) / 10.0 < 0.13


def test_histogram_mixed_bpd_raises_and_legacy_param_path(spark):
    """Bin ids are meaningless without B: rolling up two silvers stamped
    at different bins_per_decade must raise, not reinterpret bins; a
    legacy frame without the stamp needs an explicit bins_per_decade
    (r11 review)."""
    import pytest as _pytest

    from crossbar_data_process_spark.operators.sketches import (
        histogram_sketch_table,
        rollup_quantiles,
    )

    df = spark.range(1, 500).select((F.col("id") * 1.0).alias("val"))
    h20 = histogram_sketch_table(df, [], "val", bins_per_decade=20)
    h50 = histogram_sketch_table(df, [], "val", bins_per_decade=50)
    with _pytest.raises(Exception, match="incommensurable"):
        rollup_quantiles(h20.unionByName(h50), [], [0.5]).collect()
    # explicit param contradicting the stamp also raises
    with _pytest.raises(Exception, match="incommensurable"):
        rollup_quantiles(h20, [], [0.5], bins_per_decade=50).collect()
    # legacy: no stamp column -> explicit B required and honored
    legacy = h20.drop("bpd")
    with _pytest.raises(ValueError, match="bpd"):
        rollup_quantiles(legacy, [], [0.5])
    a = rollup_quantiles(legacy, [], [0.5], bins_per_decade=20).collect()[0]
    b = rollup_quantiles(h20, [], [0.5]).collect()[0]
    assert a.q_0_5 == b.q_0_5 and a.n == b.n


def test_histogram_integer_rank_boundary(spark):
    """q·n that is mathematically integer must use rank ceil(q·n), not
    one higher from binary rounding (0.017·3000 → 51.000…01; r11
    review): 51 values in the first bin, q=0.017 over n=3000 must stay
    inside bin 1, not jump to bin 2."""
    from crossbar_data_process_spark.operators.sketches import (
        histogram_sketch_table,
        rollup_quantiles,
    )

    rows = [(2.0,)] * 51 + [(200.0,)] * 2949  # bin(2.0) << bin(200.0)
    df = spark.createDataFrame(rows, "val double")
    hist = histogram_sketch_table(df, [], "val", bins_per_decade=20)
    out = rollup_quantiles(hist, [], [0.017]).collect()[0]
    assert out.q_0_017 is not None and out.q_0_017 < 10.0, out.q_0_017


def test_quantile_expectation_gate(spark):
    """Distribution gate over the histogram silver: p95/median rules
    evaluated from bin counts; a quantile falling into nonpositive mass
    fails its rule (unknown is not a pass)."""
    from crossbar_data_process_spark.operators.sketches import (
        check_quantile_expectations,
        histogram_sketch_table,
    )

    rows = [(float(10 + (i % 90)),) for i in range(1000)]
    df = spark.createDataFrame(rows, "val double")
    hist = histogram_sketch_table(df, [], "val", bins_per_decade=50)
    report = {
        r.rule: (r.value, r.pass_ if hasattr(r, "pass_") else r["pass"])
        for r in check_quantile_expectations(
            hist,
            {
                "p95_le_150": (0.95, lambda c: c <= 150.0),
                "median_ge_1000": (0.5, lambda c: c >= 1000.0),
            },
        ).collect()
    }
    assert report["p95_le_150"][1] is True
    assert report["median_ge_1000"][1] is False

    # nonpositive-dominated distribution: quantile is NULL -> rule fails
    neg = spark.createDataFrame([(-1.0,)] * 100 + [(5.0,)] * 10, "val double")
    nhist = histogram_sketch_table(neg, [], "val")
    rep = check_quantile_expectations(
        nhist, {"median_any": (0.5, lambda c: c > 0.0)}
    ).collect()[0]
    assert rep["pass"] is False and rep.value is None


def test_histogram_nonfinite_and_empty_inputs(spark):
    """r11 review round 2 (verified failures): +inf must not ANSI-crash
    the build (reserved top bin, NULL-edge quantiles), NaN must not land
    near 1.0 (excluded from rank positions, reported as n_nan), and an
    empty histogram must roll up to n=0 with NULL quantiles, not raise a
    NULL-message error."""
    from crossbar_data_process_spark.operators.sketches import (
        histogram_sketch_table,
        rollup_quantiles,
    )

    rows = (
        [(float("inf"),)] * 5
        + [(float("nan"),)] * 7
        + [(float("-inf"),)] * 3
        + [(100.0,)] * 85
    )
    df = spark.createDataFrame(rows, "val double")
    hist = histogram_sketch_table(df, [], "val")
    out = rollup_quantiles(hist, [], [0.5, 0.99]).collect()[0]
    # ranks: 3 neg-inf (nonpositive) + 85 finite + 5 posinf = 93; NaN out
    assert out.n == 93 and out.n_nan == 7 and out.n_nonpositive == 3
    assert out.q_0_5 is not None and abs(out.q_0_5 - 100.0) / 100.0 < 0.13
    assert out.q_0_99 is None  # lands in the +inf mass — no finite edge

    empty = histogram_sketch_table(
        spark.createDataFrame([], "val double"), [], "val"
    )
    e = rollup_quantiles(empty, [], [0.5]).collect()[0]
    assert e.n == 0 and e.n_nan == 0 and e.q_0_5 is None


def test_q68_oracle_drops_null_text_like_spark(spark, tmp_path):
    """r11 review round 4 (latent): a NULL-text document must be dropped
    by BOTH sides of q68 — the Spark sketch filters isNotNull; the oracle
    must not let a NULL bin row inflate the window totals and shift every
    rank."""
    import duckdb

    from crossbar_data_process_spark.plans.queries import (
        _quantile_rollup_oracle,
        q68_quantile_rollup,
    )

    sf = str(tmp_path)
    rows = [(i, "src0", "x" * (10 + i)) for i in range(40)] + [
        (99, "src0", None)
    ]
    spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    ).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    got = sorted(tuple(r) for r in q68_quantile_rollup(spark, sf).collect())
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    want = sorted(tuple(t) for t in con.sql(_quantile_rollup_oracle()).fetchall())
    assert got == want and got[0][1] == 40  # n excludes the NULL row
