"""The engine's declared query inventory — one entry per SURVEY.md §2
operator family, each with an exact DuckDB oracle (ORACLES) for the driver's
t2 correctness gate.

Conventions (driver contract, __spark_entry__.py):
- every query is ``f(spark, sf_dir) -> DataFrame``;
- every computed column is aliased identically in Spark and SQL;
- double SUMs go through DECIMAL so the result is order-independent and
  bit-identical across engines (a plain double sum depends on reduction
  order — nondeterministic under partitioning);
- counts/ranks are cast to long (DuckDB COUNT/row_number are BIGINT);
- timestamps are rendered as strings at the output boundary.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from crossbar_data_process_spark.sources.readers import load_events

from crossbar_data_process_spark.functions.text import (
    LANG_MARKERS,
    STOPWORDS,
    doc_fingerprint,
    language_id,
    quality_score,
    token_count,
    tokens,
)
from crossbar_data_process_spark.graph.components import connected_components
from crossbar_data_process_spark.graph.hierarchy import transitive_closure
from crossbar_data_process_spark.operators.aggregates import (
    agg_median,
    agg_middle_row,
    conflict_resolve,
    tf_effect_resolve,
)
from crossbar_data_process_spark.operators.dedup import dedup_undirected
from crossbar_data_process_spark.operators.filters import anti_filter, semi_filter
from crossbar_data_process_spark.operators.mapping import fallback_map
from crossbar_data_process_spark.operators.merge import CoalesceSpec, outer_merge
from crossbar_data_process_spark.operators.rangejoin import bucketed_range_join
from crossbar_data_process_spark.operators.similarity import cosine_topk
from crossbar_data_process_spark.operators.textdedup import (
    dedup_exact as doc_dedup_exact,
)
from crossbar_data_process_spark.operators.textdedup import (
    _A,
    _B,
    _P,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
    simhash_pairs,
)
from crossbar_data_process_spark.operators.topk import top_k_per_group

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

# headline queries timed by bench.py at sf0.1
BENCH_QUERIES = [
    "q01_pricing_summary",
    "q02_nation_revenue",
    "q03_shipping_priority",
    "q07_undirected_dedup",
    # r04: q13_middle_row folded into q12_median_middle (same orders groupBy
    # plus the median column) — the bench slot follows the fold
    "q12_median_middle",
    "q16_brand_revenue",
    "q17_multi_source_merge",
    "q21_doc_exact_dedup",
    "q25_ngram_jaccard",
    "q26b_simhash",
    # r14: q27_cosine_topk's bench slot follows the fold to the streaming
    # ANN ingest silver (2 sink batches + replay + full probe priced from
    # day one — the q71 convention)
    "q72_ann_streaming_ingest",
    "q28_events_hourly",
    "q41_sessionize",
    "q43_ddi_merge",
    # r03 additions: the new named surfaces, benchmarked from day one
    "q52_kg_paths",
    # r15: q53_neardup_resolve's bench slot follows the fold to the
    # streaming semantic-dedup ingest (2 dedup-sink batches + replay +
    # full probe priced from day one — the q71/q72 convention)
    "q73_semantic_dedup_ingest",
    # r04 additions
    "q54_ivf_topk",
    "q55_curation_funnel",
    # r06 addition: bucketed range join, benchmarked from day one
    "q56_range_join",
    # r07 addition: two-table as-of join (q44_rollup's folded slot),
    # benchmarked from day one
    "q57_asof_two_table",
    # r07 addition: sequence packing (q20_running_total's folded slot),
    # benchmarked from day one
    "q58_pack_documents",
    # r07 addition: span-level segment dedup (q30_supplier_degree's folded
    # slot), benchmarked from day one
    "q59_segment_dedup",
    # r07 addition: naive-Bayes token classifier (q37_numeric_parse's folded
    # slot), benchmarked from day one
    "q60_nb_quality",
    # r13: q61_bm25's bench slot follows the fold to the indexed silver
    # path (ingest + compaction + bucket-pruned probe priced from day one)
    "q71_bm25_indexed",
    # r08 additions: snapshot diff (q14's folded slot) and incremental dedup
    # vs persisted index (q33's folded slot), benchmarked from day one
    "q62_snapshot_diff",
    "q63_incremental_dedup",
    # r09 addition: end-to-end streaming ingest (q48_asof_join's folded
    # slot), benchmarked from day one
    "q64_streaming_ingest",
    # r10 additions: benchmark decontamination (q04's folded slot) and
    # deterministic mix sampling (q35's folded slot), benchmarked from day one
    "q65_contamination",
    "q66_mixture_sample",
    # r11 additions: PQ-ADC top-k (q39_ann_lsh's folded slot) and the
    # quantile-sketch rollup (q31's folded slot), benchmarked from day one
    "q67_pq_adc_topk",
    "q68_quantile_rollup",
    # r12 additions: the IVF-PQ production silver path (q32's folded slot)
    # and integer-exact RRF fusion (q47's folded slot), benchmarked from
    # day one
    "q69_ivfpq_silver",
    "q70_rrf_fusion",
]


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # events.ts type drifts across testdata generations (TIMESTAMP(NANOS) vs
    # TIMESTAMP(MICROS)); load_events branches on the actual footer schema.
    if name == "events":
        return load_events(spark, f"{sf_dir}/{name}.parquet")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _dsum(col, scale: int = 2):
    """Order-independent SUM of a double column: exact decimal accumulation,
    rendered back as double. Same expression in the SQL oracles."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double")


def _dsum_sql(expr: str, scale: int = 2) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------- A1: groupBy
# with multi-column aggregation (reference ppi.py:137-140, compound.py:202-211)
@query(
    "q01_pricing_summary",
    f"""
SELECT l_returnflag, l_linestatus,
       {_dsum_sql('l_quantity')} AS sum_qty,
       {_dsum_sql('l_extendedprice')} AS sum_base_price,
       {_dsum_sql('l_extendedprice * (1 - l_discount)', 6)} AS sum_disc_price,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-06-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2001-06-01 00:00:00").cast("timestamp")
    )
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        _dsum("l_quantity").alias("sum_qty"),
        _dsum("l_extendedprice").alias("sum_base_price"),
        _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias(
            "sum_disc_price"
        ),
        (_dsum("l_quantity") / F.count(F.lit(1))).alias("avg_qty"),
        F.count(F.lit(1)).alias("count_order"),
    )


# ------------------------------------------------- J1 multi-join + A1 rollup
@query(
    "q02_nation_revenue",
    f"""
SELECT n_name, r_name, {_dsum_sql('l_extendedprice * (1 - l_discount)', 6)} AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY n_name, r_name
""",
)
def q02_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crossbar_data_process_spark.operators.skew import salted_join

    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    big = (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
    )
    # The nation attach runs through salted_join: c_nationkey has only 25
    # distinct values — exactly the hot-key shape salting exists for — and
    # the oracle hash staying unchanged proves the salt is
    # semantics-preserving. (At this dim size Spark still broadcasts the
    # salted 25×8-row side, so the plan stays a BroadcastHashJoin; on a
    # dim too big to broadcast the same call spreads each hot key over 8
    # reducers.)
    joined = salted_join(
        big,
        n.withColumnRenamed("n_nationkey", "c_nationkey"),
        on=["c_nationkey"],
        salt=8,
        salt_cols=["o_orderkey", "l_linenumber"],
    )
    return (
        joined.join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias(
                "revenue"
            )
        )
    )


# --------------------------------------- O1/top-k + join pipeline (TPC-H Q3)
@query(
    "q03_shipping_priority",
    f"""
SELECT l_orderkey, {_dsum_sql('l_extendedprice * (1 - l_discount)', 6)} AS revenue,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate, o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
)
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias(
                "revenue"
            )
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# ----------------------------- A2/W1 keep-best-per-group (ppi.py:135-137)
# r10: folded out of the registry → slot to q65_contamination (REGISTRY.md).
# A2/W1/O1 stay hash-checked via q18_topk_per_group — the IDENTICAL
# row_number-over-ordered-window (keep-best ≡ top-k at k=1) — plus the
# hypothesis argmax property test; this exact query's former DuckDB oracle
# lives on in tests/test_operator_properties.py::test_keep_best_matches_oracle.
def q04_keep_best_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crossbar_data_process_spark.operators.dedup import keep_best

    o = _t(spark, sf_dir, "orders")
    return keep_best(
        o, ["o_custkey"], [F.desc("o_totalprice"), F.asc("o_orderkey")]
    ).select("o_custkey", "o_orderkey", "o_totalprice")


# ------------- P4 semi-join membership (ppi.py:126) + P5 anti-join exclusion
# (compound.py:179) in ONE query — both are the membership-filter shape, so
# they share an oracle row (r04 fold freeing a slot for q54; the former
# q05_semi_urgent_customers and q06_anti_customers_no_orders verbatim,
# tagged and unioned).
@query(
    "q05_membership_filters",
    """
SELECT c_custkey, c_name, 'urgent' AS tag FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
UNION ALL
SELECT c_custkey, c_name, 'no_orders' AS tag FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
""",
)
def q05_membership_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT")
    semi = semi_filter(c, urgent, [("c_custkey", "o_custkey")]).select(
        "c_custkey", "c_name", F.lit("urgent").alias("tag")
    )
    anti = anti_filter(c, o, [("c_custkey", "o_custkey")]).select(
        "c_custkey", "c_name", F.lit("no_orders").alias("tag")
    )
    return semi.unionByName(anti)


# ------------------- A4 symmetric-pair dedup with keep-best (ppi.py:135+142)
@query(
    "q07_undirected_dedup",
    """
SELECT a, b, score FROM (
  SELECT l_partkey % 50 AS a, l_suppkey % 50 AS b, l_extendedprice AS score,
         row_number() OVER (
           PARTITION BY least(l_partkey % 50, l_suppkey % 50),
                        greatest(l_partkey % 50, l_suppkey % 50)
           ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
  FROM lineitem) WHERE rn = 1
""",
)
def q07_undirected_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        (F.col("l_partkey") % 50).alias("a"),
        (F.col("l_suppkey") % 50).alias("b"),
        F.col("l_extendedprice").alias("score"),
        "l_orderkey",
        "l_linenumber",
    )
    return dedup_undirected(
        li,
        "a",
        "b",
        order_by=[F.desc("score"), F.asc("l_orderkey"), F.asc("l_linenumber")],
    ).select("a", "b", "score")


# --------------------- J5 fallback-priority lookup (disease.py:1631-1654)
@query(
    "q08_fallback_map",
    """
WITH m1 AS (SELECT n_nationkey, 'P1:' || n_name AS v FROM nation WHERE n_regionkey IN (0, 1)),
     m2 AS (SELECT n_nationkey, 'P2:' || n_name AS v FROM nation)
SELECT c_custkey, COALESCE(m1.v, m2.v) AS resolved
FROM customer
LEFT JOIN m1 ON c_nationkey = m1.n_nationkey
LEFT JOIN m2 ON c_nationkey = m2.n_nationkey
""",
)
def q08_fallback_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    m1 = n.filter(F.col("n_regionkey").isin(0, 1)).select(
        "n_nationkey", F.concat(F.lit("P1:"), F.col("n_name")).alias("v")
    )
    m2 = n.select("n_nationkey", F.concat(F.lit("P2:"), F.col("n_name")).alias("v"))
    return fallback_map(
        c,
        [(m1, "n_nationkey", "v"), (m2, "n_nationkey", "v")],
        key_col="c_nationkey",
        out_col="resolved",
    ).select("c_custkey", "resolved")


# ------------------- X3 pipe-union aggregate (compound.py:476-490), sorted
@query(
    "q09_provenance_union",
    """
SELECT o_custkey,
       array_to_string(list_sort(list(DISTINCT o_orderpriority)), '|') AS priorities,
       COUNT(*) AS n_orders
FROM orders GROUP BY o_custkey
""",
)
def q09_provenance_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.array_join(F.array_sort(F.collect_set("o_orderpriority")), "|").alias(
            "priorities"
        ),
        F.count(F.lit(1)).alias("n_orders"),
    )


# ------------------ X6 conflict-detection aggregate (drug.py:902-907)
@query(
    "q10_conflict_status",
    """
SELECT o_custkey,
       CASE WHEN COUNT(DISTINCT o_orderstatus) = 1 THEN MIN(o_orderstatus) END AS status
FROM orders GROUP BY o_custkey
""",
)
def q10_conflict_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        conflict_resolve("o_orderstatus").alias("status")
    )


# ------------------ X5 Unknown-dominance conflict ladder (tf_gen.py:381-395)
@query(
    "q11_effect_resolve",
    """
WITH m AS (
  SELECT user_id, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         CASE event_type WHEN 'purchase' THEN 'Activation'
                         WHEN 'error'    THEN 'Repression'
                         ELSE 'Unknown' END AS eff
  FROM events)
SELECT user_id, day,
       CASE WHEN COUNT(DISTINCT CASE WHEN eff <> 'Unknown' THEN eff END) = 0 THEN 'Unknown'
            WHEN COUNT(DISTINCT CASE WHEN eff <> 'Unknown' THEN eff END) = 1
                 THEN MIN(CASE WHEN eff <> 'Unknown' THEN eff END)
       END AS effect
FROM m GROUP BY user_id, day
""",
)
def q11_effect_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events").select(
        "user_id",
        F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias("day"),
        F.when(F.col("event_type") == "purchase", "Activation")
        .when(F.col("event_type") == "error", "Repression")
        .otherwise("Unknown")
        .alias("eff"),
    )
    return e.groupBy("user_id", "day").agg(tf_effect_resolve("eff").alias("effect"))


# ---------- X1 median aggregate (compound.py:461-462) + X2 middle-row pick
# (compound.py:464-474, len//2) in ONE query — both are single-groupBy custom
# aggregates, so one pass over orders exercises both against one oracle
# (r04 fold freeing a slot for q55; the former q12_median's agg_median and
# q13_middle_row's agg_middle_row verbatim, same group keys).
@query(
    "q12_median_middle",
    """
SELECT o_orderpriority, CAST(year(o_orderdate) AS BIGINT) AS yr,
       round(median(o_totalprice), 3) AS med_price,
       (list(o_totalprice ORDER BY o_totalprice))[CAST(COUNT(*) // 2 AS INT) + 1]
         AS middle_price
FROM orders GROUP BY o_orderpriority, yr
""",
)
def q12_median_middle(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").withColumn(
        "yr", F.year("o_orderdate").cast("long")
    )
    return o.groupBy("o_orderpriority", "yr").agg(
        agg_median("o_totalprice").alias("med_price"),
        agg_middle_row("o_totalprice").alias("middle_price"),
    )


# --------------------------- X9/F1 explode + token aggregation
# r08: folded out of the registry → slot to q62_snapshot_diff (REGISTRY.md).
# explode/split stay hash-checked via q59 (posexplode segments) and the
# q25/q26 shingle chains; this exact query's former DuckDB oracle lives on in
# tests/test_operator_properties.py::test_explode_tokens_matches_oracle.
def q14_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return (
        p.select("p_partkey", F.explode(F.split("p_name", " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("p_partkey").alias("n_parts"),
        )
    )


# ----------------- F4/F5/F6 id surgery: CURIE build, sanitize, last-segment,
# bioregistry-style prefix canonicalization. The alias list deliberately
# mixes case and alias/canonical forms; the oracle computes the expected
# canonical per alias through the SAME Python table
# (functions.ids.PREFIX_ALIASES), so Spark's in-plan literal-map lookup and
# the SQL expectation can never drift.
_Q15_RAW_PREFIXES = ["UniProt", "GENEID", "MIM", "supplier"]


def _q15_oracle() -> str:
    from crossbar_data_process_spark.functions.ids import PREFIX_ALIASES

    case = " ".join(
        f"WHEN {i} THEN '{PREFIX_ALIASES.get(p.lower(), p.lower())}'"
        for i, p in enumerate(_Q15_RAW_PREFIXES)
    )
    return f"""
SELECT s_suppkey,
       'supplier:' || s_suppkey AS curie,
       (CASE s_suppkey % {len(_Q15_RAW_PREFIXES)} {case} END)
         || ':' || s_suppkey AS curie_norm,
       translate(upper(s_name), '''|', '^,') AS name_clean,
       (string_split(s_name, '#'))[-1] AS local_id,
       CAST(replace(format('{{:,}}', s_suppkey * 1000 + s_nationkey), ',', '')
            AS BIGINT) AS parsed_back,
       CAST((string_split(s_name, '#'))[-1] AS INT) AS local_num
FROM supplier
"""


@query("q15_curie_ids", _q15_oracle())
def q15_curie_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crossbar_data_process_spark.functions.ids import (
        add_curie_prefix,
        clean_number,
        normalize_curie,
        sanitize_graph_chars,
        strip_prefix,
    )

    s = _t(spark, sf_dir, "supplier")
    raw_prefix = F.element_at(
        F.array(*[F.lit(p) for p in _Q15_RAW_PREFIXES]),
        (F.pmod(F.col("s_suppkey"), F.lit(len(_Q15_RAW_PREFIXES))) + 1).cast("int"),
    )
    return s.select(
        "s_suppkey",
        add_curie_prefix(F.col("s_suppkey").cast("string"), "supplier").alias("curie"),
        normalize_curie(
            F.concat_ws(":", raw_prefix, F.col("s_suppkey").cast("string"))
        ).alias("curie_norm"),
        sanitize_graph_chars(F.upper(F.col("s_name"))).alias("name_clean"),
        strip_prefix("s_name", "#").alias("local_id"),
        # r07 fold of q37_numeric_parse (F5/F7): comma-number round-trip +
        # delimited numeric prefix parse, composed into the scalar-function row
        clean_number(
            F.format_number(F.col("s_suppkey") * 1000 + F.col("s_nationkey"), 0)
        ).alias("parsed_back"),
        F.element_at(F.split("s_name", "#"), -1).cast("int").alias("local_num"),
    )


# -------------------- J4 broadcast mapping join (ppi.py:209-226 as a join)
@query(
    "q16_brand_revenue",
    f"""
SELECT p_brand,
       {_dsum_sql('l_extendedprice * (1 - l_discount)', 6)} AS revenue,
       {_dsum_sql('l_quantity')} AS qty,
       COUNT(*) AS n
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
""",
)
def q16_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias(
                "revenue"
            ),
            _dsum("l_quantity").alias("qty"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# ------- J1/J2 flagship: multi-source outer merge with coalescers + X4 union
@query(
    "q17_multi_source_merge",
    f"""
WITH s1 AS (SELECT o_custkey AS custkey, COUNT(*) AS cnt,
                   {_dsum_sql('o_totalprice')} AS total
            FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey),
     s2 AS (SELECT o_custkey AS custkey, COUNT(*) AS cnt,
                   {_dsum_sql('o_totalprice')} AS total
            FROM orders WHERE o_orderpriority = '2-HIGH' GROUP BY o_custkey),
     s3 AS (SELECT o_custkey AS custkey, COUNT(*) AS cnt,
                   {_dsum_sql('o_totalprice')} AS total
            FROM orders WHERE o_orderpriority = '3-MEDIUM' GROUP BY o_custkey)
SELECT COALESCE(s1.custkey, s2.custkey, s3.custkey) AS custkey,
       COALESCE(s1.cnt, s2.cnt, s3.cnt) AS cnt,
       COALESCE(s1.total, s2.total, s3.total) AS total,
       concat_ws('|',
         CASE WHEN s1.custkey IS NOT NULL THEN 'urgent' END,
         CASE WHEN s2.custkey IS NOT NULL THEN 'high' END,
         CASE WHEN s3.custkey IS NOT NULL THEN 'medium' END) AS sources
FROM s1
FULL OUTER JOIN s2 ON s1.custkey = s2.custkey
FULL OUTER JOIN s3 ON COALESCE(s1.custkey, s2.custkey) = s3.custkey
""",
)
def q17_multi_source_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")

    def src(priority: str, tag: str) -> DataFrame:
        return (
            o.filter(F.col("o_orderpriority") == priority)
            .groupBy(F.col("o_custkey").alias("custkey"))
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                _dsum("o_totalprice").alias("total"),
                F.array(F.lit(tag)).alias("sources"),
            )
        )

    merged = outer_merge(
        [src("1-URGENT", "urgent"), src("2-HIGH", "high"), src("3-MEDIUM", "medium")],
        on=["custkey"],
        specs=[
            CoalesceSpec("cnt", "first_non_null"),
            CoalesceSpec("total", "first_non_null"),
            CoalesceSpec("sources", "array_union"),
        ],
    )
    return merged.select(
        "custkey", "cnt", "total", F.array_join("sources", "|").alias("sources")
    )


# --------------------------------- O3 top-k per group (disgenet limit param)
@query(
    "q18_topk_per_group",
    """
SELECT o_orderpriority, o_orderkey, o_totalprice, CAST(rnk AS BIGINT) AS rnk FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey) AS rnk
  FROM orders) WHERE rnk <= 3
""",
)
def q18_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    out = top_k_per_group(
        o,
        ["o_orderpriority"],
        [F.desc("o_totalprice"), F.asc("o_orderkey")],
        3,
        rank_col="rnk",
    )
    return out.select(
        "o_orderpriority", "o_orderkey", "o_totalprice", F.col("rnk").cast("long").alias("rnk")
    )


# --------------- bucketed point-in-interval range join (engine extension;
# SURVEY §2.3 time-series join family). q19_union_sources was folded out in
# r6 (U1 remains oracled via q09/q40's unions) to keep the registry at 50.
@query(
    "q56_range_join",
    f"""
WITH bands AS (
  SELECT i AS band_id, i * 10000 AS lo, i * 10000 + 15000 AS hi
  FROM range(0, 60) t(i))
SELECT band_id, COUNT(*) AS n_orders, {_dsum_sql('o_totalprice')} AS total
FROM orders JOIN bands ON o_totalprice BETWEEN lo AND hi
GROUP BY band_id
""",
)
def q56_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping price bands (width 15000, stride 10000 — most orders land
    in two bands) joined to orders via the bucketed equi-join plan of
    operators.rangejoin — never a nested loop, unlike what Spark plans for
    a raw BETWEEN condition."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    bands = spark.range(0, 60).select(
        F.col("id").alias("band_id"),
        (F.col("id") * 10000).cast("double").alias("lo"),
        (F.col("id") * 10000 + 15000).cast("double").alias("hi"),
    )
    joined = bucketed_range_join(
        o, bands, "o_totalprice", "lo", "hi", bucket_width=15000.0
    )
    return joined.groupBy("band_id").agg(
        F.count(F.lit(1)).alias("n_orders"), _dsum("o_totalprice").alias("total")
    )


# ------------- W: sequence packing over a running-total window (r07 fold:
# q20_running_total's cumsum-window coverage lives on INSIDE this oracle —
# the exclusive running sum is the same window family, now composed into
# the training-prep packing operator; see REGISTRY.md)
@query(
    "q58_pack_documents",
    r"""
WITH toks AS (
  SELECT doc_id,
         CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                              x -> x <> '')) AS BIGINT) AS n_tokens,
         CAST(doc_id % 8 AS INTEGER) AS bucket,
         md5(CAST(doc_id AS VARCHAR)) AS k
  FROM documents
), cums AS (
  SELECT doc_id, n_tokens, bucket, k,
         SUM(n_tokens) OVER (PARTITION BY bucket ORDER BY k
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS ce
  FROM toks
)
SELECT doc_id, n_tokens, bucket,
       CAST(CAST(bucket AS BIGINT) * 1099511627776 + (ce // 512) AS BIGINT) AS pack_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY CAST(bucket AS BIGINT) * 1099511627776 + (ce // 512)
                               ORDER BY ce, k) - 1 AS BIGINT) AS pack_pos
FROM cums
""",
)
def q58_pack_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-budget sequence packing (operators/packing.pack_documents):
    whole documents greedily packed to a 512-token budget inside 8
    deterministic buckets via ONE exclusive running-sum window. The
    oracle replays the identical md5-ordered window in DuckDB, so the
    greedy assignment itself — not just row counts — is hash-pinned.
    Bucket = doc_id % 8 here (both engines share it exactly); the
    operator's default crc32(md5) bucket has no DuckDB twin."""
    from crossbar_data_process_spark.operators.packing import pack_documents

    d = _t(spark, sf_dir, "documents").withColumn(
        "bucket", F.pmod(F.col("doc_id"), F.lit(8)).cast("int")
    )
    out = pack_documents(d, budget=512, n_buckets=8, bucket_col="bucket")
    return out.select(
        "doc_id",
        "n_tokens",
        "bucket",
        "pack_id",
        F.col("pack_pos").cast("long").alias("pack_pos"),
    )


# ====================== LLM-pipeline extensions (SURVEY §7.1 step 7) =======


@query(
    "q21_doc_exact_dedup",
    """
SELECT substr(md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')), 1, 16) AS fp,
       MIN(doc_id) AS doc_id, COUNT(*) AS dup_count
FROM documents GROUP BY fp
""",
)
def q21_doc_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return doc_dedup_exact(d)


# Span-level (sub-document) exact dedup at fixed 8-token granularity — the
# corpus-wide duplicated-substring removal pass (Lee et al. 2022) as a hash
# problem: posexplode segments → first-occurrence by groupBy-MIN on the md5
# (skew-safe; never a window over the hash) → ONE reassembly groupBy.
# r07: q30_supplier_degree's folded slot (REGISTRY.md).
@query(
    "q59_segment_dedup",
    r"""
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS toks
  FROM documents),
segs AS (
  SELECT doc_id, i - 1 AS seg_idx,
         array_to_string(toks[(i-1)*8+1:(i-1)*8+8], ' ') AS seg
  FROM t, UNNEST(range(1, CAST(ceil(len(toks) / 8.0) AS BIGINT) + 1)) AS u(i)),
flagged AS (
  SELECT doc_id, seg_idx, seg,
         (COUNT(*) OVER (PARTITION BY seg) < 2
          OR ROW_NUMBER() OVER (PARTITION BY seg ORDER BY doc_id, seg_idx) = 1) AS keep
  FROM segs)
SELECT doc_id,
       COALESCE(string_agg(seg, ' ' ORDER BY seg_idx) FILTER (WHERE keep), '') AS clean_text,
       CAST(COUNT(*) AS BIGINT) AS n_segs,
       CAST(COUNT(*) FILTER (WHERE keep) AS BIGINT) AS kept_segs,
       CAST(COUNT(*) FILTER (WHERE NOT keep) AS BIGINT) AS dropped_segs
FROM flagged GROUP BY doc_id
""",
)
def q59_segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crossbar_data_process_spark.operators.textdedup import segment_dedup

    d = _t(spark, sf_dir, "documents")
    return segment_dedup(d, k=8, min_doc_freq=2)


def _stop_pat() -> str:
    return r"\b(" + "|".join(STOPWORDS) + r")\b"


# Consolidated per-document profile: token counts (whitespace + BPE-style),
# content fingerprint, quality score, and language ID in ONE linear pass —
# one row per doc, every charter text-analysis function exercised by one
# oracle (r02 folded the former q22/q23/q24/q50 so the declared set fits
# the driver's 50-row CORRECTNESS window without losing operator coverage).
_FP_SQL = (
    "substr(md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')), 1, 16)"
)

_QUALITY_SQL = """round(
         (CASE WHEN ntok BETWEEN 10 AND 100000 THEN 0.5 ELSE 0.0 END)
         + least((CASE WHEN ntok > 0 THEN round(swhits * 1.0 / ntok, 6) ELSE 0.0 END) * 2, 0.3)
         - least(CASE WHEN nch > 0 THEN round(njunk * 1.0 / nch, 6) ELSE 0.0 END, 0.2)
         + 0.2, 6)"""


def _profile_ctes(src: str = "documents") -> str:
    """The s/h/best CTE chain behind the per-document profile (token count,
    stopword/junk ratios, language-marker hits) — shared by the q22 profile
    oracle and the q55 curation-funnel oracle so the gate expressions cannot
    drift between them."""
    selects = []
    for lang, words in sorted(LANG_MARKERS.items()):
        pat = r"\b(" + "|".join(words) + r")\b"
        selects.append(
            f"SELECT doc_id, '{lang}' AS lang, len(regexp_extract_all(lower(text), '{pat}')) AS hits FROM {src}"
        )
    union = "\nUNION ALL\n".join(selects)
    return f"""s AS (
  SELECT doc_id, text, lang, n_chars,
         len(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '')) AS ntok,
         len(regexp_extract_all(lower(text), '{_stop_pat()}')) AS swhits,
         length(text) AS nch,
         length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS njunk
  FROM {src}),
h AS ({union}),
best AS (
  SELECT doc_id, lang FROM h WHERE hits > 0
  QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, lang DESC) = 1)"""


def _doc_profile_oracle() -> str:
    from crossbar_data_process_spark.functions.text import BPE_SPLIT_PATTERN

    bpe = BPE_SPLIT_PATTERN.replace("'", "''")
    # r07: + dup_3gram_ratio (Gopher-style repetition signal) — NON-distinct
    # 3-grams, 1 - distinct/total, same descending-sequence guard as the
    # Spark side (greatest(...) keeps the range empty for short docs)
    dup3 = (
        "(SELECT CASE WHEN greatest(len(t2) - 2, 0) > 0 THEN round("
        "(greatest(len(t2) - 2, 0) - len(list_distinct("
        "list_transform(range(1, greatest(len(t2) - 2, 0) + 1), "
        "i -> array_to_string(t2[i:i+2], ' '))))) * 1.0 "
        "/ greatest(len(t2) - 2, 0), 6) ELSE 0.0 END "
        "FROM (SELECT list_filter(regexp_split_to_array(trim(s.text), "
        "'\\s+'), x -> x <> '') AS t2))"
    )
    # r07-late: + log_ppl (corpus unigram-LM surprisal, the CCNet
    # perplexity-filter analogue — operators/lm.py). The LM CTEs mirror
    # doc_surprisal exactly: Lidstone α=0.5, logp rounded 1e-6, DECIMAL
    # accumulation, one IEEE division; perplexity = e^log_ppl (log form
    # reported so no cross-engine exp() enters the hash).
    return f"""
WITH {_profile_ctes()},
tok2 AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                            x -> x <> '')) AS token
  FROM documents),
cnt2 AS (SELECT token, COUNT(*) AS c FROM tok2 GROUP BY token),
tot2 AS (
  SELECT CAST(SUM(c) AS DOUBLE) AS t_mass, CAST(COUNT(*) AS DOUBLE) AS vocab
  FROM cnt2),
lp AS (
  -- floor-based fixed rounding: round()'s x.xxxxxx5 half-cases resolve
  -- differently across engines (measured at sf0.1); floor is exact in both
  SELECT token,
         floor(ln((c + 0.5) / (t_mass + 0.5 * vocab)) * 1000000.0 + 0.5)
           / 1000000.0 AS logp
  FROM cnt2, tot2),
ppl AS (
  SELECT doc_id,
         floor((-CAST(SUM(CAST(logp AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*))
               * 1000000.0 + 0.5) / 1000000.0 AS log_ppl
  FROM tok2 JOIN lp USING (token) GROUP BY doc_id)
SELECT s.doc_id,
       CAST(ntok AS BIGINT) AS n_tokens,
       CAST(len(regexp_extract_all(text, '{bpe}')) AS BIGINT) AS bpe_tokens,
       {_FP_SQL} AS fp,
       n_chars,
       {_QUALITY_SQL} AS quality,
       {dup3} AS dup_3gram_ratio,
       ppl.log_ppl AS log_ppl,
       COALESCE(best.lang, 'und') AS lang_detected,
       s.lang AS lang_labeled
FROM s LEFT JOIN best ON s.doc_id = best.doc_id
       LEFT JOIN ppl ON s.doc_id = ppl.doc_id
"""


@query("q22_doc_profile", _doc_profile_oracle())
def q22_doc_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crossbar_data_process_spark.functions.text import (
        bpe_token_count,
        duplicate_ngram_ratio,
    )
    from crossbar_data_process_spark.operators.lm import doc_surprisal

    d = _t(spark, sf_dir, "documents")
    profile = d.select(
        "doc_id",
        token_count("text").cast("long").alias("n_tokens"),
        bpe_token_count("text").cast("long").alias("bpe_tokens"),
        doc_fingerprint("text").alias("fp"),
        "n_chars",
        quality_score("text").alias("quality"),
        duplicate_ngram_ratio("text", n=3).alias("dup_3gram_ratio"),
        language_id("text").alias("lang_detected"),
        F.col("lang").alias("lang_labeled"),
    )
    # r07-late: + unigram-LM surprisal (left join keeps zero-token docs)
    ppl = doc_surprisal(d).select("doc_id", "log_ppl")
    return profile.join(ppl, "doc_id", "left").select(
        "doc_id", "n_tokens", "bpe_tokens", "fp", "n_chars", "quality",
        "dup_3gram_ratio", "log_ppl", "lang_detected", "lang_labeled",
    )


# Distributed multinomial naive-Bayes token classifier (the fastText-style
# quality-classifier stage of LLM curation) trained SELF-SUPERVISED against
# the engine's own heuristic quality gate (quality_score >= 0.82 — a
# balanced ~52/48 split on this corpus, and the classifier recovers it at
# ~90% vs a ~52% majority baseline: tests/test_classifier.py) and applied
# corpus-wide in the same plan: ONE token groupBy to fit, one equi-join +
# doc groupBy to score, totals/prior as 1-row broadcasts. Weights round at
# 1e-6 and accumulate in DECIMAL (engine _dsum convention) so scores
# hash-match DuckDB exactly. The label reuses the exact _QUALITY_SQL
# expression the q22/q55 oracles share, so the heuristic being distilled
# cannot drift from the declared gate.
# r07: q37_numeric_parse's folded slot (merged into q15 — REGISTRY.md).
def _nb_oracle(tau: float = 0.82) -> str:
    return f"""
WITH s AS (
  SELECT doc_id, text,
         len(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '')) AS ntok,
         len(regexp_extract_all(lower(text), '{_stop_pat()}')) AS swhits,
         length(text) AS nch,
         length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS njunk
  FROM documents),
lab AS (SELECT doc_id, text, ({_QUALITY_SQL} >= {tau}) AS y FROM s),
tok AS (
  SELECT doc_id, y,
         unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                            x -> x <> '')) AS token
  FROM lab),
stats AS (
  SELECT token,
         COUNT(*) FILTER (WHERE y) AS c_pos,
         COUNT(*) FILTER (WHERE NOT y) AS c_neg
  FROM tok GROUP BY token),
tot AS (
  SELECT CAST(SUM(c_pos) AS DOUBLE) AS g_mass,
         CAST(SUM(c_neg) AS DOUBLE) AS b_mass,
         CAST(COUNT(*) AS DOUBLE) AS vocab
  FROM stats),
w AS (
  -- floor-based fixed rounding (see the q22 lp CTE note): round()'s
  -- half-cases are engine-specific; floor is exact in both
  SELECT token,
         floor(ln((c_pos + 1.0) * (b_mass + vocab)
                  / ((c_neg + 1.0) * (g_mass + vocab))) * 1000000.0 + 0.5)
           / 1000000.0 AS w
  FROM stats, tot),
prior AS (
  SELECT floor(ln((COUNT(*) FILTER (WHERE y) + 1.0)
               / (COUNT(*) FILTER (WHERE NOT y) + 1.0)) * 1000000.0 + 0.5)
           / 1000000.0 AS prior
  FROM lab),
agg AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_scored_tokens,
         SUM(CAST(w AS DECIMAL(28,6))) AS wsum
  FROM tok JOIN w USING (token) GROUP BY doc_id)
SELECT doc_id, n_scored_tokens,
       CAST(wsum AS DOUBLE) + prior AS nb_score,
       (CAST(wsum AS DOUBLE) + prior) > 0 AS nb_pred
FROM agg, prior
"""


@query("q60_nb_quality", _nb_oracle())
def q60_nb_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crossbar_data_process_spark.operators.classifier import nb_classify

    d = _t(spark, sf_dir, "documents")
    return nb_classify(d, label=quality_score("text") >= 0.82)


# BM25 retrieval scoring (the search/RAG ranking half of a corpus pipeline)
# as pure DataFrame aggs: inverted term stats in two groupBys, corpus
# scalars on a 1-row broadcast, scoring via the query-term ⋈ tf access path
# (never corpus × queries), 1e-6-rounded contributions DECIMAL-summed. The
# query set derives deterministically from the corpus itself (every 97th
# doc's first 4 tokens). NB: on this synthetic 31-word shared vocabulary no
# term is discriminative, so self-retrieval is NOT guaranteed (and not
# claimed) — the hash pins the exact scoring math; semantic ranking
# behavior is pinned on planted corpora in tests/test_retrieval.py.
# r07: q42_min_cost_supplier's folded slot (REGISTRY.md).
# r12: the oracle's CTE chain is shared VERBATIM with q70_rrf_fusion (the
# lexical arm of the fusion is this exact ranking) — one definition, two
# oracles, so the two rows can never drift apart.
_BM25_CTES = r"""dtok AS (
  SELECT doc_id AS doc,
         unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                            x -> x <> '')) AS term
  FROM documents),
tf AS (SELECT doc, term, COUNT(*) AS tf FROM dtok GROUP BY doc, term),
dl AS (SELECT doc, CAST(SUM(tf) AS DOUBLE) AS dl FROM tf GROUP BY doc),
stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(dl) AS avgdl FROM dl),
dfx AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
idf AS (
  -- floor-based fixed rounding (see the q22 lp CTE note)
  SELECT term,
         floor(ln(1 + (n_docs - df + 0.5) / (df + 0.5)) * 1000000.0 + 0.5)
           / 1000000.0 AS idf,
         avgdl
  FROM dfx, stats),
q AS (
  -- FIXED query workload: the doc_id < 5000 bound keeps the query count
  -- constant as the corpus grows (a benchmark whose query set scales with
  -- the corpus measures Q x N growth, not per-query cost — the sf1 probe
  -- measured slope 45 on the unbounded form because every term of this
  -- 31-word vocabulary matches every document)
  SELECT doc_id AS qid,
         array_to_string(
           (list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                        x -> x <> ''))[1:4], ' ') AS qt
  FROM documents WHERE doc_id % 97 = 0 AND doc_id < 5000),
qterms AS (
  SELECT qid,
         unnest(list_distinct(
           list_filter(regexp_split_to_array(qt, '\s+'), x -> x <> ''))) AS term
  FROM q),
contrib AS (
  SELECT qid, doc,
         floor(((idf * (tf * 2.2))
               / (tf + 1.2 * (0.25 + (0.75 * dl) / avgdl))) * 1000000.0 + 0.5)
           / 1000000.0 AS c
  FROM qterms JOIN tf USING (term) JOIN dl USING (doc) JOIN idf USING (term)),
scored AS (
  SELECT qid, doc,
         CAST(SUM(CAST(c AS DECIMAL(28,6))) AS DOUBLE) AS score
  FROM contrib GROUP BY qid, doc)"""


# r13: q61_bm25 folded out of the registry → slot to q71_bm25_indexed
# (REGISTRY.md). The function stays for tests and as the documented batch
# form; its ranking math remains registry-oracled TWICE — q70_rrf_fusion's
# lexical arm runs this exact bm25_topk call against the same _BM25_CTES
# text, and q71's oracle IS the former q61 oracle verbatim (indexed
# rankings ≡ batch rankings bit-for-bit, pinned in tests/test_retrieval.py).
def q61_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crossbar_data_process_spark.operators.retrieval import bm25_topk

    d = _t(spark, sf_dir, "documents")
    q = d.filter((F.col("doc_id") % 97 == 0) & (F.col("doc_id") < 5000)).select(
        F.col("doc_id").alias("query_id"),
        F.array_join(F.slice(tokens(F.lower(F.col("text"))), 1, 4), " ").alias(
            "query_text"
        ),
    )
    return bm25_topk(d, q, top_k=10)


# -------- persisted BM25 index silver (operators/retrieval.py:
# bm25_index_ingest → compact_bm25_index → bm25_topk_indexed) under the
# hash gate — r13 (VERDICT r12 #4), the retrieval twin of q63's
# dedup_index and the q69 silver-path precedent. The corpus is ingested
# into the index in TWO doc-disjoint batches (doc_id parity — per-batch
# work is batch-sized, the existing index is never read), the FULL index
# is COMPACTED (df/stats folds plus — r14 — the tf/dl bin-pack rewrite,
# all under the staging-dir + pending-marker protocol), and the
# probe runs against the persisted silver: qterms partition-prune the tf
# scan on the term_bucket column, df(term) = Σ per-batch partials,
# avgdl = Σ total_dl / Σ n_docs. Everything BM25 needs is additive over
# disjoint batches and dl values are integer token counts (double sums
# < 2^53 are exact), so indexed rankings equal the batch path's
# bit-for-bit and q61's oracle applies VERBATIM — while the batch ingest,
# compaction fold, meta identity check, and bucket-pruned probe all
# execute under the driver's rows+schema+hash check. The same fixed query
# carve as q61 (doc_id % 97 = 0 AND doc_id < 5000, _WORKLOAD_BOUNDS).
@query(
    "q71_bm25_indexed",
    f"""
WITH {_BM25_CTES}
SELECT qid AS query_id, doc AS doc_id, score, rnk FROM (
  SELECT *, row_number() OVER (PARTITION BY qid
                               ORDER BY score DESC, doc) AS rnk
  FROM scored)
WHERE rnk <= 10
""",
)
def q71_bm25_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ingest (2 disjoint batches) → compact → probe the persisted index.
    A fresh pid-scoped silver per invocation (ingest APPENDS batch dirs,
    so unlike q69's overwrite-reuse the dir must start empty or a rerun
    would double-ingest); removed at interpreter exit."""
    import atexit
    import os
    import shutil
    import tempfile

    from crossbar_data_process_spark.operators.retrieval import (
        bm25_index_ingest,
        bm25_topk_indexed,
        compact_bm25_index,
    )

    d = _t(spark, sf_dir, "documents")
    q = d.filter((F.col("doc_id") % 97 == 0) & (F.col("doc_id") < 5000)).select(
        F.col("doc_id").alias("query_id"),
        F.array_join(F.slice(tokens(F.lower(F.col("text"))), 1, 4), " ").alias(
            "query_text"
        ),
    )
    silver = os.path.join(
        tempfile.gettempdir(), f"bm25_silver_q71_{os.getpid()}"
    )
    shutil.rmtree(silver, ignore_errors=True)
    atexit.register(shutil.rmtree, silver, ignore_errors=True)
    # single-file parquet scans arrive as ONE partition; tokenization is
    # the CPU-heavy scan-side stage (the q69 _spread convention applies
    # inside _doc_tf)
    bm25_index_ingest(d.filter(F.pmod(F.col("doc_id"), F.lit(2)) == 0), silver, "b0")
    bm25_index_ingest(d.filter(F.pmod(F.col("doc_id"), F.lit(2)) == 1), silver, "b1")
    compact_bm25_index(spark, silver)
    return bm25_topk_indexed(spark, silver, q)



# The DECLARED form carries the stop-shingle cap (max_doc_freq=20): shingles
# in more than 20 documents are dropped from candidate generation AND the
# intersection count (jaccard becomes a lower bound — |A|,|B| stay full-size).
# A constant cap bounds candidate volume to Σ_{df≤τ} df² ≤ τ·|index|, i.e.
# LINEAR in corpus size — the unbounded exact form measured slope 41 on the
# 10× sf1 probe (Σdf² grows quadratically in duplicate density) and survives
# only as the test-side recall oracle (max_doc_freq=None, the operator
# default). τ=20 ≈ the 99.9th-percentile doc-frequency at sf0.1 (max 25), so
# at the sf0.01 correctness gate (max df 7) the cap is exercised-but-no-op
# and the oracle pins identical semantics by implementing the same df filter.
@query(
    "q25_ngram_jaccard",
    """
WITH toks AS (
  SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '') AS t
  FROM documents),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(t) - 2, 0) + 1),
                                      i -> array_to_string(t[i:i+2], ' '))) AS s
  FROM toks),
ex0 AS (SELECT doc_id, len(s) AS nsh, unnest(s) AS tok FROM sh),
df AS (SELECT tok, COUNT(*) AS c FROM ex0 GROUP BY tok),
ex AS (SELECT e.doc_id, e.nsh, e.tok
       FROM ex0 e JOIN df ON e.tok = df.tok WHERE df.c <= 20),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.nsh AS na, b.nsh AS nb,
         COUNT(*) AS i
  FROM ex a JOIN ex b ON a.tok = b.tok AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4)
SELECT doc_a, doc_b, round(i * 1.0 / (na + nb - i), 6) AS jaccard
FROM pairs WHERE round(i * 1.0 / (na + nb - i), 6) >= 0.5
""",
)
def q25_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(d, n=3, threshold=0.5, max_doc_freq=20)


# MinHash-LSH oracle: the whole pipeline is deterministic md5 + LCG
# arithmetic, so it ports to SQL verbatim — the same 32-bit md5-prefix hash
# as q26b, the same 12 (A*h + B) mod P permutations (constants imported from
# operators.textdedup so Spark and SQL can never drift), the same 6 bands of
# 2 rows, and the same exact-Jaccard verify as q25.
def _minhash_ctes(num_hashes: int = 12, bands: int = 6, src: str = "documents") -> str:
    """The shared CTE chain ending in ``j`` (candidate pairs + exact-Jaccard
    terms) — composed by the q26 oracle, the q53 cluster-resolution oracle,
    and (over the gated/exact-deduped ``src`` CTE) the q55 curation-funnel
    oracle, so Spark and SQL can never drift on the pair set."""
    r = num_hashes // bands
    hash32 = (
        "list_sum(list_transform(range(1, 9), "
        "i -> (strpos('0123456789abcdef', md5(tok)[i:i]) - 1) "
        "* (1::BIGINT << (4 * (8 - i)))))"
    )
    mins = ", ".join(
        f"list_min(list_transform(h, x -> ({_A[i]} * x + {_B[i]}) % {_P}))"
        for i in range(num_hashes)
    )
    key = " || '_' || ".join(
        f"CAST(sig[{r} * bi + {j + 1}] AS VARCHAR)" for j in range(r)
    )
    return f"""toks AS (
  SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '') AS t
  FROM {src}),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(t) - 2, 0) + 1),
                                      i -> array_to_string(t[i:i+2], ' '))) AS s
  FROM toks),
nz AS (SELECT doc_id, s, len(s) AS nsh FROM sh WHERE len(s) > 0),
hs AS (SELECT doc_id, list_transform(s, tok -> {hash32}) AS h FROM nz),
sig AS (SELECT doc_id, [{mins}] AS sig FROM hs),
bands AS (
  SELECT doc_id, bi, {key} AS key
  FROM sig CROSS JOIN range(0, {bands}) t(bi)),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.bi = b.bi AND a.key = b.key AND a.doc_id < b.doc_id),
j AS (
  SELECT c.doc_a, c.doc_b, len(list_intersect(ia.s, ib.s)) AS i,
         ia.nsh AS na, ib.nsh AS nb
  FROM cand c JOIN nz ia ON ia.doc_id = c.doc_a
              JOIN nz ib ON ib.doc_id = c.doc_b)"""


def _minhash_oracle(num_hashes: int = 12, bands: int = 6, threshold: float = 0.5) -> str:
    return f"""
WITH {_minhash_ctes(num_hashes, bands)}
SELECT doc_a, doc_b, round(i * 1.0 / (na + nb - i), 6) AS jaccard
FROM j WHERE round(i * 1.0 / (na + nb - i), 6) >= {threshold}
"""


def _neardup_resolve_oracle(threshold: float = 0.5) -> str:
    """MinHash-LSH pairs → undirected min-reachable components (recursive
    CTE) → min-id survivor per cluster + singleton pass-through — the SQL
    statement of operators.textdedup.resolve_neardups."""
    return f"""
WITH RECURSIVE {_minhash_ctes()},
pairs AS (
  SELECT doc_a, doc_b FROM j
  WHERE round(i * 1.0 / (na + nb - i), 6) >= {threshold}),
sym AS (SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION SELECT doc_b, doc_a FROM pairs),
pnodes AS (SELECT DISTINCT a AS id FROM sym),
walk(id, r) AS (
  SELECT id, id FROM pnodes
  UNION
  SELECT w.id, s.b FROM walk w JOIN sym s ON w.r = s.a),
comp AS (SELECT id, MIN(r) AS component FROM walk GROUP BY id),
clusters AS (SELECT MIN(id) AS doc_id, COUNT(*) AS cluster_size
             FROM comp GROUP BY component)
SELECT doc_id, CAST(cluster_size AS BIGINT) AS cluster_size FROM clusters
UNION ALL
SELECT doc_id, CAST(1 AS BIGINT) AS cluster_size FROM documents
WHERE doc_id NOT IN (SELECT id FROM pnodes)
"""


@query("q26_minhash_lsh", _minhash_oracle())
def q26_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return minhash_lsh_pairs(d, n=3, num_hashes=12, bands=6, threshold=0.5)


# ---------- near-dup cluster RESOLUTION (pairs → components → survivors):
# the end-to-end dedup contract — every doc either survives as its cluster's
# min-id representative (carrying the member count) or passes through with
# cluster_size 1. Mirrors dedup_exact's survivors shape; the reference's
# every dedup returns surviving rows (edge_data/ppi.py:142).
# r15: q53_neardup_resolve folded out of the registry → slot to
# q73_semantic_dedup_ingest (REGISTRY.md fold table). The recursive
# min-label component walk it oracled stays registry-checked THREE ways —
# q55_curation_funnel and q64_streaming_ingest carry the identical
# text-side walk composed in their oracles, and q73 now runs the SAME walk
# over embedding pairs — and the former standalone oracle lives on
# verbatim in tests/test_operator_properties.py::
# test_neardup_resolve_matches_oracle.
def q53_neardup_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crossbar_data_process_spark.operators.textdedup import resolve_neardups

    d = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(d, n=3, num_hashes=12, bands=6, threshold=0.5)
    return resolve_neardups(d, pairs)


# ---------- end-to-end curation funnel (plans/llm_curation.py): profile →
# quality/language gate → exact dedup → MinHash-LSH near-dup resolution,
# plus the funnel report, all in ONE oracle — the composed CTE chain reuses
# _profile_ctes (gate expressions) and _minhash_ctes (pair set) verbatim,
# so no stage can drift from its individually-oracled form (q22/q21/q26/q53).
def _curation_funnel_oracle(
    min_quality: float = 0.4, language: str = "en", threshold: float = 0.5
) -> str:
    return f"""
WITH RECURSIVE {_profile_ctes()},
profiled AS (
  SELECT s.doc_id, s.text,
         CAST(ntok AS BIGINT) AS n_tokens,
         {_QUALITY_SQL} AS quality,
         COALESCE(best.lang, 'und') AS lang_detected,
         {_FP_SQL} AS fp
  FROM s LEFT JOIN best ON s.doc_id = best.doc_id),
gated AS (
  SELECT * FROM profiled
  WHERE quality >= {min_quality} AND lang_detected IN ('{language}')),
exact AS (
  SELECT doc_id, text, n_tokens, quality, lang_detected FROM gated
  QUALIFY row_number() OVER (PARTITION BY fp ORDER BY doc_id) = 1),
{_minhash_ctes(src='exact')},
pairs AS (
  SELECT doc_a, doc_b FROM j
  WHERE round(i * 1.0 / (na + nb - i), 6) >= {threshold}),
sym AS (SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION SELECT doc_b, doc_a FROM pairs),
pnodes AS (SELECT DISTINCT a AS id FROM sym),
walk(id, r) AS (
  SELECT id, id FROM pnodes
  UNION
  SELECT w.id, sy.b FROM walk w JOIN sym sy ON w.r = sy.a),
comp AS (SELECT id, MIN(r) AS component FROM walk GROUP BY id),
clusters AS (SELECT MIN(id) AS doc_id, COUNT(*) AS cluster_size
             FROM comp GROUP BY component),
survivors AS (
  SELECT doc_id, CAST(cluster_size AS BIGINT) AS cluster_size FROM clusters
  UNION ALL
  SELECT doc_id, CAST(1 AS BIGINT) AS cluster_size FROM exact
  WHERE doc_id NOT IN (SELECT id FROM pnodes)),
curated AS (
  SELECT e.doc_id, e.n_tokens, e.quality, e.lang_detected, sv.cluster_size
  FROM survivors sv JOIN exact e USING (doc_id)),
report AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_input,
         CAST(SUM(CASE WHEN quality >= {min_quality}
                        AND lang_detected IN ('{language}')
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_after_gate
  FROM profiled),
surv_agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_survivors,
         CAST(SUM(cluster_size) AS BIGINT) AS n_represented
  FROM curated)
SELECT c.doc_id, c.n_tokens, c.quality, c.lang_detected, c.cluster_size,
       r.n_input, r.n_after_gate, sa.n_survivors, sa.n_represented
FROM curated c CROSS JOIN report r CROSS JOIN surv_agg sa
"""


@query("q55_curation_funnel", _curation_funnel_oracle())
def q55_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crossbar_data_process_spark.plans.llm_curation import (
        curate_documents,
        curation_report,
    )

    d = _t(spark, sf_dir, "documents")
    curated = curate_documents(d)
    report = curation_report(d, curated)
    # the report is ONE row — broadcasting it onto the survivors is the
    # sanctioned bounded nested-loop case (a literal-key equi-join gets
    # constant-folded back to a nested loop, so say what we mean)
    return curated.drop("text").crossJoin(F.broadcast(report))


# ---------- KG path motifs (plans/kg.py): depth 2 is the named
# drug→target→disease traversal CROssBAR's KG serves (two_hop_paths); depth
# 3 is the variable-depth DP fold (chain_paths aggregate_hops=True — state
# bounded to reachable (src, frontier) pairs, counts SUM, running product
# keeps MAX) hash-checked against a DuckDB WITH RECURSIVE path enumeration,
# which is equivalent exactly because scores are non-negative. Scores are
# max-of-products (no float-sum order dependence).
@query(
    "q52_kg_paths",
    """
WITH RECURSIVE
dti AS (
  SELECT l_suppkey % 40 AS src, l_partkey % 100 AS dst, MAX(l_discount) AS s
  FROM lineitem GROUP BY 1, 2),
gda AS (
  SELECT p_partkey % 100 AS src, p_brand AS dst, MAX(p_retailprice) AS s
  FROM part GROUP BY 1, 2),
bc AS (
  SELECT p_brand AS src, p_type AS dst, MAX(CAST(p_size AS DOUBLE)) AS s
  FROM part GROUP BY 1, 2),
edges AS (
  SELECT 1 AS hop, CAST(src AS VARCHAR) AS src, CAST(dst AS VARCHAR) AS dst, s FROM dti
  UNION ALL
  SELECT 2, CAST(src AS VARCHAR), dst, s FROM gda
  UNION ALL
  SELECT 3, src, dst, s FROM bc),
walk(hop, root, node, prod) AS (
  SELECT 1, src, dst, s FROM edges WHERE hop = 1
  UNION ALL
  SELECT w.hop + 1, w.root, e.dst, w.prod * e.s
  FROM walk w JOIN edges e ON e.hop = w.hop + 1 AND e.src = w.node
  WHERE w.hop < 3),
p3 AS (
  SELECT CAST(root AS BIGINT) AS src, node AS dst,
         COUNT(*) AS n_paths, MAX(prod) AS best
  FROM walk WHERE hop = 3 GROUP BY 1, 2),
r3 AS (
  SELECT src, dst, n_paths, round(best, 6) AS best_score,
         row_number() OVER (PARTITION BY src ORDER BY best DESC, dst) AS rnk
  FROM p3),
p2 AS (
  SELECT d.src AS drug, g.dst AS disease, COUNT(*) AS n_paths,
         MAX(d.s * g.s) AS best
  FROM dti d JOIN gda g ON d.dst = g.src GROUP BY 1, 2),
r2 AS (
  SELECT drug, disease, n_paths, round(best, 6) AS best_score,
         row_number() OVER (PARTITION BY drug ORDER BY best DESC, disease) AS rnk
  FROM p2)
SELECT 2 AS depth, drug AS src, disease AS dst, n_paths, best_score,
       CAST(rnk AS BIGINT) AS rnk
FROM r2 WHERE rnk <= 3
UNION ALL
SELECT 3 AS depth, src, dst, n_paths, best_score, CAST(rnk AS BIGINT) AS rnk
FROM r3 WHERE rnk <= 3
""",
)
def q52_kg_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crossbar_data_process_spark.plans.kg import (
        chain_paths,
        drug_target_disease_paths,
    )

    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    dti = li.groupBy(
        (F.col("l_suppkey") % 40).alias("drug"),
        (F.col("l_partkey") % 100).alias("target"),
    ).agg(F.max("l_discount").alias("affinity"))
    gda = p.groupBy(
        (F.col("p_partkey") % 100).alias("target"),
        F.col("p_brand").alias("disease"),
    ).agg(F.max("p_retailprice").alias("assoc"))
    bc = p.groupBy(
        F.col("p_brand").alias("src"), F.col("p_type").alias("dst")
    ).agg(F.max(F.col("p_size").cast("double")).alias("s"))
    two = drug_target_disease_paths(dti, gda, k=3)
    chain = chain_paths(
        [
            dti.select(
                F.col("drug").alias("src"),
                F.col("target").alias("dst"),
                F.col("affinity").alias("s"),
            ),
            gda.select(
                F.col("target").alias("src"),
                F.col("disease").alias("dst"),
                F.col("assoc").alias("s"),
            ),
            bc,
        ],
        score="s",
        k=3,
        aggregate_hops=True,
    )
    p2 = two.select(
        F.lit(2).alias("depth"),
        F.col("drug").alias("src"),
        F.col("disease").alias("dst"),
        "n_paths",
        F.round("best_score", 6).alias("best_score"),
        "rnk",
    )
    p3 = chain.select(
        F.lit(3).alias("depth"),
        "src",
        "dst",
        "n_paths",
        F.round("best_score", 6).alias("best_score"),
        "rnk",
    )
    return p2.unionByName(p3)


# SimHash oracle: per-token 32-bit md5-derived hash (hex→int via strpos
# polynomial), ±1 per bit position summed over tokens with multiplicity,
# sign vector → integer — the exact arithmetic of operators.textdedup.simhash
@query(
    "q26b_simhash",
    """
WITH t AS (
  SELECT doc_id,
         list_transform(
           list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> ''),
           tok -> list_sum(list_transform(range(1, 9),
                    i -> (strpos('0123456789abcdef', md5(tok)[i:i]) - 1)
                         * (1::BIGINT << (4 * (8 - i)))))) AS hs
  FROM documents),
s AS (
  SELECT doc_id AS doc,
         CAST(list_sum(list_transform(range(0, 32), j ->
           CASE WHEN list_sum(list_transform(hs,
                       h -> CASE WHEN ((h >> j) & 1) = 1 THEN 1 ELSE -1 END)) > 0
                THEN (1::BIGINT << j) ELSE 0 END)) AS BIGINT) AS simhash
  FROM t),
chunks AS (
  SELECT doc, j AS band, (simhash >> CAST(8 * j AS INT)) & 255 AS key
  FROM s, range(0, 4) r(j)),
cand AS (
  SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
  FROM chunks a JOIN chunks b
    ON a.band = b.band AND a.key = b.key AND a.doc < b.doc),
pairs AS (
  SELECT doc_a, doc_b,
         CAST(bit_count(xor(sa.simhash, sb.simhash)) AS INT) AS hamming
  FROM cand
  JOIN s sa ON sa.doc = cand.doc_a
  JOIN s sb ON sb.doc = cand.doc_b
  WHERE bit_count(xor(sa.simhash, sb.simhash)) <= 3),
sym AS (
  SELECT doc_a AS doc, hamming FROM pairs
  UNION ALL
  SELECT doc_b AS doc, hamming FROM pairs)
SELECT s.doc, s.simhash,
       COALESCE(g.n_neardup, 0) AS n_neardup,
       CAST(COALESCE(g.min_hamming, -1) AS INT) AS min_hamming
FROM s LEFT JOIN (
  SELECT doc, COUNT(*) AS n_neardup, MIN(hamming) AS min_hamming
  FROM sym GROUP BY doc) g USING (doc)
""",
)
def q26b_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every doc's 32-bit SimHash fingerprint PLUS its near-dup pair profile
    (count and min Hamming over simhash_pairs at bands=4, d<=3) — the one
    result hash-checks both the fingerprint arithmetic and the banded
    bucket-join + bit_count(xor) verify of operators.textdedup.simhash_pairs
    (pigeonhole-exact recall: d < bands)."""
    d = _t(spark, sf_dir, "documents")
    sigs = simhash(d)
    pairs = simhash_pairs(d, bands=4, max_hamming=3)
    sym = pairs.select(F.col("doc_a").alias("doc"), "hamming").unionByName(
        pairs.select(F.col("doc_b").alias("doc"), "hamming")
    )
    agg = sym.groupBy("doc").agg(
        F.count(F.lit(1)).alias("n_neardup"),
        F.min("hamming").alias("min_hamming"),
    )
    return sigs.join(agg, "doc", "left").select(
        "doc",
        "simhash",
        F.coalesce("n_neardup", F.lit(0).cast("long")).alias("n_neardup"),
        F.coalesce("min_hamming", F.lit(-1)).cast("int").alias("min_hamming"),
    )


def _cosine_sql(a: str, b: str) -> str:
    """Deterministic left-to-right fold dot/norms matching operators.similarity."""
    return (
        f"round(list_reduce(list_transform(range(1, len({a}) + 1), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), (x, y) -> x + y) / "
        f"(sqrt(list_reduce(list_transform(range(1, len({a}) + 1), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE)), (x, y) -> x + y)) * "
        f"sqrt(list_reduce(list_transform(range(1, len({b}) + 1), "
        f"i -> CAST({b}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), (x, y) -> x + y))), 6)"
    )


# Exact cosine top-k over the sub-10 query set — shared by q27 (brute-force
# cosine_topk) and q54 (IVF with nprobe == nlist: every list probed means the
# candidate set is the whole corpus minus self, so the data-adaptive
# fit→assign→probe plan must reproduce the exact answer bit-for-bit).
_COSINE_TOPK_ORACLE = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
scored AS (
  SELECT query_id, e.vec_id AS neighbor_id,
         {_cosine_sql('qv', 'e.embedding')} AS cosine
  FROM q JOIN embeddings e ON e.vec_id <> q.query_id)
SELECT query_id, neighbor_id, cosine, CAST(rnk AS BIGINT) AS rnk FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id) AS rnk
  FROM scored) WHERE rnk <= 5
"""


# r14: q27_cosine_topk folded out of the registry → slot to
# q72_ann_streaming_ingest (REGISTRY.md fold table). The brute-force
# ranking stays registry-oracled TWICE over — q54 and q72 both probe at
# nprobe == nlist against the SAME _COSINE_TOPK_ORACLE text — and the
# operator itself keeps this oracle verbatim in
# tests/test_operator_properties.py::test_cosine_topk_matches_oracle.
def q27_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    out = cosine_topk(e, q, k=5)
    return out.select(
        "query_id", "neighbor_id", "cosine", F.col("rnk").cast("long").alias("rnk")
    )


# ---------- IVF ANN with every list probed (operators/ivf.py): nprobe ==
# nlist makes IVF exactly equivalent to brute-force cosine top-k, so the
# whole data-adaptive plan — deterministic md5-seeded spherical k-means fit,
# corpus assignment, probe-list explode, bucket equi-join, in-list exact
# scoring — is hash-checked against the same oracle as q27. Recall at
# nprobe < nlist is measured separately (tests/test_ivf_ann.py ≥ 0.95).
@query("q54_ivf_topk", _COSINE_TOPK_ORACLE)
def q54_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION silver-layout path, not the in-memory shortcut:
    fit → write_assigned_corpus (corpus partitioned by cluster id) →
    ivf_topk_assigned (probe join keys on the partition column, so the
    scan is dynamically pruned to the probed lists). nprobe == nlist makes
    it exactly brute-force, hash-checked against the same oracle as q27."""
    import atexit
    import os
    import shutil
    import tempfile

    from crossbar_data_process_spark.operators.ivf import (
        ivf_fit_with_diagnostics,
        ivf_topk_assigned,
        write_assigned_corpus,
    )

    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    # derive dim from the data instead of pinning 64 — testdata schemas
    # drift between rounds (the r5 events lesson). ONE setup job (r16
    # optimization round): dim and the row count (which saves the fit
    # sample's own count scan) ride the same aggregate.
    row = e.agg(
        F.count(F.lit(1)).alias("n"), F.first(F.size("embedding")).alias("d")
    ).first()
    n, dim = int(row["n"]), int(row["d"])
    # driver_fit_rows: quantizer trains numpy-side on a bounded md5-sample
    # (ONE collect job instead of per-iteration assignment+groupBy jobs);
    # results stay brute-force-exact here because nprobe == nlist probes
    # every list regardless of where the centroids land. The combined fit
    # yields the quality gauge from the SAME sample (no extra job); it is
    # persisted into the silver below. require_clustered stays off: the
    # driver's synthetic embeddings are isotropic by construction and this
    # query probes every list, where the regime doesn't affect results.
    cents, diag = ivf_fit_with_diagnostics(
        e, dim=dim, nlist=8, iters=2, driver_fit_rows=2048, n_rows=n
    )
    # ONE pid-scoped silver dir reused (overwrite) across invocations —
    # repeated bench/correctness runs must not accumulate corpus copies in
    # /tmp — and removed at interpreter exit.
    silver = os.path.join(
        tempfile.gettempdir(), f"ivf_silver_q54_{os.getpid()}"
    )
    atexit.register(shutil.rmtree, silver, ignore_errors=True)
    write_assigned_corpus(e, cents, silver, diagnostics=diag)
    out = ivf_topk_assigned(spark, silver, q, cents, k=5, nprobe=8)
    return out.select(
        "query_id", "neighbor_id", "cosine", F.col("rnk").cast("long").alias("rnk")
    )


# ---------- STREAMING ANN ingest under the hash gate (r14, VERDICT r13
# #6 — the q64/q54 tricks composed): two disjoint micro-batches land
# through the production foreachBatch sink (`ann_ingest.ivf_ingest_writer`
# — per-batch assignment projection, (cluster, __batch_id) dynamic
# partition overwrite, centroid identity stamped and re-verified), batch 1
# is then REPLAYED (the Structured Streaming recovery contract), and the
# streamed silver is probed at nprobe == nlist. Full probes make the
# candidate set the whole corpus, so the result is brute-force-exact and
# _COSINE_TOPK_ORACLE applies VERBATIM (the q54 identity trick) — while a
# sink that double-landed the replayed batch would duplicate neighbors
# into distinct rnk rows and fail the hash, so exactly-once replay is
# checked by the driver, not just pytest. Pruned-probe recall and the
# drift→refit maintenance path stay pinned in tests/test_ann_ingest.py.
@query("q72_ann_streaming_ingest", _COSINE_TOPK_ORACLE)
def q72_ann_streaming_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ingest (2 disjoint micro-batches) → replay batch 1 → full-probe
    top-k over the streamed silver. Fresh pid-scoped silver per
    invocation (the q71 convention: a silver assigned under a previous
    corpus' centroids would — correctly — trip the identity stamp)."""
    import atexit
    import os
    import shutil
    import tempfile

    from crossbar_data_process_spark.operators.ivf import (
        ivf_fit,
        ivf_topk_assigned,
    )
    from crossbar_data_process_spark.streaming.ann_ingest import (
        ivf_ingest_writer,
    )

    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    # ONE setup job (r16): dim + row count (saves the fit sample's own
    # count scan) in the same aggregate
    row = e.agg(
        F.count(F.lit(1)).alias("n"), F.first(F.size("embedding")).alias("d")
    ).first()
    n, dim = int(row["n"]), int(row["d"])
    cents = ivf_fit(
        e, dim=dim, nlist=8, iters=2, driver_fit_rows=2048, n_rows=n
    )
    silver = os.path.join(
        tempfile.gettempdir(), f"ann_stream_silver_q72_{os.getpid()}"
    )
    shutil.rmtree(silver, ignore_errors=True)
    atexit.register(shutil.rmtree, silver, ignore_errors=True)
    sink = ivf_ingest_writer(spark, cents, silver)
    b0 = e.filter(F.pmod(F.col("vec_id"), F.lit(2)) == 0)
    b1 = e.filter(F.pmod(F.col("vec_id"), F.lit(2)) == 1)
    sink(b0, 0)
    sink(b1, 1)
    sink(b1, 1)  # replay — dynamic overwrite must replace, not append
    out = ivf_topk_assigned(spark, silver, q, cents, k=5, nprobe=8)
    return out.select(
        "query_id", "neighbor_id", "cosine", F.col("rnk").cast("long").alias("rnk")
    )


# ---------- streaming SEMANTIC-DEDUP ingest under the hash gate (r15,
# VERDICT r14 #4 — the q64/q72 tricks composed for the dedup-mode sink,
# the engine's production semantic-ingest path). Two micro-batches land
# through `ivf_ingest_writer(dedup_threshold=τ)`; batch 1 carries planted
# EXACT copies — of batch-0 residents (the cross-silver flag must drop
# them against the landed silver), of its own residents (within-batch
# `semantic_dedup` must collapse them to the min-id original), and a
# double-copy pair whose within-batch survivor must STILL be flagged
# cross-silver — then batch 1 is replayed (`exclude_batch_id` recovery
# contract) and the landed silver is probed at nprobe == nlist.
#
# Why the oracle needs no quantizer: candidacy inside the sink is
# same-cluster only, but at τ = 0.999 every ≥τ pair in this corpus is a
# planted IDENTICAL copy (max natural pairwise cosine measured 0.60 at
# sf0.1) and identical vectors assign identically (same scores, same
# argmax/tie-break), so same-cluster candidacy ≡ full candidacy and the
# SQL replay below — full-cross cosine pairs at τ per batch, the q53-form
# recursive min-label walk (the fold's coverage moving in), min-id
# survivors, cross-silver flag, then the q54-form full-probe window —
# reproduces the sink bit-for-bit. A sink that misses a within-batch dup,
# misses a cross-batch dup, drops an original, or double-lands the replay
# each perturbs the survivor corpus and fails the hash.
def _semantic_dedup_ingest_oracle(tau: float = 0.999) -> str:
    cos_ab = _cosine_sql("a.embedding", "b.embedding")
    cos_cross = _cosine_sql("y.embedding", "x.embedding")
    cos_probe = _cosine_sql("qv", "c.embedding")

    def _batch_dedup(tag: str, src: str) -> str:
        """Within-batch semantic dedup in SQL: cosine pairs at τ →
        recursive min-label components → min-id survivor per component +
        singleton pass-through (operators.similarity.semantic_dedup)."""
        return f"""p{tag} AS (
  SELECT a.vec_id AS va, b.vec_id AS vb FROM {src} a JOIN {src} b
    ON a.vec_id < b.vec_id AND {cos_ab} >= {tau}),
sym{tag} AS (SELECT va AS x, vb AS y FROM p{tag}
             UNION SELECT vb, va FROM p{tag}),
n{tag} AS (SELECT DISTINCT x AS id FROM sym{tag}),
walk{tag}(id, r) AS (
  SELECT id, id FROM n{tag}
  UNION
  SELECT w.id, s.y FROM walk{tag} w JOIN sym{tag} s ON w.r = s.x),
s{tag} AS (
  SELECT MIN(id) AS vec_id
  FROM (SELECT id, MIN(r) AS component FROM walk{tag} GROUP BY id)
  GROUP BY component
  UNION ALL
  SELECT vec_id FROM {src}
  WHERE vec_id NOT IN (SELECT id FROM n{tag}))"""

    return f"""
WITH RECURSIVE
b0 AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 2 = 0),
b1 AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 2 = 1
  UNION ALL
  SELECT vec_id + 100000, embedding FROM embeddings WHERE vec_id < 10
  UNION ALL
  SELECT vec_id + 200000, embedding FROM embeddings WHERE vec_id < 2),
{_batch_dedup("0", "b0")},
{_batch_dedup("1", "b1")},
silver0 AS (
  SELECT e.vec_id, e.embedding FROM b0 e JOIN s0 ON e.vec_id = s0.vec_id),
surv1 AS (
  SELECT e.vec_id, e.embedding FROM b1 e JOIN s1 ON e.vec_id = s1.vec_id),
flagged AS (
  SELECT DISTINCT y.vec_id
  FROM surv1 y JOIN silver0 x ON {cos_cross} >= {tau}),
corpus AS (
  SELECT vec_id, embedding FROM silver0
  UNION ALL
  SELECT vec_id, embedding FROM surv1
  WHERE vec_id NOT IN (SELECT vec_id FROM flagged)),
q AS (SELECT vec_id AS query_id, embedding AS qv
      FROM embeddings WHERE vec_id < 10),
scored AS (
  SELECT query_id, c.vec_id AS neighbor_id, {cos_probe} AS cosine
  FROM q JOIN corpus c ON c.vec_id <> q.query_id)
SELECT query_id, neighbor_id, cosine, CAST(rnk AS BIGINT) AS rnk FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id) AS rnk
  FROM scored) WHERE rnk <= 5
"""


@query("q73_semantic_dedup_ingest", _semantic_dedup_ingest_oracle())
def q73_semantic_dedup_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedup-mode ingest: batch 0 (evens) → batch 1 (odds + planted exact
    copies) → replay batch 1 → full-probe top-k over the landed silver.
    The workload is constant-bounded (vec_id < 10 — _WORKLOAD_BOUNDS);
    the plants are query-synthesized from that same carve, so the corpus
    stays the driver's table plus a fixed-size planted set."""
    import atexit
    import os
    import shutil
    import tempfile

    from crossbar_data_process_spark.operators.ivf import (
        ivf_fit,
        ivf_topk_assigned,
    )
    from crossbar_data_process_spark.streaming.ann_ingest import (
        ivf_ingest_writer,
    )

    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    q = e.filter(F.col("vec_id") < 10)
    # nlist scales with the corpus via THE codified posture (r16,
    # VERDICT r15 #2: suggest_nlist is the one definition of
    # E[cluster] ≈ 250 — the sink's within-batch pair stage is
    # Σ cluster², so a PINNED nlist would make this row quadratic in
    # corpus size on scale probes). Safe under the hash: the oracle is
    # quantizer-free (see above) — nlist moves candidacy, and every ≥τ
    # pair co-clusters at ANY nlist because the plants are identical
    # vectors.
    from crossbar_data_process_spark.operators.ivf import suggest_nlist

    # ONE setup job instead of two (r16 optimization round): the corpus
    # count (sizes nlist) and the vector dim ride the same aggregate
    row = e.agg(
        F.count(F.lit(1)).alias("n"), F.first(F.size("embedding")).alias("d")
    ).first()
    n, dim = int(row["n"]), int(row["d"])
    nl = suggest_nlist(n)
    # n_rows=n: the fit's sample path would otherwise re-count the frame
    # this query just counted to size nlist (r15 review pass 2)
    cents = ivf_fit(
        e,
        dim=dim,
        nlist=nl,
        iters=2,
        driver_fit_rows=max(2048, 8 * nl),
        n_rows=n,
    )
    silver = os.path.join(
        tempfile.gettempdir(), f"ann_dedup_silver_q73_{os.getpid()}"
    )
    shutil.rmtree(silver, ignore_errors=True)
    atexit.register(shutil.rmtree, silver, ignore_errors=True)
    # Full-arrow registration: this row gates the PRODUCTION dedup-mode
    # sink, whose production arithmetic is the r15 Arrow pair kernel —
    # registering it here puts that kernel under the driver's hash gate
    # (inverting the keep-JVM-defaults registry convention FOR THIS ROW;
    # REGISTRY.md records why). r16: assign_backend joins pair_backend
    # on arrow — the r15 ADVICE threaded the sink's assign engine into
    # the flag's probe-side candidacy, so the old jvm/arrow mix would
    # put the flag's batch assignment back on the interpreted
    # O(nlist·dim) walk (the sf1-slope class the arrow registration
    # exists to avoid); full-arrow is also exactly llm_build's scale
    # posture. Byte-identity with the JVM engine is separately pinned
    # (tests/test_ann_ingest.py, test_semantic_dedup), and the
    # interpreted JVM within-batch path scales as the measured r12
    # curve (~21 s at 10k rows), which would be the row's sf1 wall.
    sink = ivf_ingest_writer(
        spark,
        cents,
        silver,
        dedup_threshold=0.999,
        assign_backend="arrow",
        pair_backend="arrow",
    )
    plants = (
        q.select((F.col("vec_id") + 100000).alias("vec_id"), "embedding")
        .unionByName(
            e.filter(F.col("vec_id") < 2).select(
                (F.col("vec_id") + 200000).alias("vec_id"), "embedding"
            )
        )
    )
    b0 = e.filter(F.pmod(F.col("vec_id"), F.lit(2)) == 0)
    b1 = e.filter(F.pmod(F.col("vec_id"), F.lit(2)) == 1).unionByName(plants)
    sink(b0, 0)
    sink(b1, 1)
    sink(b1, 1)  # replay — exclude_batch_id keeps the flag exactly-once
    out = ivf_topk_assigned(spark, silver, q, cents, k=5, nprobe=nl)
    return out.select(
        "query_id", "neighbor_id", "cosine", F.col("rnk").cast("long").alias("rnk")
    )


# ---------- as-of join (time-series family; SURVEY §2.3 notes these are
# out of the reference's contract but native to Spark — implemented as the
# union + last-ignoring-nulls window, the shuffle-once as-of pattern).
# r09: folded out of the registry → slot to q64_streaming_ingest
# (REGISTRY.md). The as-of FAMILY stays registry-oracled via
# q57_asof_two_table (native DuckDB ASOF LEFT JOIN oracle); this
# single-table form's last-ignoring-nulls window and its former DuckDB
# oracle live on in tests/test_operator_properties.py::
# test_asof_single_table_matches_oracle.
def q48_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = e.withColumn(
        "last_error_ts",
        F.last(
            F.when(F.col("event_type") == "error", F.col("ts")), ignorenulls=True
        ).over(w),
    )
    return marked.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.date_format("last_error_ts", "yyyy-MM-dd HH:mm:ss").alias(
            "last_error_ts"
        ),
    )


# ------------- embedding-cosine near-dup, brute-force form: NOT REGISTERED.
# The O(n²) cross join is a bounded recall fixture only (tests/test_ann_recall
# builds its own ground truth); the public registry contains no unbounded
# all-pairs plan — the declared near-dup surface is q49 (neighbor_pairs_lsh).


# --------------------- streaming surface, batch-equivalent form (SURVEY §2.10)
@query(
    "q28_events_hourly",
    f"""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type, COUNT(*) AS n, {_dsum_sql('value', 6)} AS sum_value
FROM events GROUP BY window_start, event_type
""",
)
def q28_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), _dsum("value", 6).alias("sum_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n",
            "sum_value",
        )
    )


# --------------------- hierarchy closure (ontology ancestors, SURVEY §1.1)
@query(
    "q29_hierarchy_rollup",
    """
SELECT r_name, COUNT(DISTINCT c_custkey) AS n_customers
FROM region JOIN nation ON r_regionkey = n_regionkey
JOIN customer ON c_nationkey = n_nationkey
GROUP BY r_name
""",
)
def q29_hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    edges = (
        n.select(
            F.concat(F.lit("R"), F.col("n_regionkey")).alias("parent"),
            F.concat(F.lit("N"), F.col("n_nationkey")).alias("child"),
        )
        .unionByName(
            c.select(
                F.concat(F.lit("N"), F.col("c_nationkey")).alias("parent"),
                F.concat(F.lit("C"), F.col("c_custkey")).alias("child"),
            )
        )
    )
    closure = transitive_closure(edges, max_iters=3)
    region_names = r.select(
        F.concat(F.lit("R"), F.col("r_regionkey")).alias("rid"), "r_name"
    )
    return (
        closure.filter(
            F.col("ancestor").startswith("R") & F.col("descendant").startswith("C")
        )
        .join(F.broadcast(region_names), F.col("ancestor") == F.col("rid"))
        .groupBy("r_name")
        .agg(F.countDistinct("descendant").alias("n_customers"))
    )


# --------------- graph degree (GraphX-style analytics). r07 fold: the q30
# registry row (plain groupBy+countDistinct, a thin Spark built-in already
# hash-checked inside q29's n_customers aggregate) moved to
# tests/test_operator_properties.py::test_degree_matches_distinct_edge_count;
# its slot went to q59_segment_dedup (REGISTRY.md).
def q30_supplier_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy(F.col("l_suppkey").alias("supplier")).agg(
        F.countDistinct("l_partkey").alias("degree")
    )


# ------------------- connected components via iterative min-label propagation
# r11 fold: the q31 registry row moved to tests/test_operator_properties.py::
# test_connected_components_matches_oracle (the former DuckDB oracle lives on
# there verbatim); its slot went to q68_quantile_rollup (REGISTRY.md). The
# iterative min-label component family stays registry-oracled via
# q53_neardup_resolve, whose DuckDB oracle walks the same components
# recursively over the LSH pair graph — the richer, production surface.
def q31_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _t(spark, sf_dir, "nation")
    a = n.alias("a")
    b = n.alias("b")
    edges = a.join(
        b,
        (F.col("a.n_regionkey") == F.col("b.n_regionkey"))
        & (F.col("a.n_nationkey") < F.col("b.n_nationkey")),
    ).select(
        F.col("a.n_nationkey").cast("long").alias("src"),
        F.col("b.n_nationkey").cast("long").alias("dst"),
    )
    nodes = n.select(F.col("n_nationkey").cast("long").alias("id"))
    return connected_components(nodes, edges).select(
        F.col("id").alias("node"), F.col("component")
    )


# ------------------ J6 derived-key self-join (pathway.py:667-704, hash form)
# r12: folded out of the registry → slot to q69_ivfpq_silver (REGISTRY.md).
# The derived-key extraction (element_at(split)) stays registry-oracled via
# q09's split family and q15's suffix surgery; the groupBy-count family via
# q01/q29; the former DuckDB oracle lives on VERBATIM in
# tests/test_operator_properties.py::test_suffix_groups_matches_oracle.
_SUFFIX_GROUPS_ORACLE = """
SELECT suffix, COUNT(*) AS n_parts,
       COUNT(*) * (COUNT(*) - 1) // 2 AS n_pairs
FROM (SELECT (string_split(p_type, ' '))[-1] AS suffix FROM part)
GROUP BY suffix
"""


def q32_suffix_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return (
        p.select(F.element_at(F.split("p_type", " "), -1).alias("suffix"))
        .groupBy("suffix")
        .agg(F.count(F.lit(1)).alias("n_parts"))
        .withColumn(
            "n_pairs",
            (F.col("n_parts") * (F.col("n_parts") - 1) / 2).cast("long"),
        )
    )


# ------------------- F11 JSON field extraction (drug.py:716-738 JSON walks)
# r08: folded out of the registry → slot to q63_incremental_dedup
# (REGISTRY.md). The F11 extraction rides q34's oracle as its k_bucket
# column (same get_json_object + cast + pmod chain), and this grouped form's
# former DuckDB oracle lives on in
# tests/test_operator_properties.py::test_json_extract_matches_oracle.
def q33_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return (
        e.withColumn(
            "k_bucket", F.get_json_object("props", "$.k").cast("long") % 10
        )
        .groupBy("event_type", "k_bucket")
        .agg(F.count(F.lit(1)).alias("n"), _dsum("value", 6).alias("sum_value"))
    )


# ----------- P7 dropna + P9 blacklist + P10 deterministic limit (top-k form)
# + F11 JSON extraction as the k_bucket column (r08: the former
# q33_json_extract's get_json_object chain merged in — REGISTRY.md).
@query(
    "q34_blacklist_topk",
    """
SELECT event_id, user_id, event_type, value,
       json_extract(props, '$.k')::BIGINT % 10 AS k_bucket
FROM events
WHERE (event_type IS NULL OR event_type NOT IN ('error', 'signup'))
  AND value IS NOT NULL
ORDER BY value DESC, event_id LIMIT 100
""",
)
def q34_blacklist_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crossbar_data_process_spark.operators.filters import blacklist_filter
    from crossbar_data_process_spark.operators.topk import global_top_k

    e = _t(spark, sf_dir, "events").na.drop(subset=["value"])
    e = blacklist_filter(e, "event_type", ["error", "signup"])
    return global_top_k(
        e.select(
            "event_id",
            "user_id",
            "event_type",
            "value",
            (F.get_json_object("props", "$.k").cast("long") % 10).alias("k_bucket"),
        ),
        [F.desc("value"), F.asc("event_id")],
        100,
    )


# ------------------- A5 group + collect ordered list (uniprot.py:102-107)
# r10: folded out of the registry → slot to q66_mixture_sample (REGISTRY.md).
# A5 group+collect stays hash-checked via q09_provenance_union (collect_set
# pipe-union aggregation over the same grouped shape); this exact query's
# former DuckDB oracle lives on in
# tests/test_operator_properties.py::test_collect_ordered_matches_oracle.
def q35_collect_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.array_join(F.array_sort(F.collect_list("o_orderkey")), ",").alias(
            "orderkeys"
        ),
        F.count(F.lit(1)).alias("n"),
    )


# ---------- J2 nullify-conflict coalescer (tf_gen.py:289-312 tf_effect)
@query(
    "q36_nullify_conflict_merge",
    """
WITH s1 AS (SELECT o_custkey AS custkey, MIN(o_orderstatus) AS status
            FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey),
     s2 AS (SELECT o_custkey AS custkey, MIN(o_orderstatus) AS status
            FROM orders WHERE o_orderpriority = '2-HIGH' GROUP BY o_custkey)
SELECT COALESCE(s1.custkey, s2.custkey) AS custkey,
       CASE WHEN s1.status IS NULL THEN s2.status
            WHEN s2.status IS NULL THEN s1.status
            WHEN s1.status = s2.status THEN s1.status
       END AS status
FROM s1 FULL OUTER JOIN s2 ON s1.custkey = s2.custkey
""",
)
def q36_nullify_conflict_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")

    def src(priority: str) -> DataFrame:
        return (
            o.filter(F.col("o_orderpriority") == priority)
            .groupBy(F.col("o_custkey").alias("custkey"))
            .agg(F.min("o_orderstatus").alias("status"))
        )

    return outer_merge(
        [src("1-URGENT"), src("2-HIGH")],
        on=["custkey"],
        specs=[CoalesceSpec("status", "nullify_conflict")],
    )


# ------------- F5/F7 numeric surgery: prefix parse + comma-number round-trip.
# r07 fold: the q37 registry row merged INTO q15_curie_ids (parsed_back /
# phone_prefix columns — the same clean_number round-trip and split-cast,
# still hash-checked compositionally); its slot went to q60_nb_quality
# (REGISTRY.md). The function stays for unit tests.
def q37_numeric_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crossbar_data_process_spark.functions.ids import clean_number

    p = _t(spark, sf_dir, "part").withColumn("o_pri", F.lit("3-MEDIUM"))
    return p.select(
        "p_partkey",
        (F.split("p_type", " ")[0] == "STANDARD").alias("is_standard"),
        clean_number(
            F.format_number(F.col("p_partkey") * 1000 + F.col("p_size"), 0)
        ).alias("parsed_back"),
        F.split("o_pri", "-")[0].cast("int").alias("priority_num"),
    )


# ---------------- graph analytics: PageRank with a full SQL oracle.
# Fixed-iteration power iteration is deterministic arithmetic, so the oracle
# unrolls the 5 iterations as chained CTEs (DuckDB forbids aggregates in
# recursive terms). Every literal goes through all-DOUBLE arithmetic so SQL
# reproduces Python's IEEE ops bit-for-bit, and per-iteration sums accumulate
# in DECIMAL(38,18) on both sides (order-independent — the engine's _dsum
# convention). The graph is deliberately asymmetric (modular edges, non-
# uniform in-degree) with node 24 dangling, so uniform-rank symmetry can't
# mask a wrong implementation, and the dangling-mass path is exercised.
def _pagerank_oracle(iters: int = 5, damping: float = 0.85) -> str:
    d = f"CAST({damping} AS DOUBLE)"
    parts = [
        f"""
WITH nodes AS (SELECT CAST(n_nationkey AS BIGINT) AS id FROM nation),
edges AS (
  SELECT CAST(n_nationkey AS BIGINT) AS src,
         CAST((n_nationkey * 5 + 1) % 25 AS BIGINT) AS dst
  FROM nation WHERE n_nationkey <> 24
  UNION ALL
  SELECT CAST(n_nationkey AS BIGINT), CAST((n_nationkey + 1) % 25 AS BIGINT)
  FROM nation WHERE n_nationkey <> 24),
od AS (SELECT src AS id, COUNT(*) AS od FROM edges GROUP BY src),
it0 AS (SELECT id, CAST(1 AS DOUBLE) / CAST(25 AS DOUBLE) AS rank FROM nodes)"""
    ]
    for k in range(1, iters + 1):
        p = f"it{k - 1}"
        parts.append(
            f"""
d{k} AS (
  SELECT COALESCE(CAST(SUM(CAST(p.rank AS DECIMAL(38,18))) AS DOUBLE),
                  CAST(0 AS DOUBLE)) AS dang
  FROM {p} p LEFT JOIN od ON od.id = p.id WHERE od.id IS NULL),
it{k} AS (
  SELECT n.id,
         (CAST(1 AS DOUBLE) - {d}) / CAST(25 AS DOUBLE)
         + {d} * (COALESCE(c.recv, CAST(0 AS DOUBLE))
                  + (SELECT dang FROM d{k}) / CAST(25 AS DOUBLE)) AS rank
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS id,
           CAST(SUM(CAST(p.rank / od.od AS DECIMAL(38,18))) AS DOUBLE) AS recv
    FROM edges e JOIN {p} p ON e.src = p.id JOIN od ON od.id = e.src
    GROUP BY e.dst) c ON n.id = c.id)"""
        )
    return (
        ",\n".join(parts)
        + f"\nSELECT id, round(rank, 6) AS rank FROM it{iters}"
    )


@query("q38_pagerank", _pagerank_oracle())
def q38_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crossbar_data_process_spark.graph.pagerank import pagerank

    n = _t(spark, sf_dir, "nation")
    nodes = n.select(F.col("n_nationkey").cast("long").alias("id"))
    # asymmetric modular graph over the 25 nations: a bijective successor
    # edge plus a many-to-one 5a+1 edge (in-degree varies 1..6); node 24's
    # out-edges are dropped so it is dangling (exercises mass redistribution)
    e1 = nodes.select(
        F.col("id").alias("src"), ((F.col("id") * 5 + 1) % 25).alias("dst")
    )
    e2 = nodes.select(
        F.col("id").alias("src"), ((F.col("id") + 1) % 25).alias("dst")
    )
    edges = e1.unionByName(e2).filter(F.col("src") != 24)
    pr = pagerank(nodes, edges, iters=5)
    return pr.select("id", F.round("rank", 6).alias("rank"))


# --------- ANN scale path: LSH-bucketed cosine top-k. The hyperplanes are a
# deterministic LCG (similarity._hyperplanes), so the oracle embeds the
# literal 6x64 plane matrix: each weight rendered with repr() and parsed via
# CAST(str AS DOUBLE), which round-trips to the identical IEEE double; the
# sign-bit fold and the cosine/topk arithmetic mirror q27's oracle exactly.
def _lsh_bucket_sql(dim: int, n_planes: int) -> str:
    """The random-hyperplane signature as a SQL expression over a column
    named ``embedding`` (shared by the q39 and q49 oracles)."""
    from crossbar_data_process_spark.operators.similarity import _hyperplanes

    def bit(plane: list[float]) -> str:
        arr = ", ".join(f"CAST('{x!r}' AS DOUBLE)" for x in plane)
        return (
            f"(CASE WHEN list_reduce(list_transform(range(1, {dim + 1}), "
            f"i -> CAST(embedding[i] AS DOUBLE) * ([{arr}])[i]), "
            f"(x, y) -> x + y) >= 0 THEN '1' ELSE '0' END)"
        )

    return " || ".join(bit(p) for p in _hyperplanes(dim, n_planes))


def _ann_lsh_oracle(dim: int = 64, n_planes: int = 6, k: int = 5) -> str:
    bucket = _lsh_bucket_sql(dim, n_planes)
    return f"""
WITH sig AS (
  SELECT vec_id, embedding, {bucket} AS bucket FROM embeddings),
q AS (SELECT vec_id AS query_id, embedding AS qv, bucket AS qbucket
      FROM sig WHERE vec_id < 10),
scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         {_cosine_sql('q.qv', 'c.embedding')} AS cosine
  FROM sig c JOIN q ON c.bucket = q.qbucket AND c.vec_id <> q.query_id)
SELECT query_id, neighbor_id, cosine, CAST(rnk AS BIGINT) AS rnk FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id) AS rnk
  FROM scored) WHERE rnk <= {k}
"""


# r11 fold: the q39 registry row moved to tests/test_operator_properties.py::
# test_ann_lsh_matches_oracle (the former DuckDB oracle above lives on there
# verbatim); its slot went to q67_pq_adc_topk (REGISTRY.md). The LSH family
# stays registry-oracled via q49_embedding_neardup_lsh (the IDENTICAL
# _lsh_bucket_sql signature over the same plane series — the richer pair
# surface) and the cosine/top-k window via q27/q54.
def q39_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crossbar_data_process_spark.operators.similarity import cosine_topk_lsh

    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    out = cosine_topk_lsh(e, q, dim=64, k=5, n_planes=6)
    return out.select(
        "query_id", "neighbor_id", "cosine", F.col("rnk").cast("long").alias("rnk")
    )


# -------- product-quantization ADC top-k (operators/pq.py — the
# storage-side ANN scale path: 4-byte codes instead of 256-byte vectors,
# m lookups instead of O(dim) arithmetic per scored pair). The codebooks
# are the deterministic LCG set (pq_codebooks_fixed — the injected-codebook
# production shape: books are fit offline and loaded), so the oracle embeds
# the literal m×k×dsub matrix exactly as q49 embeds the hyperplane series.
# Every per-code distance goes through the floor-based _fround on BOTH
# sides before the argmin/sum (the r7 round() half-case lesson), and ties
# take the first code index in both engines — codes and ADC scores are
# bit-identical. Data-adaptive pq_fit recall is measured in tests/test_pq.py.
def _pq_fround_sql(x: str) -> str:
    """floor-based half-up at 1e-6 — exact in both engines (lm._fround)."""
    return f"floor(({x}) * 1000000 + 0.5) / 1000000"


def _pq_dists_sql(book: list[list[float]], sv: str, dsub: int) -> str:
    """Rounded squared-Euclidean distances from subvector column ``sv`` to
    each code of one book — literal matrix, left-to-right fold (mirrors
    pq._sqdist / pq._code_dists)."""
    lit = "[" + ", ".join(
        "[" + ", ".join(f"CAST('{x!r}' AS DOUBLE)" for x in code) + "]"
        for code in book
    ) + "]"
    sq = (
        f"list_reduce(list_transform(range(1, {dsub + 1}), "
        f"i -> (CAST({sv}[i] AS DOUBLE) - cb[i]) * "
        f"(CAST({sv}[i] AS DOUBLE) - cb[i])), (x, y) -> x + y)"
    )
    return f"list_transform({lit}, cb -> {_pq_fround_sql(sq)})"


def _pq_adc_oracle(
    dim: int = 64, m: int = 4, k: int = 16, topk: int = 5
) -> str:
    from crossbar_data_process_spark.operators.pq import pq_codebooks_fixed

    books = pq_codebooks_fixed(dim, m, k)
    dsub = dim // m
    sv_cols = ", ".join(
        f"embedding[{j * dsub + 1}:{(j + 1) * dsub}] AS s{j}" for j in range(m)
    )
    d_cols = ", ".join(
        f"{_pq_dists_sql(books[j], f's{j}', dsub)} AS d{j}" for j in range(m)
    )
    codes = ", ".join(
        f"list_position(d{j}, list_min(d{j})) - 1" for j in range(m)
    )
    lut = " || ".join(f"d{j}" for j in range(m))
    adc = " + ".join(
        f"q.lut[{j * k} + e.codes[{j + 1}] + 1]" for j in range(m)
    )
    return f"""
WITH sv AS (SELECT vec_id, {sv_cols} FROM embeddings),
d AS (SELECT vec_id, {d_cols} FROM sv),
enc AS (SELECT vec_id, [{codes}] AS codes FROM d),
qlut AS (SELECT vec_id AS query_id, {lut} AS lut FROM d WHERE vec_id < 10),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         {_pq_fround_sql(adc)} AS adc
  FROM enc e JOIN qlut q ON e.vec_id <> q.query_id)
SELECT query_id, neighbor_id, adc, CAST(rnk AS BIGINT) AS rnk FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY adc, neighbor_id) AS rnk
  FROM scored) WHERE rnk <= {topk}
"""


@query("q67_pq_adc_topk", _pq_adc_oracle())
def q67_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-ADC top-k (Jégou et al. 2011): encode the corpus into m=4
    subspace codes (pure projection, scan-side), build each query's ADC
    lookup table once, broadcast the 10-query LUT frame, score every
    corpus row with m array lookups, window top-5 ascending distance.
    The workload is constant-bounded (vec_id < 10 — _WORKLOAD_BOUNDS)."""
    from crossbar_data_process_spark.operators.pq import (
        pq_adc_topk,
        pq_codebooks_fixed,
        pq_encode,
        pq_query_lut,
    )
    from crossbar_data_process_spark.operators.textdedup import _spread

    e = _t(spark, sf_dir, "embeddings")
    books = pq_codebooks_fixed(64, m=4, k=16)
    # single-file parquet scans arrive as ONE partition; the encode is the
    # CPU-heavy scan-side stage, so spread it across the cores first
    codes = pq_encode(
        _spread(e.select("vec_id", "embedding")), books, keep_vec=False
    )
    luts = pq_query_lut(e.filter(F.col("vec_id") < 10), books)
    out = pq_adc_topk(codes, luts, m=4, k_codes=16, k=5)
    return out.select(
        "query_id", "neighbor_id", "adc", F.col("rnk").cast("long").alias("rnk")
    )


# -------- mergeable quantile-sketch rollup (operators/sketches.py, r11):
# log-spaced bin counts per (source) cell, quantiles read from summed bins
# — the distribution silver a 100 TB profiler rolls up instead of sorting
# the corpus. The whole chain is pure arithmetic (floor(log10·B) binning,
# window cumsum, relative-epsilon rank, 10^((bin+1)/B) edge), so the
# DuckDB oracle replicates it term by term; the edge goes through the
# floor-based _fround on BOTH sides (pow differs by ≤1 ulp between libms —
# the r7 rounding rule), and the binned value is length(text)+0.5 so no
# input sits on an exact power-of-ten bin boundary.
def _quantile_rollup_oracle(b: int = 20, qs=(0.5, 0.9, 0.99)) -> str:
    eps = repr(1.0 - 1e-12)
    qb_cols = []
    for q in qs:
        name = f"q_{str(q).replace('.', '_')}"
        rank = (
            f"ceil((CAST('{q!r}' AS DOUBLE) * CAST(n AS DOUBLE)) "
            f"* CAST('{eps}' AS DOUBLE))"
        )
        qb_cols.append(
            f"MIN(CASE WHEN cum >= {rank} THEN bin END) AS qb_{name}"
        )
    edge_cols = ", ".join(
        f"floor(pow(10.0, CAST(qb_q_{s} + 1 AS DOUBLE) / CAST({b} AS DOUBLE))"
        f" * 1000000 + 0.5) / 1000000 AS q_{s}"
        for s in (str(q).replace(".", "_") for q in qs)
    )
    return f"""
WITH vals AS (
  -- NULL text is dropped on the Spark side too (histogram_sketch_table
  -- filters isNotNull): without this, a NULL-length row would join the
  -- oracle's window SUM as a NULL bin and shift every rank
  SELECT source, CAST(length(text) AS DOUBLE) + 0.5 AS v
  FROM documents WHERE text IS NOT NULL),
bins AS (
  SELECT source, CAST(floor(log10(v) * CAST({b} AS DOUBLE)) AS INT) AS bin,
         COUNT(*) AS cnt
  FROM vals GROUP BY source, bin),
c AS (
  SELECT source, bin, cnt,
         SUM(cnt) OVER (PARTITION BY source ORDER BY bin) AS cum,
         SUM(cnt) OVER (PARTITION BY source) AS n
  FROM bins),
g AS (
  SELECT source, CAST(MAX(n) AS BIGINT) AS n, {', '.join(qb_cols)}
  FROM c GROUP BY source)
SELECT source, n, CAST(0 AS BIGINT) AS n_nonpositive,
       CAST(0 AS BIGINT) AS n_nan, {edge_cols}
FROM g
"""


@query("q68_quantile_rollup", _quantile_rollup_oracle())
def q68_quantile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source doc-length p50/p90/p99 via the mergeable log-histogram
    silver (histogram_sketch_table → rollup_quantiles): one (source, bin)
    groupBy over the corpus, then quantiles from the cell-count-sized bin
    table. Binned value = length(text) + 0.5 (never on a 10^(k/B)
    boundary); edges rounded with the engine-portable _fround."""
    from crossbar_data_process_spark.operators.lm import _fround
    from crossbar_data_process_spark.operators.sketches import (
        histogram_sketch_table,
        rollup_quantiles,
    )

    d = _t(spark, sf_dir, "documents")
    vals = d.select(
        "source",
        (F.length("text").cast("double") + F.lit(0.5)).alias("doclen"),
    )
    hist = histogram_sketch_table(vals, ["source"], "doclen", bins_per_decade=20)
    out = rollup_quantiles(hist, ["source"], [0.5, 0.9, 0.99])
    return out.select(
        "source",
        "n",
        F.col("n_nonpositive").cast("long").alias("n_nonpositive"),
        F.col("n_nan").cast("long").alias("n_nan"),
        *[
            _fround(F.col(c), 6).alias(c)
            for c in ("q_0_5", "q_0_9", "q_0_99")
        ],
    )


# -------- IVF-PQ production silver path (operators/pq.py:
# write_pq_corpus → ivf_pq_topk_assigned) under the hash gate — r12, the
# q54 precedent applied to PQ (VERDICT r11 #1). q67 oracles the FLAT
# encode/ADC machinery; this row runs the actual 100 TB read path: the
# corpus is IVF-assigned and PQ-encoded into a cluster-PARTITIONED silver
# storing (id, codes[m]) only — no raw vector — with the quantizer AND
# codebook identity stamped next to the data, then probed at
# nprobe == nlist. Probing every list makes the candidate set exactly the
# full corpus, so ADC scores equal the flat path's and the q67 oracle
# applies VERBATIM — while the silver write, the identity-stamp
# verification, the partition-pruning join on the cluster column, and the
# codes-only scan (ReadSchema never mentions an embedding) all execute
# under the driver's rows+schema+hash check. Pruned-probe (nprobe <
# nlist) recall and the partition/column-pruning plan shape stay pinned
# in tests/test_pq.py. The centroids come from the data-adaptive ivf_fit
# — where they land cannot affect results here (every list is probed),
# exactly q54's argument.
@query("q69_ivfpq_silver", _pq_adc_oracle())
def q69_ivfpq_silver(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fit → write_pq_corpus (cluster-partitioned, codes-only, identity
    stamped) → ivf_pq_topk_assigned at nprobe == nlist (⇒ exact, so the
    q67 PQ-ADC oracle applies verbatim). The workload is constant-bounded
    (vec_id < 10 — _WORKLOAD_BOUNDS)."""
    import atexit
    import os
    import shutil
    import tempfile

    from crossbar_data_process_spark.operators.ivf import ivf_fit
    from crossbar_data_process_spark.operators.pq import (
        ivf_pq_topk_assigned,
        pq_codebooks_fixed,
        write_pq_corpus,
    )
    from crossbar_data_process_spark.operators.textdedup import _spread

    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    # dim pinned to 64 like q67: the oracle embeds dim-64 codebooks
    books = pq_codebooks_fixed(64, m=4, k=16)
    cents = ivf_fit(e, dim=64, nlist=8, iters=2, driver_fit_rows=2048)
    # ONE pid-scoped silver dir reused (overwrite) across invocations and
    # removed at interpreter exit — the q54 convention
    silver = os.path.join(
        tempfile.gettempdir(), f"ivfpq_silver_q69_{os.getpid()}"
    )
    atexit.register(shutil.rmtree, silver, ignore_errors=True)
    # single-file parquet scans arrive as ONE partition; the encode is the
    # CPU-heavy scan-side stage, so spread it across the cores first
    write_pq_corpus(_spread(e), cents, books, silver)
    out = ivf_pq_topk_assigned(
        spark, silver, q, cents, books, k=5, nprobe=8
    )
    return out.select(
        "query_id", "neighbor_id", "adc", F.col("rnk").cast("long").alias("rnk")
    )


# -------- reciprocal-rank fusion (operators/retrieval.rrf_fuse) under the
# hash gate — r12 (VERDICT r11 #3): the operator was built integer-exact
# (per-system contributions as floor-rounded MICROS summed as longs)
# specifically so fused rankings are engine-identical; this row gives it
# the composed oracle it was designed for. The lexical arm is q61's BM25
# ranking — the SAME _BM25_CTES text, so the two oracles can never drift —
# and the dense arm is the q27-form cosine top-k over embeddings, both
# restricted to the SHARED constant-bounded query carve (id % 97 = 0 AND
# id < 5000, _WORKLOAD_BOUNDS). Fusion: micros = floor(1e6/(60+rank)+0.5)
# per (system, query, doc), summed exactly as BIGINT, divided back to
# rrf_score; n_systems counts contributing arms (1 or 2 — asymmetric
# coverage is the realistic fusion shape); ties break on doc_id.
_RRF_ORACLE = f"""
WITH {_BM25_CTES},
lex AS (
  SELECT qid AS query_id, doc AS doc_id, rnk FROM (
    SELECT *, row_number() OVER (PARTITION BY qid
                                 ORDER BY score DESC, doc) AS rnk
    FROM scored)
  WHERE rnk <= 10),
dq AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings
  WHERE vec_id % 97 = 0 AND vec_id < 5000),
dscored AS (
  SELECT query_id, e.vec_id AS neighbor_id,
         {_cosine_sql('qv', 'e.embedding')} AS cosine
  FROM dq JOIN embeddings e ON e.vec_id <> dq.query_id),
den AS (
  SELECT query_id, neighbor_id AS doc_id, rnk FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, neighbor_id) AS rnk
    FROM dscored)
  WHERE rnk <= 10),
u AS (
  SELECT query_id, doc_id,
         CAST(floor(1000000.0 / (60 + rnk) + 0.5) AS BIGINT) AS micros
  FROM lex
  UNION ALL
  SELECT query_id, doc_id,
         CAST(floor(1000000.0 / (60 + rnk) + 0.5) AS BIGINT) AS micros
  FROM den),
fscored AS (
  SELECT query_id, doc_id,
         CAST(SUM(micros) AS DOUBLE) / 1000000.0 AS rrf_score,
         CAST(COUNT(*) AS BIGINT) AS n_systems
  FROM u GROUP BY query_id, doc_id)
SELECT query_id, doc_id, rrf_score, n_systems, CAST(rnk AS BIGINT) AS rnk
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY rrf_score DESC, doc_id) AS rnk
  FROM fscored)
WHERE rnk <= 10
"""


@query("q70_rrf_fusion", _RRF_ORACLE)
def q70_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 (q61's exact ranking) ⊕ dense cosine top-10, fused with
    integer-micros RRF (k=60): union of two Q×10 rank tables, one small
    groupBy, per-query top-10 window — the expensive work happened inside
    the per-system retrievers. Queries carve: id % 97 = 0 AND id < 5000
    on BOTH arms (_WORKLOAD_BOUNDS)."""
    from crossbar_data_process_spark.operators.retrieval import (
        bm25_topk,
        rrf_fuse,
    )

    d = _t(spark, sf_dir, "documents")
    q = d.filter((F.col("doc_id") % 97 == 0) & (F.col("doc_id") < 5000)).select(
        F.col("doc_id").alias("query_id"),
        F.array_join(F.slice(tokens(F.lower(F.col("text"))), 1, 4), " ").alias(
            "query_text"
        ),
    )
    lex = bm25_topk(d, q, top_k=10).select("query_id", "doc_id", "rnk")
    e = _t(spark, sf_dir, "embeddings")
    qe = e.filter((F.col("vec_id") % 97 == 0) & (F.col("vec_id") < 5000))
    den = cosine_topk(e, qe, k=10).select(
        "query_id", F.col("neighbor_id").alias("doc_id"), "rnk"
    )
    fused = rrf_fuse([lex, den], k=60, top_k=10)
    return fused.select(
        "query_id",
        "doc_id",
        "rrf_score",
        "n_systems",
        F.col("rnk").cast("long").alias("rnk"),
    )


# -------- the DECLARED embedding near-dup surface: LSH-bucketed threshold
# pairs (operators.similarity.neighbor_pairs_lsh). q27b keeps the brute-force
# all-pairs form as a bounded oracle fixture; this is the plan that survives
# 100 TB — candidates come from signature buckets, never the cross product.
def _neardup_lsh_oracle(
    dim: int = 64, n_planes: int = 6, threshold: float = 0.4
) -> str:
    bucket = _lsh_bucket_sql(dim, n_planes)
    cos = _cosine_sql("a.embedding", "b.embedding")
    return f"""
WITH sig AS (
  SELECT vec_id, embedding, {bucket} AS bucket FROM embeddings)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, {cos} AS cosine
FROM sig a JOIN sig b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE {cos} >= {threshold}
"""


@query("q49_embedding_neardup_lsh", _neardup_lsh_oracle())
def q49_embedding_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crossbar_data_process_spark.operators.similarity import neighbor_pairs_lsh

    e = _t(spark, sf_dir, "embeddings")
    return neighbor_pairs_lsh(e, dim=64, threshold=0.4, n_planes=6)


# ----- rolling-hash document fingerprinting (charter text-analysis item):
# winnowed k-gram fingerprint set. The window-hash array is materialized
# into a column before the block-min reduction — Catalyst does not CSE
# inside HOF lambdas, so the one-expression form would recompute every
# window hash per block (see functions/text.py). Rendered as a sorted
# '|'-joined string at the boundary (list order is not cross-engine stable).
def _winnow_oracle(k: int = 8, stride: int = 16) -> str:
    hash32 = (
        "list_sum(list_transform(range(1, 9), "
        f"j -> (strpos('0123456789abcdef', md5(t[i:i+{k - 1}])[j:j]) - 1) "
        "* (1::BIGINT << (4 * (8 - j)))))"
    )
    return f"""
WITH n AS (
  SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t
  FROM documents),
h AS (
  SELECT doc_id,
         CASE WHEN len(t) >= {k}
              THEN list_transform(range(1, len(t) - {k - 2}), i -> {hash32})
              ELSE [] END AS hs
  FROM n)
SELECT doc_id,
       array_to_string(
         list_sort(list_distinct(
           CASE WHEN len(hs) > 0
                THEN list_transform(
                       range(1, CAST(ceil(len(hs) / {stride}.0) AS INT) + 1),
                       b -> list_min(hs[(b-1)*{stride}+1 : b*{stride}]))
                ELSE [] END)), '|') AS fingerprints
FROM h
"""


@query("q51_rolling_fingerprints", _winnow_oracle())
def q51_rolling_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crossbar_data_process_spark.functions.text import (
        rolling_window_hashes,
        winnow_min,
    )

    d = _t(spark, sf_dir, "documents")
    with_hashes = d.select(
        "doc_id", rolling_window_hashes("text", k=8).alias("__h")
    )
    fp = winnow_min(F.col("__h"), stride=16)
    return with_hashes.select(
        "doc_id",
        F.array_join(
            F.array_sort(fp).cast("array<string>"), "|"
        ).alias("fingerprints"),
    )


# -------- X4 order-preserving union (merge_source_column, ppi.py:414-428):
# first-occurrence dedup across two ordered provenance lists
@query(
    "q40_ordered_union",
    """
WITH s1 AS (SELECT o_custkey AS custkey,
                   list(DISTINCT o_orderpriority ORDER BY o_orderpriority) AS provs
            FROM orders WHERE o_orderstatus = 'O' GROUP BY o_custkey),
     s2 AS (SELECT o_custkey AS custkey,
                   list(DISTINCT o_orderpriority ORDER BY o_orderpriority DESC) AS provs
            FROM orders WHERE o_orderstatus = 'F' GROUP BY o_custkey),
     m AS (SELECT COALESCE(s1.custkey, s2.custkey) AS custkey,
                  list_concat(COALESCE(s1.provs, []), COALESCE(s2.provs, [])) AS cat
           FROM s1 FULL OUTER JOIN s2 ON s1.custkey = s2.custkey)
SELECT custkey,
       array_to_string(list_filter(cat, (x, i) -> list_position(cat, x) = i), '|')
         AS provenance
FROM m
""",
)
def q40_ordered_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crossbar_data_process_spark.operators.aggregates import ordered_union

    o = _t(spark, sf_dir, "orders")
    s1 = (
        o.filter(F.col("o_orderstatus") == "O")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(F.array_sort(F.collect_set("o_orderpriority")).alias("provs1"))
    )
    s2 = (
        o.filter(F.col("o_orderstatus") == "F")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.reverse(F.array_sort(F.collect_set("o_orderpriority"))).alias("provs2")
        )
    )
    m = s1.join(s2, "custkey", "full_outer")
    return m.select(
        "custkey",
        F.array_join(
            ordered_union(F.col("provs1"), F.col("provs2")), "|"
        ).alias("provenance"),
    )


# ------------- W: gap-based sessionization (lag + running sum windows)
@query(
    "q41_sessionize",
    """
WITH g AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS new_sess
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (
  SELECT user_id, ts,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_id
  FROM g)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id, COUNT(*) AS n,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end
FROM s GROUP BY user_id, session_id
""",
)
def q41_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prev = F.lag("ts").over(w)
    new_sess = F.when(
        prev.isNull()
        | (F.unix_micros(F.col("ts")) - F.unix_micros(prev) > 1_800_000_000),
        1,
    ).otherwise(0)
    return (
        e.withColumn("session_id", F.sum(new_sess).over(run).cast("long"))
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        )
    )


# --------- A2 over a join (TPC-H Q2 pattern: min-cost supplier per part).
# r07 fold: the q42 registry row (keep_best-over-join — the same A2 window
# q04 keeps oracled, plus a distinct q45 still covers) moved to
# tests/test_operator_properties.py::test_min_cost_supplier_matches_oracle;
# its slot went to q61_bm25 (REGISTRY.md). The function stays for tests.
def q42_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crossbar_data_process_spark.operators.dedup import keep_best

    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    s = _t(spark, sf_dir, "supplier")
    joined = li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
    return keep_best(
        joined, ["l_partkey"], [F.asc("s_acctbal"), F.asc("s_suppkey")]
    ).select("l_partkey", "s_suppkey", "s_acctbal")


# ------- DDI composition (plans/ddi.py): per-source symmetric dedup (A4)
# then directed outer merge with X4 source union — the drug.py:1177-1189
# pipeline exercised end-to-end over TPC-H stand-ins
@query(
    "q43_ddi_merge",
    """
WITH kegg AS (
  SELECT drug1, drug2, recommendation FROM (
    SELECT *, row_number() OVER (PARTITION BY u, v
              ORDER BY recommendation NULLS LAST, drug1, drug2) AS rn
    FROM (
      SELECT o_custkey % 40 AS drug1, o_orderkey % 40 AS drug2,
             o_orderpriority AS recommendation,
             least(o_custkey % 40, o_orderkey % 40) AS u,
             greatest(o_custkey % 40, o_orderkey % 40) AS v
      FROM orders WHERE o_orderstatus = 'O'))
  WHERE rn = 1),
ddinter AS (
  SELECT drug1, drug2, interaction_level, interaction_type FROM (
    SELECT *, row_number() OVER (PARTITION BY u, v
              ORDER BY interaction_level NULLS LAST, interaction_type NULLS LAST,
                       drug1, drug2) AS rn
    FROM (
      SELECT c_custkey % 40 AS drug1, (c_nationkey * 3) % 40 AS drug2,
             c_mktsegment AS interaction_level,
             CAST(c_nationkey AS VARCHAR) AS interaction_type,
             least(c_custkey % 40, (c_nationkey * 3) % 40) AS u,
             greatest(c_custkey % 40, (c_nationkey * 3) % 40) AS v
      FROM customer))
  WHERE rn = 1)
SELECT COALESCE(k.drug1, d.drug1) AS drug1,
       COALESCE(k.drug2, d.drug2) AS drug2,
       k.recommendation, d.interaction_level, d.interaction_type,
       CASE WHEN k.drug1 IS NOT NULL AND d.drug1 IS NOT NULL
            THEN 'Kegg|DDInter'
            WHEN k.drug1 IS NOT NULL THEN 'Kegg' ELSE 'DDInter' END AS source
FROM kegg k FULL OUTER JOIN ddinter d
  ON k.drug1 = d.drug1 AND k.drug2 = d.drug2
""",
)
def q43_ddi_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crossbar_data_process_spark.plans.ddi import (
        merge_all_ddis,
        normalize_ddinter_ddi,
        normalize_kegg_ddi,
    )

    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    kegg = o.filter(F.col("o_orderstatus") == "O").select(
        (F.col("o_custkey") % 40).alias("drug1"),
        (F.col("o_orderkey") % 40).alias("drug2"),
        F.col("o_orderpriority").alias("recommendation"),
    )
    ddinter = c.select(
        (F.col("c_custkey") % 40).alias("drug1"),
        ((F.col("c_nationkey") * 3) % 40).alias("drug2"),
        F.col("c_mktsegment").alias("interaction_level"),
        F.col("c_nationkey").cast("string").alias("interaction_type"),
    )
    merged = merge_all_ddis(
        normalize_kegg_ddi(kegg), normalize_ddinter_ddi(ddinter)
    )
    return merged.withColumn("source", F.array_join("source", "|"))


# ---------------- generalized TWO-TABLE backward as-of join
# (operators/rangejoin.asof_join — q48 oracles the single-table window
# form; this row oracles the true two-table operator against DuckDB's
# native ASOF LEFT JOIN, a fully independent implementation). Replaced
# q44_rollup in the 50-slot registry (r07; rollup() is a thin Spark
# built-in, now pinned by tests/test_operator_properties.py instead —
# see REGISTRY.md fold history). Right side is deduped to one row per
# (key, ts) so tie semantics are fully defined in both engines.
@query(
    "q57_asof_two_table",
    """
WITH r AS (
  SELECT user_id, ts AS rts, max(value) AS ev_value,
         max(event_type) AS ev_type
  FROM events GROUP BY user_id, ts)
SELECT o_orderkey, o_custkey,
       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS order_ts,
       round(ev_value, 6) AS ev_value, ev_type,
       strftime(rts, '%Y-%m-%d %H:%M:%S') AS matched_ts
FROM orders ASOF LEFT JOIN r
  ON o_custkey = r.user_id AND r.rts < o_orderdate
""",
)
def q57_asof_two_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crossbar_data_process_spark.operators.rangejoin import asof_join

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    ev = (
        _t(spark, sf_dir, "events")
        .groupBy(F.col("user_id").alias("o_custkey"), F.col("ts").alias("rts"))
        .agg(
            F.max("value").alias("ev_value"),
            F.max("event_type").alias("ev_type"),
        )
    )
    out = asof_join(
        o, ev, by="o_custkey", left_ts="o_orderdate", right_ts="rts",
        value_cols=["ev_value", "ev_type"],
    )
    return out.select(
        "o_orderkey",
        "o_custkey",
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("order_ts"),
        F.round("ev_value", 6).alias("ev_value"),
        "ev_type",
        F.date_format("matched_rts", "yyyy-MM-dd HH:mm:ss").alias("matched_ts"),
    )


# --------- U2 relational set ops (EXCEPT / INTERSECT, SURVEY §2.7) feeding
# a J3 plain left-outer attach (disease.py:832 citation join) — one pipeline,
# one oracle (r02 consolidation: the former q45 + q46 folded so the declared
# set fits the driver's 50-row CORRECTNESS window; both operators still
# hash-checked, now compositionally)
@query(
    "q45_set_ops_attach",
    f"""
WITH building AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
     urgent AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders
                WHERE o_orderpriority = '1-URGENT'),
     only_building AS (SELECT c_custkey FROM building EXCEPT SELECT c_custkey FROM urgent),
     both_sets AS (SELECT c_custkey FROM building INTERSECT SELECT c_custkey FROM urgent),
     tagged AS (SELECT c_custkey, 'building_minus_urgent' AS tag FROM only_building
                UNION ALL
                SELECT c_custkey, 'building_and_urgent' AS tag FROM both_sets),
     stats AS (SELECT o_custkey, COUNT(*) AS n_orders,
                      {_dsum_sql('o_totalprice')} AS total_spent
               FROM orders GROUP BY o_custkey)
SELECT c_custkey, tag, COALESCE(n_orders, 0) AS n_orders, total_spent
FROM tagged LEFT JOIN stats ON c_custkey = o_custkey
""",
)
def q45_set_ops_attach(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    urgent = (
        o.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    # subtract = EXCEPT DISTINCT (exact U2 semantics; customer keys are
    # unique so bag/set agree, but the operator declared is the set form)
    minus = building.subtract(urgent).withColumn(
        "tag", F.lit("building_minus_urgent")
    )
    inter = building.intersect(urgent).withColumn(
        "tag", F.lit("building_and_urgent")
    )
    tagged = minus.unionByName(inter)
    stats = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        _dsum("o_totalprice").alias("total_spent"),
    )
    return tagged.join(stats, tagged.c_custkey == stats.o_custkey, "left").select(
        "c_custkey",
        "tag",
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        "total_spent",
    )


# ------ P8 self-pair drop + A3 plain dedup + F2 first-xref pick combined
# r12: folded out of the registry → slot to q70_rrf_fusion (REGISTRY.md).
# P8 self-pair exclusion stays registry-oracled via the `neighbor_id <>
# query_id` join predicates of q27/q54/q67/q69 and the strict `a < b`
# pair conditions of q25/q26/q49; A3 plain dedup via q21's exact-dedup
# groupBy and q45's DISTINCT scans; the F2 first-xref split rides q09's
# split family. The former DuckDB oracle lives on VERBATIM in
# tests/test_operator_properties.py::test_pair_normalize_matches_oracle.
_PAIR_NORMALIZE_ORACLE = """
SELECT DISTINCT
       l_suppkey % 20 AS a, l_partkey % 20 AS b,
       (string_split(l_returnflag || ';' || l_linestatus || ';', ';'))[1] AS first_flag
FROM lineitem
WHERE l_suppkey % 20 <> l_partkey % 20
"""


def q47_pair_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crossbar_data_process_spark.functions.ids import first_xref
    from crossbar_data_process_spark.operators.filters import drop_self_pairs

    li = _t(spark, sf_dir, "lineitem").select(
        (F.col("l_suppkey") % 20).alias("a"),
        (F.col("l_partkey") % 20).alias("b"),
        first_xref(
            F.concat_ws(";", "l_returnflag", "l_linestatus", F.lit("")), ";"
        ).alias("first_flag"),
    )
    return drop_self_pairs(li, "a", "b").dropDuplicates()


# ---------------- snapshot diff / CDC (operators/diff.py) — r08: the former
# q14_explode_tokens' folded slot (REGISTRY.md). Two deterministic versions
# of orders: "old" misses every 13th key (those become added), "new" misses
# every 17th (removed) and perturbs o_totalprice on %5 keys and
# o_orderstatus on %7 keys (changed, with the column list named in compare
# order). One co-partitioned full-outer join; changed_cols is emitted as a
# joined string so the value-hash covers it portably.
_Q62_COMPARE = ["o_totalprice", "o_orderstatus"]


@query(
    "q62_snapshot_diff",
    """
WITH old AS (
  SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
  WHERE o_orderkey % 13 <> 0),
new AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1.5
              ELSE o_totalprice END AS o_totalprice,
         CASE WHEN o_orderkey % 7 = 0 THEN 'X' ELSE o_orderstatus END
           AS o_orderstatus
  FROM orders WHERE o_orderkey % 17 <> 0),
j AS (
  SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
         o.o_orderkey IS NULL AS is_added,
         n.o_orderkey IS NULL AS is_removed,
         o.o_totalprice IS DISTINCT FROM n.o_totalprice AS dp,
         o.o_orderstatus IS DISTINCT FROM n.o_orderstatus AS ds
  FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey)
SELECT o_orderkey,
       CASE WHEN is_added THEN 'added' WHEN is_removed THEN 'removed'
            WHEN dp OR ds THEN 'changed' ELSE 'unchanged' END AS change,
       CASE WHEN NOT is_added AND NOT is_removed AND (dp OR ds)
            THEN array_to_string(list_filter(
                   [CASE WHEN dp THEN 'o_totalprice' END,
                    CASE WHEN ds THEN 'o_orderstatus' END],
                   x -> x IS NOT NULL), ',')
            ELSE '' END AS changed_cols
FROM j
""",
)
def q62_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crossbar_data_process_spark.operators.diff import diff_snapshots

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    old = o.filter(F.col("o_orderkey") % 13 != 0)
    new = o.filter(F.col("o_orderkey") % 17 != 0).select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 5 == 0, F.col("o_totalprice") + 1.5
        )
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
        F.when(F.col("o_orderkey") % 7 == 0, F.lit("X"))
        .otherwise(F.col("o_orderstatus"))
        .alias("o_orderstatus"),
    )
    d = diff_snapshots(old, new, keys=["o_orderkey"], compare=_Q62_COMPARE)
    return d.select(
        "o_orderkey",
        "change",
        F.array_join("changed_cols", ",").alias("changed_cols"),
    )


# ---------------- incremental dedup against a persisted index
# (operators/textdedup.dedup_index + flag_against_index) — r08: the former
# q33_json_extract's folded slot (REGISTRY.md). The operator a 100 TB ingest
# runs daily: corpus = doc_id%10<8 builds the three-table silver index once;
# the batch (doc_id%10>=8, plus re-ingested copies of every %40==0 corpus
# doc under shifted ids — the natural corpus has no exact dups, and
# re-ingest is precisely the scenario the exact-fp fast path serves) is
# checked against it — exact-fp equi-join first (exact dups skip shingling
# entirely), LSH bucket probe + exact-Jaccard verify for the fp-novel rest.
# Work is sized by the BATCH, never the corpus. The oracle reuses
# _minhash_ctes verbatim over the same corpus∪batch union (same
# permutations, same band keys) so the index path can never drift from the
# full-corpus q26 row.
def _incremental_dedup_oracle(threshold: float = 0.5) -> str:
    return f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 10 < 8),
batch AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 10 >= 8
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM corpus WHERE doc_id % 40 = 0),
uni AS (
  SELECT doc_id, text, 0 AS is_new FROM corpus
  UNION ALL SELECT doc_id, text, 1 AS is_new FROM batch),
{_minhash_ctes(src="uni")},
side AS (SELECT doc_id, is_new FROM uni),
cfp AS (SELECT doc_id, {_FP_SQL} AS fp FROM corpus),
bfp AS (SELECT doc_id, {_FP_SQL} AS fp FROM batch),
exact AS (
  SELECT b.doc_id, MIN(c.doc_id) AS matched_doc
  FROM bfp b JOIN cfp c ON b.fp = c.fp GROUP BY b.doc_id),
cand2 AS (
  SELECT DISTINCT a.doc_id AS new_doc, b.doc_id AS corpus_doc
  FROM bands a JOIN bands b ON a.bi = b.bi AND a.key = b.key
  JOIN side sa ON sa.doc_id = a.doc_id
  JOIN side sb ON sb.doc_id = b.doc_id
  WHERE sa.is_new = 1 AND sb.is_new = 0
    AND a.doc_id NOT IN (SELECT doc_id FROM exact)),
near AS (
  SELECT new_doc, corpus_doc,
         round(len(list_intersect(ia.s, ib.s)) * 1.0
               / (ia.nsh + ib.nsh - len(list_intersect(ia.s, ib.s))), 6)
           AS jaccard
  FROM cand2 JOIN nz ia ON ia.doc_id = new_doc
             JOIN nz ib ON ib.doc_id = corpus_doc),
nbest AS (
  SELECT new_doc AS doc_id, 'near' AS dup_kind,
         corpus_doc AS matched_doc, jaccard
  FROM near WHERE jaccard >= {threshold}
  QUALIFY row_number() OVER (PARTITION BY new_doc
                             ORDER BY corpus_doc, jaccard) = 1)
SELECT doc_id, 'exact' AS dup_kind, matched_doc,
       CAST(NULL AS DOUBLE) AS jaccard
FROM exact
UNION ALL SELECT doc_id, dup_kind, matched_doc, jaccard FROM nbest
"""


@query("q63_incremental_dedup", _incremental_dedup_oracle())
def q63_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crossbar_data_process_spark.operators.textdedup import (
        dedup_index,
        flag_against_index,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = d.filter(F.col("doc_id") % 10 < 8)
    reingested = corpus.filter(F.col("doc_id") % 40 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    batch = d.filter(F.col("doc_id") % 10 >= 8).unionByName(reingested)
    index = dedup_index(corpus, n=3, num_hashes=12, bands=6)
    return flag_against_index(
        batch, index, n=3, num_hashes=12, bands=6, threshold=0.5
    )


# ---------------- streaming incremental-dedup ingest, END TO END
# (streaming/ingest.py) — r09: the former q48_asof_join's folded slot
# (REGISTRY.md). q63 oracles the batch-shaped flag_against_index call; THIS
# row runs the actual Structured Streaming path — a bounded 2-file parquet
# stream (maxFilesPerTrigger=1, mtime-ordered so file→batch mapping is
# deterministic) through writeStream.foreachBatch(dedup_ingest_writer)
# with availableNow — so the exactly-once gold contract (within-batch exact
# + near dedup, cross-batch dedup via the GROWING persisted index, seeded-
# corpus dedup, dynamic partition overwrite) is hash-checked by the driver,
# not just pytest (VERDICT r8 #6). Batch composition: batch 0 carries
# %10==8 docs + exact re-ingests of corpus %40==0 (flagged vs the seeded
# index) + within-batch copies of %40==8 docs (within-batch min-id dedup);
# batch 1 carries %10==9 docs + fresh copies of the SAME %40==8 texts —
# flagged ONLY because batch 0's survivors extended the index between
# micro-batches, which is the property that separates streaming ingest from
# a stateless per-batch job. The oracle replays the two batches in SQL:
# _minhash_ctes over corpus∪batch0∪batch1 (ids are disjoint by
# construction) + the q53-style recursive component walk per batch + the
# q63-style fp/near flag logic per batch, with batch 1 flagging against
# corpus ∪ survivors(batch 0).
def _streaming_ingest_oracle(threshold: float = 0.5) -> str:
    return f"""
WITH RECURSIVE corpus AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 10 < 4),
b0 AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 10 = 8
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM corpus WHERE doc_id % 40 = 0
  UNION ALL
  SELECT doc_id + 1500000 AS doc_id, text FROM documents WHERE doc_id % 40 = 8),
b1 AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 10 = 9
  UNION ALL
  SELECT doc_id + 2000000 AS doc_id, text FROM documents WHERE doc_id % 40 = 8),
uni AS (
  SELECT doc_id, text, 0 AS side FROM corpus
  UNION ALL SELECT doc_id, text, 1 AS side FROM b0
  UNION ALL SELECT doc_id, text, 2 AS side FROM b1),
{_minhash_ctes(src="uni")},
side AS (SELECT doc_id, side FROM uni),
fps AS (SELECT doc_id, {_FP_SQL} AS fp FROM uni),
jac AS (
  SELECT doc_a AS a, doc_b AS b,
         round(i * 1.0 / (na + nb - i), 6) AS jc FROM j
  UNION ALL
  SELECT doc_b, doc_a, round(i * 1.0 / (na + nb - i), 6) FROM j),
b0x AS (
  SELECT f.doc_id FROM fps f JOIN side s USING (doc_id) WHERE s.side = 1
  QUALIFY row_number() OVER (PARTITION BY f.fp ORDER BY f.doc_id) = 1),
p0 AS (
  SELECT a, b FROM jac
  WHERE jc >= {threshold} AND a < b
    AND a IN (SELECT doc_id FROM b0x) AND b IN (SELECT doc_id FROM b0x)),
sym0 AS (SELECT a, b FROM p0 UNION SELECT b, a FROM p0),
pn0 AS (SELECT DISTINCT a AS id FROM sym0),
walk0(id, r) AS (
  SELECT id, id FROM pn0
  UNION
  SELECT w.id, s.b FROM walk0 w JOIN sym0 s ON w.r = s.a),
keep0 AS (
  SELECT MIN(id) AS doc_id FROM (
    SELECT id, MIN(r) AS component FROM walk0 GROUP BY id) GROUP BY component),
b0p AS (
  SELECT doc_id FROM b0x WHERE doc_id NOT IN (SELECT id FROM pn0)
  UNION ALL SELECT doc_id FROM keep0),
idx0fp AS (
  SELECT DISTINCT f.fp FROM fps f JOIN side s USING (doc_id) WHERE s.side = 0),
f0x AS (
  SELECT f.doc_id FROM fps f JOIN b0p USING (doc_id)
  WHERE f.fp IN (SELECT fp FROM idx0fp)),
f0n AS (
  SELECT DISTINCT jac.a AS doc_id FROM jac
  JOIN side sb ON sb.doc_id = jac.b AND sb.side = 0
  WHERE jc >= {threshold}
    AND jac.a IN (SELECT doc_id FROM b0p)
    AND jac.a NOT IN (SELECT doc_id FROM f0x)),
s0 AS (
  SELECT doc_id FROM b0p
  WHERE doc_id NOT IN (SELECT doc_id FROM f0x)
    AND doc_id NOT IN (SELECT doc_id FROM f0n)),
b1x AS (
  SELECT f.doc_id FROM fps f JOIN side s USING (doc_id) WHERE s.side = 2
  QUALIFY row_number() OVER (PARTITION BY f.fp ORDER BY f.doc_id) = 1),
p1 AS (
  SELECT a, b FROM jac
  WHERE jc >= {threshold} AND a < b
    AND a IN (SELECT doc_id FROM b1x) AND b IN (SELECT doc_id FROM b1x)),
sym1 AS (SELECT a, b FROM p1 UNION SELECT b, a FROM p1),
pn1 AS (SELECT DISTINCT a AS id FROM sym1),
walk1(id, r) AS (
  SELECT id, id FROM pn1
  UNION
  SELECT w.id, s.b FROM walk1 w JOIN sym1 s ON w.r = s.a),
keep1 AS (
  SELECT MIN(id) AS doc_id FROM (
    SELECT id, MIN(r) AS component FROM walk1 GROUP BY id) GROUP BY component),
b1p AS (
  SELECT doc_id FROM b1x WHERE doc_id NOT IN (SELECT id FROM pn1)
  UNION ALL SELECT doc_id FROM keep1),
idx1 AS (
  SELECT doc_id FROM side WHERE side = 0
  UNION ALL SELECT doc_id FROM s0),
idx1fp AS (SELECT DISTINCT f.fp FROM fps f JOIN idx1 USING (doc_id)),
f1x AS (
  SELECT f.doc_id FROM fps f JOIN b1p USING (doc_id)
  WHERE f.fp IN (SELECT fp FROM idx1fp)),
f1n AS (
  SELECT DISTINCT jac.a AS doc_id FROM jac
  JOIN idx1 ON idx1.doc_id = jac.b
  WHERE jc >= {threshold}
    AND jac.a IN (SELECT doc_id FROM b1p)
    AND jac.a NOT IN (SELECT doc_id FROM f1x)),
s1 AS (
  SELECT doc_id FROM b1p
  WHERE doc_id NOT IN (SELECT doc_id FROM f1x)
    AND doc_id NOT IN (SELECT doc_id FROM f1n))
SELECT doc_id, CAST(0 AS BIGINT) AS batch_id FROM s0
UNION ALL
SELECT doc_id, CAST(1 AS BIGINT) AS batch_id FROM s1
"""


@query("q64_streaming_ingest", _streaming_ingest_oracle())
def q64_streaming_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ACTUAL streaming path — readStream over a 2-file bounded parquet
    stream, foreachBatch(dedup_ingest_writer), availableNow — then read the
    gold table back. Checkpoint dir is FRESH per invocation (a reused one
    would make the replayed stream a committed no-op); gold/index live in a
    pid-scoped root wiped per invocation so repeated bench/correctness runs
    never accumulate state."""
    import atexit
    import glob
    import os
    import shutil
    import tempfile

    from crossbar_data_process_spark.streaming.ingest import (
        dedup_ingest_writer,
        seed_dedup_index,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    # seed corpus is %10<4 (not q63's %10<8): the NEW surface here is the
    # streaming machinery + cross-batch index growth, not batch-vs-large-
    # corpus probing (q63 owns that); the smaller seed halves the one-off
    # index-build cost in every bench/correctness run
    corpus = d.filter(F.col("doc_id") % 10 < 4)
    batch0 = (
        d.filter(F.col("doc_id") % 10 == 8)
        .unionByName(
            corpus.filter(F.col("doc_id") % 40 == 0).select(
                (F.col("doc_id") + 1000000).alias("doc_id"), "text"
            )
        )
        .unionByName(
            d.filter(F.col("doc_id") % 40 == 8).select(
                (F.col("doc_id") + 1500000).alias("doc_id"), "text"
            )
        )
    )
    batch1 = d.filter(F.col("doc_id") % 10 == 9).unionByName(
        d.filter(F.col("doc_id") % 40 == 8).select(
            (F.col("doc_id") + 2000000).alias("doc_id"), "text"
        )
    )

    root = os.path.join(
        tempfile.gettempdir(), f"stream_ingest_q64_{os.getpid()}"
    )
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    shutil.rmtree(root, ignore_errors=True)
    input_dir = os.path.join(root, "input")
    index_dir = os.path.join(root, "index")
    gold_dir = os.path.join(root, "gold")
    ckpt_dir = os.path.join(root, "ckpt")
    os.makedirs(input_dir)

    # seed build and the two input-file stagings are mutually
    # independent jobs — overlap them (guide §2.6, r16 optimization
    # round); byte-wise identical outputs at identical paths
    from crossbar_data_process_spark.parallel import run_concurrently

    def _stage(i: int, b: DataFrame) -> None:
        # one parquet FILE per micro-batch, mtimes 1000 s apart: the
        # file stream source admits files oldest-first, so file i IS
        # batch i
        staging = os.path.join(root, f"stage{i}")
        b.coalesce(1).write.mode("overwrite").parquet(staging)
        part = glob.glob(os.path.join(staging, "part-*.parquet"))[0]
        dst = os.path.join(input_dir, f"batch{i}.parquet")
        shutil.copyfile(part, dst)
        os.utime(dst, (1_700_000_000 + i * 1000,) * 2)

    run_concurrently(
        [
            lambda: seed_dedup_index(corpus, index_dir),
            lambda: _stage(0, batch0),
            lambda: _stage(1, batch1),
        ]
    )

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )
    sq = (
        stream.writeStream.foreachBatch(
            dedup_ingest_writer(spark, index_dir, gold_dir, threshold=0.5)
        )
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .start()
    )
    sq.awaitTermination()

    return spark.read.parquet(gold_dir).select(
        "doc_id", F.col("__batch_id").cast("long").alias("batch_id")
    )


# --------------------- benchmark decontamination, driver-oracled (r10)
# Training-data hygiene charter surface (operators/textdedup.contamination_
# flags), previously pytest-only (tests/test_neardup_resolution.py) and an
# optional q55 stage: flag corpus documents sharing any 8-token n-gram with
# an evaluation/benchmark set — the screen every pretraining mix runs before
# freezing. The benchmark is carved from the corpus by a CONSTANT-bounded
# predicate (doc_id % 7 = 0 AND doc_id < 5000 — the q61 workload-pinning
# rule: the eval suite must NOT grow with the corpus, or scale probes
# measure benchmark growth instead of engine scaling; real eval suites are
# fixed-size by nature). Scale shape: the benchmark side is shingled,
# deduped, and BROADCAST — the corpus is never shuffled; per-doc hit counts
# aggregate on the (small) match set only.
_CONTAM_BENCH = "(doc_id % 7 = 0 AND doc_id < 5000)"


@query(
    "q65_contamination",
    f"""
WITH toks AS (
  SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '') AS t
  FROM documents),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(t) - 7, 0) + 1),
                                      i -> array_to_string(t[i:i+7], ' '))) AS s
  FROM toks),
bench AS (SELECT DISTINCT unnest(s) AS tok FROM sh WHERE {_CONTAM_BENCH}),
corpus AS (SELECT doc_id, unnest(s) AS tok FROM sh WHERE NOT {_CONTAM_BENCH})
SELECT doc_id, COUNT(*) AS n_contaminated_ngrams
FROM corpus JOIN bench USING (tok) GROUP BY doc_id
""",
)
def q65_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crossbar_data_process_spark.operators.textdedup import (
        contamination_flags,
    )

    d = _t(spark, sf_dir, "documents")
    is_bench = (F.col("doc_id") % 7 == 0) & (F.col("doc_id") < 5000)
    return contamination_flags(d.filter(~is_bench), d.filter(is_bench), n=8)


# --------------------- deterministic training-mix sampling, driver-oracled
# (r10). operators/sampling.py was pytest-only since r04: per-row md5-bucket
# membership (no RNG — reproducible across runs, partitionings, retries, and
# ENGINES, which is exactly what makes it oracle-able: DuckDB reproduces the
# identical draw digit-by-digit). The declared form composes the two
# production operators end-to-end: source_mix (per-source keep fractions in
# ONE scan-side CASE filter; sources absent from the mix are dropped — a mix
# is a whitelist, src16-19 exercise that) then assign_split (train/val/test
# from cumulative bucket boundaries of an INDEPENDENT salt — membership in
# the mix and the split assignment are separate draws on the same key).
# Scale shape: pure scan-side expressions, ZERO shuffles (plan pinned in
# tests/test_plan_shapes.py) — at 100 TB the mix is a filter pushed to the
# scan, not a sampling job.
_MIX_WEIGHTS = {f"src{i}": ((i * 7) % 10 + 1) / 10 for i in range(16)}
_SPLIT_WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}


def _bucket_sql(salt: str) -> str:
    """DuckDB twin of sampling._bucket: 32-bit md5-prefix of
    (salt, 0x1f, key) — the q26 hex-digit idiom — mod 1e6."""
    return (
        "list_sum(list_transform(range(1, 9), "
        f"i -> (strpos('0123456789abcdef', md5('{salt}' || chr(31) || "
        "CAST(doc_id AS VARCHAR))[i:i]) - 1) "
        "* (1::BIGINT << (4 * (8 - i))))) % 1000000"
    )


def _mixture_oracle() -> str:
    mix_case = (
        "CASE "
        + " ".join(
            f"WHEN source = '{s}' THEN {int(w * 1_000_000)}"
            for s, w in sorted(_MIX_WEIGHTS.items())
        )
        + " ELSE NULL END"
    )
    # assign_split semantics: names in sorted order against cumulative
    # boundaries — sorted({train,val,test}) = [test, train, val].
    return f"""
WITH b AS (SELECT doc_id, source,
                  {_bucket_sql("mix")} AS mb,
                  {_bucket_sql("split")} AS sb
           FROM documents)
SELECT doc_id, source,
       CASE WHEN sb < 100000 THEN 'test'
            WHEN sb < 900000 THEN 'train'
            ELSE 'val' END AS split
FROM b WHERE mb < ({mix_case})
"""


@query("q66_mixture_sample", _mixture_oracle())
def q66_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crossbar_data_process_spark.operators.sampling import (
        assign_split,
        source_mix,
    )

    d = _t(spark, sf_dir, "documents")
    mixed = source_mix(
        d, _MIX_WEIGHTS, source_col="source", key_col="doc_id", salt="mix"
    )
    return mixed.select(
        "doc_id",
        "source",
        assign_split("doc_id", _SPLIT_WEIGHTS, salt="split"),
    )


# ---------------------------------------------------------------------------
# Registration-order defense + registry discipline. The driver records
# CORRECTNESS rows for AT MOST the first 50 registered queries, so the
# declared set stays at EXACTLY 50 — to add a query, FOLD a redundant row
# out. The full fold history and rationale live in REGISTRY.md (the single
# source of truth; COVERAGE.md and this comment only point there).
# `tests/test_plan_shapes.py::test_registry_is_exactly_fifty` pins the count.
# The newest/reshaped surfaces are moved to the FRONT of the registration
# order, so any harness truncation falls on queries with multi-round green
# history rather than the coverage-critical ones.
_FRONT = [
    # r15 new surface first
    "q73_semantic_dedup_ingest",
    # r14 new surface
    "q72_ann_streaming_ingest",
    # r13 new surface
    "q71_bm25_indexed",
    # r12 new surfaces
    "q69_ivfpq_silver",
    "q70_rrf_fusion",
    # r11 new surfaces
    "q68_quantile_rollup",
    "q67_pq_adc_topk",
    # r10 new surfaces
    "q65_contamination",
    "q66_mixture_sample",
    # r09 new surface
    "q64_streaming_ingest",
    # r08 new/reshaped surfaces
    "q63_incremental_dedup",
    "q62_snapshot_diff",
    "q34_blacklist_topk",
    # r07 new/reshaped surfaces
    "q60_nb_quality",
    "q59_segment_dedup",
    "q58_pack_documents",
    "q57_asof_two_table",
    "q25_ngram_jaccard",
    "q15_curie_ids",
    # r06 new/reshaped surfaces
    "q56_range_join",
    "q26b_simhash",
    "q52_kg_paths",
    "q54_ivf_topk",
    "q55_curation_funnel",
    "q05_membership_filters",
    "q12_median_middle",
    "q22_doc_profile",
    "q45_set_ops_attach",
]


def _reorder() -> None:
    global QUERIES, ORACLES
    order = _FRONT + [n for n in QUERIES if n not in _FRONT]
    QUERIES = {n: QUERIES[n] for n in order}
    ORACLES = {n: ORACLES[n] for n in order if n in ORACLES}


_reorder()
