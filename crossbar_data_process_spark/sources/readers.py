"""Readers (SURVEY.md §2.1 S3–S5).

Every reader takes an explicit schema or infers once and pins it — schema
drift (the reference's pandas dtype widening, ppi.py:460-476) cannot happen.
Filters/projections applied right after these reads reach the parquet scan
via Catalyst pushdown (verify with ``df.explain``: PushedFilters/ReadSchema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

TESTDATA_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | None = None,
    **options,
) -> DataFrame:
    """S4/S5: local CSV/JSON/parquet scan (reference drug.py:601 CSV cache,
    disease.py:479-493 JSON dir)."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    if fmt == "csv":
        options.setdefault("header", True)
    return r.format(fmt).options(**options).load(path)


def read_testdata(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    assert table in TESTDATA_TABLES, table
    if table == "events":
        return load_events(spark, f"{sf_dir}/{table}.parquet")
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def load_events(spark: SparkSession, path: str) -> DataFrame:
    """Schema-aware events loader. ``events.ts`` has shipped as both parquet
    TIMESTAMP(MICROS) (reads natively) and TIMESTAMP(NANOS) (the Spark 4
    reader rejects it unless nanos are surfaced as long via
    ``spark.sql.legacy.parquet.nanosAsLong``). Branch on what the footer
    actually contains instead of hardcoding either era; always return ``ts``
    as the session-TZ TIMESTAMP type every downstream plan was audited with.

    The legacy conf is only mutated on the nanos path — never for a natively
    readable file — and is left set there because executors re-read SQL confs
    at job execution, so restoring it before the job runs would break the
    scan mid-query.
    """
    from pyspark.sql.types import TimestampNTZType, TimestampType

    try:
        df = spark.read.parquet(path)
        ts_type = df.schema["ts"].dataType
    except Exception:
        df, ts_type = None, None
    if df is not None and isinstance(ts_type, (TimestampType, TimestampNTZType)):
        if isinstance(ts_type, TimestampNTZType):
            # DuckDB reads the same file as a naive timestamp; with a UTC
            # session this cast is render-identical and keeps downstream
            # unix_micros/window/date_format call sites on TIMESTAMP.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    # Legacy nanos era: surface INT64(NANOS) as long, truncate to micros
    # (what the DuckDB oracle sees), restore a timestamp.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def parse_kegg_links(spark: SparkSession, path: str) -> DataFrame:
    """S3: KEGG ``link``/``conv`` microformat — tab-separated id pairs
    (reference kegg_local.py:346-399). ``spark.read.text`` + split; stays a
    two-column mapping DataFrame for broadcast joins."""
    lines = spark.read.text(path)
    parts = F.split(F.col("value"), "\t")
    return lines.select(
        parts.getItem(0).alias("source_id"), parts.getItem(1).alias("target_id")
    ).filter(F.col("target_id").isNotNull())


def parse_flat_records(
    spark: SparkSession, path: str, record_sep: str = "///"
) -> DataFrame:
    """S3: KEGG flat-file records (reference kegg_local.py:211-274 regex
    state machine) as a distributed parse: one row per record via a custom
    line-group delimiter, then field extraction with ``regexp_extract`` —
    the per-record regex work is JVM-side, partition-parallel."""
    raw = spark.read.option("lineSep", f"\n{record_sep}\n").text(path)
    rec = F.col("value")
    return raw.select(
        F.regexp_extract(rec, r"ENTRY\s+(\S+)", 1).alias("entry_id"),
        F.regexp_extract(rec, r"NAME\s+([^\n]+)", 1).alias("name"),
        rec.alias("raw"),
    ).filter(F.col("entry_id") != "")
