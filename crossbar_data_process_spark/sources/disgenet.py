"""DisGeNET client surface (SURVEY §2.1 S2): the reference wraps an
authenticated paginated REST API in a hand-rolled client
(disgenet_local.py) whose typed endpoint results are NamedTuples
(e.g. DiseaseDiseaseAssociation, disgenet_local.py:1276-1298) with a
per-query ``limit`` (default 10, max 100 — disgenet_local.py:117,163).

Engine form: the HTTP/auth loop is an ingest job landing raw JSON in a
bronze directory; the Spark surface is (a) the declared StructTypes below
(the NamedTuple schemas), (b) ``parse_bronze_json`` turning landed payloads
into typed DataFrames, and (c) ``top_k_per_disease`` reproducing the API's
limit semantics as an O3 rank window over the full table — at scale you
filter/rank the landed data, not the API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from crossbar_data_process_spark.operators.topk import top_k_per_group

# disgenet_local.py:1276-1298 DiseaseDiseaseAssociation
DDA_SCHEMA = StructType(
    [
        StructField("disease1_name", StringType()),
        StructField("disease2_name", StringType()),
        StructField("disease1_nshare", IntegerType()),
        StructField("disease2_nshare", IntegerType()),
        StructField("disease1_disease_class", ArrayType(StringType())),
        StructField("disease2_disease_class", ArrayType(StringType())),
        StructField("disease1_disease_class_name", ArrayType(StringType())),
        StructField("disease2_disease_class_name", ArrayType(StringType())),
        StructField("jaccard_share", DoubleType()),
        StructField("pvalue_jaccard_share", DoubleType()),
        StructField("source", StringType()),
        StructField("ngenes1", IntegerType()),
        StructField("ngenes2", IntegerType()),
        StructField("nshare", IntegerType()),
        StructField("nvariants1", IntegerType()),
        StructField("nvariants2", IntegerType()),
        StructField("diseaseid1", StringType()),
        StructField("diseaseid2", StringType()),
    ]
)

# disgenet_local.py:1418-1438-style gene-disease association (core fields)
GDA_SCHEMA = StructType(
    [
        StructField("geneid", IntegerType()),
        StructField("gene_symbol", StringType()),
        StructField("uniprotid", StringType()),
        StructField("diseaseid", StringType()),
        StructField("disease_name", StringType()),
        StructField("score", DoubleType()),
        StructField("ei", DoubleType()),
        StructField("el", StringType()),
        StructField("year_initial", IntegerType()),
        StructField("year_final", IntegerType()),
        StructField("source", StringType()),
    ]
)


def parse_bronze_json(
    spark: SparkSession, path: str, schema: StructType
) -> DataFrame:
    """Landed JSON (one object per line, the bronze layout the ingest job
    writes) → typed DataFrame. Explicit schema: no sampling-based
    inference drift between rounds."""
    return spark.read.schema(schema).json(path)


def top_k_per_disease(
    gda: DataFrame, k: int = 10, disease_col: str = "diseaseid"
) -> DataFrame:
    """The API's per-disease ``limit`` (default 10, max 100) as a rank
    window — O3. Ties broken by gene id for determinism."""
    assert k <= 100, "reference API caps limit at 100"
    return top_k_per_group(
        gda,
        [disease_col],
        [F.desc("score"), F.asc("geneid")],
        k,
        rank_col=None,
    )
