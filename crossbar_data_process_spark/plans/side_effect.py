"""Drug–side effect adapter (reference node_data/side_effect.py): the
ADReCS ⊕ SIDER ⊕ OffSides three-way merge on (drugbank_id, meddra_id)
with X4 source union (side_effect.py:260-280), plus per-source frequency
parsing/rounding (F7, side_effect.py:221) and plain dedup (A3,
side_effect.py:201,225,249)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crossbar_data_process_spark.operators.merge import CoalesceSpec, outer_merge

SIDE_EFFECT_KEY = ["drugbank_id", "meddra_id"]


def normalize_side_effect_source(df: DataFrame, name: str) -> DataFrame:
    out = df.withColumn("source", F.array(F.lit(name))).dropDuplicates(
        SIDE_EFFECT_KEY
    )
    if "frequency" in df.columns:
        # "12.3%"-style strings → rounded double (side_effect.py:221)
        out = out.withColumn(
            "frequency",
            F.round(F.regexp_replace("frequency", "%", "").cast("double"), 3),
        )
    return out


def merge_drug_side_effect(
    adrecs: DataFrame, sider: DataFrame, offsides: DataFrame
) -> DataFrame:
    srcs = [
        normalize_side_effect_source(adrecs, "ADReCS"),
        normalize_side_effect_source(sider, "SIDER"),
        normalize_side_effect_source(offsides, "OffSides"),
    ]
    return outer_merge(
        srcs, on=SIDE_EFFECT_KEY, specs=[CoalesceSpec("source", "array_union")]
    )
