"""Phenotype (HPO) adapter (reference node_data/phenotype.py): the
HPO–disease association pipeline — evidence blacklist, OMIM→MONDO fallback
mapping, PMID list normalization, per-pair pubmed union.

Reference semantics (phenotype.py:150-178):
- drop rows with blacklisted evidence (P9);
- keep rows whose OMIM id resolves via the MONDO mapping (J4 inner join
  replaces the ``mondo_mappings.get`` guard);
- pmids: strip ``PMID:`` prefixes, ';'-list → native array (F1/F5);
- group by (hpo_id, disease_id): pubmed X4 union, evidence keep-first
  (engine pins alphabetical keep-best for determinism).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crossbar_data_process_spark.operators.dedup import keep_best
from crossbar_data_process_spark.operators.filters import blacklist_filter
from crossbar_data_process_spark.operators.mapping import broadcast_map


def hpo_disease_process(
    hpo_disease: DataFrame,
    omim_to_mondo: DataFrame,
    evidence_blacklist: list[str] = ["IEA"],
) -> DataFrame:
    """``hpo_disease``: (hpo_id, omim string 'OMIM:123456', pmid
    ';'-list with 'PMID:' prefixes, evidence)."""
    df = blacklist_filter(hpo_disease, "evidence", evidence_blacklist)
    df = df.filter(F.split("omim", ":")[0] == "OMIM").withColumn(
        "omim_num", F.split("omim", ":")[1]
    )
    df = broadcast_map(
        df, omim_to_mondo, [("omim_num", "omim")], "mondo", "disease_id",
        how="inner",
    )
    df = df.withColumn(
        "pubmed_ids",
        F.when(
            F.col("pmid").isNotNull(),
            F.transform(
                F.filter(F.split("pmid", ";"), lambda x: x != ""),
                lambda x: F.regexp_replace(x, "^PMID:", ""),
            ),
        ),
    )
    pubs = df.groupBy("hpo_id", "disease_id").agg(
        F.array_sort(
            F.array_distinct(
                F.flatten(F.collect_list(F.coalesce("pubmed_ids", F.array())))
            )
        ).alias("__pubs")
    )
    best = keep_best(
        df.select("hpo_id", "disease_id", "evidence"),
        ["hpo_id", "disease_id"],
        [F.asc("evidence")],
    )
    return (
        best.join(pubs, ["hpo_id", "disease_id"])
        .withColumn(
            "pubmed_ids", F.when(F.size("__pubs") > 0, F.col("__pubs"))
        )
        .drop("__pubs")
    )
