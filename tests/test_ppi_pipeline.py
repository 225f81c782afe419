"""Golden test for the PPI three-source merge pipeline (plans/ppi.py),
on FIXTURES.md F1/F2/F3/F7-shaped literal fixtures. Expected rows are
hand-computed from the reference semantics (edge_data/ppi.py) with the
documented canonical-orientation divergence."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from crossbar_data_process_spark.plans.ppi import (
    biogrid_process,
    intact_process,
    merge_all,
    string_process,
)


@pytest.fixture(scope="module")
def fixtures(spark):
    swissprot = spark.createDataFrame(
        [Row(uniprot=u) for u in ["P1", "P2", "P3", "P4", "P5"]]
    )
    intact = spark.createDataFrame(
        [
            # reciprocal duplicate with different scores -> keep best (0.9),
            # pubmed union over the pair
            Row(uniprot_a="P1", uniprot_b="P2", pubmed_id="11;12",
                intact_score=0.9, method="y2h", interaction_type="direct"),
            Row(uniprot_a="P2", uniprot_b="P1", pubmed_id="12;13;unassigned",
                intact_score=0.5, method="coip", interaction_type="direct"),
            # same pair, different interaction_type -> survives dedup
            Row(uniprot_a="P1", uniprot_b="P2", pubmed_id="14",
                intact_score=0.7, method="y2h", interaction_type="physical"),
            # endpoint not in swissprot -> dropped
            Row(uniprot_a="P1", uniprot_b="X9", pubmed_id="15",
                intact_score=0.8, method="y2h", interaction_type="direct"),
            Row(uniprot_a="P3", uniprot_b="P4", pubmed_id=None,
                intact_score=0.4, method=None, interaction_type="direct"),
        ]
    )
    biogrid = spark.createDataFrame(
        [
            # maps to (P1,P3)
            Row(partner_a="aaa", partner_b="ccc", tax_a="9606", tax_b="9606",
                pmid="21", experimental_system="Two-hybrid"),
            # ambiguous symbol ddd (2 uniprots) -> dropped
            Row(partner_a="aaa", partner_b="ddd", tax_a="9606", tax_b="9606",
                pmid="22", experimental_system="Two-hybrid"),
            # reciprocal of the first with another pmid -> unioned
            Row(partner_a="CCC", partner_b="AAA", tax_a="9606", tax_b="9606",
                pmid="23", experimental_system="Affinity"),
        ]
    )
    symbol_map = spark.createDataFrame(
        [
            Row(symbol="AAA", tax="9606", uniprot="P1"),
            Row(symbol="CCC", tax="9606", uniprot="P3"),
            Row(symbol="DDD", tax="9606", uniprot="P4"),
            Row(symbol="DDD", tax="9606", uniprot="P5"),  # ambiguous
        ]
    )
    string = spark.createDataFrame(
        [
            # maps to (P2,P1): orientation opposite to IntAct's (P1,P2) —
            # canonicalization must merge them
            Row(protein_a="9606.E2", protein_b="9606.E1",
                combined_score=900, physical_combined_score=700),
            Row(protein_a="9606.E1", protein_b="9606.E2",
                combined_score=800, physical_combined_score=600),
            Row(protein_a="9606.E5", protein_b="9606.E6",
                combined_score=400, physical_combined_score=None),
        ]
    )
    string_map = spark.createDataFrame(
        [
            Row(string_id="9606.E1", uniprot="P1"),
            Row(string_id="9606.E2", uniprot="P2"),
            Row(string_id="9606.E5", uniprot="P4"),
            Row(string_id="9606.E6", uniprot="P5"),
        ]
    )
    return dict(
        swissprot=swissprot, intact=intact, biogrid=biogrid,
        symbol_map=symbol_map, string=string, string_map=string_map,
    )


def test_intact_process(spark, fixtures):
    out = intact_process(fixtures["intact"], fixtures["swissprot"])
    rows = {
        (r.uniprot_a, r.uniprot_b, r.interaction_type): r
        for r in out.collect()
    }
    # directed group (P1,P2) = {direct 0.9 pm[11,12], physical 0.7 pm[14]}
    # -> keep-best collapses to the direct/0.9 row with pubmed union;
    # directed group (P2,P1) = {direct 0.5, pubmed cell nullified by
    # 'unassigned'}; undirected dedup on pair+type then keeps the 0.9 row
    # (reference ppi.py:135-142 semantics)
    assert set(rows) == {("P1", "P2", "direct"), ("P3", "P4", "direct")}
    direct = rows[("P1", "P2", "direct")]
    assert direct.intact_score == 0.9
    assert direct.method == "y2h"
    assert direct.pubmed_ids == ["11", "12", "14"]
    assert rows[("P3", "P4", "direct")].pubmed_ids is None


def test_biogrid_process(spark, fixtures):
    out = biogrid_process(
        fixtures["biogrid"], fixtures["symbol_map"], fixtures["swissprot"]
    )
    rows = out.collect()
    # ambiguous DDD row dropped; (P1,P3) and (P3,P1) are separate *directed*
    # groups (pubmeds not unioned across orientations, ppi.py:248-252);
    # undirected dedup keys on pair+method so both survive canonicalized
    assert {(r.uniprot_a, r.uniprot_b, r.method) for r in rows} == {
        ("P1", "P3", "Affinity"),
        ("P1", "P3", "Two-hybrid"),
    }
    by_method = {r.method: r for r in rows}
    assert by_method["Two-hybrid"].pubmed_ids == ["21"]
    assert by_method["Affinity"].pubmed_ids == ["23"]


def test_string_process(spark, fixtures):
    out = string_process(
        fixtures["string"], fixtures["string_map"], fixtures["swissprot"]
    )
    rows = {(r.uniprot_a, r.uniprot_b): r for r in out.collect()}
    assert set(rows) == {("P1", "P2"), ("P4", "P5")}
    assert rows[("P1", "P2")].string_combined_score == 900


def test_merge_all(spark, fixtures):
    ia = intact_process(fixtures["intact"], fixtures["swissprot"])
    bg = biogrid_process(
        fixtures["biogrid"], fixtures["symbol_map"], fixtures["swissprot"]
    )
    st = string_process(
        fixtures["string"], fixtures["string_map"], fixtures["swissprot"]
    )
    # reduce bg to one row per undirected pair pre-merge (the reference
    # reindexes to the merge key before merge_mall, ppi.py:393-402)
    from crossbar_data_process_spark.operators.dedup import keep_best
    from pyspark.sql import functions as F

    bg1 = keep_best(bg, ["uniprot_a", "uniprot_b"], [F.asc("method")])
    merged = merge_all(ia, bg1, st)
    rows = {(r.uniprot_a, r.uniprot_b): r for r in merged.collect()}
    assert set(rows) == {("P1", "P2"), ("P3", "P4"), ("P1", "P3"), ("P4", "P5")}
    p12 = rows[("P1", "P2")]
    assert p12.sources == ["IntAct", "STRING"]
    assert p12.string_combined_score == 900
    assert p12.intact_score == 0.9
    assert p12.pubmed_ids == ["11", "12", "14"]
    p13 = rows[("P1", "P3")]
    assert p13.sources == ["BioGRID"]
    assert p13.intact_score is None
    assert p13.pubmed_ids == ["23"]  # Affinity sorts first
    p45 = rows[("P4", "P5")]
    assert p45.sources == ["STRING"]
    assert p45.pubmed_ids is None
