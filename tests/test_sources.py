"""Reader tests (SURVEY §2.1 S3-S5): KEGG microformat link tables and
flat-file records parsed distributed, with explicit schemas."""

from __future__ import annotations

from crossbar_data_process_spark.sources.readers import (
    parse_flat_records,
    parse_kegg_links,
    read_table,
)

KEGG_LINKS = """hsa:10458\tpath:hsa04520
hsa:10458\tpath:hsa04530
hsa:2534\tpath:hsa04144
"""

KEGG_FLAT = """ENTRY       H00001                      Disease
NAME        Acute lymphoblastic leukemia (ALL)
DBLINKS     ICD-10: C91.0
///
ENTRY       H00002                      Disease
NAME        Chronic myeloid leukemia (CML)
///
"""


def test_parse_kegg_links(spark, tmp_path):
    p = tmp_path / "links.tsv"
    p.write_text(KEGG_LINKS)
    df = parse_kegg_links(spark, str(p))
    rows = {(r.source_id, r.target_id) for r in df.collect()}
    assert rows == {
        ("hsa:10458", "path:hsa04520"),
        ("hsa:10458", "path:hsa04530"),
        ("hsa:2534", "path:hsa04144"),
    }


def test_parse_flat_records(spark, tmp_path):
    p = tmp_path / "diseases.txt"
    p.write_text(KEGG_FLAT)
    df = parse_flat_records(spark, str(p))
    rows = {r.entry_id: r.name for r in df.collect()}
    assert rows == {
        "H00001": "Acute lymphoblastic leukemia (ALL)",
        "H00002": "Chronic myeloid leukemia (CML)",
    }


def test_read_table_csv_with_schema(spark, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("id,score\n1,0.5\n2,0.7\n")
    df = read_table(spark, str(p), fmt="csv", inferSchema=True)
    assert df.count() == 2
    assert set(df.columns) == {"id", "score"}
