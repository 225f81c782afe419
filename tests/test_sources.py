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


def test_load_events_handles_both_timestamp_eras(spark, tmp_path):
    """events.ts has shipped as TIMESTAMP(MICROS) and TIMESTAMP(NANOS)
    across testdata generations (the r5 regression): load_events must
    return an identical session-TZ TIMESTAMP column for both footer
    types."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.types import TimestampType

    from crossbar_data_process_spark.sources.readers import load_events

    base = {
        "event_id": pa.array([1, 2], pa.int64()),
        "user_id": pa.array([7, 8], pa.int64()),
        "event_type": pa.array(["a", "b"]),
        "value": pa.array([1.0, 2.0]),
        "props": pa.array(["{}", "{}"]),
    }
    epoch_us = [1_700_000_000_000_000, 1_700_000_001_500_000]
    micros = tmp_path / "ev_us.parquet"
    nanos = tmp_path / "ev_ns.parquet"
    pq.write_table(
        pa.table({**base, "ts": pa.array(epoch_us, pa.timestamp("us"))}),
        str(micros),
    )
    pq.write_table(
        pa.table(
            {**base, "ts": pa.array([v * 1000 for v in epoch_us], pa.timestamp("ns"))}
        ),
        str(nanos),
        version="2.6",  # keeps INT64 TIMESTAMP(NANOS) instead of coercing
    )
    out = {}
    for name, path in (("us", micros), ("ns", nanos)):
        df = load_events(spark, str(path))
        assert isinstance(df.schema["ts"].dataType, TimestampType), name
        out[name] = sorted(
            (r.event_id, r.ts.isoformat()) for r in df.select("event_id", "ts").collect()
        )
    assert out["us"] == out["ns"]


def test_with_retries_and_manifest_gated_landing(spark, tmp_path):
    """S8 (SURVEY §2.1): bounded retry around the fetch; completed
    landings are manifest-gated so re-runs skip the fetch entirely
    (the reference's download cache as a data-layer property)."""
    import pytest as _pytest

    from crossbar_data_process_spark.sources.landing import (
        land_bronze,
        with_retries,
    )

    # retry: fails twice, succeeds third; deterministic backoff observed
    calls, sleeps = [], []
    def flaky():
        calls.append(1)
        if len(calls) < 3:
            raise OSError("transient")
        return "ok"
    assert with_retries(flaky, attempts=3, backoff_s=0.5, sleep=sleeps.append) == "ok"
    assert len(calls) == 3 and sleeps == [0.5, 1.0]
    def always_fails():
        raise OSError("x")
    with _pytest.raises(OSError):
        with_retries(always_fails, attempts=2, sleep=lambda _: None)

    # landing: first call fetches (with one transient failure), second
    # call must NOT invoke fetch at all; refresh=True forces it again
    path = str(tmp_path / "bronze_t")
    fetches = []
    def fetch():
        fetches.append(1)
        if len(fetches) == 1:
            raise OSError("transient fetch")
        return spark.range(5).toDF("id")
    out = land_bronze(spark, fetch, path, attempts=3, sleep=lambda _: None)
    assert out.count() == 5 and len(fetches) == 2
    again = land_bronze(spark, fetch, path, sleep=lambda _: None)
    assert again.count() == 5 and len(fetches) == 2  # cache hit: no fetch
    land_bronze(spark, fetch, path, refresh=True, sleep=lambda _: None)
    assert len(fetches) == 3  # cache_off equivalent
