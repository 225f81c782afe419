"""Session-factory heuristics (crossbar_data_process_spark/session.py):
the input-sized AQE scale margin (VERDICT r14 #6) — pure-function pins,
no Spark session needed."""

from __future__ import annotations

from crossbar_data_process_spark.session import (
    _initial_partitions,
    _input_parquet_bytes,
)


def test_initial_partitions_small_input_keeps_small_plan_shape():
    # sf0.1 is ~17 MB: the margin must floor at shuffle_partitions (the
    # r13 plan shape whose removal cost a measured ~4-5% at sf0.1)
    assert _initial_partitions(32, 16, 17 * 1024 * 1024) == 16


def test_initial_partitions_scales_with_input_and_caps():
    # 1.78 GB (the 5M-doc corpus) wants ceil(bytes/2MiB) ≈ 853 — capped
    # at the protective 4×cpus margin that fixed the r14 scale-1000 OOM
    assert _initial_partitions(32, 16, 1_780_000_000) == 128
    # mid-scale lands between floor and cap
    mid = _initial_partitions(32, 16, 178_000_000)  # 500k docs, 178 MB
    assert 16 < mid < 128 and mid == -(-178_000_000 // (2 * 1024 * 1024))


def test_initial_partitions_unknown_input_keeps_protective_margin():
    assert _initial_partitions(32, 16, None) == 128
    # cap also honors oversized explicit shuffle_partitions
    assert _initial_partitions(4, 64, None) == 256


def test_input_parquet_bytes_reads_sf_dir(tmp_path, monkeypatch):
    d = tmp_path / "sf"
    d.mkdir()
    (d / "a.parquet").write_bytes(b"x" * 1000)
    (d / "b.parquet").write_bytes(b"y" * 500)
    (d / "ignored.json").write_bytes(b"z" * 10_000)
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", str(d))
    assert _input_parquet_bytes() == 1500
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", str(tmp_path / "missing"))
    assert _input_parquet_bytes() is None


def test_input_bytes_follow_the_passed_dir():
    """r16, VERDICT r15 #4: the AQE-margin signal must follow the
    session's REAL input dir when the entry point knows it — sf0.001's
    bytes size a sf0.001 session to the shuffle-partition floor, not to
    sf0.1's ~91-part grain (the env-default walk)."""
    small = _input_parquet_bytes("/root/testdata/sf0.001")
    big = _input_parquet_bytes("/root/testdata/sf0.1")
    assert small is not None and big is not None and small < big
    # at test geometry (8 shuffle partitions) the small dir floors out
    assert _initial_partitions(32, 8, small) == 8
    # absent dir -> None -> protective margin
    assert _input_parquet_bytes("/no/such/dir") is None
