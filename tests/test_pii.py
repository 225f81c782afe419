"""PII detection/redaction (functions/pii.py): exact counts, conservative
non-matches, redaction idempotence, JVM-side plan, curation integration."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crossbar_data_process_spark.functions.pii import (
    pii_count,
    pii_counts,
    redact_pii,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "Contact alice.smith+spam@example.co.uk or call (555) 123-4567."),
        (2, "Server at 192.168.1.254 and 10.0.0.7; mail root@host.org."),
        (3, "Version 10.1.2.3000, price 1.234.567, build 1.2.3.4.5 — no PII."),
        (4, "Call 555-123-4567 or +1 555.987.6543 twice: 555-123-4567."),
        (5, "Year 20231231 and order 5551234567 are not phone numbers."),
        (6, None),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_counts_exact(spark, docs):
    out = {
        r.doc_id: r
        for r in docs.select(
            "doc_id", pii_counts("text").alias("p")
        ).select("doc_id", "p.*").collect()
    }
    assert (out[1].n_email, out[1].n_phone, out[1].n_ipv4) == (1, 1, 0)
    assert (out[2].n_email, out[2].n_phone, out[2].n_ipv4) == (1, 0, 2)
    assert out[2].n_total == 3
    # conservative: versions / prices / 5-part quads never match
    assert out[3].n_total == 0
    assert (out[4].n_phone, out[4].n_total) == (3, 3)
    # bare digit runs are not phones
    assert out[5].n_total == 0
    assert out[6].n_total is None  # NULL text propagates


def test_redaction_and_idempotence(spark, docs):
    once = docs.select(
        "doc_id", redact_pii("text").alias("text")
    )
    twice = once.select("doc_id", redact_pii("text").alias("text"))
    got = {r.doc_id: r.text for r in once.collect()}
    assert got[1] == "Contact <PII_EMAIL> or call <PII_PHONE>."
    assert got[2] == "Server at <PII_IPV4> and <PII_IPV4>; mail <PII_EMAIL>."
    assert got[3] == "Version 10.1.2.3000, price 1.234.567, build 1.2.3.4.5 — no PII."
    assert [r.text for r in once.orderBy("doc_id").collect()] == [
        r.text for r in twice.orderBy("doc_id").collect()
    ]
    # redacted text carries zero remaining PII
    resid = once.select(F.sum(pii_counts("text")["n_total"]).alias("s")).collect()
    assert resid[0].s == 0


def test_single_kind_and_plan_stays_jvm_side(spark, docs):
    n = docs.select(F.sum(pii_count("text", "email")).alias("s")).collect()
    assert n[0].s == 2
    plan = docs.select(
        redact_pii("text").alias("t"), pii_counts("text").alias("p")
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_curation_redacts_survivor_text(spark):
    from crossbar_data_process_spark.plans.llm_curation import curate_documents

    rows = [
        (
            1,
            "the quick brown fox jumps over the lazy dog and then walks "
            "home to rest. Write to alice@example.com for details.",
        ),
        (
            2,
            "a completely different second document about the weather in "
            "the mountains with no contact information at all today.",
        ),
    ]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    out = {
        r.doc_id: r.text
        for r in curate_documents(docs, redact_pii_output=True).collect()
    }
    assert "<PII_EMAIL>" in out[1] and "alice@example.com" not in out[1]
    assert out[2] == rows[1][1]
