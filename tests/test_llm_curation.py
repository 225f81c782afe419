"""End-to-end curation pipeline (plans/llm_curation.py): junk and foreign
docs gated out, exact duplicates collapse to the min id, near-duplicates
collapse to one representative carrying the cluster size, and the funnel
report's numbers reconcile."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crossbar_data_process_spark.plans.llm_curation import (
    curate_documents,
    curation_report,
)

GOOD = (
    "the quick brown fox jumps over the lazy dog and then the dog chases "
    "the fox around the big green field for a while until both are tired "
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, GOOD * 2),                       # survivor
        (2, GOOD * 2),                       # exact dup of 1 -> dropped
        # near-dup of 1 (tiny tail edit -> Jaccard ~0.95, firmly inside the
        # LSH operating point; a longer tail sits at J~0.78 where the FIXED
        # permutation family can deterministically miss — that regime is the
        # recall suite's job, not this pipeline test's)
        (3, GOOD * 2 + "with one extra bit"),
        (4, "der hund und die katze und das haus und ein baum " * 4),  # non-en
        (5, "@@ ## !! ?? %% ^^ && ** (( ))"),  # junk -> quality gate
        (6, "a completely different english document about the engine "
            "design of the spark based analytics stack and its operators "
            "which keeps going for long enough to pass the length gate"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_curation_end_to_end(spark, corpus):
    curated = curate_documents(corpus)
    by_id = {r.doc_id: r for r in curated.collect()}
    assert set(by_id) == {1, 6}
    assert by_id[1].cluster_size == 2      # represents itself + near-dup 3
    assert by_id[6].cluster_size == 1
    assert by_id[1].lang_detected == "en"
    assert by_id[1].quality >= 0.4


def test_curation_report_reconciles(spark, corpus):
    curated = curate_documents(corpus)
    rep = curation_report(corpus, curated).collect()[0]
    assert rep.n_input == 6
    assert rep.n_after_gate == 4           # 1,2,3,6 pass quality+lang
    assert rep.n_survivors == 2
    # survivors represent every gated doc minus the exact dup (2), which
    # the near-dup cluster count does not re-count
    assert rep.n_represented == 3


def test_curation_is_single_lazy_plan_until_action(spark, corpus):
    # smoke: building the pipeline triggers no job until an action
    df = curate_documents(corpus)
    assert "doc_id" in df.columns and "cluster_size" in df.columns


def test_curation_with_decontamination_stage(spark):
    """Optional benchmark stage: contaminated docs are dropped after the
    quality gate; with no benchmark the pipeline is byte-identical to the
    oracled q55 form."""
    from crossbar_data_process_spark.plans.llm_curation import curate_documents

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    base = curate_documents(docs)
    # use one surviving doc's own text as the "benchmark": that doc (and
    # any near-identical text) must disappear; others survive unchanged
    leak_row = base.orderBy("doc_id").select("doc_id", "text").first()
    bench = spark.createDataFrame([(leak_row.text,)], "text string")
    decon = curate_documents(docs, benchmark=bench)
    survivors = {r.doc_id for r in decon.select("doc_id").collect()}
    assert leak_row.doc_id not in survivors
    assert decon.count() < base.count()


def test_curation_with_repetition_gate(spark, corpus):
    """max_dup_ngram_ratio (r07, default off): GOOD*2 docs are literally
    repeated text (dup-3gram ratio ~0.5), so a 0.3 cap drops docs 1/2/3 in
    the same scan-side gate as quality/language, while the distinct-prose
    doc 6 survives. Default-off behavior is pinned by the other tests."""
    capped = curate_documents(corpus, max_dup_ngram_ratio=0.3)
    assert {r.doc_id for r in capped.collect()} == {6}


def test_perplexity_gate_drops_out_of_distribution(spark):
    """max_log_ppl: documents whose tokens are corpus-atypical (high mean
    surprisal under the self-fit unigram LM) are dropped; default off
    leaves the funnel unchanged."""
    from crossbar_data_process_spark.operators.lm import doc_surprisal

    rows = [
        (i, "the quick brown fox jumps over the lazy dog again", "en")
        for i in range(30)
    ]
    rows.append((100, "zq wvx jkl pqm zzz yyy xxx www vvv uuu", "en"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")

    base = curate_documents(docs, min_quality=0.0, languages=("en", "und"))
    base_ids = {r.doc_id for r in base.collect()}
    assert 100 in base_ids  # no ppl gate -> OOD doc survives

    ppl = {r.doc_id: r.log_ppl for r in doc_surprisal(docs).collect()}
    cut = (ppl[0] + ppl[100]) / 2
    gated = curate_documents(
        docs, min_quality=0.0, languages=("en", "und"), max_log_ppl=cut
    )
    gated_ids = {r.doc_id for r in gated.collect()}
    assert 100 not in gated_ids
    assert base_ids - gated_ids == {100}


def test_perplexity_gate_keeps_token_less_docs(spark):
    """A token-less document has no perplexity to gate on: enabling
    max_log_ppl must not drop docs that doc_surprisal omits (the inner
    join did exactly that — r7 review finding). The whitespace-only doc
    passes every other gate and must survive with the ppl cap ON."""
    rows = [
        (i, "the quick brown fox jumps over the lazy dog again", "en")
        for i in range(10)
    ]
    rows.append((200, "   ", "en"))  # zero tokens
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")

    base = curate_documents(docs, min_quality=-1.0, languages=("en", "und"))
    base_ids = {r.doc_id for r in base.collect()}
    assert 200 in base_ids, "precondition: doc passes the non-ppl gates"

    gated = curate_documents(
        docs, min_quality=-1.0, languages=("en", "und"), max_log_ppl=1e9
    )
    assert {r.doc_id for r in gated.collect()} == base_ids


def test_quantile_expectation_gate(spark, corpus):
    """r12 (VERDICT r11 #4): the distribution gate wired into the
    curation plan. Rules that the input's token-length shape satisfies
    leave the pipeline's output UNCHANGED; a violated rule raises before
    the dedup stages, naming the rule and the estimate."""
    baseline = {r.doc_id for r in curate_documents(corpus).collect()}
    ok = curate_documents(
        corpus,
        quantile_expectations={
            # corpus docs are all well under 10k tokens
            "p95_len_cap": (0.95, lambda v: v <= 10_000),
            "median_len_floor": (0.5, lambda v: v >= 2),
        },
    )
    assert {r.doc_id for r in ok.collect()} == baseline
    with pytest.raises(ValueError, match="p95_len_cap"):
        curate_documents(
            corpus,
            quantile_expectations={"p95_len_cap": (0.95, lambda v: v <= 1)},
        ).collect()


def test_lsh_bucket_cap_passes_through(spark, corpus):
    """r12: the stop-shingle skew cap (minhash_lsh_pairs'
    max_bucket_size) is reachable from the curation plan — at corpus
    scale mega-buckets make candidate generation quadratic (measured:
    94% of candidates from 59 buckets at 50k docs; >79 GB spill at 500k
    uncapped). cap=1 drops every multi-member bucket, so near-dup
    resolution no-ops and the near-dup doc 3 SURVIVES (exact dedup,
    which runs first, is unaffected)."""
    capped = {r.doc_id: r for r in curate_documents(
        corpus, lsh_max_bucket_size=1
    ).collect()}
    assert 3 in capped, "cap=1 disables near-dup candidates entirely"
    assert capped[3].cluster_size == 1
    assert 2 not in capped, "exact dedup is unaffected by the LSH cap"
    # default (None) keeps the q55 pipeline byte-identical: doc 3 folds
    # into doc 1's cluster
    baseline = {r.doc_id: r for r in curate_documents(corpus).collect()}
    assert 3 not in baseline and baseline[1].cluster_size == 2


def test_curation_report_surfaces_lsh_cap_mass(spark, corpus):
    """With lsh_max_bucket_size the report grows the est_dropped_* columns
    (`no silent caps`, VERDICT r12 #3); without it the 4-column q55 schema
    is untouched."""
    curated = curate_documents(corpus)
    base = curation_report(corpus, curated)
    assert base.columns == [
        "n_input", "n_after_gate", "n_survivors", "n_represented",
    ]
    # cap of 0 drops EVERY bucket of the gated corpus (4 gated docs × 6
    # bands, minus band-key collisions) — nonzero counts, pinned shape
    rep = curation_report(
        corpus, curated, lsh_max_bucket_size=0
    ).collect()[0]
    assert rep.est_dropped_buckets > 0
    assert rep.est_dropped_memberships == 4 * 6  # every membership dropped
    assert rep.est_dropped_bucket_docs == 4      # all gated docs affected
    # a cap far above any bucket: columns present, all zero
    loose = curation_report(
        corpus, curated, lsh_max_bucket_size=1000
    ).collect()[0]
    assert loose.est_dropped_buckets == 0
    assert loose.est_dropped_bucket_docs == 0
