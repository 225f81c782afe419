"""BPE tokenizer (operators/bpe.py): merge learning on the classic
low/lower corpus, lossless round-trip, greedy-rank application semantics,
partition-invariant determinism, and composition with sequence packing."""

from __future__ import annotations

from pyspark.sql import functions as F

from crossbar_data_process_spark.operators.bpe import (
    _EOW,
    _encode_word,
    bpe_encode,
    bpe_train,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_train_learns_frequent_pairs_first(spark):
    """Sennrich's canonical shape: with 'low' dominating the corpus, the
    first merges build 'low' before anything 'wider' / 'newest'."""
    corpus = " ".join(["low"] * 8 + ["lower"] * 4 + ["newest"] * 2 + ["wider"])
    d = _docs(spark, [(1, corpus)])
    merges = bpe_train(d, num_merges=4)
    assert merges[0] == ("l", "o")
    assert ("lo", "w") in merges[:2]
    # applying the merges tokenizes the dominant word to a single unit
    # (the end-of-word marker merges in by rank 2: 'low' -> ['low</w>'])
    ranks = {p: i for i, p in enumerate(merges)}
    assert _encode_word("low", ranks) == [f"low{_EOW}"]


def test_encode_round_trips_words(spark):
    d = _docs(spark, [(1, "interoperable tokenization works"), (2, "low lower")])
    merges = bpe_train(d, num_merges=30)
    rows = {r.doc_id: r for r in bpe_encode(d, merges).collect()}
    for did, text in ((1, "interoperable tokenization works"), (2, "low lower")):
        toks = rows[did].bpe_tokens
        assert rows[did].n_bpe == len(toks)
        rebuilt = "".join(toks).replace(_EOW, " ").strip()
        assert rebuilt == text.lower()


def test_encode_preserves_string_doc_ids(spark):
    """Non-numeric ids pass through with their source type — a hard cast
    to long silently NULLed string ids (r7 review finding)."""
    d = spark.createDataFrame(
        [("doc-a", "low lower"), ("doc-b", "newest low")],
        "doc_id string, text string",
    )
    merges = bpe_train(d, num_merges=10)
    out = bpe_encode(d, merges)
    assert out.schema["doc_id"].dataType.simpleString() == "string"
    got = {r.doc_id for r in out.collect()}
    assert got == {"doc-a", "doc-b"}


def test_encode_prefers_lowest_rank_merge(spark):
    """Application must replay merges in LEARNED order (rank), not greedily
    left-to-right: with ranks {(a,b):0 learned before (b,c):1}, 'abc'
    becomes [ab, c…], never [a, bc…]."""
    ranks = {("a", "b"): 0, ("b", "c"): 1}
    assert _encode_word("abc", ranks)[:2] == ["ab", "c"]
    ranks = {("b", "c"): 0, ("a", "b"): 1}
    assert _encode_word("abc", ranks)[0] == "a"
    assert _encode_word("abc", ranks)[1] == "bc"


def test_encode_partition_invariant(spark):
    rows = [(i, f"tok{i % 7} shared lower low words tok{i % 3}") for i in range(40)]
    d = _docs(spark, rows)
    merges = bpe_train(d, num_merges=25)
    a = sorted(
        (r.doc_id, tuple(r.bpe_tokens))
        for r in bpe_encode(d.repartition(1), merges).collect()
    )
    b = sorted(
        (r.doc_id, tuple(r.bpe_tokens))
        for r in bpe_encode(d.repartition(9), merges).collect()
    )
    assert a == b


def test_bpe_counts_drive_sequence_packing(spark):
    """n_bpe plugs straight into pack_documents as the budget unit — the
    tokenizer-true packing path (whitespace counts under-estimate budget
    for long words)."""
    from crossbar_data_process_spark.operators.packing import pack_documents

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    merges = bpe_train(docs, num_merges=50)
    enc = bpe_encode(docs, merges).join(docs.select("doc_id"), "doc_id")
    packed = pack_documents(
        enc, budget=256, n_buckets=4, n_tokens_col="n_bpe", text_col="doc_id"
    )
    assert packed.count() == docs.count()
    stats = packed.join(enc.select("doc_id", "n_bpe"), "doc_id")
    per_pack = stats.groupBy("pack_id").agg(F.sum("n_bpe").alias("tot"))
    # every pack holds >0 tokens; multi-doc packs exist (budget binds)
    assert per_pack.filter(F.col("tot") <= 0).count() == 0
    assert packed.groupBy("pack_id").count().filter("count > 1").count() > 0
