"""BM25 retrieval (operators/retrieval.py): hand-checked scores against a
transparent Python reference, self-retrieval sanity on the real corpus,
and partition-invariant determinism."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from crossbar_data_process_spark.operators.retrieval import bm25_topk


def _bm25_ref(corpus, query, k1=1.2, b=0.75):
    """Plain-Python BM25 mirroring the operator's formula and rounding."""
    toks = {d: t.lower().split() for d, t in corpus.items()}
    tf = {d: {} for d in corpus}
    for d, ts in toks.items():
        for t in ts:
            tf[d][t] = tf[d].get(t, 0) + 1
    n = len([d for d in corpus if toks[d]])
    avgdl = sum(len(ts) for ts in toks.values()) / n
    df = {}
    for d in corpus:
        for t in set(toks[d]):
            df[t] = df.get(t, 0) + 1
    out = {}
    for d in corpus:
        s = 0.0
        for t in dict.fromkeys(query.lower().split()):
            if t not in tf[d]:
                continue
            idf = round(math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5)), 6)
            f = tf[d][t]
            s += round(
                (idf * (f * (k1 + 1.0)))
                / (f + k1 * ((1.0 - b) + (b * len(toks[d])) / avgdl)),
                6,
            )
        if s:
            out[d] = round(s, 6)
    return out


def test_bm25_matches_python_reference(spark):
    corpus = {
        1: "the cat sat on the mat",
        2: "the dog chased the cat",
        3: "dogs and cats living together",
        4: "a completely unrelated sentence about spark plans",
    }
    docs = spark.createDataFrame(list(corpus.items()), "doc_id long, text string")
    q = spark.createDataFrame([(100, "the cat")], "query_id long, query_text string")
    got = {
        r.doc_id: r.score for r in bm25_topk(docs, q, top_k=10).collect()
    }
    want = _bm25_ref(corpus, "the cat")
    assert got.keys() == want.keys()
    for d in want:
        assert abs(got[d] - want[d]) < 1e-9, (d, got[d], want[d])


def test_bm25_rare_terms_outrank_common(spark):
    """A term appearing in one doc must pull that doc above docs matched
    only through a corpus-wide term."""
    docs = spark.createDataFrame(
        [
            (1, "shared words everywhere zebra"),
            (2, "shared words everywhere common"),
            (3, "shared words everywhere common"),
        ],
        "doc_id long, text string",
    )
    q = spark.createDataFrame([(1, "shared zebra")], "query_id long, query_text string")
    [top] = bm25_topk(docs, q, top_k=1).collect()
    assert top.doc_id == 1


def test_bm25_ranking_invariants_on_corpus(spark):
    """The declared q61 shape on the real corpus (a 31-word shared
    vocabulary, so no term is discriminative enough for guaranteed
    self-retrieval): ranks are dense and 1-based, scores non-increasing
    within each query, every score positive, and every retrieved doc
    shares at least one term with its query."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    from crossbar_data_process_spark.functions.text import tokens

    q = docs.filter(F.col("doc_id") % 20 == 0).select(
        F.col("doc_id").alias("query_id"),
        F.array_join(F.slice(tokens(F.lower(F.col("text"))), 1, 6), " ").alias(
            "query_text"
        ),
    )
    rows = bm25_topk(docs, q, top_k=5).collect()
    texts = {r.doc_id: set(r.text.lower().split()) for r in docs.collect()}
    qterms = {r.query_id: set(r.query_text.split()) for r in q.collect()}
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r)
        assert r.score > 0
        assert texts[r.doc_id] & qterms[r.query_id]
    for qid, rs in per_q.items():
        rs.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in rs] == list(range(1, len(rs) + 1))
        assert all(a.score >= b.score for a, b in zip(rs, rs[1:]))


def test_bm25_partition_invariant(spark):
    rows = [(i, f"tok{i % 11} tok{i % 5} shared text body {i % 3}") for i in range(80)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    q = spark.createDataFrame([(0, "tok3 shared")], "query_id long, query_text string")
    a = sorted(
        (r.doc_id, r.score, r.rnk)
        for r in bm25_topk(docs.repartition(1), q, top_k=20).collect()
    )
    b = sorted(
        (r.doc_id, r.score, r.rnk)
        for r in bm25_topk(docs.repartition(13), q, top_k=20).collect()
    )
    assert a == b


def test_bm25_stop_term_cut_bounds_candidates(spark):
    """max_df_ratio: a query matching only through a corpus-wide stop term
    returns nothing; rare-term matches and their scores are unaffected
    except for the dropped stop-term contribution."""
    docs = spark.createDataFrame(
        [
            (1, "common zebra alpha"),
            (2, "common beta gamma"),
            (3, "common delta epsilon"),
            (4, "common zeta eta"),
        ],
        "doc_id long, text string",
    )
    q = spark.createDataFrame(
        [(1, "common zebra"), (2, "common")], "query_id long, query_text string"
    )
    capped = bm25_topk(docs, q, top_k=10, max_df_ratio=0.5)
    rows = capped.collect()
    assert {r.query_id for r in rows} == {1}  # stop-term-only query: empty
    [r] = rows
    assert r.doc_id == 1  # zebra still retrieves its doc
    # the zebra score equals the exact run's zebra CONTRIBUTION (the
    # common-term contribution is what got dropped)
    exact = {
        (x.query_id, x.doc_id): x.score for x in bm25_topk(docs, q, top_k=10).collect()
    }
    assert r.score < exact[(1, 1)]


def test_bm25_serves_streaming_queries(spark, tmp_path):
    """Search serving: the corpus statistics are STATIC silver tables; a
    stream of queries joins against them (stream-static joins are
    stateless), so bm25_topk's scoring path runs unchanged on a query
    stream — streamed scores match the batch run bit-for-bit."""
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the dog chased the cat"),
        (3, "dogs and cats living together"),
        (4, "an unrelated sentence about spark plans"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    qrows = [(100, "the cat"), (200, "spark plans"), (300, "dogs")]
    qbatch = spark.createDataFrame(qrows, "query_id long, query_text string")

    want = {
        (r.query_id, r.doc_id): r.score
        for r in bm25_topk(docs, qbatch, top_k=3).collect()
    }

    qdir = str(tmp_path / "queries")
    qbatch.repartition(3).write.mode("overwrite").parquet(qdir)
    qstream = (
        spark.readStream.schema(qbatch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(qdir)
    )
    # per-query top-k is independent across queries, so micro-batch
    # scoring via foreachBatch IS the full semantics (each query arrives
    # exactly once; the corpus side is static)
    got = {}

    def sink(bdf, bid):
        for r in bm25_topk(docs, bdf, top_k=3).collect():
            got[(r.query_id, r.doc_id)] = r.score

    qy = (
        qstream.writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    qy.awaitTermination(120)
    assert got == want


def test_statistical_operators_survive_empty_inputs(spark):
    """Pipeline edges: an empty corpus or empty query set must yield empty
    results, never a crash (division-by-null and seed-collection paths)."""
    from crossbar_data_process_spark.operators.classifier import nb_classify
    from crossbar_data_process_spark.operators.lm import doc_surprisal

    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    empty_q = spark.createDataFrame([], "query_id long, query_text string")
    q = spark.createDataFrame([(1, "a")], "query_id long, query_text string")

    assert bm25_topk(empty_docs, q).count() == 0
    assert bm25_topk(docs, empty_q).count() == 0
    assert doc_surprisal(empty_docs).count() == 0
    assert nb_classify(empty_docs, F.lit(True)).count() == 0


def _rank_df(spark, rows):
    return spark.createDataFrame(
        rows, "query_id long, doc_id long, rnk long"
    )


def test_rrf_hand_computed_fusion(spark):
    """Two systems, k=60: contributions are floor(1e6/(60+r)+0.5) micros,
    summed exactly — checked against hand arithmetic."""
    from crossbar_data_process_spark.operators.retrieval import rrf_fuse

    lex = _rank_df(spark, [(1, 10, 1), (1, 11, 2), (1, 12, 3)])
    dense = _rank_df(spark, [(1, 11, 1), (1, 13, 2), (1, 10, 3)])
    got = {
        r.doc_id: (r.rrf_score, r.n_systems, r.rnk)
        for r in rrf_fuse([lex, dense], k=60, top_k=10).collect()
    }

    def c(r):
        return int(1_000_000 / (60 + r) + 0.5)

    assert got[11] == ((c(2) + c(1)) / 1e6, 2, 1)  # best: 1st + 2nd
    assert got[10] == ((c(1) + c(3)) / 1e6, 2, 2)
    # single-system docs still rank, ordered by their one contribution:
    # 13 carries c(2)=16129 micros > 12's c(3)=15873
    assert got[13] == (c(2) / 1e6, 1, 3)
    assert got[12] == (c(3) / 1e6, 1, 4)


def test_rrf_tie_breaks_on_doc_id(spark):
    from crossbar_data_process_spark.operators.retrieval import rrf_fuse

    a = _rank_df(spark, [(1, 20, 1), (1, 30, 2)])
    b = _rank_df(spark, [(1, 30, 1), (1, 20, 2)])
    out = rrf_fuse([a, b], top_k=10).collect()
    # symmetric ranks => identical scores; smaller doc id wins rank 1
    assert [r.doc_id for r in sorted(out, key=lambda r: r.rnk)] == [20, 30]
    assert len({r.rrf_score for r in out}) == 1


def test_rrf_partition_invariant_and_exact(spark):
    """Integer-micros accumulation: byte-identical scores however the
    inputs are partitioned (a double 1/(k+r) sum would not be)."""
    import random

    from crossbar_data_process_spark.operators.retrieval import rrf_fuse

    rng = random.Random(7)
    rows = [
        (q, d, r)
        for q in range(20)
        for r, d in enumerate(rng.sample(range(100), 10), start=1)
    ]
    sys1, sys2 = _rank_df(spark, rows), _rank_df(
        spark, [(q, (d * 7) % 100, r) for q, d, r in rows]
    )
    one = rrf_fuse([sys1.coalesce(1), sys2.coalesce(1)]).collect()
    many = rrf_fuse([sys1.repartition(17), sys2.repartition(3)]).collect()
    key = lambda r: (r.query_id, r.rnk)
    assert sorted(
        [(r.query_id, r.rnk, r.doc_id, r.rrf_score) for r in one]
    ) == sorted([(r.query_id, r.rnk, r.doc_id, r.rrf_score) for r in many])


def test_rrf_fuses_bm25_with_dense_ranking(spark):
    """End-to-end hybrid: BM25 lexical ranking fused with a synthetic
    dense ranking over the same query set — the RAG-stack composition the
    operator exists for. Fused top-1 must come from the union of per-
    system top-1s' docs and every fused row must appear in at least one
    input ranking."""
    from crossbar_data_process_spark.operators.retrieval import rrf_fuse

    docs = spark.createDataFrame(
        [
            (1, "spark shuffles partition data across executors"),
            (2, "the cat sat on the mat"),
            (3, "partition pruning skips parquet files"),
            (4, "dogs chase cats in the yard"),
            (5, "adaptive query execution replans shuffles"),
        ],
        "doc_id long, text string",
    )
    queries = spark.createDataFrame(
        [(100, "shuffle partition"), (200, "cat")],
        "query_id long, query_text string",
    )
    lex = bm25_topk(docs, queries, top_k=3)
    dense = _rank_df(
        spark, [(100, 5, 1), (100, 1, 2), (200, 4, 1), (200, 2, 2)]
    )
    fused = rrf_fuse([lex.select("query_id", "doc_id", "rnk"), dense], top_k=3)
    rows = fused.collect()
    allowed = {(r.query_id, r.doc_id) for r in lex.collect()} | {
        (r.query_id, r.doc_id) for r in dense.collect()
    }
    assert {(r.query_id, r.doc_id) for r in rows} <= allowed
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    # docs ranked by BOTH systems outrank single-system docs at equal ranks
    top100 = min(by_q[100], key=lambda r: r.rnk)
    assert top100.n_systems == 2


def _cand_df(spark, rows):
    return spark.createDataFrame(
        rows, "query_id long, doc_id long, score double, embedding array<float>"
    )


def test_mmr_demotes_redundant_candidates(spark):
    """Two near-identical high-relevance docs: pure relevance ranks them
    1-2, MMR at lam=0.5 interleaves the diverse doc ahead of the clone."""
    from crossbar_data_process_spark.operators.retrieval import mmr_rerank

    rows = [
        (1, 10, 1.00, [1.0, 0.0, 0.0]),
        (1, 11, 0.98, [0.999, 0.01, 0.0]),   # near-clone of 10
        (1, 12, 0.70, [0.0, 1.0, 0.0]),      # orthogonal, lower relevance
    ]
    out = sorted(
        mmr_rerank(_cand_df(spark, rows), k=3, lam=0.5).collect(),
        key=lambda r: r.rnk,
    )
    assert [r.doc_id for r in out] == [10, 12, 11]
    # and lam=1 is pure relevance order
    pure = sorted(
        mmr_rerank(_cand_df(spark, rows), k=3, lam=1.0).collect(),
        key=lambda r: r.rnk,
    )
    assert [r.doc_id for r in pure] == [10, 11, 12]


def test_mmr_tie_breaks_on_doc_id_and_bounds_k(spark):
    from crossbar_data_process_spark.operators.retrieval import mmr_rerank

    rows = [
        (1, 30, 0.9, [1.0, 0.0]),
        (1, 20, 0.9, [0.0, 1.0]),  # identical relevance, orthogonal
        (1, 40, 0.1, [1.0, 1.0]),
    ]
    out = sorted(
        mmr_rerank(_cand_df(spark, rows), k=2, lam=1.0).collect(),
        key=lambda r: r.rnk,
    )
    assert len(out) == 2
    assert out[0].doc_id == 20  # tie -> lowest doc id first


def test_mmr_partition_invariant(spark):
    import random

    from crossbar_data_process_spark.operators.retrieval import mmr_rerank

    rng = random.Random(11)
    rows = [
        (q, d, round(rng.random(), 6),
         [round(rng.random(), 6) for _ in range(8)])
        for q in range(6)
        for d in rng.sample(range(1000), 40)
    ]
    a = mmr_rerank(_cand_df(spark, rows).repartition(1), k=5).collect()
    b = mmr_rerank(_cand_df(spark, rows).repartition(13), k=5).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_mmr_composes_with_rrf(spark):
    """retrieve -> fuse -> diversify: rrf output joined back to vectors
    feeds mmr_rerank — the full RAG re-ranking chain."""
    from crossbar_data_process_spark.operators.retrieval import (
        mmr_rerank,
        rrf_fuse,
    )

    lex = _rank_df(spark, [(1, 10, 1), (1, 11, 2), (1, 12, 3)])
    dense = _rank_df(spark, [(1, 11, 1), (1, 10, 2), (1, 12, 3)])
    fused = rrf_fuse([lex, dense], top_k=3)
    vecs = spark.createDataFrame(
        [
            (10, [1.0, 0.0]),
            (11, [0.999, 0.01]),
            (12, [0.0, 1.0]),
        ],
        "doc_id long, embedding array<float>",
    )
    cands = fused.join(vecs, "doc_id").select(
        "query_id", "doc_id", F.col("rrf_score").alias("score"), "embedding"
    )
    out = sorted(
        mmr_rerank(cands, k=3, lam=0.5).collect(), key=lambda r: r.rnk
    )
    # 10/11 fuse nearly equal but are clones; 12 must come second
    assert out[1].doc_id == 12


def test_mmr_anti_similar_candidates_are_boosted_not_clamped(spark):
    """The MMR penalty term is the TRUE max cosine — a candidate
    anti-similar to everything picked gets a negative penalty (a boost),
    not a zero-clamped one (r10 review)."""
    from crossbar_data_process_spark.operators.retrieval import mmr_rerank

    rows = [
        (1, 10, 1.00, [1.0, 0.0]),
        (1, 11, 0.50, [-1.0, 0.0]),   # anti-parallel to 10: boost
        (1, 12, 0.60, [0.0, 1.0]),    # orthogonal, higher relevance
    ]
    out = sorted(
        mmr_rerank(_cand_df(spark, rows), k=3, lam=0.5).collect(),
        key=lambda r: r.rnk,
    )
    # true MMR: 11 scores 0.25 + 0.5 = 0.75 > 12's 0.30 - 0 = 0.30
    assert [r.doc_id for r in out] == [10, 11, 12]
    assert abs(out[1].mmr_score - 0.75) < 1e-9


def test_rrf_fuses_pq_dense_leg(spark, tmp_path):
    """The 100 TB dense leg: ivf_pq_topk_assigned's output (query_id,
    neighbor_id, adc, rnk) plugs straight into rrf_fuse next to a lexical
    ranking — ranks are what fuse, so the ADC distance scale never leaks
    into the fusion (the reason RRF was chosen). Pins the column-rename
    seam and that the PQ leg's rnk is the 1-based dense rank rrf_fuse
    expects."""
    import numpy as np

    from crossbar_data_process_spark.operators.ivf import ivf_fit
    from crossbar_data_process_spark.operators.pq import (
        ivf_pq_topk_assigned,
        pq_fit,
        write_pq_corpus,
    )
    from crossbar_data_process_spark.operators.retrieval import rrf_fuse

    rng = np.random.default_rng(31)
    centers = rng.normal(size=(4, 16)) * 4.0
    rows = [
        (int(c * 50 + i), [float(x) for x in centers[c] + rng.normal(size=16) * 0.5])
        for c in range(4)
        for i in range(50)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = ivf_fit(emb, dim=16, nlist=4, iters=2)
    books = pq_fit(emb, dim=16, m=4, k=8, iters=4)
    silver = str(tmp_path / "pq")
    write_pq_corpus(emb, cents, books, silver)

    q = emb.filter(F.col("vec_id") % 50 == 0)
    dense = ivf_pq_topk_assigned(
        spark, silver, q, cents, books, k=5, nprobe=4
    ).select("query_id", F.col("neighbor_id").alias("doc_id"), "rnk")
    # a toy lexical ranking that agrees on one doc per query
    lex = dense.filter(F.col("rnk") <= 2).select(
        "query_id", "doc_id", F.col("rnk").alias("rnk")
    )
    fused = rrf_fuse([lex, dense], k=60, top_k=5)
    out = fused.collect()
    assert len(out) > 0
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, rs in by_q.items():
        # docs in both systems outrank dense-only docs
        both = [r for r in rs if r.n_systems == 2]
        only = [r for r in rs if r.n_systems == 1]
        assert both, qid
        if only:
            assert max(r.rnk for r in both) < min(r.rnk for r in only), qid


# ---------------------------------------------------------------- persisted
# BM25 index silver (VERDICT r12 #4): batch ingest → probe ≡ batch path
# bit-for-bit, compaction identity, crash recovery, identity guard.


def _queries_df(spark):
    return spark.createDataFrame(
        [(1, "cat mat"), (2, "dog"), (3, "unrelated spark plans")],
        "query_id long, query_text string",
    )


def _corpus_df(spark):
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the dog chased the cat"),
        (3, "dogs and cats living together"),
        (4, "a completely unrelated sentence about spark plans"),
        (5, "the mat was sat on by another cat and a dog"),
        (6, "spark plans are read by the unrelated dog"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _ranks(df):
    return sorted((r.query_id, r.doc_id, r.score, r.rnk) for r in df.collect())


def test_indexed_equals_batch_bitwise(spark, tmp_path):
    """Two doc-disjoint ingest batches; the indexed probe must equal the
    single-pass batch ranking BIT-FOR-BIT — df sums, the long-sum avgdl,
    and the shared scoring tail are exact by construction."""
    from crossbar_data_process_spark.operators.retrieval import (
        bm25_index_ingest,
        bm25_topk_indexed,
    )

    d, q = _corpus_df(spark), _queries_df(spark)
    path = str(tmp_path / "bm25")
    bm25_index_ingest(d.filter(F.col("doc_id") <= 3), path, "b0")
    bm25_index_ingest(d.filter(F.col("doc_id") > 3), path, "b1")
    assert _ranks(bm25_topk_indexed(spark, path, q)) == _ranks(
        bm25_topk(d, q)
    )


def test_compaction_preserves_rankings_and_folds_batches(spark, tmp_path):
    import os

    from crossbar_data_process_spark.operators.retrieval import (
        bm25_index_ingest,
        bm25_topk_indexed,
        compact_bm25_index,
    )

    d, q = _corpus_df(spark), _queries_df(spark)
    path = str(tmp_path / "bm25")
    for i in range(3):
        bm25_index_ingest(
            d.filter(F.col("doc_id") % 3 == i), path, f"b{i}"
        )
    want = _ranks(bm25_topk_indexed(spark, path, q))
    compact_bm25_index(spark, path, include_tf_dl=False)
    assert _ranks(bm25_topk_indexed(spark, path, q)) == want
    assert sorted(os.listdir(f"{path}/df")) == ["batch=compacted"]
    assert sorted(os.listdir(f"{path}/stats")) == ["batch=compacted"]
    # include_tf_dl=False leaves the per-doc batch dirs in place
    assert len(os.listdir(f"{path}/tf")) == 3
    assert len(os.listdir(f"{path}/dl")) == 3
    # a second compaction is a no-op (single batch already)
    compact_bm25_index(spark, path, include_tf_dl=False)
    assert _ranks(bm25_topk_indexed(spark, path, q)) == want


def test_tf_dl_compaction_bins_files_and_preserves_rankings(spark, tmp_path):
    """The r14 tf/dl bin-pack (VERDICT r13 #3): after a full compaction
    the probe lists O(term_buckets) dirs regardless of ingest count —
    one batch dir per table, exactly tf_files_per_bucket parquet files
    under each term_bucket dir, dl bin-packed — and indexed rankings
    stay bit-identical to the single-pass batch form."""
    import glob
    import os

    from crossbar_data_process_spark.operators.retrieval import (
        bm25_index_ingest,
        bm25_topk_indexed,
        compact_bm25_index,
    )

    d, q = _corpus_df(spark), _queries_df(spark)
    path = str(tmp_path / "bm25")
    for i in range(3):
        bm25_index_ingest(d.filter(F.col("doc_id") % 3 == i), path, f"b{i}")
    compact_bm25_index(spark, path)  # include_tf_dl defaults ON
    for t in ("tf", "dl", "df", "stats"):
        assert sorted(os.listdir(f"{path}/{t}")) == ["batch=compacted"], t
    # every term_bucket dir holds exactly tf_files_per_bucket(=1) files
    for bdir in glob.glob(f"{path}/tf/batch=compacted/term_bucket=*"):
        files = [f for f in os.listdir(bdir) if f.endswith(".parquet")]
        assert len(files) == 1, (bdir, files)
    dl_files = [
        f
        for f in os.listdir(f"{path}/dl/batch=compacted")
        if f.endswith(".parquet")
    ]
    assert len(dl_files) <= 8
    assert _ranks(bm25_topk_indexed(spark, path, q)) == _ranks(
        bm25_topk(d, q)
    )
    # idempotent: a second full compaction is a no-op, rankings intact
    compact_bm25_index(spark, path)
    assert _ranks(bm25_topk_indexed(spark, path, q)) == _ranks(
        bm25_topk(d, q)
    )


def test_tf_compaction_crash_recovery(spark, tmp_path):
    """Crash AFTER the tf staging rewrite + pending marker landed but
    BEFORE the old batch dirs were removed: the next ingest replays
    delete→rename→unmark and rankings are unchanged (the df recovery
    test's twin for the corpus-sized table)."""
    import json
    import os
    import shutil

    from crossbar_data_process_spark.operators.retrieval import (
        bm25_index_ingest,
        bm25_topk_indexed,
    )

    d, q = _corpus_df(spark), _queries_df(spark)
    path = str(tmp_path / "bm25")
    bm25_index_ingest(d.filter(F.col("doc_id") <= 3), path, "b0")
    # hand-craft the crash state: staging = a copy of tf/batch=b0 (the
    # bin-pack of a single batch is content-identical), marker claiming
    # it supersedes b0
    shutil.copytree(f"{path}/tf/batch=b0", f"{path}/tf/_staging_compacted")
    with open(f"{path}/_pending_compaction.json", "w") as f:
        json.dump(
            {"table": "tf", "batch_id": "compacted", "old": ["batch=b0"]}, f
        )
    bm25_index_ingest(d.filter(F.col("doc_id") > 3), path, "b1")
    assert not os.path.exists(f"{path}/tf/_staging_compacted")
    assert not os.path.exists(f"{path}/_pending_compaction.json")
    assert os.path.exists(f"{path}/tf/batch=compacted")
    assert not os.path.exists(f"{path}/tf/batch=b0")
    assert _ranks(bm25_topk_indexed(spark, path, q)) == _ranks(
        bm25_topk(d, q)
    )


def test_compaction_crash_recovery(spark, tmp_path):
    """Simulate a crash AFTER the staging fold + pending marker landed but
    BEFORE the old dirs were removed: the next ingest heals the index and
    rankings are unchanged."""
    import json
    import os
    import shutil

    from crossbar_data_process_spark.operators.retrieval import (
        bm25_index_ingest,
        bm25_topk_indexed,
        compact_bm25_index,
    )

    d, q = _corpus_df(spark), _queries_df(spark)
    path = str(tmp_path / "bm25")
    bm25_index_ingest(d.filter(F.col("doc_id") <= 3), path, "b0")
    want_b0 = _ranks(
        bm25_topk_indexed(spark, path, q)
    )  # pre-crash truth: batch b0 only
    # hand-craft the crash state: staging = a copy of df/batch=b0 (the
    # fold of a single batch is itself), marker claiming it supersedes b0
    shutil.copytree(f"{path}/df/batch=b0", f"{path}/df/_staging_compacted")
    with open(f"{path}/_pending_compaction.json", "w") as f:
        json.dump(
            {"table": "df", "batch_id": "compacted", "old": ["batch=b0"]}, f
        )
    # a reader in the crash window would see df double-counted — the
    # protocol's documented single-writer window; recovery must fix it
    bm25_index_ingest(d.filter(F.col("doc_id") > 3), path, "b1")
    assert not os.path.exists(f"{path}/df/_staging_compacted")
    assert not os.path.exists(f"{path}/_pending_compaction.json")
    assert os.path.exists(f"{path}/df/batch=compacted")
    assert not os.path.exists(f"{path}/df/batch=b0")
    assert _ranks(bm25_topk_indexed(spark, path, q)) == _ranks(
        bm25_topk(d, q)
    )
    del want_b0  # (kept for debuggability on failure)
    compact_bm25_index(spark, path)
    assert _ranks(bm25_topk_indexed(spark, path, q)) == _ranks(
        bm25_topk(d, q)
    )


def test_index_meta_guard_refuses_mismatched_parameters(spark, tmp_path):
    import json

    import pytest

    from crossbar_data_process_spark.operators.retrieval import (
        bm25_index_ingest,
        bm25_topk_indexed,
    )

    d, q = _corpus_df(spark), _queries_df(spark)
    path = str(tmp_path / "bm25")
    import os

    bm25_index_ingest(d, path, "b0")
    with open(f"{path}/_bm25_meta.json", "w") as f:
        json.dump(
            {"tokenizer": "other", "n_term_buckets": 8, "version": 1}, f
        )
    # the Hadoop local FS keeps a checksum sidecar for files IT wrote;
    # rewriting the meta behind its back must also drop the stale crc
    # or the read fails on checksum instead of reaching the guard
    crc = f"{path}/._bm25_meta.json.crc"
    if os.path.exists(crc):
        os.remove(crc)
    with pytest.raises(ValueError, match="different parameters"):
        bm25_topk_indexed(spark, path, q)
    with pytest.raises(ValueError, match="different parameters"):
        bm25_index_ingest(d, path, "b1")


def test_indexed_probe_prunes_term_buckets(spark, tmp_path):
    """The scale contract: the tf scan is partition-pruned to the query
    terms' buckets — the probed bucket set is a LITERAL IN filter on the
    term_bucket partition column (static pruning, independent of join
    strategy/DPP heuristics), visible in the scan's PartitionFilters and
    in the actual file count the scan reads."""
    import re

    from crossbar_data_process_spark.operators.retrieval import (
        _term_bucket,
        bm25_index_ingest,
        bm25_topk_indexed,
    )

    d = _corpus_df(spark)
    q = spark.createDataFrame(
        [(1, "cat")], "query_id long, query_text string"
    )
    path = str(tmp_path / "bm25")
    bm25_index_ingest(d, path, "b0")
    plan = (
        bm25_topk_indexed(spark, path, q)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # every FileScan over a bucketed table (tf/df — the only scans whose
    # schema carries term_bucket) must have a term_bucket PartitionFilter
    scans = [
        ln
        for ln in plan.splitlines()
        if "FileScan" in ln and "term_bucket#" in ln
    ]
    assert len(scans) >= 2, plan[:4000]  # tf and df
    want_bucket = (
        spark.range(1)
        .select(_term_bucket(F.lit("cat")).alias("b"))
        .collect()[0]
        .b
    )
    for ln in scans:
        m = re.search(r"PartitionFilters: \[([^\]]*)", ln)
        assert m, ln
        # the single query term prunes to exactly ONE literal bucket
        assert f"term_bucket#" in m.group(1), ln
        assert f"= {want_bucket})" in m.group(1), ln


def test_ingest_is_batch_sized(spark, tmp_path):
    """Ingesting a batch never reads the existing index: the batch's
    ingest must succeed even if the previously written index tables are
    made unreadable (moved away) — proving per-batch work touches only
    the batch (the q63 contract)."""
    import os

    from crossbar_data_process_spark.operators.retrieval import (
        bm25_index_ingest,
    )

    d = _corpus_df(spark)
    path = str(tmp_path / "bm25")
    bm25_index_ingest(d.filter(F.col("doc_id") <= 3), path, "b0")
    # poison the existing batch data: rename its tf/df/dl batch dirs away
    for t in ("tf", "df", "dl", "stats"):
        os.rename(f"{path}/{t}/batch=b0", f"{path}/{t}/__hidden")
    bm25_index_ingest(d.filter(F.col("doc_id") > 3), path, "b1")
    for t in ("tf", "df", "dl", "stats"):
        assert os.path.exists(f"{path}/{t}/batch=b1")
        os.rename(f"{path}/{t}/__hidden", f"{path}/{t}/batch=b0")


def test_compaction_aborts_when_batch_lands_mid_fold(
    spark, tmp_path, monkeypatch
):
    """r14 ADVICE: the tf/dl rewrite made the fold window corpus-sized —
    a batch ingested DURING the fold would be read into the staging copy
    and also survive as its own dir (absent from the superseded list),
    double-counting its mass after the swap. The re-list check must
    abort: staging discarded, marker never written, every landed batch
    (including the concurrent one) intact and correctly ranked."""
    import os

    import pytest

    import crossbar_data_process_spark.operators.retrieval as retrieval
    from crossbar_data_process_spark.operators.retrieval import (
        bm25_index_ingest,
        bm25_topk_indexed,
        compact_bm25_index,
    )

    d, q = _corpus_df(spark), _queries_df(spark)
    path = str(tmp_path / "bm25")
    bm25_index_ingest(d.filter(F.col("doc_id") <= 3), path, "b0")
    bm25_index_ingest(
        d.filter((F.col("doc_id") > 3) & (F.col("doc_id") <= 5)), path, "b1"
    )
    late = d.filter(F.col("doc_id") > 5)

    real_tb = retrieval._term_bucket
    fired = {"done": False}

    def landing_tb(col):
        # a concurrent writer lands a batch inside the df fold window —
        # after compact listed `old`, before its staging write's
        # post-write re-list (r16: the fold's materialize+count pre-pass
        # was removed, so the injection seam moved to _term_bucket,
        # which the df staging write builds with inside that window)
        if not fired["done"]:
            fired["done"] = True
            bm25_index_ingest(late, path, "b_concurrent")
        return real_tb(col)

    monkeypatch.setattr(retrieval, "_term_bucket", landing_tb)
    with pytest.raises(RuntimeError, match="batch set changed"):
        compact_bm25_index(spark, path)
    monkeypatch.setattr(retrieval, "_term_bucket", real_tb)
    # nothing lost, nothing staged, marker never written
    assert not os.path.exists(f"{path}/_pending_compaction.json")
    assert not any(
        name.startswith("_staging") for name in os.listdir(f"{path}/df")
    )
    for b in ("batch=b0", "batch=b1", "batch=b_concurrent"):
        assert os.path.exists(f"{path}/df/{b}")
    assert _ranks(bm25_topk_indexed(spark, path, q)) == _ranks(
        bm25_topk(d, q)
    )
    # and the re-run (quiet window) compacts cleanly
    compact_bm25_index(spark, path)
    assert _ranks(bm25_topk_indexed(spark, path, q)) == _ranks(
        bm25_topk(d, q)
    )
