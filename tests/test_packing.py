"""Chunking + sequence packing (operators/packing.py): coverage and
overlap algebra, packing invariants, determinism under repartitioning."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crossbar_data_process_spark.operators.packing import (
    chunk_documents,
    pack_documents,
)


def _doc(n, tag):
    return " ".join(f"{tag}{i}" for i in range(n))


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, _doc(5 + (i * 7) % 40, f"d{i}_")) for i in range(40)]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_chunking_covers_exactly_no_overlap(spark):
    docs = spark.createDataFrame(
        [(1, _doc(10, "t")), (2, _doc(4, "u")), (3, "   "), (4, _doc(9, "v"))],
        "doc_id int, text string",
    )
    out = chunk_documents(docs, max_tokens=4).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for rs in by_doc.values():
        rs.sort(key=lambda r: r.chunk_no)
        assert [r.chunk_no for r in rs] == list(range(len(rs)))
    # concatenating chunks reproduces each doc's token stream exactly
    assert " ".join(r.chunk_text for r in by_doc[1]) == _doc(10, "t")
    assert [r.n_tokens for r in by_doc[1]] == [4, 4, 2]
    assert [r.n_tokens for r in by_doc[2]] == [4]  # exactly max → 1 chunk
    assert by_doc[3][0].chunk_text == "" and by_doc[3][0].n_tokens == 0
    assert [r.n_tokens for r in by_doc[4]] == [4, 4, 1]


def test_chunking_overlap_algebra(spark):
    docs = spark.createDataFrame([(1, _doc(10, "t"))], "doc_id int, text string")
    out = sorted(
        chunk_documents(docs, max_tokens=4, overlap=1).collect(),
        key=lambda r: r.chunk_no,
    )
    # stride 3 over 10 tokens: starts 0,3,6 then the tail chunk
    chunks = [r.chunk_text.split() for r in out]
    assert chunks[0] == ["t0", "t1", "t2", "t3"]
    assert chunks[1] == ["t3", "t4", "t5", "t6"]
    assert chunks[2] == ["t6", "t7", "t8", "t9"]
    for a, b in zip(chunks, chunks[1:]):
        assert a[-1:] == b[:1]  # adjacent chunks share `overlap` tokens
    with pytest.raises(ValueError):
        chunk_documents(docs, max_tokens=4, overlap=4)


def test_packing_invariants(spark, corpus):
    budget = 64
    out = pack_documents(corpus, budget=budget, n_buckets=4).collect()
    assert len(out) == 40 and len({r.doc_id for r in out}) == 40
    packs = {}
    for r in out:
        packs.setdefault(r.pack_id, []).append(r)
    for rows in packs.values():
        rows.sort(key=lambda r: r.pack_pos)
        assert [r.pack_pos for r in rows] == list(range(len(rows)))
        assert len({r.bucket for r in rows}) == 1  # packs never cross buckets
        # greedy bound: everything before the last doc fits the budget
        assert sum(r.n_tokens for r in rows[:-1]) < budget


def test_packing_deterministic_and_reuses_precomputed_counts(spark, corpus):
    a = pack_documents(corpus, budget=64, n_buckets=4)
    b = pack_documents(corpus.repartition(13), budget=64, n_buckets=4)
    key = lambda rs: sorted(map(tuple, rs))  # noqa: E731
    assert key(a.collect()) == key(b.collect())
    pre = corpus.withColumn("nt", F.size(F.split(F.col("text"), " ")))
    c = pack_documents(pre, budget=64, n_buckets=4, n_tokens_col="nt")
    assert key(c.drop("nt").collect()) == key(a.collect())


def test_packing_plan_is_one_exchange(spark, corpus):
    """The bucket window is the ONLY shuffle: pack_pos's window reuses the
    same hash partitioning? No — it re-keys on pack_id; assert instead
    that no join/cartesian appears and exchanges stay ≤ 2."""
    plan = pack_documents(corpus, budget=64)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "Join" not in plan
    assert plan.count("Exchange") <= 2

def test_curate_pack_shard_end_to_end(spark, tmp_path):
    """The full training-prep path composes: curated docs -> fixed-budget
    packs -> deterministic shards on disk. Every curated doc appears in
    exactly one pack and exactly one shard; the shard layout is reproducible
    from a differently-partitioned input."""
    from crossbar_data_process_spark.operators.packing import pack_documents
    from crossbar_data_process_spark.sources.writers import write_training_shards

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    packed = pack_documents(docs, budget=512, n_buckets=8)
    n_docs = docs.count()
    assert packed.count() == n_docs

    joined = packed.join(docs.select("doc_id", "text"), "doc_id")
    c1 = write_training_shards(joined, str(tmp_path / "a"), n_shards=4)
    c2 = write_training_shards(
        joined.repartition(17), str(tmp_path / "b"), n_shards=4
    )
    assert sum(c1.values()) == n_docs
    assert c1 == c2
    import glob as _glob

    import pyarrow.parquet as pq

    def rows(path):
        out = {}
        for d in sorted(_glob.glob(f"{path}/shard=*")):
            [f] = _glob.glob(f"{d}/*.parquet")
            t = pq.read_table(f, columns=["doc_id", "pack_id", "pack_pos"])
            out[d.rsplit("=", 1)[1]] = list(
                zip(t.column("doc_id").to_pylist(), t.column("pack_id").to_pylist())
            )
        return out

    assert rows(str(tmp_path / "a")) == rows(str(tmp_path / "b"))


def test_materialize_packs_builds_ordered_sequences(spark):
    from crossbar_data_process_spark.operators.packing import (
        materialize_packs,
        pack_documents,
    )

    rows = [(i, " ".join([f"w{i}"] * (3 + i % 4))) for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    assign = pack_documents(docs, budget=10, n_buckets=3)
    packs = materialize_packs(docs, assign).collect()

    amap = {
        r.doc_id: r for r in assign.collect()
    }
    assert sum(p.n_docs for p in packs) == 30
    for p in packs:
        # doc order inside the pack == pack_pos order from the assignment
        assert [amap[d].pack_pos for d in p.doc_ids] == list(range(p.n_docs))
        # boundaries = exclusive running sum of member token counts
        want_bounds, acc = [], 0
        for d in p.doc_ids:
            want_bounds.append(acc)
            acc += amap[d].n_tokens
        assert list(p.boundaries) == want_bounds
        assert p.n_tokens == acc
        # the packed text is the member texts joined in order
        texts = {r.doc_id: r.text for r in docs.collect()}
        assert p.pack_text == " ".join(texts[d] for d in p.doc_ids)
