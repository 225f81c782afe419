"""Composed LLM training-data build (scripts/llm_build.py — VERDICT r11
#2): per-stage SEMANTICS are pinned by the operator suites (q55/q65
curation, SemDeDup, q66 mix/split, q58 packing, the JSONL exporter);
this pins the COMPOSITION — stages chain, the funnel is monotone, the
token-permuted paraphrase plant separates the semantic stage from the
text stages, the export manifest reconciles, and the whole build is
deterministic (same corpus → identical counts and byte-identical
shards)."""

from __future__ import annotations

import importlib.util
import json
import os
from pathlib import Path

import pytest
from pyspark.sql import functions as F

_SPEC = importlib.util.spec_from_file_location(
    "llm_build",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts",
        "llm_build.py",
    ),
)
llm_build = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(llm_build)

N_DOCS = 160
PLANT_EVERY = 20


@pytest.fixture(scope="module")
def corpus(spark):
    """Deterministic English-ish corpus: alternating stopword/content
    tokens (passes the language and quality gates), distinct content
    words per doc (so random pairs are neither text- nor
    embedding-dups), an exact re-ingest double every 50th doc, and the
    reversed-paraphrase plant every 20th."""
    stop = ["the", "and", "of", "to", "in", "is", "it", "for", "on", "with"]
    rows = []
    for i in range(N_DOCS):
        toks = []
        for j in range(30):
            toks.append(stop[(i + j) % len(stop)])
            toks.append(f"w{(i * 37 + j * 11) % 997}")
        rows.append((i, " ".join(toks)))
    for i in range(7, N_DOCS, 50):  # exact dup plant (text dedup's case)
        rows[i] = (i, rows[i - 1][1])
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return llm_build._plant_paraphrases(
        llm_build._with_sources(df), every=PLANT_EVERY
    )


def _ids(spark, path: str) -> set[int]:
    return {
        r.doc_id for r in spark.read.parquet(path).select("doc_id").collect()
    }


def _shard_bytes(root: str) -> dict[str, bytes]:
    out = {}
    for d in sorted(Path(root).glob("shard=*")):
        parts = sorted(p for p in d.iterdir() if not p.name.startswith(("_", ".")))
        out[d.name] = b"".join(p.read_bytes() for p in parts)
    return out


def test_build_composes_and_separates_semantic_stage(spark, corpus, tmp_path):
    out = str(tmp_path / "gold")
    report = llm_build.build(
        spark, corpus, out, nlist=4, benchmark_mod=101, benchmark_cap=30
    )
    st = report["stages"]
    # funnel monotone: every stage's survivor count is <= its input's
    assert st["curate"]["rows"] <= N_DOCS
    assert st["semantic_dedup"]["rows"] <= st["curate"]["rows"]
    assert st["mix_split"]["rows"] <= st["semantic_dedup"]["rows"]
    # packing is per split and drops NOTHING: every mixed doc (train AND
    # val/test) reaches the packs and the export (r12 review — the first
    # form silently discarded the non-train splits)
    assert st["pack"]["rows"] == st["mix_split"]["rows"]
    assert st["export_jsonl"]["rows"] == st["pack"]["rows"]
    packed_df = spark.read.parquet(f"{out}/packed")
    mixed_splits = {
        r.split
        for r in spark.read.parquet(f"{out}/mixed").select("split").distinct().collect()
    }
    # packs never mix splits: pack_id is GLOBALLY unique (the bucket id
    # encodes the split), so every pack_id must map to exactly one split
    # — this fails if _pack reverts to split-blind global packing
    # (r12 review pass 2: the first assertion here compared a groupBy
    # count to a distinct count of the SAME key — a tautology)
    mixed_pack = (
        packed_df.groupBy("pack_id")
        .agg(F.countDistinct("split").alias("ns"))
        .filter(F.col("ns") > 1)
        .count()
    )
    assert mixed_pack == 0
    # verify the EXPORT leg from the written shard bytes, not from the
    # pack parquet the manifest also counted (r12 review pass 2): parse
    # the JSONL lines themselves
    lines = []
    for blob in _shard_bytes(f"{out}/shards").values():
        lines.extend(
            json.loads(l) for l in blob.decode().splitlines() if l
        )
    assert len(lines) == st["pack"]["rows"]
    assert {l["split"] for l in lines} == mixed_splits

    curated = _ids(spark, f"{out}/curated")
    semantic = _ids(spark, f"{out}/semantic")
    plants = {i for i in range(N_DOCS) if i % PLANT_EVERY == PLANT_EVERY - 1}
    # the separating property: reversed-bag paraphrases PASS the text
    # stages (no shared word-3-gram shingles with their source) ...
    assert len(plants & curated) >= len(plants) - 2, (
        "paraphrase plants should survive text curation"
    )
    # ... and are ALL removed by the semantic stage (bag-of-words
    # embedding cosine 1.0), while their sources survive it
    assert not (plants & semantic), "semantic stage must drop the plants"
    sources = {p - 1 for p in plants}
    assert sources & curated <= semantic | (sources - curated)
    assert (sources & curated) & semantic == sources & curated

    # exact-dup plant is gone by the text stage already
    exact_dups = {i for i in range(7, N_DOCS, 50)}
    assert not (exact_dups & curated)

    # export manifest reconciles with what was packed, and records its
    # counts' provenance
    manifest = json.loads((tmp_path / "gold" / "shards" / "manifest.json").read_text())
    assert sum(manifest["shards"].values()) == st["pack"]["rows"]
    assert manifest["counts_mode"] == "input"
    # compiled mix fractions are part of the run log
    assert set(report["mix_fractions"]) <= set(llm_build.MIX_BUDGETS)


def test_build_is_deterministic(spark, corpus, tmp_path):
    out1, out2 = str(tmp_path / "g1"), str(tmp_path / "g2")
    r1 = llm_build.build(spark, corpus, out1, nlist=4)
    r2 = llm_build.build(spark, corpus, out2, nlist=4)
    rows1 = {k: v["rows"] for k, v in r1["stages"].items()}
    rows2 = {k: v["rows"] for k, v in r2["stages"].items()}
    assert rows1 == rows2
    assert r1["mix_fractions"] == r2["mix_fractions"]
    # byte-identical shards: the md5 pseudo-shuffle pins (shard, order)
    b1 = _shard_bytes(f"{out1}/shards")
    b2 = _shard_bytes(f"{out2}/shards")
    assert b1 == b2 and len(b1) > 0
    assert sum(len(v) for v in b1.values()) > 0


def test_tokenized_sequence_export(spark, corpus, tmp_path):
    """--tokenize: BPE merges trained on the deduped corpus, documents
    re-packed by REAL token counts, physical sequences (pack_text +
    boundary offsets) exported. Boundaries are the attention-reset
    contract: boundaries[i] is doc i's token offset, and the whole
    sequence's token count equals the sum of its parts."""
    out = str(tmp_path / "gold")
    report = llm_build.build(
        spark, corpus, out, nlist=4, tokenize=True, num_merges=50
    )
    st = report["stages"]
    assert st["tokenize_pack_sequences"]["rows"] > 0
    manifest = json.loads(
        (tmp_path / "gold" / "token_shards" / "manifest.json").read_text()
    )
    assert sum(manifest["shards"].values()) == st["tokenize_pack_sequences"]["rows"]
    lines = []
    for blob in _shard_bytes(f"{out}/token_shards").values():
        lines.extend(json.loads(l) for l in blob.decode().splitlines() if l)
    assert len(lines) == st["tokenize_pack_sequences"]["rows"]
    for l in lines:
        assert l["split"] in llm_build.SPLIT_WEIGHTS
        assert len(l["boundaries"]) == l["n_docs"] == len(l["doc_ids"])
        assert l["boundaries"][0] == 0
        # n_tokens is the BPE token count of the materialized sequence
        assert l["n_tokens"] == len(l["pack_text"].split())
        assert all(
            a < b for a, b in zip(l["boundaries"], l["boundaries"][1:])
        )
        assert l["boundaries"][-1] < l["n_tokens"]
    # the sequences cover every mixed doc exactly once
    all_doc_ids = [d for l in lines for d in l["doc_ids"]]
    assert len(all_doc_ids) == len(set(all_doc_ids)) == st["mix_split"]["rows"]
