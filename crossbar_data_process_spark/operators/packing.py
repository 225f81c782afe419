"""Context-window chunking and sequence packing — the training-prep step
between a curated corpus and a tokenized batch stream (engine extension;
charter: "operations a large-scale training-data pipeline would need").
The reference repo has no analogue; semantics follow the public T5/GPT
data-pipeline conventions (fixed token budget per sequence, greedy
document packing, optional chunk overlap for long-document splitting).

Both operators are pure DataFrame plans:

- ``chunk_documents``: split each document's token stream into
  ``max_tokens``-sized chunks with ``overlap`` carried between adjacent
  chunks. One ``posexplode`` over a scan-side ``sequence``/``slice``
  expression — 1→N fan-out with no Python and no shuffle (the chunk
  explosion happens in the same stage as the scan).
- ``pack_documents``: assign whole documents to fixed-budget packs via
  an exclusive running token sum inside deterministic md5-ordered salt
  buckets: ``pack_id = floor(cum_excl / budget)``. ONE window (one
  shuffle on the bucket key, ~rows/`n_buckets` rows per partition —
  bucket count scales the parallelism, not the data). Greedy first-fit
  is inherently sequential; this is the standard parallel compromise,
  and its semantics are exact and documented: every pack except
  possibly the LAST of each bucket reaches at least ``budget`` tokens
  counting its overflowing tail doc, packs never split a document, and
  a doc longer than ``budget`` occupies a pack of its own (callers
  chunk first if that must not happen). Deterministic: same corpus →
  same packs, independent of partitioning (md5 order, no RNG).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from crossbar_data_process_spark.functions.text import tokens


def chunk_documents(
    docs: DataFrame,
    max_tokens: int = 512,
    overlap: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One row per (doc, chunk): (id, chunk_no, chunk_text, n_tokens).
    Chunk k covers tokens [k*stride, k*stride + max_tokens) with
    stride = max_tokens - overlap; the final chunk is short rather than
    padded. Empty/whitespace-only docs yield one empty chunk row so no
    document silently disappears between pipeline stages."""
    if not 0 <= overlap < max_tokens:
        raise ValueError("need 0 <= overlap < max_tokens")
    stride = max_tokens - overlap
    toks = tokens(text_col)
    n = F.size(toks)
    # number of chunks: 1 + ceil(max(n - max_tokens, 0) / stride)
    n_chunks = F.lit(1) + F.ceil(
        F.greatest(n - max_tokens, F.lit(0)) / stride
    ).cast("int")
    starts = F.sequence(F.lit(0), (n_chunks - 1) * stride, F.lit(stride))
    exploded = docs.select(
        F.col(id_col),
        toks.alias("__toks"),
        F.posexplode(starts).alias("chunk_no", "__start"),
    )
    chunk = F.slice(F.col("__toks"), F.col("__start") + 1, max_tokens)
    return exploded.select(
        id_col,
        "chunk_no",
        F.array_join(chunk, " ").alias("chunk_text"),
        F.size(chunk).cast("long").alias("n_tokens"),
    )


def pack_documents(
    docs: DataFrame,
    budget: int = 2048,
    n_buckets: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_tokens_col: str | None = None,
    bucket_col: str | None = None,
) -> DataFrame:
    """Assign every document to a pack: (id, n_tokens, bucket, pack_id,
    pack_pos). ``pack_id`` is globally unique (bucket * 2^40 + local id);
    ``pack_pos`` is the doc's 0-based position within its pack in the
    deterministic md5 order. Pass ``n_tokens_col`` to reuse a
    pre-computed count (e.g. the curation profile) instead of
    re-tokenizing, and ``bucket_col`` to supply your own bucket
    assignment (any deterministic int in [0, n_buckets); default
    crc32-of-md5)."""
    nt = (
        F.col(n_tokens_col)
        if n_tokens_col is not None
        else F.size(tokens(text_col))
    ).cast("long")
    key = F.md5(F.col(id_col).cast("string"))
    bucket = (
        F.col(bucket_col).cast("int")
        if bucket_col is not None
        else F.pmod(F.crc32(key), F.lit(n_buckets)).cast("int")
    )
    base = docs.select(
        F.col(id_col),
        nt.alias("n_tokens"),
        bucket.alias("bucket"),
        key.alias("__k"),
    )
    w = Window.partitionBy("bucket").orderBy("__k")
    cum_excl = (
        F.sum("n_tokens").over(w) - F.col("n_tokens")
    )  # exclusive running sum
    local = F.floor(cum_excl / budget)
    packed = base.select(
        id_col,
        "n_tokens",
        "bucket",
        (F.col("bucket").cast("long") * (1 << 40) + local).alias("pack_id"),
        cum_excl.alias("__ce"),
        "__k",
    )
    # __k tie-break: zero-token docs share a cum_excl value
    wp = Window.partitionBy("pack_id").orderBy("__ce", "__k")
    return packed.select(
        id_col,
        "n_tokens",
        "bucket",
        "pack_id",
        (F.row_number().over(wp) - 1).alias("pack_pos"),
    )


def materialize_packs(
    docs: DataFrame,
    assignments: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Turn :func:`pack_documents` assignments into the physical training
    sequences a data loader streams: one row per pack — (pack_id,
    pack_text, n_docs, n_tokens, doc_ids, boundaries) where
    ``boundaries[i]`` is the token offset at which document ``doc_ids[i]``
    starts (the attention-mask reset points for packed training).

    ONE groupBy on pack_id: texts and offsets come out of a single
    ``array_sort(collect_list(struct(pack_pos, …)))`` — no window, no
    second shuffle; the boundary offsets are an exclusive running sum
    computed INSIDE the sorted array via ``transform`` over its indices
    (scan-side, after the aggregation)."""
    joined = assignments.select(id_col, "n_tokens", "pack_id", "pack_pos").join(
        docs.select(id_col, text_col), id_col
    )
    ordered = F.array_sort(
        F.collect_list(F.struct("pack_pos", id_col, "n_tokens", text_col))
    )
    agg = joined.groupBy("pack_id").agg(ordered.alias("__o"))
    boundaries = F.transform(
        F.sequence(F.lit(1), F.size("__o")),
        lambda i: F.aggregate(
            F.slice("__o", 1, i - 1),
            F.lit(0).cast("long"),
            lambda acc, s: acc + s["n_tokens"],
        ),
    )
    return agg.select(
        "pack_id",
        F.array_join(
            F.transform(F.col("__o"), lambda s: s[text_col]), " "
        ).alias("pack_text"),
        F.size("__o").cast("long").alias("n_docs"),
        F.aggregate(
            F.col("__o"), F.lit(0).cast("long"), lambda acc, s: acc + s["n_tokens"]
        ).alias("n_tokens"),
        F.transform(F.col("__o"), lambda s: s[id_col]).alias("doc_ids"),
        boundaries.alias("boundaries"),
    )
