"""BM25 full-text retrieval scoring — the ranking half of a RAG/search
corpus pipeline, as pure DataFrame aggregations: build the term
statistics (tf, df, doc length, corpus averages) in one pass over the
corpus, score any query set against them, return top-k per query.

Scale shape (100 TB):
- the inverted statistics are two groupBys over the (doc, term)
  occurrence table (term-frequency, then document-frequency over the tf
  table — which is already |distinct terms per doc| sized, far smaller
  than the token stream);
- corpus scalars (N, avgdl) ride a 1-row broadcast;
- scoring joins the QUERY term list (small side) against the tf table on
  the term — candidate rows are only (query term, matching doc) pairs,
  the classic inverted-index access path, never corpus × queries;
- per-term contributions round at 1e-6 and accumulate in DECIMAL (the
  engine determinism contract), so rankings are bit-stable across
  partitionings and engines and the whole pipeline has a DuckDB oracle.

Versus the reference: no counterpart (no retrieval anywhere) — engine
charter, SURVEY.md §7 "beyond the reference" track.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crossbar_data_process_spark.functions.text import tokens
from crossbar_data_process_spark.operators.lm import _fround
from crossbar_data_process_spark.operators.materialize import materialize
from crossbar_data_process_spark.operators.textdedup import _spread
from crossbar_data_process_spark.operators.topk import top_k_per_group
from crossbar_data_process_spark.parallel import run_concurrently


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 10,
    scale: int = 6,
    max_df_ratio: float | None = None,
) -> DataFrame:
    """(query_id, doc_id, score, rnk) — the ``top_k`` best BM25 matches per
    query, ties broken by ascending doc id. Uses the standard
    ``idf = ln(1 + (N - df + 0.5)/(df + 0.5))`` (always positive) and the
    Robertson tf saturation with length normalization
    ``tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))``.

    Documents with zero tokens never match; query terms absent from the
    corpus contribute nothing (inner join on the term).

    Scale lever: candidate volume is Σ over query terms of df(term) — a
    query term near df = N touches the whole corpus for a near-zero idf
    contribution. ``max_df_ratio`` opts into the standard stop-term cut
    (the static half of what WAND-style engines do dynamically): terms
    with ``df > max_df_ratio·N`` are excluded from scoring entirely, so
    candidates are bounded by ``max_df_ratio·N`` per query term. Scores
    drop by at most the skipped terms' tiny idf contributions; documents
    matched ONLY through stop terms disappear. Default off (exact)."""
    tf = materialize(_doc_tf(docs, text_col, id_col))
    dl = tf.groupBy("doc").agg(F.sum("tf").cast("double").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    return _score_from_stats(
        tf, dl, df_, stats,
        _query_terms(queries, query_id_col, query_text_col),
        k1=k1, b=b, top_k=top_k, scale=scale, max_df_ratio=max_df_ratio,
        id_col=id_col, query_id_col=query_id_col,
    )


def _doc_tf(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc, term, tf) term-frequency table — the tokenizer contract
    shared by the batch path and the index silver (lower + whitespace
    ``tokens``); one definition so batch and indexed rankings can never
    drift."""
    return (
        _spread(docs)
        .select(F.col(id_col).alias("doc"), F.lower(F.col(text_col)).alias("__lt"))
        .select("doc", F.explode(tokens("__lt")).alias("term"))
        .groupBy("doc", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def _query_terms(
    queries: DataFrame, query_id_col: str, query_text_col: str
) -> DataFrame:
    """(qid, term) distinct query terms under the same tokenizer."""
    return queries.select(
        F.col(query_id_col).alias("qid"),
        F.lower(F.col(query_text_col)).alias("__qt"),
    ).select("qid", F.explode(F.array_distinct(tokens("__qt"))).alias("term"))


def _score_from_stats(
    tf: DataFrame,
    dl: DataFrame,
    df_: DataFrame,
    stats: DataFrame,
    qterms: DataFrame,
    k1: float,
    b: float,
    top_k: int,
    scale: int,
    max_df_ratio: float | None,
    id_col: str,
    query_id_col: str,
) -> DataFrame:
    """The BM25 scoring tail over prepared statistics frames — tf
    (doc, term, tf), dl (doc, dl double), df_ (term, df), stats (1 row:
    n_docs double, avgdl double), qterms (qid, term). Shared verbatim by
    :func:`bm25_topk` (stats built in-query) and
    :func:`bm25_topk_indexed` (stats read from the persisted silver), so
    the two paths are the same math by construction."""
    idf = df_.crossJoin(F.broadcast(stats))
    if max_df_ratio is not None:
        idf = idf.filter(F.col("df") <= max_df_ratio * F.col("n_docs"))
    idf = idf.select(
        "term",
        _fround(
            F.log(
                1.0
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
            scale,
        ).alias("idf"),
        "avgdl",
    )
    # join idf BEFORE tf: the (tiny) query-term × vocab join decides which
    # terms expand at all, so the stop-term cut bounds the tf fan-out —
    # filtering after the expansion would pay the candidate cost anyway
    contrib = (
        qterms.join(idf, "term")
        .join(tf, "term")
        .join(dl, "doc")
        .select(
            "qid",
            "doc",
            _fround(
                F.col("idf")
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
                ),
                scale,
            ).alias("__c"),
        )
    )
    dec = f"decimal(28,{scale})"
    scored = contrib.groupBy("qid", "doc").agg(
        F.sum(F.col("__c").cast(dec)).cast("double").alias("score")
    )
    return top_k_per_group(
        scored.select(
            F.col("qid").alias(query_id_col),
            F.col("doc").alias(id_col),
            "score",
        ),
        [query_id_col],
        [F.desc("score"), F.asc(id_col)],
        top_k,
        rank_col="rnk",
    )


# ---------------------------------------------------------------- BM25
# persisted index silver (VERDICT r12 #4) — the retrieval twin of
# textdedup.dedup_index: a production 100 TB search corpus persists its
# term statistics ONCE and ingests deltas, instead of re-tokenizing the
# corpus on every bm25_topk call. Everything BM25 needs is additive over
# disjoint document batches:
#   tf (doc, term, tf)        — per-batch rows, never merged (docs disjoint)
#   dl (doc, dl)              — same
#   df (term, df)             — per-batch partial counts; df(term) = Σ batches
#   stats (n_docs, total_dl)  — per-batch scalars; N and avgdl = Σ / Σ
# Layout: every table lives under {path}/{name}/batch=<id>/ — one
# directory per ingest batch, written with an overwrite of ONLY its own
# directory, so re-running a failed batch is idempotent (the q63/ann_ingest
# exactly-once posture without a manifest: the batch dir IS the unit of
# atomicity). tf is additionally partitioned by term_bucket =
# pmod(xxhash64(term), N_BUCKETS) so the probe join on the bucket column
# partition-prunes the scan to the query terms' buckets (the q54/q69
# partition-pruned silver precedent). The tokenizer + bucket layout are
# stamped in _bm25_meta.json and verified on every ingest/read (the
# check_centroid_meta philosophy: an index probed under different
# parameters silently returns wrong rankings).

_BM25_META = "_bm25_meta.json"
_BM25_TERM_BUCKETS = 64


def _term_bucket(term) -> "F.Column":
    c = F.col(term) if isinstance(term, str) else term
    return F.pmod(F.xxhash64(c), F.lit(_BM25_TERM_BUCKETS)).cast("int")


def _bm25_meta_payload() -> dict:
    return {
        "tokenizer": "lower+whitespace",
        "n_term_buckets": _BM25_TERM_BUCKETS,
        "version": 1,
    }


def _check_bm25_meta(spark, path: str) -> None:
    import json

    from crossbar_data_process_spark.streaming.ingest import (
        _fs_and_path,
        _hadoop_read_text,
    )

    meta_uri = f"{path}/{_BM25_META}"
    fs, jpath = _fs_and_path(spark, meta_uri)
    if not fs.exists(jpath):
        from crossbar_data_process_spark.sources.writers import (
            _hadoop_write_text,
        )

        _hadoop_write_text(spark, meta_uri, json.dumps(_bm25_meta_payload()))
        return
    want = json.loads(_hadoop_read_text(spark, meta_uri))
    got = _bm25_meta_payload()
    if want != got:
        raise ValueError(
            f"BM25 index at {path} was built under different parameters "
            f"(stored {want}, this engine {got}): probing it would "
            "silently return wrong rankings — rebuild the index"
        )


def bm25_index_ingest(
    docs: DataFrame,
    path: str,
    batch_id: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Ingest one document batch into the persisted BM25 index at
    ``path``. Work is BATCH-sized (the q63 contract): one tokenize pass
    over the batch, three batch-local aggregations, four writes into
    ``batch=<batch_id>/`` directories — the existing index is never read,
    rewritten, or locked. Re-running a batch id overwrites exactly its
    own directories (idempotent recovery).

    PRECONDITION: batches are disjoint in ``id_col`` — a doc ingested
    twice under two batch ids would double-count its tf/df/dl mass
    (run the batch through ``textdedup.flag_against_index`` first, the
    composition ``streaming.ingest`` already implements for text dedup).
    """
    spark = docs.sparkSession
    _check_bm25_meta(spark, path)
    _recover_bm25_compaction(spark, path)
    tf = materialize(_doc_tf(docs, text_col, id_col))
    # the tf write runs ALONE first: it is the lazy tf checkpoint's
    # first consumer (the parallel.run_concurrently race-hygiene
    # contract); the three downstream tables all fold the materialized
    # checkpoint blocks and are mutually independent, so their writes
    # overlap (guide §2.6, r16 optimization round) — 4 serial write
    # walls become ~2, identical outputs at identical paths
    (
        tf.withColumn("term_bucket", _term_bucket("term"))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "static")
        .partitionBy("term_bucket")
        .parquet(f"{path}/tf/batch={batch_id}")
    )
    dl = tf.groupBy("doc").agg(F.sum("tf").cast("long").alias("dl"))

    def _write_dl() -> None:
        dl.write.mode("overwrite").parquet(f"{path}/dl/batch={batch_id}")

    def _write_df() -> None:
        (
            tf.groupBy("term")
            .agg(F.count(F.lit(1)).alias("df"))
            .withColumn("term_bucket", _term_bucket("term"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "static")
            .partitionBy("term_bucket")
            .parquet(f"{path}/df/batch={batch_id}")
        )

    def _write_stats() -> None:
        (
            dl.agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("dl").alias("total_dl"),
            )
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{path}/stats/batch={batch_id}")
        )

    run_concurrently([_write_dl, _write_df, _write_stats])


def bm25_topk_indexed(
    spark,
    path: str,
    queries: DataFrame,
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 10,
    scale: int = 6,
    max_df_ratio: float | None = None,
) -> DataFrame:
    """BM25 top-k against the persisted index — bit-identical rankings to
    :func:`bm25_topk` over the union of the ingested batches (pinned in
    tests/test_retrieval.py; the q71 oracle is q61's SQL verbatim):

    - df(term) = Σ per-batch partials (exact — batches are doc-disjoint);
    - N = Σ n_docs, avgdl = Σ total_dl / N — dl values are integer token
      counts, so the batch path's double ``avg`` and this long-sum
      division compute the SAME double (integer sums < 2^53 are exact in
      both representations);
    - the scoring tail is :func:`_score_from_stats`, the same code object
      the batch path runs.

    Scale shape: the corpus is never re-tokenized — the probed bucket set
    is collected first (ONE tiny job, ≤ N_TERM_BUCKETS ints — a
    hyperparameter-sized bounded collect, never data-sized) and applied
    as a LITERAL ``IN`` filter on the term_bucket partition column, so
    the tf/df scans partition-prune STATICALLY (visible in the scan's
    PartitionFilters — pinned in tests/test_retrieval.py) to
    ≈ |query-term buckets| / N_TERM_BUCKETS of the index regardless of
    join-strategy or DPP heuristics; df/stats reads are vocabulary- and
    batch-count-sized. Batch-count growth is bounded by compaction
    (:func:`compact_bm25_index`)."""
    _check_bm25_meta(spark, path)
    qterms = materialize(
        _query_terms(queries, query_id_col, query_text_col)
    )
    buckets = sorted(
        r.b
        for r in qterms.select(_term_bucket("term").alias("b"))
        .distinct()
        .collect()
    )
    tf = (
        spark.read.parquet(f"{path}/tf")
        .filter(F.col("term_bucket").isin(buckets))
        .select("doc", "term", "tf")
    )
    dl = spark.read.parquet(f"{path}/dl").select(
        "doc", F.col("dl").cast("double").alias("dl")
    )
    df_ = (
        spark.read.parquet(f"{path}/df")
        .filter(F.col("term_bucket").isin(buckets))
        .groupBy("term")
        .agg(F.sum("df").alias("df"))
    )
    stats = spark.read.parquet(f"{path}/stats").agg(
        F.sum("n_docs").cast("double").alias("n_docs"),
        (
            F.sum("total_dl").cast("double")
            / F.sum("n_docs").cast("double")
        ).alias("avgdl"),
    )
    return _score_from_stats(
        tf, dl, df_, stats, qterms,
        k1=k1, b=b, top_k=top_k, scale=scale, max_df_ratio=max_df_ratio,
        id_col=id_col, query_id_col=query_id_col,
    )


_BM25_PENDING = "_pending_compaction.json"


def _recover_bm25_compaction(spark, path: str) -> None:
    """Finish a compaction that crashed mid-protocol (see
    :func:`compact_bm25_index`): the pending marker records which batch
    dirs the already-written staging fold supersedes — delete any that
    survive, move the staging fold into place, drop the marker. Idempotent
    at every crash point (each step re-checks existence)."""
    import json

    from crossbar_data_process_spark.streaming.ingest import (
        _fs_and_path,
        _hadoop_read_text,
    )

    fs, marker = _fs_and_path(spark, f"{path}/{_BM25_PENDING}")
    if not fs.exists(marker):
        return
    pend = json.loads(_hadoop_read_text(spark, f"{path}/{_BM25_PENDING}"))
    table, batch_id = pend["table"], pend["batch_id"]
    _, staging = _fs_and_path(spark, f"{path}/{table}/_staging_{batch_id}")
    _, dest = _fs_and_path(spark, f"{path}/{table}/batch={batch_id}")
    if fs.exists(staging):
        # same returns-false-on-failure contract as compaction (r13
        # review): abort with the marker intact rather than dropping it
        # over a half-applied fold
        for name in pend["old"]:
            _, p = _fs_and_path(spark, f"{path}/{table}/{name}")
            if fs.exists(p) and not fs.delete(p, True):
                raise IOError(
                    f"bm25 recovery: could not delete superseded "
                    f"'{table}/{name}' — marker left in place"
                )
        if not fs.rename(staging, dest):
            raise IOError(
                f"bm25 recovery: could not move staging fold into "
                f"'{table}/batch={batch_id}' — marker left in place"
            )
    fs.delete(marker, False)


def compact_bm25_index(
    spark,
    path: str,
    batch_id: str = "compacted",
    include_tf_dl: bool = True,
    tf_files_per_bucket: int = 1,
    dl_target_files: int = 8,
) -> None:
    """Fold every ingested batch of the index into ONE batch directory
    per table — df as a groupBy-term sum and stats as one summed row
    (vocabulary-/1-row-sized folds), tf and dl as a bin-packing REWRITE
    (``include_tf_dl``, r13 VERDICT #3): per-doc tables carry no
    cross-batch duplication, so their fold is an identity copy whose
    only — but structural — win is file count. At a daily ingest cadence
    the tf table is 365 ``batch=`` dirs × 64 ``term_bucket`` dirs of
    kilobyte files per year, and every probe pays directory listing +
    parquet footer opens per file; after compaction the probe lists
    O(term_buckets) dirs and opens ``tf_files_per_bucket`` files per
    probed bucket REGARDLESS of how many ingests ever landed (the exact
    file-count wall the r09 streaming probe measured for the text-dedup
    silver — ``streaming.ingest.compact_batch_partitions`` is this
    function's gold-side twin). The rewrite reads and rewrites the whole
    tf table once — corpus-sized I/O, which is what a compaction IS; run
    it at maintenance cadence, not per ingest (``include_tf_dl=False``
    restores the r13 metadata-only fold — vocabulary-/1-row-sized, cheap
    enough for any cadence). tf keeps its
    ``term_bucket`` partitioning (the probe's static-pruning contract)
    with at most ``tf_files_per_bucket`` files per bucket — exactly one
    at the default of 1; above it, (bucket, doc-hash slice) pairs that
    hash into the same write task share a file — and dl bin-packs to
    ``dl_target_files`` files.

    Crash protocol, per table: (1) the fold is fully written to an
    ``_staging_<id>`` directory — underscore-prefixed, so parquet readers
    never see it (df/stats additionally materialize their vocab-/1-row-
    sized folds first; for the corpus-sized tf/dl rewrite the staging
    write itself is the read barrier, since the superseded dirs are not
    touched until it finishes); (2) a pending marker records the staging id and the
    superseded batch dirs; (3) the old dirs are deleted; (4) the staging
    dir renames to ``batch=<id>``; (5) the marker drops. A crash anywhere
    is healed by :func:`_recover_bm25_compaction` (run automatically at
    the start of every compaction and ingest): before the marker exists
    the staging dir is invisible garbage; after it, recovery replays
    steps 3–5 idempotently. The one honest window: a READER concurrent
    with steps 3–4 (or with a crashed-and-not-yet-recovered compaction)
    sees reduced df/stats mass — this is a single-writer maintenance
    operation on a raw-parquet silver, the same ops contract as any
    hive-style table without a transaction log."""
    import json

    from crossbar_data_process_spark.sources.writers import _hadoop_write_text
    from crossbar_data_process_spark.streaming.ingest import _fs_and_path

    _check_bm25_meta(spark, path)
    _recover_bm25_compaction(spark, path)
    tables = ["df", "stats"] + (["tf", "dl"] if include_tf_dl else [])
    for table in tables:
        fs, root = _fs_and_path(spark, f"{path}/{table}")
        old = [
            st.getPath().getName()
            for st in fs.listStatus(root)
            if st.isDirectory() and st.getPath().getName().startswith("batch=")
        ]
        if len(old) <= 1:
            continue  # already a single batch — nothing to fold
        staging = f"{path}/{table}/_staging_{batch_id}"
        if table in ("df", "stats"):
            # the staging write is the read barrier for df/stats exactly
            # as it is for tf/dl below — it reads every old batch dir to
            # completion before any directory is touched (the marker and
            # deletes only follow it), so the former materialize+count
            # pre-pass was a redundant extra job per table (r16
            # optimization round; the post-write re-list abort below is
            # unchanged)
            fold = (
                (lambda d: d.groupBy("term").agg(F.sum("df").alias("df")))
                if table == "df"
                else (
                    lambda d: d.agg(
                        F.sum("n_docs").alias("n_docs"),
                        F.sum("total_dl").alias("total_dl"),
                    )
                )
            )
            folded = fold(spark.read.parquet(f"{path}/{table}"))
            if table == "df":
                (
                    folded.withColumn("term_bucket", _term_bucket("term"))
                    .write.mode("overwrite")
                    .option("partitionOverwriteMode", "static")
                    .partitionBy("term_bucket")
                    .parquet(staging)
                )
            else:
                folded.coalesce(1).write.mode("overwrite").parquet(staging)
        else:
            # tf/dl: corpus-sized identity rewrite — NO driver-side
            # materialize (that would checkpoint the whole corpus for
            # nothing); the staging write itself is the read barrier,
            # since the superseded dirs are not touched until it
            # finishes (task retries re-read still-live sources).
            src = spark.read.parquet(f"{path}/{table}").drop("batch")
            if table == "tf":
                # one write task per (bucket, doc-hash slice) → exactly
                # tf_files_per_bucket files under each term_bucket dir
                (
                    src.repartition(
                        _BM25_TERM_BUCKETS * tf_files_per_bucket,
                        F.col("term_bucket"),
                        F.pmod(
                            F.xxhash64("doc"), F.lit(tf_files_per_bucket)
                        ),
                    )
                    .write.mode("overwrite")
                    .option("partitionOverwriteMode", "static")
                    .partitionBy("term_bucket")
                    .parquet(staging)
                )
            else:
                src.repartition(dl_target_files).write.mode(
                    "overwrite"
                ).parquet(staging)
        # re-list AFTER the staging write (r14 ADVICE): the tf/dl rewrite
        # is corpus-sized, so a batch ingested during that (long) window
        # would be read into the fold AND survive as its own batch dir
        # (not in `old`) — double-counted mass after recovery. The df/
        # stats race pre-existed but its window was vocab-sized; with the
        # window now wide, abort cleanly instead: delete staging, skip
        # the marker, leave every landed batch intact for the next run.
        now = {
            st.getPath().getName()
            for st in fs.listStatus(root)
            if st.isDirectory() and st.getPath().getName().startswith("batch=")
        }
        if now != set(old):
            _, sp = _fs_and_path(spark, staging)
            # checked delete (the r13 Hadoop rule this function already
            # applies below): a false return would leave a corpus-sized
            # _staging dir invisible behind an 'aborted cleanly' message
            if fs.exists(sp) and not fs.delete(sp, True):
                raise IOError(
                    f"bm25 compaction abort: batch set changed during the "
                    f"'{table}' fold AND the staging dir could not be "
                    f"deleted — remove {staging} by hand, then re-run"
                )
            raise RuntimeError(
                f"bm25 compaction aborted: '{table}' batch set changed "
                f"during the fold (was {sorted(old)}, now {sorted(now)}) — "
                f"a concurrent ingest landed; staging discarded, no "
                f"'{table}' data touched. Tables folded EARLIER in this "
                "run may already be compacted — a consistent state (each "
                "table folds additively on its own), not a no-op; re-run "
                "compaction"
            )
        _hadoop_write_text(
            spark,
            f"{path}/{_BM25_PENDING}",
            json.dumps({"table": table, "batch_id": batch_id, "old": old}),
        )
        # Hadoop FileSystem reports failure by RETURNING FALSE, not by
        # raising (r13 review) — an unchecked delete would leave an old
        # batch dir alive next to the fold (df double-counted under the
        # dropped marker), an unchecked rename would strand the fold in
        # the invisible _staging dir after the old mass was deleted.
        # Raise instead: the marker survives, recovery replays 3–5.
        for name in old:
            _, p = _fs_and_path(spark, f"{path}/{table}/{name}")
            if fs.exists(p) and not fs.delete(p, True):
                raise IOError(
                    f"bm25 compaction: could not delete superseded "
                    f"'{table}/{name}' — marker left for recovery"
                )
        _, sp = _fs_and_path(spark, staging)
        _, dest = _fs_and_path(spark, f"{path}/{table}/batch={batch_id}")
        if not fs.rename(sp, dest):
            raise IOError(
                f"bm25 compaction: could not move staging fold into "
                f"'{table}/batch={batch_id}' — marker left for recovery"
            )
        _, marker = _fs_and_path(spark, f"{path}/{_BM25_PENDING}")
        fs.delete(marker, False)


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 60,
    top_k: int = 10,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rnk",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) — the standard way to
    combine heterogeneous retrievers (BM25 lexical + dense cosine, or any
    mix) without score calibration: each system contributes
    1/(k + rank) per (query, doc), summed across systems; scores from
    different systems never meet, only RANKS do, so a system with wild
    score scales cannot dominate.

    Determinism contract: each contribution is materialized as integer
    MICROS (floor(1e6/(k+rank) + 0.5)) and summed as longs — the sum is
    exact and order/partitioning-independent (a double sum of reciprocals
    is not), then divided back down; ties break on the doc id. This keeps
    the operator oracle-able in any engine with 64-bit integers.

    Scale shape: input rankings are top-k-per-query tables — Q×k rows,
    MINUSCULE next to the corpora they were ranked from; the union +
    groupBy shuffles only these. The expensive work already happened
    inside the per-system retrievers (``bm25_topk``'s inverted-index path,
    ``ivf_topk_assigned``'s pruned probe); fusion adds one small shuffle.

    Returns (query_col, doc_col, rrf_score, n_systems, rnk) — top_k rows
    per query, rrf_score descending.

    PRECONDITION: each input ranking has at most one row per
    (query, doc) — the ``bm25_topk``/``ivf_topk_assigned`` contract. A
    system emitting duplicates would double-count its contribution
    (n_systems counts ROWS, so such inputs are visible in the output).
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    parts = [
        r.select(
            F.col(query_col),
            F.col(doc_col),
            (
                F.floor(
                    F.lit(1_000_000.0) / (F.lit(k) + F.col(rank_col))
                    + F.lit(0.5)
                )
            ).cast("long").alias("__micros"),
        )
        for r in rankings
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    scored = u.groupBy(query_col, doc_col).agg(
        (F.sum("__micros") / F.lit(1_000_000.0)).alias("rrf_score"),
        F.count(F.lit(1)).cast("long").alias("n_systems"),
    )
    return top_k_per_group(
        scored,
        [query_col],
        [F.desc("rrf_score"), F.asc(doc_col)],
        top_k,
        rank_col="rnk",
    )


def mmr_rerank(
    candidates: DataFrame,
    k: int = 10,
    lam: float = 0.5,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    score_col: str = "score",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal-marginal-relevance re-ranking (Carbonell & Goldstein 1998)
    — the diversity stage after retrieval/fusion: greedily pick the
    candidate maximizing ``lam·relevance − (1−lam)·max_cosine_to_already_
    picked``, so near-duplicate hits don't crowd the context window.
    ``lam=1`` reduces to pure relevance order.

    Greedy selection is inherently sequential PER QUERY, so this is the
    sanctioned Arrow path (``applyInPandas`` — same contract as the BPE
    apply): one vectorized numpy kernel per query group. That is the
    RIGHT shape at scale because the input is a top-N candidate table
    from a retriever (N ≤ a few hundred), never a corpus: Q×N rows
    shuffle once on the query id and each group's O(k·N·d) greedy loop
    touches only its own candidates. Determinism: ties break on the doc
    id; scores are relevance-scaled cosines, reproducible bit-for-bit
    for a fixed candidate set (numpy double ops, no RNG).

    Returns (query_col, doc_col, mmr_score, rnk) with rnk 1..k in
    selection order.
    """
    import numpy as np
    import pandas as pd

    if not 0.0 <= lam <= 1.0:
        raise ValueError(f"lam must be in [0, 1], got {lam}")

    fields = {f.name: f.dataType.simpleString() for f in candidates.schema}
    out_schema = (
        f"{query_col} {fields[query_col]}, {doc_col} {fields[doc_col]}, "
        "mmr_score double, rnk long"
    )

    def _mmr(pdf: pd.DataFrame) -> pd.DataFrame:
        # deterministic candidate order regardless of arrival order
        pdf = pdf.sort_values(doc_col, kind="mergesort").reset_index(drop=True)
        vecs = np.array(
            [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
        )
        norms = np.linalg.norm(vecs, axis=1)
        norms[norms == 0.0] = 1.0  # zero vectors: sim 0 to everything
        units = vecs / norms[:, None]
        rel = pdf[score_col].to_numpy(dtype=np.float64)
        n = len(pdf)
        picked: list[int] = []
        scores: list[float] = []
        max_sim = None  # undefined until something is picked: the first
        avail = np.ones(n, dtype=bool)  # pick is pure relevance, and a
        for _ in range(min(k, n)):  # NEGATIVE max-cosine genuinely boosts
            if max_sim is None:  # (anti-similar docs add diversity) —
                mmr = lam * rel  # never clamped at zero (r10 review)
            else:
                mmr = lam * rel - (1.0 - lam) * max_sim
            mmr[~avail] = -np.inf
            best = int(np.argmax(mmr))  # argmax takes the FIRST max:
            picked.append(best)  # ties -> lowest doc id (sorted order)
            scores.append(float(mmr[best]))
            avail[best] = False
            sims = units @ units[best]
            if max_sim is None:
                max_sim = sims.copy()
            else:
                np.maximum(max_sim, sims, out=max_sim)
        return pd.DataFrame(
            {
                query_col: pdf[query_col].iloc[picked].to_numpy(),
                doc_col: pdf[doc_col].iloc[picked].to_numpy(),
                "mmr_score": scores,
                "rnk": np.arange(1, len(picked) + 1, dtype=np.int64),
            }
        )

    return candidates.groupBy(query_col).applyInPandas(_mmr, out_schema)
