"""Text-analysis operators for large-scale training-data pipelines
(engine extension beyond the reference's surface; SURVEY.md §7.1 step 7).

Pure Column expressions over a ``text`` column — JVM-side, codegen-friendly,
linear in input size, no shuffle. Each has an exact ANSI-SQL oracle
(see __spark_entry__.oracle_sql) so correctness is checked against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny per-language marker lexicons for the n-gram/stopword language-ID
# heuristic; real deployments would swap in a fastText-style model via a
# Pandas UDF — the engine keeps the interface (text -> lang code) identical.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "die", "und", "das", "ein"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "los", "las", "una", "y"],
}

STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "it"]


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization to a native array (empty tokens dropped)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.trim(c), "\\s+"), lambda x: x != "")


def token_count(col: Column | str) -> Column:
    """Whitespace token count; 0 for empty/blank text."""
    return F.size(tokens(col))


def _marker_hits(c: Column, words: list[str]) -> Column:
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(c), F.lit(pat), F.lit(0)))


def language_id(col: Column | str) -> Column:
    """Heuristic language ID: score each language by marker-word hit count,
    pick the argmax (ties broken by language-code order, 'und' =
    undetermined when nothing hits). Deterministic, oracle-expressible."""
    c = F.col(col) if isinstance(col, str) else col
    scored = F.array(
        *[
            F.struct(
                _marker_hits(c, words).alias("hits"), F.lit(lang).alias("lang")
            )
            for lang, words in sorted(LANG_MARKERS.items())
        ]
    )
    best = F.array_max(F.filter(scored, lambda s: s["hits"] > 0))
    return F.coalesce(best["lang"], F.lit("und"))


def stopword_ratio(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    n = token_count(c)
    return F.when(n > 0, F.round(_marker_hits(c, STOPWORDS) / n, 6)).otherwise(
        F.lit(0.0)
    )


def non_alnum_ratio(col: Column | str) -> Column:
    """Share of characters that are not alphanumeric/whitespace (punctuation
    density — a standard junk-text signal)."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c)
    junk = n - F.length(F.regexp_replace(c, "[a-zA-Z0-9\\s]", ""))
    return F.when(n > 0, F.round((n - junk) / n, 6)).otherwise(F.lit(0.0))


def quality_score(col: Column | str) -> Column:
    """Composite quality score in [0,1]: length band + stopword presence −
    punctuation density. A cheap filter stage for pretraining pipelines;
    thresholds are illustrative and deliberately simple so the DuckDB oracle
    states the same arithmetic."""
    c = F.col(col) if isinstance(col, str) else col
    n_tok = token_count(c)
    len_ok = F.when((n_tok >= 10) & (n_tok <= 100000), F.lit(0.5)).otherwise(F.lit(0.0))
    stop = F.least(stopword_ratio(c) * 2, F.lit(0.3))
    punct_pen = F.least(non_alnum_ratio(c), F.lit(0.2))
    return F.round(len_ok + stop - punct_pen + F.lit(0.2), 6)


def doc_fingerprint(col: Column | str, bits_hex: int = 16) -> Column:
    """Document fingerprint: md5 over whitespace-normalized lowercase text,
    truncated to ``bits_hex`` hex chars. Stable across engines (md5 is
    bit-exact everywhere), used as the exact-dedup key."""
    c = F.col(col) if isinstance(col, str) else col
    norm = F.regexp_replace(F.lower(F.trim(c)), "\\s+", " ")
    return F.substring(F.md5(norm), 1, bits_hex)


# BPE-style pre-tokenizer pattern (GPT-2-inspired split shape, ASCII classes
# so Java regex and RE2/DuckDB agree): contraction suffixes, space-prefixed
# letter runs, space-prefixed digit runs, space-prefixed punctuation runs.
# DELIBERATE deviation from GPT-2: there is no residual-whitespace branch, so
# runs of extra whitespace are dropped (uncounted) rather than emitted as
# whitespace tokens — Spark and the DuckDB oracle agree with each other, and
# for token-BUDGET estimation whitespace tokens are noise. A real tokenizer's
# merges would run as a Pandas UDF; the PRE-tokenization (where token counts
# come from) is pure regex.
BPE_SPLIT_PATTERN = (
    "'(?:[sdmt]|ll|ve|re)"
    "| ?[A-Za-z]+"
    "| ?[0-9]+"
    "| ?[^ A-Za-z0-9]+"
)


def bpe_token_count(col: Column | str) -> Column:
    """BPE-ish token count: the number of pre-tokenizer segments — the
    standard cheap proxy for LLM token budgets (whitespace counts
    under-estimate punctuation-heavy text). JVM regex, linear scan."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_SPLIT_PATTERN), F.lit(0)))


# Rolling-hash document fingerprinting (winnowing): hash every k-char window
# of the normalized text, then keep the MINIMUM hash per stride-sized block —
# the classic local fingerprint set for plagiarism/overlap detection. Two
# documents sharing a run of ≥ k+stride chars share at least one fingerprint.
# Split into two expressions because Catalyst does not CSE inside
# higher-order-function lambdas: inlining the window-hash array into the
# block-min transform would recompute ALL window hashes once per block
# (quadratic per doc). Pipelines must materialize rolling_window_hashes into
# a column, then apply winnow_min to that column. Cost is O(len·k) character
# work instead of the sequential O(len) Rabin-Karp recurrence — the rolling
# state can't vectorize across a Column; at small k the scan stays in
# whole-stage codegen and the constant is cheap.


def rolling_window_hashes(col: Column | str, k: int = 8) -> Column:
    """32-bit md5-prefix hash (the engine's cross-engine hash) of every
    ``k``-char window of the whitespace-normalized lowercase text; empty
    array for texts shorter than ``k``."""
    c = F.col(col) if isinstance(col, str) else col
    norm = F.regexp_replace(F.lower(F.trim(c)), "\\s+", " ")
    starts = F.sequence(F.lit(1), F.length(norm) - (k - 1))
    hashes = F.transform(
        starts,
        lambda i: F.conv(
            F.substring(F.md5(F.substring(norm, i, k)), 1, 8), 16, 10
        ).cast("long"),
    )
    # guard: sequence(1, n) is DESCENDING [1, 0] for n <= 0, not empty
    return F.when(F.length(norm) >= k, hashes).otherwise(
        F.array().cast("array<bigint>")
    )


def winnow_min(hashes: Column | str, stride: int = 16) -> Column:
    """Winnowing reduction over a MATERIALIZED window-hash column: distinct
    per-block minimum hashes (block = ``stride`` consecutive windows)."""
    h = F.col(hashes) if isinstance(hashes, str) else hashes
    n_blocks = F.ceil(F.size(h) / stride).cast("int")
    block_mins = F.transform(
        F.sequence(F.lit(1), n_blocks),
        lambda b: F.array_min(F.slice(h, (b - 1) * stride + 1, stride)),
    )
    return F.when(F.size(h) > 0, F.array_distinct(block_mins)).otherwise(
        F.array().cast("array<bigint>")
    )


def duplicate_line_ratio(col: Column | str) -> Column:
    """Gopher-style repetition signal: fraction of non-blank lines that are
    duplicates of another line in the same document (boilerplate menus,
    navigation chrome, generated logs). Pure scan-side Column expr —
    ``1 - distinct/total`` over trimmed lines; 0.0 for empty/blank docs."""
    c = F.col(col) if isinstance(col, str) else col
    lines = F.filter(
        F.transform(F.split(c, "\n"), lambda x: F.trim(x)),
        lambda x: x != "",
    )
    n = F.size(lines)
    return F.when(
        n > 0, F.round((n - F.size(F.array_distinct(lines))) / n, 6)
    ).otherwise(F.lit(0.0))


def duplicate_ngram_ratio(col: Column | str, n: int = 3) -> Column:
    """Gopher-style repetition signal: fraction of word n-grams that are
    repeats of an n-gram already seen in the document (``1 -
    distinct/total``, NON-distinct grams — unlike ``shingles_of``, which
    deliberately distincts for set-Jaccard). High values flag repetitive /
    degenerate text. O(len) scan-side expression; 0.0 for docs shorter
    than ``n`` tokens (same descending-``sequence`` guard as
    ``shingles_of``)."""
    t = tokens(col)
    last = F.size(t) - (n - 1)
    idx = F.when(last >= 1, F.sequence(F.lit(1), last)).otherwise(
        F.array().cast("array<int>")
    )
    grams = F.transform(idx, lambda i: F.array_join(F.slice(t, i, n), " "))
    k = F.size(grams)
    return F.when(
        k > 0, F.round((k - F.size(F.array_distinct(grams))) / k, 6)
    ).otherwise(F.lit(0.0))
