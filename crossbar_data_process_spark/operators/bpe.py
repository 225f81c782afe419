"""Byte-pair-encoding tokenizer: train on the corpus, tokenize at scale —
the real token-counting/segmentation step of training-data prep (the
`bpe_token_count` regex in functions/text.py approximates GPT-style
PRE-tokenization; this module learns and applies actual merges).

Train (Sennrich et al. 2016): word-frequency table → iterative best-pair
merges. The frequency table is collected BOUNDED (top ``max_words`` by
frequency — the classic implementation trains on exactly such a table, and
Zipf means the tail it drops barely votes), so driver memory is a
hyperparameter, never data-sized — the same contract as the IVF
driver-side fit (operators/ivf.py ``driver_fit_rows``).

Apply: Arrow-batched ``mapInPandas`` — the sanctioned slow path (engine
policy: Python only for genuinely non-SQL work; iterative longest-match
merging is not expressible as Column algebra). Per-batch word caching
makes the common case a dict hit: corpus token distributions are Zipfian,
so each batch tokenizes ~hundreds of distinct words, not millions of
occurrences.

Determinism: merge selection breaks frequency ties lexicographically;
application is a pure function of (merges, word); no RNG anywhere — the
tokenizer artifact and every encoded corpus are reproducible bit-for-bit.

Versus the reference: no counterpart (no tokenizer anywhere) — engine
charter, SURVEY.md §7 "beyond the reference" track.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from crossbar_data_process_spark.functions.text import tokens
from crossbar_data_process_spark.operators.textdedup import _spread

_EOW = "</w>"


def bpe_train(
    docs: DataFrame,
    num_merges: int = 200,
    text_col: str = "text",
    max_words: int = 50_000,
    lowercase: bool = True,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus word-frequency
    table. Returns the ordered merge list — the tokenizer artifact; ship
    it to :func:`bpe_encode` (or persist as JSON) and never retrain."""
    txt = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    freq_rows = (
        _spread(docs)
        .select(F.explode(tokens(txt)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("f"))
        .orderBy(F.desc("f"), F.asc("w"))
        .limit(max_words)
        .collect()
    )
    vocab: dict[tuple[str, ...], int] = {
        (*r["w"], _EOW): int(r["f"]) for r in freq_rows
    }
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: Counter[tuple[str, str]] = Counter()
        for word, f in vocab.items():
            for a, b in zip(word, word[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        # max by frequency, ties broken lexicographically — deterministic
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for word, f in vocab.items():
            out = []
            i = 0
            while i < len(word):
                if i + 1 < len(word) and (word[i], word[i + 1]) == best:
                    out.append(merged)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    symbols = [*word, _EOW]
    while len(symbols) > 1:
        best_rank, best_i = None, None
        for i, pair in enumerate(zip(symbols, symbols[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        symbols[best_i : best_i + 2] = [symbols[best_i] + symbols[best_i + 1]]
    return symbols


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
) -> DataFrame:
    """(id, bpe_tokens: array<string>, n_bpe: long) — the encoded corpus.
    ``n_bpe`` is the budget unit sequence packing should use
    (``pack_documents(..., n_tokens_col="n_bpe")``); joining the tokens of
    one word and stripping the end-of-word marker reconstructs the word
    exactly (lossless within the whitespace-token contract)."""
    ranks = {pair: i for i, pair in enumerate(merges)}
    # The id passes through UNTOUCHED with its source type — a hard cast
    # to long silently NULLed non-numeric string ids (r7 review finding).
    schema = T.StructType(
        [
            T.StructField("__id", docs.schema[id_col].dataType),
            T.StructField("bpe_tokens", T.ArrayType(T.StringType())),
            T.StructField("n_bpe", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[str]] = {}

        def enc_text(text) -> list[str]:
            if text is None:
                return []
            if lowercase:
                text = text.lower()
            out: list[str] = []
            for w in text.split():
                hit = cache.get(w)
                if hit is None:
                    hit = _encode_word(w, ranks)
                    cache[w] = hit
                out.extend(hit)
            return out

        for pdf in batches:
            toks = pdf["__text"].map(enc_text)
            yield pd.DataFrame(
                {
                    "__id": pdf["__id"],
                    "bpe_tokens": toks,
                    "n_bpe": toks.map(len).astype("int64"),
                }
            )

    narrowed = _spread(docs).select(
        F.col(id_col).alias("__id"), F.col(text_col).alias("__text")
    )
    return narrowed.mapInPandas(run, schema).withColumnRenamed("__id", id_col)
