"""Document deduplication for training-data pipelines: exact, n-gram
Jaccard, MinHash+LSH, SimHash (engine extension; SURVEY.md §7.1 step 7).

Design for 100 TB:
- exact dedup = fingerprint + hash-groupBy (one shuffle on a 16-byte key);
- near-dup never does an O(n²) cross join — candidate pairs come from an
  inverted-index self-join (shared shingle) or LSH band buckets, both of
  which shuffle on small keys and exploit AQE skew splitting for stop-shingle
  hot buckets;
- all hashing is md5-based (bit-exact across engines) so every step has a
  DuckDB oracle; xxhash64 would be faster but engine-specific.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from crossbar_data_process_spark.functions.text import doc_fingerprint, tokens

# deterministic odd constants for the MinHash permutation family
# h_i(x) = (A_i * x + B_i) mod P  over 32-bit md5-derived shingle hashes.
# A_i < 2^31 so A*h <= (2^31-1)(2^32-1) < 2^63 — no int64 overflow under ANSI
_P = (1 << 61) - 1
_A = [1103515245, 668265263, 374761393, 1299709, 15485863, 32452843,
      49979687, 67867967, 86028121, 104395301, 122949823, 141650939]
_B = [97, 193, 389, 769, 1543, 3079, 6151, 12289, 24593, 49157, 98317, 196613]


def _hash32(c: Column) -> Column:
    """32-bit integer hash of a string via md5 prefix — bit-exact in any
    engine that has md5 (DuckDB oracle parity; see oracle_sql)."""
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


def shingles(text_col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingle set (distinct, as strings joined by space)."""
    toks = tokens(text_col)
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " "))
    )


def dedup_exact(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: group by content fingerprint, keep the lowest id
    (deterministic representative). Returns the surviving (id, fingerprint)."""
    return (
        docs.withColumn("fp", doc_fingerprint(text_col))
        .groupBy("fp")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("dup_count"))
    )


def _shingle_index(docs: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    """Inverted index (shingle → doc) plus per-doc shingle counts."""
    with_sh = docs.select(
        F.col(id_col).alias("doc"), shingles(text_col, n).alias("sh")
    ).withColumn("nsh", F.size("sh"))
    return with_sh


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via inverted-index self-join.

    |A∩B| is computed distributed: explode shingles, self-join on shingle,
    count per pair; |A∪B| = |A|+|B|−|A∩B|. Only pairs sharing ≥1 shingle are
    ever materialized — at scale this is the standard candidate-generation
    join (shuffle keyed on shingle hash; stop-shingle skew handled by AQE).
    Returns (doc_a < doc_b, jaccard) above ``threshold``.
    """
    idx = _shingle_index(docs, text_col, id_col, n)
    ex = idx.select("doc", "nsh", F.explode("sh").alias("s"))
    a = ex.alias("a")
    b = ex.alias("b")
    pairs = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            F.col("a.nsh").alias("na"),
            F.col("b.nsh").alias("nb"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
    return pairs


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 12,
) -> DataFrame:
    """MinHash signature per document: k independent linear permutations over
    32-bit shingle hashes, min per permutation. Pure Column expressions
    (transform + array_min) — no UDF, no shuffle."""
    assert num_hashes <= len(_A)
    sh = F.col("sh")
    hashed = F.transform(sh, lambda s: _hash32(s))
    sig = F.array(
        *[
            F.array_min(
                F.transform(hashed, lambda h: (F.lit(_A[i]) * h + F.lit(_B[i])) % F.lit(_P))
            ).alias(f"m{i}")
            for i in range(num_hashes)
        ]
    )
    return (
        docs.select(F.col(id_col).alias("doc"), shingles(text_col, n).alias("sh"))
        .filter(F.size("sh") > 0)
        .select("doc", sig.alias("sig"))
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 12,
    bands: int = 6,
    threshold: float = 0.2,
) -> DataFrame:
    """MinHash-LSH near-dup candidates, verified with exact Jaccard.

    signatures → band keys (rows_per_band hashes concatenated) → explode →
    self-join per (band, key) bucket → exact-Jaccard verify on candidates.
    At scale: the bucket join shuffles on band-key (uniform by construction);
    candidate verification touches only bucket-collision pairs, never n².
    """
    r = num_hashes // bands
    sigs = minhash_signatures(docs, text_col, id_col, n, num_hashes)
    band_arr = F.array(
        *[
            F.struct(
                F.lit(bi).alias("band"),
                F.concat_ws("_", *[F.element_at("sig", bi * r + j + 1) for j in range(r)]).alias("key"),
            )
            for bi in range(bands)
        ]
    )
    buckets = sigs.select("doc", F.explode(band_arr).alias("bk")).select(
        "doc", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
    a = buckets.alias("a")
    b = buckets.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )
    # exact verify: join shingle sets back on and compute true jaccard
    idx = _shingle_index(docs, text_col, id_col, n).select(
        "doc", "sh", "nsh"
    )
    ia = idx.select(F.col("doc").alias("doc_a"), F.col("sh").alias("sh_a"), F.col("nsh").alias("na"))
    ib = idx.select(F.col("doc").alias("doc_b"), F.col("sh").alias("sh_b"), F.col("nsh").alias("nb"))
    out = (
        cand.join(ia, "doc_a")
        .join(ib, "doc_b")
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
    return out


def simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 32) -> DataFrame:
    """SimHash fingerprint: per-token 32-bit md5 hash; for each bit position,
    sum +1/−1 over tokens (with multiplicity); sign vector → integer
    fingerprint. Near-dup = small Hamming distance between fingerprints.
    Pure expressions: one transform per doc + a per-bit fold, no shuffle."""
    toks = tokens(text_col)
    hashed = F.transform(toks, lambda t: _hash32(t))
    def bit_sum(j: int) -> Column:
        return F.aggregate(
            hashed,
            F.lit(0).cast("long"),
            lambda acc, h: acc + F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )
    fingerprint = None
    for j in range(bits):
        bit = F.when(bit_sum(j) > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, j)
        fingerprint = term if fingerprint is None else fingerprint + term
    return docs.select(
        F.col(id_col).alias("doc"), fingerprint.alias("simhash")
    )
