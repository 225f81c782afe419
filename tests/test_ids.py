"""ID/CURIE functions (functions/ids.py) — bioregistry-style prefix
canonicalization mirroring the reference's ``add_prefix_to_id`` →
``normalize_curie`` idiom (orthology.py:344-352, ec.py:315-323)."""

from __future__ import annotations

from pyspark.sql import functions as F

from crossbar_data_process_spark.functions.ids import (
    PREFIX_ALIASES,
    add_curie_prefix,
    normalize_curie,
    normalize_prefix,
)


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0].v


def test_normalize_curie_alias_and_case(spark):
    cases = {
        "UniProt:P12345": "uniprot:P12345",  # case only
        "GENEID:672": "ncbigene:672",  # alias -> canonical
        "MIM:154700": "omim:154700",
        "EC-CODE:1.1.1.1": "ec:1.1.1.1",
        "FooDB:9": "foodb:9",  # unknown prefix: lowercase, keep
        "noprefix": "noprefix",  # no sep: pass through untouched
        "GO:GO:0008150": "go:GO:0008150",  # local id kept byte-for-byte
    }
    for raw, want in cases.items():
        assert _one(spark, normalize_curie(F.lit(raw))) == want, raw


def test_normalize_curie_null_safe(spark):
    assert _one(spark, normalize_curie(F.lit(None).cast("string"))) is None


def test_normalize_prefix_custom_registry_overrides(spark):
    got = _one(
        spark, normalize_prefix(F.lit("MYDB"), aliases={"mydb": "canonical"})
    )
    assert got == "canonical"
    # built-in table no longer consulted under a custom registry
    assert _one(
        spark, normalize_prefix(F.lit("MIM"), aliases={"mydb": "canonical"})
    ) == "mim"


def test_add_curie_prefix_normalize_is_plan_time(spark):
    # the reference idiom: normalize_curie(prefix + ":" + id) — here the
    # literal prefix canonicalizes ONCE at plan build, never per row
    col = add_curie_prefix(F.lit("P04637"), "UniProtKB", normalize=True)
    assert _one(spark, col) == "uniprot:P04637"
    # default stays verbatim (the testdata contract's plain concat)
    assert _one(spark, add_curie_prefix(F.lit("7"), "supplier")) == "supplier:7"
    # NULL id -> NULL, with or without normalization
    assert _one(
        spark,
        add_curie_prefix(F.lit(None).cast("string"), "MIM", normalize=True),
    ) is None


def test_alias_table_is_canonical_closed(spark):
    # every canonical target must not itself be a registered alias —
    # normalization must be idempotent in one pass
    for canon in set(PREFIX_ALIASES.values()):
        assert canon not in PREFIX_ALIASES, canon


def test_large_registry_path_via_broadcast_map(spark):
    """The scale path the docs prescribe for BIG user registries: the alias
    table as a mapping DataFrame joined per J4 (broadcast_map), equivalent
    to the literal-map normalize_prefix on the same rules."""
    from crossbar_data_process_spark.operators.mapping import broadcast_map

    rules = [(k, v) for k, v in PREFIX_ALIASES.items()]
    mapping = spark.createDataFrame(rules, "alias string, canon string")
    docs = spark.createDataFrame(
        [("MIM", "154700"), ("UniProt", "P04637"), ("FooDB", "9")],
        "pre string, local string",
    )
    joined = broadcast_map(
        docs.withColumn("pre_low", F.lower("pre")),
        mapping,
        on=[("pre_low", "alias")],
        value_col="canon",
        out_col="canon",
        broadcast=True,
    ).select(
        "pre",
        "local",
        F.concat_ws(
            ":", F.coalesce("canon", F.col("pre_low")), F.col("local")
        ).alias("curie"),
    )
    got = {r.pre: r.curie for r in joined.collect()}
    want = {
        r.pre: r.curie
        for r in docs.select(
            "pre",
            normalize_curie(F.concat_ws(":", "pre", "local")).alias("curie"),
        ).collect()
    }
    assert got == want == {
        "MIM": "omim:154700",
        "UniProt": "uniprot:P04637",
        "FooDB": "foodb:9",
    }


# ------------------------------------------------- URL canonicalization (r07)
def test_canonicalize_url_collapses_equivalent_forms(spark):
    from crossbar_data_process_spark.functions.urls import canonicalize_url

    forms = [
        "HTTP://Example.COM/Path/Page?a=1&utm_source=x#frag",
        "https://example.com:443/Path/Page?a=1",
        "https://example.com/Path/Page?a=1&fbclid=abc",
        " https://example.com/Path/Page/?a=1&gclid=z ",
    ]
    df = spark.createDataFrame([(u,) for u in forms], "url string")
    got = {r.c for r in df.select(canonicalize_url("url").alias("c")).collect()}
    assert got == {"https://example.com/Path/Page?a=1"}, got


def test_canonicalize_url_preserves_distinctions(spark):
    """Different pages stay different: path CASE, real query params, and
    hosts are all semantic."""
    from crossbar_data_process_spark.functions.urls import canonicalize_url

    urls = [
        "https://example.com/page?a=1",
        "https://example.com/page?a=2",
        "https://example.com/PAGE?a=1",
        "https://other.com/page?a=1",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    assert df.select(canonicalize_url("url").alias("c")).distinct().count() == 4


def test_canonicalize_url_tracking_match_is_anchored(spark):
    """Parameter names CONTAINING a tracking name (href=, xref=) and path
    segments like Amazon's /ref=sr_1 are NOT tracking params — an
    unanchored match collided distinct pages into one dedup key (found in
    r7 review: '?href=abc' and '?href=zzz' both canonicalized to '?h')."""
    from crossbar_data_process_spark.functions.urls import canonicalize_url

    urls = [
        "https://ex.com/?href=abc",
        "https://ex.com/?href=zzz",
        "https://ex.com/?xref=1",
        "https://ex.com/?xref=2",
        "https://ex.com/dp/B01/ref=sr_1?k=shoes",
        "https://ex.com/dp/B01/ref=x9?k=hats",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [r.c for r in df.select(canonicalize_url("url").alias("c")).collect()]
    # every page stays distinct…
    assert len(set(got)) == len(urls), got
    # …and the non-tracking params survive verbatim
    assert "https://ex.com?href=abc" in got
    assert "https://ex.com/dp/B01/ref=sr_1?k=shoes" in got
    # while REAL tracking params (?&-anchored) still strip cleanly,
    # including consecutive ones and mid-string ones
    tracked = [
        "https://ex.com/p?utm_a=1&utm_b=2&k=3",
        "https://ex.com/p?k=3&utm_a=1&utm_b=2",
        "https://ex.com/p?utm_a=1&k=3&ref=feed",
    ]
    df2 = spark.createDataFrame([(u,) for u in tracked], "url string")
    got2 = {r.c for r in df2.select(canonicalize_url("url").alias("c")).collect()}
    assert got2 == {"https://ex.com/p?k=3"}, got2


def test_url_host_extraction(spark):
    from crossbar_data_process_spark.functions.urls import url_host

    rows = [
        ("https://WWW.Example.com/x", "example.com"),
        ("http://sub.domain.org:8080/path", "sub.domain.org"),
        ("not a url", None),
    ]
    df = spark.createDataFrame([(u,) for u, _ in rows], "url string")
    got = [r.h for r in df.select(url_host("url").alias("h")).collect()]
    assert got == [want for _, want in rows]


def test_canonical_url_is_jvm_side(spark):
    from crossbar_data_process_spark.functions.urls import canonicalize_url, url_host

    df = spark.createDataFrame([("https://a.com/x",)], "url string")
    plan = (
        df.select(canonicalize_url("url"), url_host("url"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan and "Arrow" not in plan
