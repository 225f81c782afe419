"""ID / string normalization functions (SURVEY.md §2.8).

All pure Column expressions — they stay JVM-side inside whole-stage codegen.
Citations point at the reference idioms each replaces.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def split_list(col: Column | str, delim: str = ";") -> Column:
    """F1: decode a delimiter-joined list to a native array, dropping empty
    tokens (reference uniprot.py:53-66 ``;``-lists, ppi.py:114 ``|``-lists).
    Arrays stay native in flight (SURVEY §7.0); re-encode only at export
    with ``F.array_join``."""
    c = F.col(col) if isinstance(col, str) else col
    esc = "\\" + delim if delim in "|.^$*+?()[]{}" else delim
    return F.filter(F.split(c, esc), lambda x: x != "")


def first_xref(col: Column | str, delim: str = ";") -> Column:
    """F2 ``xref_process``: strip trailing delimiter, take the first element
    (reference uniprot.py:37-46, orthology.py:166)."""
    c = F.col(col) if isinstance(col, str) else col
    esc = "\\" + delim if delim in "|.^$*+?()[]{}" else delim
    return F.element_at(F.filter(F.split(c, esc), lambda x: x != ""), 1)


def sanitize_graph_chars(col: Column | str) -> Column:
    """F4: character sanitization for graph import — ``'`` → ``^`` and
    ``|`` → ``,`` (reference ec.py:122,131,140,149; go.py:404;
    phenotype.py:208-215). One ``translate``, not chained replaces."""
    c = F.col(col) if isinstance(col, str) else col
    return F.translate(c, "'|", "^,")


# Bioregistry-style prefix canonicalization (SURVEY §2.8 F6 / §4 custom item
# 3): alias → canonical prefix, keys pre-lowercased (the registry matches
# case-insensitively). A compact snapshot of the COMMON biomedical aliases
# the reference's adapters actually hit through bioregistry's
# ``normalize_curie`` (orthology.py:344-352, ec.py:315-323); user registries
# extend/override via the ``aliases`` parameter. Deliberately a DATA table,
# not per-row library calls — the reference invokes a Python registry
# lookup per identifier; the engine folds the same rules into the plan.
PREFIX_ALIASES: dict[str, str] = {
    "uniprotkb": "uniprot", "swissprot": "uniprot", "sp": "uniprot",
    "geneid": "ncbigene", "entrez": "ncbigene", "entrezgene": "ncbigene",
    "mim": "omim",
    "hpo": "hp",
    "do": "doid",
    "msh": "mesh",
    "react": "reactome",
    "ec-code": "ec", "eccode": "ec", "enzyme": "ec",
    "ipr": "interpro",
    "pubchem": "pubchem.compound", "cid": "pubchem.compound",
    "db": "drugbank",
}


def normalize_prefix(
    col: Column | str, aliases: dict[str, str] | None = None
) -> Column:
    """F6: canonicalize a CURIE prefix — lowercase, then alias → canonical
    through the registry table (``MIM`` → ``omim``, ``GENEID`` →
    ``ncbigene``); unknown prefixes just lowercase (divergence from
    bioregistry, which returns None for unregistered prefixes — a drop
    would silently null out user namespaces). The bounded built-in table
    compiles to a scan-side literal-map lookup — zero join nodes, cheaper
    than even a broadcast join; for a LARGE user registry, join against a
    mapping DataFrame per J4 (`operators/mapping.py`) instead."""
    c = F.col(col) if isinstance(col, str) else col
    table = PREFIX_ALIASES if aliases is None else aliases
    low = F.lower(c)
    pairs: list[Column] = []
    for k, v in table.items():
        pairs += [F.lit(k), F.lit(v)]
    return F.coalesce(F.element_at(F.create_map(*pairs), low), low)


def normalize_curie(
    col: Column | str, sep: str = ":", aliases: dict[str, str] | None = None
) -> Column:
    """F6 ``normalize_curie``: split ``prefix:local`` on the FIRST ``sep``,
    canonicalize the prefix (:func:`normalize_prefix`), keep the local id
    byte-for-byte (so ``GO:0008150``-style locals with embedded colons
    survive). Strings without ``sep`` pass through unchanged; NULL-safe."""
    c = F.col(col) if isinstance(col, str) else col
    has = c.contains(sep)
    pre = F.substring_index(c, sep, 1)
    rest = F.substr(c, F.length(pre) + F.lit(len(sep) + 1))
    return F.when(
        c.isNotNull() & has,
        F.concat_ws(sep, normalize_prefix(pre, aliases), rest),
    ).otherwise(c)


def add_curie_prefix(
    col: Column | str, prefix: str, sep: str = ":", normalize: bool = False
) -> Column:
    """F6 ``add_prefix_to_id``: build a CURIE ``prefix:id``; NULL-safe
    (reference orthology.py:344-352, ec.py:315-323, drug.py:1351-1358 —
    there ``normalize_curie(prefix + sep + id)`` via bioregistry).
    ``normalize=True`` mirrors that exactly; the prefix is a LITERAL, so
    canonicalization happens once at plan-build time (a Python dict
    lookup), never per row."""
    c = F.col(col) if isinstance(col, str) else col
    if normalize:
        prefix = PREFIX_ALIASES.get(prefix.lower(), prefix.lower())
    return F.when(c.isNotNull(), F.concat_ws(sep, F.lit(prefix), c))


def strip_prefix(col: Column | str, sep: str = ":") -> Column:
    """F5: drop a CURIE/namespace prefix — ``split(":")[1]`` idiom
    (reference disease.py:551-555, pathway.py:241)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.element_at(F.split(c, sep), -1)


def strip_version(col: Column | str) -> Column:
    """F5: drop a trailing ``.N`` version suffix — ``split(".")[0]``
    (reference kegg_local.py:745-748 ENSG version strip)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.element_at(F.split(c, "\\."), 1)


def clean_number(col: Column | str) -> Column:
    """F7: parse ints with thousands separators — ``int(mass.replace(",",""))``
    (reference uniprot.py:127-133)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, ",", "").cast("long")
