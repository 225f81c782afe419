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


def add_curie_prefix(col: Column | str, prefix: str, sep: str = ":") -> Column:
    """F6 ``add_prefix_to_id``: build a CURIE ``prefix:id``; NULL-safe
    (reference orthology.py:344-352, ec.py:315-323, drug.py:1351-1358 —
    there via bioregistry ``normalize_curie``; prefix normalization rules are
    a precomputed mapping table in the engine, not a per-row library call)."""
    c = F.col(col) if isinstance(col, str) else col
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
