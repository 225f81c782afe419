"""Scalar function library (SURVEY.md §2.8 F1–F11) — pure Column
expressions; zero Python UDFs."""

from crossbar_data_process_spark.functions.ids import (
    add_curie_prefix,
    first_xref,
    sanitize_graph_chars,
    split_list,
    strip_prefix,
    strip_version,
)
from crossbar_data_process_spark.functions.text import (
    doc_fingerprint,
    language_id,
    quality_score,
    token_count,
)

__all__ = [
    "add_curie_prefix",
    "doc_fingerprint",
    "first_xref",
    "language_id",
    "quality_score",
    "sanitize_graph_chars",
    "split_list",
    "strip_prefix",
    "strip_version",
    "token_count",
]
