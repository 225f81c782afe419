"""Source/sink layer (SURVEY.md §2.1 S1–S8).

The reference's downloads (pypath REST/FTP crawls, S1–S3) are ingestion
jobs *outside* the query engine: they land raw payloads in a bronze
directory, and everything after that is ``spark.read``. This package covers
the Spark-side surface: tabular readers (parquet/csv/json/text with explicit
schemas), the KEGG-style flat-text record parser as DataFrame expressions,
and sinks (parquet gold layer, chunked CSV, BioCypher tuple iterator).
"""

from crossbar_data_process_spark.sources.readers import (
    read_table,
    read_testdata,
)
from crossbar_data_process_spark.sources.writers import (
    biocypher_tuples,
    write_chunked_csv,
    write_gold,
)

__all__ = [
    "biocypher_tuples",
    "read_table",
    "read_testdata",
    "write_chunked_csv",
    "write_gold",
]
