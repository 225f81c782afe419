"""crossbar_data_process_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of HUBioDataLab/CROssBAR-Data-Process.

The reference (/root/reference) is a pandas-based biomedical KG data-processing
layer; this package re-expresses its dataflow operators (SURVEY.md §2) as
idiomatic Spark DataFrame transformations, designed for a multi-executor
cluster at 100 TB scale:

- everything is declarative DataFrame/SQL so Catalyst handles pushdown,
  pruning, join selection, and AQE handles skew/coalescing at runtime;
- small mapping/dimension tables broadcast (reference: driver-side dicts);
- arrays are native ``ArrayType`` in flight; the reference's ``;``/``|``
  string encodings exist only at ingest/export boundaries;
- no row-at-a-time Python UDFs in any hot path — the X1–X9 dialect
  (SURVEY.md §2.9) is implemented with Column expressions only.
"""

from crossbar_data_process_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
