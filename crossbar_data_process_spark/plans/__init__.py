from crossbar_data_process_spark.plans.queries import BENCH_QUERIES, ORACLES, QUERIES

__all__ = ["BENCH_QUERIES", "ORACLES", "QUERIES"]
