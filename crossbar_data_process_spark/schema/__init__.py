from crossbar_data_process_spark.schema.registry import SchemaRegistry

__all__ = ["SchemaRegistry"]
