from ibc_spark.io_.sources import TABLES, load_tables, read_table

__all__ = ["TABLES", "load_tables", "read_table"]
