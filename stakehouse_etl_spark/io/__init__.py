from stakehouse_etl_spark.io.sources import TABLE_NAMES, load_table, load_tables, register_views
from stakehouse_etl_spark.io.sinks import write_insert_ignore, write_upsert

__all__ = [
    "TABLE_NAMES",
    "load_table",
    "load_tables",
    "register_views",
    "write_upsert",
    "write_insert_ignore",
]
