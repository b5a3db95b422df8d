from mapreduce_implementation_spark.sources.catalog import TABLES, load_table, register_views
from mapreduce_implementation_spark.sources.text_source import read_text_keyed

__all__ = ["TABLES", "load_table", "register_views", "read_text_keyed"]
