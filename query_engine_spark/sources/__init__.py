from query_engine_spark.sources.testdata import TABLES, load_table, load_tables, posts_view

__all__ = ["TABLES", "load_table", "load_tables", "posts_view"]
