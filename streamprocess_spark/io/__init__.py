from streamprocess_spark.io.tables import load_tables, register_views, table_path

__all__ = ["load_tables", "register_views", "table_path"]
