from data_pipeline_cursor_spark.sources.tables import load_table, table_path

__all__ = ["load_table", "table_path"]
