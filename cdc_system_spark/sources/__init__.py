from cdc_system_spark.sources.catalog import TABLES, TableCatalog, load_table

__all__ = ["TABLES", "TableCatalog", "load_table"]
