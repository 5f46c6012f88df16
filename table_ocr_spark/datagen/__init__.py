from table_ocr_spark.datagen.pages import generate_pages, write_pages_parquet

__all__ = ["generate_pages", "write_pages_parquet"]
