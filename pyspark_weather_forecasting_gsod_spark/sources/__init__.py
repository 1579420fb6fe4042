from .io import TABLE_SCHEMAS, load_table, read_csv, write_parquet  # noqa: F401
