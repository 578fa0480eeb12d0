from .io import latest_file, read_csv, read_table, write_csv, write_parquet

__all__ = ["latest_file", "read_csv", "read_table", "write_csv", "write_parquet"]
