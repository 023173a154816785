from .writers import format_console, write_csv, write_parquet

__all__ = ["format_console", "write_csv", "write_parquet"]
