from .writers import (
    compact_parquet,
    format_console,
    write_clustered_parquet,
    write_csv,
    write_parquet,
    write_zordered_parquet,
    zorder_value,
)

__all__ = [
    "compact_parquet",
    "format_console",
    "write_clustered_parquet",
    "write_csv",
    "write_parquet",
    "write_zordered_parquet",
    "zorder_value",
]
