"""File sources and sinks (reference §2.2 scan/source surface)."""

from pysparkdb.sources.files import (
    read_csv,
    read_json,
    read_orc,
    read_parquet,
    scan,
    write_bucketed,
    write_csv,
    write_json,
    write_orc,
    write_parquet,
)

__all__ = [
    "read_csv",
    "read_json",
    "read_orc",
    "read_parquet",
    "scan",
    "write_bucketed",
    "write_csv",
    "write_json",
    "write_orc",
    "write_parquet",
]
