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
from pysparkdb.sources.arrow_s3 import (
    S3Conf,
    arrow_s3_list,
    arrow_s3_read_csv,
    arrow_s3_read_parquet,
    arrow_s3_write_parquet,
)
from pysparkdb.sources.layout import compact_parquet, write_zordered
from pysparkdb.sources.objectstore import (
    configure_s3a,
    hadoop_list_names,
    hadoop_path_exists,
    is_remote_path,
    s3a_confs,
    s3a_session_confs,
)
from pysparkdb.sources.versioned import (
    snapshot_append,
    snapshot_compact,
    snapshot_read,
    snapshot_schema,
    snapshot_stream_sink,
    snapshot_versions,
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
    "compact_parquet",
    "write_zordered",
    "S3Conf",
    "arrow_s3_list",
    "arrow_s3_read_csv",
    "arrow_s3_read_parquet",
    "arrow_s3_write_parquet",
    "configure_s3a",
    "hadoop_list_names",
    "hadoop_path_exists",
    "is_remote_path",
    "s3a_confs",
    "s3a_session_confs",
    "snapshot_append",
    "snapshot_compact",
    "snapshot_read",
    "snapshot_schema",
    "snapshot_stream_sink",
    "snapshot_versions",
]
