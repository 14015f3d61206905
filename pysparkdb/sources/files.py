"""File readers/writers: CSV (configurable delimiter, gzip/bz2), Parquet.

Reference surface being re-expressed (all file:line into /root/reference):

- CSV with configurable delimiter: fpdb-tuple/include/fpdb/tuple/csv/
  CSVFormat.h:12 (fieldSeparator, default '|' for TPC-H data).
- gzip/bz2-compressed CSV: fpdb-executor/src/physical/s3/SelectPOp.cpp:112-135
  (CompressionType GZIP/BZIP2) and fpdb-tuple/include/fpdb/tuple/arrow/
  ArrowGzipInputStream.h. Spark's CSV reader infers both codecs from the
  file extension — no explicit option needed.
- Parquet: fpdb-tuple/include/fpdb/tuple/parquet/ParquetReader.h.
- Pushdown scan (SELECT cols FROM object WHERE pred): fpdb-executor/src/
  physical/s3/SelectPOp.cpp + SQL generation in transform/
  PrePToS3PTransformer.cpp:463-469 — in Spark the same contract is "express
  projection+filter on the raw scan and let Catalyst push them down";
  ``scan()`` packages that and the pushdown is auditable via
  pysparkdb.plans.pushdown.assert_pushdown.
- Sink: the reference only returns results to the client
  (fpdb-main/src/Client.cpp:104-110); writers here are the documented free
  upgrade (SURVEY §2.2).

Scale notes: schemas are always declared (never inferSchema — a 100 TB CSV
inference pass is a full extra read); readers return splittable scans
(Spark splits plain CSV and parquet by spark.sql.files.maxPartitionBytes;
gzip is non-splittable per-file, so compressed corpora should be many
files — same constraint the reference has with per-object S3 GETs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import types as T


# Written timestamps carry the full microsecond fraction: Spark's own
# default CSV/JSON write pattern is [.SSS] — silently truncating to
# milliseconds on a write→read round trip — while the repo's versioned /
# as-of machinery guarantees exact integer-microsecond semantics. The
# READERS deliberately set no timestampFormat at all: a pinned pattern
# makes PERMISSIVE mode NULL every value it doesn't match (sub-second,
# ISO 'T'-separated), whereas Spark's lenient default parse accepts
# space- or T-separated text with any fraction length — including
# exactly what the writers below emit.
_WRITE_TS_FORMAT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    delimiter: str = "|",
    header: bool = False,
    null_value: str | None = None,
    timestamp_format: str | None = None,
) -> DataFrame:
    """Declared-schema CSV scan (CSVFormat.h semantics: explicit separator,
    no inference). gzip/bz2 files are decoded transparently by extension.
    ``timestamp_format`` pins a non-standard source pattern (e.g.
    ``dd/MM/yyyy HH:mm``); leave None for Spark's lenient default, which
    parses space- and T-separated forms with any sub-second fraction."""
    reader = (
        spark.read.schema(schema)
        .option("sep", delimiter)
        .option("header", str(header).lower())
    )
    if timestamp_format is not None:
        reader = reader.option("timestampFormat", timestamp_format)
    if null_value is not None:
        reader = reader.option("nullValue", null_value)
    return reader.csv(path)


def read_parquet(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    merge_schema: bool = False,
) -> DataFrame:
    """Parquet scan; optional declared schema (projection enforced at the
    footer level — extra on-disk columns are simply never read).

    ``merge_schema=True`` unions the schemas of every footer in the scan —
    the schema-evolution read path: a corpus written over months gains
    columns, and old files surface the new columns as NULL instead of
    failing or silently dropping them. Off by default because the merge
    reads every footer up front (on a 100 TB corpus that is millions of
    footer GETs); evolved corpora should either declare the superset
    schema explicitly (footer-read-free) or pay the merge knowingly."""
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    if schema is not None:
        return reader.schema(schema).parquet(path)
    return reader.parquet(path)


def scan(
    df: DataFrame,
    columns: list[str] | None = None,
    predicate: Column | None = None,
) -> DataFrame:
    """FilterableScan (SelectPOp shape): SELECT <columns> WHERE <predicate>
    expressed directly over the source relation so Catalyst pushes the
    filter into the scan and prunes unread columns. Equivalent of the
    reference's generated `select <cols> from s3Object where <pred>`
    (PrePToS3PTransformer.cpp:463-469)."""
    out = df
    if predicate is not None:
        out = out.filter(predicate)
    if columns is not None:
        out = out.select(*columns)
    return out


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    compression: str = "snappy",
) -> None:
    """Parquet sink. partition_by produces hive-style directory partitioning
    — the write-side half of partition pruning: a reader filtering on the
    partition column scans only matching directories (the dynamic analog of
    the reference's zone-map pruning, PartitionPruner.cpp:23-52)."""
    w = df.write.mode(mode).option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    delimiter: str = "|",
    header: bool = False,
    compression: str | None = None,
    timestamp_format: str = _WRITE_TS_FORMAT,
) -> None:
    """CSV sink with the same format knobs as the reader. Timestamps keep
    their full microsecond fraction by default (see _WRITE_TS_FORMAT), so
    write_csv → read_csv round-trips exactly."""
    w = (
        df.write.mode(mode)
        .option("sep", delimiter)
        .option("header", str(header).lower())
        .option("timestampFormat", timestamp_format)
    )
    if compression is not None:
        w = w.option("compression", compression)
    w.csv(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    timestamp_format: str | None = None,
) -> DataFrame:
    """Declared-schema JSON-lines scan (beyond-ref format; the reference
    reads only CSV and parquet, fpdb-tuple/include/fpdb/tuple/csv/CSVFormat.h
    + parquet/ParquetReader.h — JSON is a free upgrade via Spark's native
    reader). Schema is always declared: at 100 TB an inference pass is a
    full extra read, and silent type drift between files is a correctness
    hazard. JSON-lines is splittable, so the scan parallelizes per
    spark.sql.files.maxPartitionBytes like CSV; gzip members are
    per-file-serial, same caveat as the CSV reader above.
    ``timestamp_format``: same contract as read_csv (None = lenient
    default parse)."""
    reader = spark.read.schema(schema)
    if timestamp_format is not None:
        reader = reader.option("timestampFormat", timestamp_format)
    return reader.json(path)


def write_json(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    compression: str | None = None,
    timestamp_format: str = _WRITE_TS_FORMAT,
) -> None:
    """JSON-lines sink (one object per line — the splittable layout).
    Microsecond-exact timestamps by default, as write_csv."""
    w = df.write.mode(mode).option("timestampFormat", timestamp_format)
    if compression is not None:
        w = w.option("compression", compression)
    w.json(path)


def read_orc(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """ORC scan (beyond-ref columnar format; same declared-schema contract
    as read_parquet — ORC carries stripe-level min/max statistics, so the
    same predicate-pushdown/row-group-skip economics as parquet apply)."""
    if schema is not None:
        return spark.read.schema(schema).orc(path)
    return spark.read.orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    compression: str = "snappy",
) -> None:
    """ORC sink; partition_by gives hive-style directory pruning exactly as
    write_parquet does."""
    w = df.write.mode(mode).option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def write_bucketed(
    df,
    table: str,
    num_buckets: int,
    bucket_cols: list[str],
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed (hash-clustered) table sink — the co-located-join layout.

    Two tables bucketed the same way on their join key hash-join WITHOUT
    any Exchange: the shuffle the reference always pays per join
    (transform/PrePToPTransformer.cpp:708-762 shuffles both inputs every
    query) is paid ONCE at write time and amortized over every subsequent
    join/aggregation on the bucket key — at 100 TB the single biggest
    recurring cost a layout decision can delete. ``sort_cols`` pre-sorts
    within buckets (sort-merge joins skip their sort too). Requires
    saveAsTable (bucket metadata lives in the session catalog);
    ``path`` makes it an external table at that location.
    """
    w = df.write.bucketBy(num_buckets, *bucket_cols).mode(mode)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)
