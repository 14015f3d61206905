"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as `binary` columns with a metadata struct;
decode / feature-extraction runs as Arrow-batched pandas functions over
mapInPandas — the schema, partitioning, UDF signature and batch shape are
real and tested. The actual codec calls are STUBBED (this container has no
image/audio libraries): `decode_image` raises NotImplementedError unless the
deterministic fake decoder is requested, exactly as flagged in the build
brief.

At 100 TB: binary payloads dominate partition sizing — repartition by
byte-budget (maxRecordsPerFile / maxPartitionBytes), never by row count, and
keep metadata in sidecar columns so filters prune without touching bytes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: schema of the per-payload metadata struct
MEDIA_META = T.StructType(
    [
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_md5", T.StringType()),
        T.StructField("media_type", T.StringType()),
    ]
)

BINARY_WITH_META = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", MEDIA_META),
    ]
)


def to_binary_column(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Pack a source column as an opaque binary payload (UTF-8 here; in
    production the bytes come off object storage). JVM-side encode."""
    return df.select(
        "doc_id", F.encode(F.col(text_col), "UTF-8").alias("payload")
    )


def extract_metadata(df: DataFrame) -> DataFrame:
    """mapInPandas metadata extraction over binary payloads.

    Arrow-batched: each pandas batch holds ~10k payloads; per-batch python
    cost is amortized. Output is (doc_id, payload, meta) with a typed meta
    struct — the real multimodal plumbing shape.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [
                {
                    "n_bytes": len(p),
                    "content_md5": hashlib.md5(p).hexdigest(),
                    "media_type": "text/plain",
                }
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": pdf["payload"], "meta": meta}
            )

    return df.mapInPandas(extract, schema=BINARY_WITH_META)


def decode_image(df: DataFrame, fake: bool = False) -> DataFrame:
    """Decode binary payloads to fixed-size feature vectors.

    STUB: no image libraries in this container. ``fake=True`` runs a
    deterministic stand-in (first-16-bytes histogram) through the identical
    mapInPandas plumbing — schema, batching and partitioning are the real
    thing; only the codec call is fake. ``fake=False`` raises.
    """
    if not fake:
        raise NotImplementedError(
            "image decode requires PIL/libvips — not available in this "
            "container; call with fake=True for the deterministic stand-in"
        )

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("features", T.ArrayType(T.DoubleType())),
        ]
    )

    def fake_decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                [float(b) / 255.0 for b in bytes(p[:16]).ljust(16, b"\0")]
                for p in pdf["payload"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": feats})

    return df.mapInPandas(fake_decode, schema=out_schema)
