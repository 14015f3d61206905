"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as `binary` columns with a metadata struct;
decode / feature-extraction runs as Arrow-batched pandas functions over
mapInPandas — the schema, partitioning, UDF signature and batch shape are
real and tested. The actual codec calls are soft dependencies (this
container ships no image/audio libraries): each entry point probes for the
real library at call time (`_codec`) and uses it when present; with no
library and ``fake=False`` it raises NotImplementedError, exactly as
flagged in the build brief. ``fake=True`` always runs the deterministic
stand-in — the test contract — through the identical Arrow plumbing.

At 100 TB: binary payloads dominate partition sizing — repartition by
byte-budget (maxRecordsPerFile / maxPartitionBytes), never by row count, and
keep metadata in sidecar columns so filters prune without touching bytes.
"""

from __future__ import annotations

import hashlib
import importlib
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


def _codec(*modules: str):
    """Soft-dependency probe: first importable module from ``modules``, or
    None. Called on the DRIVER at plan time to pick the real codec path
    when the library exists (executors share the container image, so a
    driver-side probe is authoritative); the real decode then imports
    inside the mapInPandas closure on each executor."""
    for m in modules:
        try:
            return importlib.import_module(m)
        except ImportError:
            continue
    return None


def _require_codec(feature: str, *modules: str) -> None:
    """Probe-or-raise for the real decode path — one consistent message
    for every entry point's soft-dependency contract."""
    if _codec(*modules) is None:
        raise NotImplementedError(
            f"{feature} requires one of {modules} — not available in this "
            "container; call with fake=True for the deterministic stand-in "
            "(the real path activates automatically once the library is "
            "installed)"
        )


def _byte_sample(raw: bytes, n: int) -> list[int]:
    """Deterministic nearest-neighbor byte sampling: n byte values spread
    over the payload. THE shared rule — fake_resize and image_ahash both
    route through it, which is what lets image_ahash's docstring promise
    'the same sampling as resize_image' and the oracles reproduce either
    from SQL (substr at the same positions). Empty payloads sample as
    zeros (ascii('') = 0 in the oracle)."""
    if not raw:
        return [0] * n
    step = max(len(raw) // n, 1)
    last = len(raw) - 1
    return [raw[min(i * step, last)] for i in range(n)]


def to_binary_column(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Pack a source column as an opaque binary payload (UTF-8 here; in
    production the bytes come off object storage). JVM-side encode; the
    input is rebalanced to the session's shuffle parallelism so downstream
    Arrow-batched python stages get even, parallel batches (a single
    parquet file otherwise feeds one python worker)."""
    n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return df.repartition(n).select(
        "doc_id", F.encode(F.col(text_col), "UTF-8").alias("payload")
    )


def extract_metadata(df: DataFrame) -> DataFrame:
    """mapInPandas metadata extraction over binary payloads.

    Arrow-batched: each pandas batch holds ~10k payloads; per-batch python
    cost is amortized. Output is (doc_id, payload, meta) with a typed meta
    struct — the real multimodal plumbing shape. NULL payloads (a NULL
    source text, a failed upstream fetch) yield a NULL meta struct, the
    1→1 convention every extractor here follows — Arrow hands them to
    pandas as None, and len()/md5() would otherwise throw executor-side.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [
                None
                if p is None
                else {
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

    Soft codec dependency: with ``fake=False`` the call probes for PIL and,
    when present, decodes for real (grayscale 16-bin histogram features);
    without it, raises. ``fake=True`` runs the deterministic stand-in
    (first-16-bytes histogram) through the identical mapInPandas plumbing —
    schema, batching and partitioning are the real thing either way.
    """
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("features", T.ArrayType(T.DoubleType())),
        ]
    )

    if not fake:
        _require_codec("image decode", "PIL.Image")

        def real_decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import io

            import numpy as np
            from PIL import Image

            for pdf in batches:
                feats = []
                for p in pdf["payload"]:
                    if p is None:
                        feats.append(None)
                        continue
                    img = Image.open(io.BytesIO(bytes(p))).convert("L")
                    h, _ = np.histogram(
                        np.asarray(img), bins=16, range=(0, 256)
                    )
                    feats.append((h / max(h.sum(), 1)).tolist())
                yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": feats})

        return df.mapInPandas(real_decode, schema=out_schema)

    def fake_decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                None
                if p is None
                else [float(b) / 255.0 for b in bytes(p[:16]).ljust(16, b"\0")]
                for p in pdf["payload"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": feats})

    return df.mapInPandas(fake_decode, schema=out_schema)


def resize_image(df: DataFrame, width: int = 4, height: int = 4,
                 fake: bool = False) -> DataFrame:
    """Resize binary image payloads to width×height pixel grids.

    Soft codec dependency (same contract as decode_image): ``fake=False``
    probes for PIL and, when present, resamples for real (grayscale
    nearest-neighbor to width×height); without it, raises. ``fake=True``
    produces a deterministic byte-sampled grid through the real mapInPandas
    plumbing — output schema carries the same typed (width, height, pixels)
    shape either way.
    """
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("pixels", T.ArrayType(T.DoubleType())),
        ]
    )
    if width <= 0 or height <= 0:
        # eager driver-side validation (layout.py convention): fail before
        # any job launches, not as a task traceback inside the executor
        raise ValueError(f"width/height must be positive, got {width}x{height}")
    npx = width * height

    if not fake:
        _require_codec("image resize", "PIL.Image")

        def real_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import io

            import numpy as np
            from PIL import Image

            for pdf in batches:
                pixels = []
                for p in pdf["payload"]:
                    if p is None:
                        pixels.append(None)
                        continue
                    img = (
                        Image.open(io.BytesIO(bytes(p)))
                        .convert("L")
                        .resize((width, height), Image.NEAREST)
                    )
                    pixels.append(
                        (np.asarray(img, dtype=np.float64).ravel() / 255.0).tolist()
                    )
                yield pd.DataFrame(
                    {"doc_id": pdf["doc_id"], "width": width,
                     "height": height, "pixels": pixels}
                )

        return df.mapInPandas(real_resize, schema=out_schema)

    def fake_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pixels = [
                None
                if p is None
                else [b / 255.0 for b in _byte_sample(bytes(p), npx)]
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": width,
                    "height": height,
                    "pixels": pixels,
                }
            )

    return df.mapInPandas(fake_resize, schema=out_schema)


def decode_audio(df: DataFrame, fake: bool = False) -> DataFrame:
    """Audio feature extraction (RMS energy, zero-crossing count) from
    binary payloads.

    Soft codec dependency: ``fake=False`` probes for soundfile and, when
    present, decodes for real (RMS + zero-crossings over the decoded
    mono float samples); without it, raises. ``fake=True`` treats the
    bytes as signed 8-bit samples CENTERED at 64 (sample = int8 − 64)
    through the real mapInPandas plumbing — deterministic,
    numpy-vectorized per Arrow batch. The centering matters: raw ASCII
    text bytes are all positive, so an uncentered fake would make the
    zero-crossing count a constant 0 on any text corpus — a sign-change
    kernel that never sees a sign change proves nothing (the round-8
    vacuity lens); 64 sits mid-printable-range, so ordinary text
    alternates sign and the counter does real work.
    """
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("rms", T.DoubleType()),
            T.StructField("zero_crossings", T.LongType()),
        ]
    )

    if not fake:
        _require_codec("audio decode", "soundfile")

        def real_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import io

            import numpy as np
            import soundfile as sf

            for pdf in batches:
                rms, zc = [], []
                for p in pdf["payload"]:
                    if p is None:
                        rms.append(None); zc.append(None)
                        continue
                    x, _sr = sf.read(io.BytesIO(bytes(p)), dtype="float64")
                    if x.ndim > 1:  # downmix to mono
                        x = x.mean(axis=1)
                    if x.size == 0:
                        rms.append(0.0); zc.append(0)
                        continue
                    rms.append(float(np.sqrt(np.mean(x * x))))
                    zc.append(int(np.sum(np.signbit(x[1:]) != np.signbit(x[:-1]))))
                yield pd.DataFrame(
                    {"doc_id": pdf["doc_id"], "rms": rms, "zero_crossings": zc}
                )

        return df.mapInPandas(real_features, schema=out_schema)

    def fake_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rms, zc = [], []
            for p in pdf["payload"]:
                if p is None:
                    rms.append(None); zc.append(None)
                    continue
                x = (
                    np.frombuffer(bytes(p), dtype=np.int8).astype(np.float64)
                    - 64.0
                )
                if x.size == 0:
                    rms.append(0.0); zc.append(0)
                    continue
                rms.append(float(np.sqrt(np.mean(x * x))))
                zc.append(int(np.sum(np.signbit(x[1:]) != np.signbit(x[:-1]))))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "rms": rms, "zero_crossings": zc})

    return df.mapInPandas(fake_features, schema=out_schema)


def sample_frames(df: DataFrame, num_frames: int = 3, fake: bool = False) -> DataFrame:
    """Sample N frames from binary video payloads — 1→N row fan-out.

    Soft codec dependency: ``fake=False`` probes for PyAV and, when
    present, samples num_frames evenly-spaced decoded frames (raw RGB
    bytes); without it, raises. ``fake=True`` slices the payload into
    num_frames equal chunks through the real mapInPandas plumbing (the
    batch shape that matters at scale: one input row yields several output
    rows, so downstream partition sizing must budget for the fan-out).
    """
    if num_frames <= 0:
        # eager driver-side validation: the fake path would otherwise hit
        # len//0 executor-side while the real path silently emitted no rows
        raise ValueError(f"num_frames must be positive, got {num_frames}")
    if not fake:
        _require_codec("video frame sampling", "av")

        real_schema = T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("frame_idx", T.IntegerType()),
                T.StructField("frame", T.BinaryType()),
            ]
        )

        def real_sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import io

            import av

            def targets(n):
                # evenly spaced over [0, n): endpoints included when
                # num_frames > 1; short videos repeat frames so every
                # decodable doc emits EXACTLY num_frames rows (the
                # fan-out contract downstream partition sizing uses)
                return [
                    min(
                        round(i * (n - 1) / (num_frames - 1))
                        if num_frames > 1 else 0,
                        n - 1,
                    )
                    for i in range(num_frames)
                ]

            for pdf in batches:
                ids, idxs, frames = [], [], []
                for did, p in zip(pdf["doc_id"], pdf["payload"]):
                    if p is None:
                        continue  # 1→N convention: NULL payload, zero rows
                    with av.open(io.BytesIO(bytes(p))) as container:
                        stream = container.streams.video[0]
                        # Frame count from stream metadata when the
                        # container carries it; otherwise one counting
                        # decode pass (frames DISCARDED as counted), then
                        # seek back. Never hold every decoded frame — a
                        # few minutes of 1080p is thousands of full RGB
                        # frames, far beyond the Arrow worker's memory.
                        n = stream.frames
                        if not n:
                            n = sum(1 for _ in container.decode(video=0))
                            container.seek(0)
                        if not n:
                            # undecodable/empty video: zero rows, the one
                            # documented divergence from the fake path's
                            # always-num_frames fan-out
                            continue
                        wanted = targets(n)
                        sampled = dict.fromkeys(wanted)  # ≤ num_frames held
                        for pos, frame in enumerate(container.decode(video=0)):
                            if pos in sampled:
                                sampled[pos] = frame.to_ndarray(
                                    format="rgb24"
                                ).tobytes()
                            if pos >= wanted[-1]:
                                break
                        for i, t in enumerate(wanted):
                            if sampled[t] is not None:
                                ids.append(did)
                                idxs.append(i)
                                frames.append(sampled[t])
                yield pd.DataFrame(
                    {"doc_id": ids, "frame_idx": idxs, "frame": frames}
                )

        return df.mapInPandas(real_sample, schema=real_schema)

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def fake_sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for did, p in zip(pdf["doc_id"], pdf["payload"]):
                if p is None:
                    continue  # 1→N convention: NULL payload, zero rows
                raw = bytes(p)
                chunk = max(len(raw) // num_frames, 1)
                for i in range(num_frames):
                    ids.append(did)
                    idxs.append(i)
                    # last frame absorbs the remainder: frames partition the
                    # payload exactly (Σ octet_length(frame) == n_bytes)
                    hi = (i + 1) * chunk if i < num_frames - 1 else len(raw)
                    frames.append(raw[i * chunk : hi])
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    return df.mapInPandas(fake_sample, schema=out_schema)


def chunk_audio(
    df: DataFrame, window_bytes: int = 1024, hop_bytes: int = 512,
    fake: bool = False,
) -> DataFrame:
    """Split binary audio payloads into overlapping fixed-byte windows
    with per-window RMS — the framing step before any spectral feature
    (the audio twin of text.chunk_text). 1→N row fan-out.

    Soft codec dependency (same contract as decode_audio): ``fake=False``
    probes for soundfile and, when present, windows the DECODED mono
    samples (window_bytes/hop_bytes then count samples, start_byte the
    sample offset); without it, raises. ``fake=True`` treats the bytes as
    signed 8-bit samples through the real mapInPandas plumbing,
    numpy-vectorized per Arrow batch. Window starts are 0, hop, 2·hop, … —
    every payload yields at least one (possibly short) window, and
    partition sizing must budget for the len/hop fan-out like
    sample_frames.
    """
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("window_id", T.LongType()),
            T.StructField("start_byte", T.LongType()),
            T.StructField("n_bytes", T.LongType()),
            T.StructField("rms", T.DoubleType()),
        ]
    )

    if window_bytes <= 0 or hop_bytes <= 0:
        # eager driver-side validation: range(0, n, 0) would otherwise
        # raise executor-side, after the job launched
        raise ValueError(
            f"window_bytes/hop_bytes must be positive, got "
            f"{window_bytes}/{hop_bytes}"
        )
    if not fake:
        _require_codec("audio framing", "soundfile")

        def real_chunks(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import io

            import numpy as np
            import soundfile as sf

            for pdf in batches:
                ids, wids, starts, sizes, rms = [], [], [], [], []
                for did, p in zip(pdf["doc_id"], pdf["payload"]):
                    if p is None:
                        continue  # 1→N convention: NULL payload, zero rows
                    x, _sr = sf.read(io.BytesIO(bytes(p)), dtype="float64")
                    if x.ndim > 1:
                        x = x.mean(axis=1)
                    n = max(x.size, 1)
                    w = 0
                    for start in range(0, n, hop_bytes):
                        seg = x[start : start + window_bytes]
                        ids.append(did); wids.append(w); starts.append(start)
                        sizes.append(int(seg.size))
                        rms.append(
                            float(np.sqrt(np.mean(seg * seg))) if seg.size else 0.0
                        )
                        w += 1
                        if start + window_bytes >= n:
                            break
                yield pd.DataFrame(
                    {"doc_id": ids, "window_id": wids, "start_byte": starts,
                     "n_bytes": sizes, "rms": rms}
                )

        return df.mapInPandas(real_chunks, schema=out_schema)

    def fake_chunks(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, wids, starts, sizes, rms = [], [], [], [], []
            for did, p in zip(pdf["doc_id"], pdf["payload"]):
                if p is None:
                    continue  # 1→N convention: NULL payload, zero rows
                x = np.frombuffer(bytes(p), dtype=np.int8).astype(np.float64)
                n = max(x.size, 1)
                w = 0
                for start in range(0, n, hop_bytes):
                    seg = x[start : start + window_bytes]
                    ids.append(did); wids.append(w); starts.append(start)
                    sizes.append(int(seg.size))
                    rms.append(float(np.sqrt(np.mean(seg * seg))) if seg.size else 0.0)
                    w += 1
                    if start + window_bytes >= n:
                        break
            yield pd.DataFrame(
                {"doc_id": ids, "window_id": wids, "start_byte": starts,
                 "n_bytes": sizes, "rms": rms}
            )

    return df.mapInPandas(fake_chunks, schema=out_schema)


def image_ahash(df: DataFrame, npx: int = 64, fake: bool = False) -> DataFrame:
    """Perceptual average-hash over image payloads — the image-side dedup
    primitive (aHash: downsample, threshold each pixel against the image
    mean, emit the bit string). Near-identical images (recompressions,
    tiny edits) collide; grouping on the hash is perceptual dedup at
    corpus scale: one Arrow-batched pass + a 64-char-key group-by, never
    pairwise image comparison.

    STUB contract (decode_image/resize_image family): ``fake=True``
    byte-samples the payload through the same deterministic
    nearest-neighbor rule as resize_image — real mapInPandas plumbing,
    numpy-vectorized per batch — and thresholds the raw byte values
    against their exact mean (integer sums in float64; mean = sum/64 is
    exact, so the bits are engine-reproducible); ``fake=False`` probes
    for PIL and runs the REAL aHash when present (grayscale resample to
    √npx × √npx, threshold vs mean), raising only when no codec exists.
    Returns (doc_id, ahash) with ahash a ``npx``-char '0'/'1' string (a
    packed int64 would lose the top bit to the sign at npx=64).
    """
    import numpy as np

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("ahash", T.StringType()),
        ]
    )

    if npx <= 0:
        raise ValueError(f"npx must be positive, got {npx}")
    if not fake:
        _require_codec("image hashing", "PIL.Image")
        side = int(npx ** 0.5)
        grid = (side, side) if side * side == npx else (npx, 1)

        def real_hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import io

            import numpy as np
            from PIL import Image

            for pdf in batches:
                hashes = []
                for p in pdf["payload"]:
                    if p is None:
                        hashes.append(None)
                        continue
                    img = (
                        Image.open(io.BytesIO(bytes(p)))
                        .convert("L")
                        .resize(grid, Image.LANCZOS)
                    )
                    b = np.asarray(img, dtype=np.float64).ravel()
                    bits = b > b.mean()
                    hashes.append("".join("1" if x else "0" for x in bits))
                yield pd.DataFrame({"doc_id": pdf["doc_id"], "ahash": hashes})

        return df.mapInPandas(real_hash, schema=out_schema)

    def hash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = []
            for p in pdf["payload"]:
                if p is None:
                    hashes.append(None)
                    continue
                # empty payloads byte-sample as zeros (0 > 0 is False),
                # giving the all-zero hash the oracle derives from
                # ascii('') = 0 at every sampled position
                b = np.array(_byte_sample(bytes(p), npx), dtype=np.float64)
                bits = b > b.mean()
                hashes.append("".join("1" if x else "0" for x in bits))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "ahash": hashes})

    return df.mapInPandas(hash_batch, schema=out_schema)
