"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with typed metadata structs, processed
through Arrow-batched ``mapInPandas`` — the only sane shape for per-row
decode work at scale (vectorized transfer, no per-row Python overhead,
decode parallelism = partition parallelism).

Codec selection is probed at import (``HAS_PIL`` / ``HAS_SOUNDFILE``):
when a real decoder is installed the non-fake kernels use it; this
container ships none, so ``deterministic_fake=True`` derives a
fake-but-stable (width, height, n_channels, feature vector) from the
payload bytes' hash and the non-fake path raises. The Spark-side
plumbing — schemas, batch iteration, partitioning — is identical in
every mode; swapping codec touches only the per-row loop body.
"""

from __future__ import annotations

import hashlib
import importlib.util
from collections.abc import Iterator

import pandas as pd

# Codec availability probe (import-time, once): when a real decoder is
# present the non-fake kernels use it; otherwise they raise. The fake
# path is unaffected either way, so oracle-checked queries stay stable
# across environments with and without codecs.
HAS_PIL = importlib.util.find_spec("PIL") is not None
HAS_SOUNDFILE = importlib.util.find_spec("soundfile") is not None
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META = StructType(
    [
        StructField("media_type", StringType()),     # image | audio | video
        StructField("format", StringType()),          # png | wav | mp4 | ...
        StructField("byte_len", LongType()),
    ]
)


def attach_binary_payload(
    df: DataFrame, source_col: str, media_type: str = "image", fmt: str = "raw"
) -> DataFrame:
    """Build a binary media column (+ metadata struct) from a source column.

    For real data this is the scan side (``spark.read.format("binaryFile")``
    or a parquet binary column); here we encode a string column so the
    downstream plumbing is exercised with honest binary data.
    """
    payload = F.encode(F.col(source_col), "utf-8").cast(BinaryType())
    meta = F.struct(
        F.lit(media_type).alias("media_type"),
        F.lit(fmt).alias("format"),
        F.octet_length(payload).cast("long").alias("byte_len"),
    )
    return df.withColumn("payload", payload).withColumn("media_meta", meta)


IMAGE_DECODE_SCHEMA = StructType(
    [
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_channels", IntegerType()),
    ]
)


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic fake image header derived from content hash."""
    h = hashlib.sha256(payload).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    channels = 1 + h[2] % 3
    return width, height, channels


def decode_image_stub(
    df: DataFrame,
    payload_col: str = "payload",
    deterministic_fake: bool = False,
) -> DataFrame:
    """Decode header metadata from image bytes via mapInPandas.

    With ``deterministic_fake`` the decode derives stable dimensions from a
    content hash so tests exercise the full batch path. Without it, the
    kernel decodes with PIL when the import probe found it (same output
    schema — only the per-row body differs), else raises
    NotImplementedError (this container ships no image codec).
    """
    out_schema = StructType(df.schema.fields + list(IMAGE_DECODE_SCHEMA.fields))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if deterministic_fake:
                decoded = [_fake_decode(bytes(p)) for p in pdf[payload_col]]
            elif HAS_PIL:
                import io

                from PIL import Image

                decoded = []
                for p in pdf[payload_col]:
                    with Image.open(io.BytesIO(bytes(p))) as im:
                        decoded.append((im.width, im.height, len(im.getbands())))
            else:
                raise NotImplementedError(
                    "image codec not available in this environment; "
                    "pass deterministic_fake=True or install PIL"
                )
            pdf = pdf.copy()
            pdf["width"] = [d[0] for d in decoded]
            pdf["height"] = [d[1] for d in decoded]
            pdf["n_channels"] = [d[2] for d in decoded]
            yield pdf

    from ..operators.util import ensure_parallelism

    # one-row-group scans arrive as ONE partition; a real codec kernel is
    # CPU-bound, so spread batches across cores before the Arrow pass
    return ensure_parallelism(df).mapInPandas(kernel, out_schema)


def extract_image_features(
    df: DataFrame,
    payload_col: str = "payload",
    dim: int = 16,
    deterministic_fake: bool = True,
) -> DataFrame:
    """Per-image feature vector (array<float>) via mapInPandas.

    STUB kernel: hash-derived unit vector (stable per content). A real
    deployment replaces the body with an ONNX/torch embedding call — batch
    shape, Arrow transfer, and output schema stay identical.
    """
    out_schema = StructType(
        df.schema.fields + [StructField("features", ArrayType(FloatType()))]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError("no embedding model in this environment")
            feats = []
            for p in pdf[payload_col]:
                h = hashlib.sha256(bytes(p)).digest()
                raw = [h[i % 32] / 255.0 - 0.5 for i in range(dim)]
                norm = sum(x * x for x in raw) ** 0.5 or 1.0
                feats.append([float(x / norm) for x in raw])
            pdf = pdf.copy()
            pdf["features"] = feats
            yield pdf

    from ..operators.util import ensure_parallelism

    # one-row-group scans arrive as ONE partition; a real codec kernel is
    # CPU-bound, so spread batches across cores before the Arrow pass
    return ensure_parallelism(df).mapInPandas(kernel, out_schema)


AUDIO_DECODE_SCHEMA = StructType(
    [
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("duration_s", DoubleType()),
        StructField("n_windows", IntegerType()),
    ]
)


def decode_audio_stub(
    df: DataFrame,
    payload_col: str = "payload",
    deterministic_fake: bool = False,
) -> DataFrame:
    """Decode audio header metadata (sample rate, sample count, duration,
    1-second analysis-window count) from audio bytes via mapInPandas.

    With ``deterministic_fake`` the header derives stably from the
    content hash (rate) and byte length (samples), so tests and the
    DuckDB oracle replicate it. Without it, the kernel reads the header
    with soundfile when the import probe found it (same output schema),
    else raises NotImplementedError (this container ships no audio
    codec). Batch shape, Arrow transfer and output schema are exactly
    what the real kernel needs."""
    out_schema = StructType(df.schema.fields + list(AUDIO_DECODE_SCHEMA.fields))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rates, nsamps, durs, nwins = [], [], [], []
            if deterministic_fake:
                for p in pdf[payload_col]:
                    b = bytes(p)
                    h = hashlib.sha256(b).digest()
                    rate = 8000 * (1 + h[3] % 5)
                    ns = len(b) * 32
                    rates.append(rate)
                    nsamps.append(ns)
                    durs.append(round(ns / rate, 4))
                    nwins.append((ns + rate - 1) // rate)
            elif HAS_SOUNDFILE:
                import io

                import soundfile as sf

                for p in pdf[payload_col]:
                    info = sf.info(io.BytesIO(bytes(p)))
                    rate, ns = info.samplerate, info.frames
                    rates.append(rate)
                    nsamps.append(ns)
                    durs.append(round(ns / rate, 4))
                    nwins.append((ns + rate - 1) // rate)
            else:
                raise NotImplementedError(
                    "audio codec not available in this environment; "
                    "pass deterministic_fake=True or install soundfile"
                )
            pdf = pdf.copy()
            pdf["sample_rate"] = rates
            pdf["n_samples"] = nsamps
            pdf["duration_s"] = durs
            pdf["n_windows"] = nwins
            yield pdf

    from ..operators.util import ensure_parallelism

    # one-row-group scans arrive as ONE partition; a real codec kernel is
    # CPU-bound, so spread batches across cores before the Arrow pass
    return ensure_parallelism(df).mapInPandas(kernel, out_schema)


def resize_stub(df: DataFrame, width: int, height: int, payload_col: str = "payload") -> DataFrame:
    """Image resize (STUB): passes payload through and records the target
    size in metadata; a real kernel resizes bytes in mapInPandas."""
    return df.withColumn(
        "resize_target",
        F.struct(F.lit(width).alias("width"), F.lit(height).alias("height")),
    )


def frame_sample_stub(
    df: DataFrame, every_n: int = 30, payload_col: str = "payload"
) -> DataFrame:
    """Video frame sampling (STUB): emits deterministic fake frame indices
    (content-hash modulo) as array<int>; a real kernel runs ffmpeg in
    mapInPandas and explodes frames to rows."""
    n_frames = (F.octet_length(F.col(payload_col)) % 270 + 30).cast("int")
    idx = F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
    return df.withColumn("sampled_frames", idx)


PHASH_SCHEMA = StructType(
    [
        StructField("ph_b0", IntegerType()),
        StructField("ph_b1", IntegerType()),
        StructField("ph_b2", IntegerType()),
        StructField("ph_b3", IntegerType()),
    ]
)


def perceptual_hash_stub(
    df: DataFrame,
    payload_col: str = "payload",
    deterministic_fake: bool = True,
) -> DataFrame:
    """64-bit perceptual hash of an image payload as four 16-bit bands,
    via the Arrow/mapInPandas batch path.

    STUB kernel: the 64 bits are content-hash-derived (sha-256 prefix),
    so only byte-identical payloads collide — a REAL deployment replaces
    the body with resize->grayscale->DCT-low-frequency dHash (PIL/cv2,
    absent in this container); batch shape, Arrow transfer, band layout
    and every downstream stage (band blocking, hamming verify,
    clustering) are production-identical. Bands are emitted separately
    because band EQUALITY is the blocking key: two codes within hamming
    distance d collide on >= 1 of 4 bands whenever d <= 3*16 (the
    pigeonhole guarantee banded LSH runs on — x9's SimHash machinery,
    fed from the multimodal lane).
    """
    out_schema = StructType(df.schema.fields + list(PHASH_SCHEMA.fields))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError(
                    "no image codec in this environment; the real kernel "
                    "is resize->DCT dHash over decoded pixels"
                )
            bands: list[list[int]] = [[], [], [], []]
            for p in pdf[payload_col]:
                hx = hashlib.sha256(bytes(p)).hexdigest()
                for b in range(4):
                    bands[b].append(int(hx[4 * b : 4 * b + 4], 16))
            pdf = pdf.copy()
            for b in range(4):
                pdf[f"ph_b{b}"] = bands[b]
            yield pdf

    from ..operators.util import ensure_parallelism

    return ensure_parallelism(df).mapInPandas(kernel, out_schema)
