"""Multimodal column plumbing (binary media + typed metadata).

Media (image/audio/video) are opaque ``binary`` columns with a typed
metadata struct; the Spark-side plumbing — schema, batching, partition
sizing, UDF signatures — is real and tested, while the actual
decode/resample kernels are STUBBED (the codec libraries are not in
this container): ``decode_image_meta`` parses only magic-number headers
deterministically (magic sniff + real PNG/GIF/JPEG header-dimension
parsing — pure byte arithmetic, no codec needed), and
``extract_features`` raises NotImplementedError unless handed a
``kernel``.

Scale shape: media rows are large and skewed → ``mapInPandas`` with
small Arrow batches (``spark.sql.execution.arrow.maxRecordsPerBatch``),
repartition by size bucket upstream, and NEVER collect blobs to the
driver.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("blob", BinaryType()),
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
    ]
)

_MAGIC = [
    (b"\x89PNG\r\n\x1a\n", "png"),
    (b"\xff\xd8\xff", "jpeg"),
    (b"GIF87a", "gif"),
    (b"GIF89a", "gif"),
    (b"RIFF", "riff"),  # wav/avi container
    (b"ID3", "mp3"),
]


def sniff_format(blob: bytes | None) -> str | None:
    if not blob:
        return None
    for magic, name in _MAGIC:
        if blob.startswith(magic):
            return name
    return "unknown"


def png_dimensions(blob: bytes) -> tuple[int | None, int | None]:
    """Header-only PNG dimensions (IHDR at fixed offset) — deterministic
    metadata extraction without a codec library."""
    if blob and blob.startswith(b"\x89PNG\r\n\x1a\n") and len(blob) >= 24:
        w = int.from_bytes(blob[16:20], "big")
        h = int.from_bytes(blob[20:24], "big")
        return w, h
    return None, None


def gif_dimensions(blob: bytes) -> tuple[int | None, int | None]:
    """GIF logical-screen dimensions (little-endian at fixed offset)."""
    if blob and blob[:6] in (b"GIF87a", b"GIF89a") and len(blob) >= 10:
        w = int.from_bytes(blob[6:8], "little")
        h = int.from_bytes(blob[8:10], "little")
        return w, h
    return None, None


def jpeg_dimensions(blob: bytes) -> tuple[int | None, int | None]:
    """JPEG dimensions from the first SOF segment (marker scan —
    header-only, no entropy decode)."""
    if not blob or not blob.startswith(b"\xff\xd8"):
        return None, None
    i = 2
    n = len(blob)
    while i + 9 <= n:  # SOF reads up to blob[i+8]
        if blob[i] != 0xFF:
            i += 1
            continue
        marker = blob[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2  # standalone marker, no length
            continue
        seg_len = int.from_bytes(blob[i + 2 : i + 4], "big")
        # SOF0..SOF15 except DHT(C4)/JPG(C8)/DAC(CC)
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            h = int.from_bytes(blob[i + 5 : i + 7], "big")
            w = int.from_bytes(blob[i + 7 : i + 9], "big")
            return w, h
        i += 2 + seg_len
    return None, None


def media_dimensions(blob: bytes | None) -> tuple[int | None, int | None]:
    """Dispatch header-dimension extraction by sniffed format."""
    fmt = sniff_format(blob)
    if fmt == "png":
        return png_dimensions(blob)
    if fmt == "gif":
        return gif_dimensions(blob)
    if fmt == "jpeg":
        return jpeg_dimensions(blob)
    return None, None


def decode_image_meta(df: DataFrame, blob_col: str = "blob") -> DataFrame:
    """Arrow-batched metadata pass: format sniff + header dims + size.

    This is the real plumbing a decode stage uses; swapping the header
    parser for an actual codec is a one-function change inside the same
    mapInPandas shape.
    """
    out_schema = StructType(
        [f for f in df.schema.fields]
        + [
            StructField("format", StringType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("n_bytes", LongType()),
        ]
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            fmts, ws, hs, ns = [], [], [], []
            for blob in pdf[blob_col]:
                b = bytes(blob) if blob is not None else None
                fmts.append(sniff_format(b))
                w, h = media_dimensions(b) if b else (None, None)
                ws.append(w)
                hs.append(h)
                ns.append(len(b) if b is not None else None)
            pdf = pdf.copy()
            pdf["format"] = fmts
            pdf["width"] = pd.array(ws, dtype="Int32")
            pdf["height"] = pd.array(hs, dtype="Int32")
            pdf["n_bytes"] = pd.array(ns, dtype="Int64")
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def extract_features(
    df: DataFrame,
    kernel: Callable | None = None,
    blob_col: str = "blob",
    out_dim: int = 8,
) -> DataFrame:
    """Feature-extraction stage: blob → array<float> embedding.

    ``kernel(bytes) -> list[float]`` supplies the actual model/codec;
    without one this raises (decode libs absent in this container).
    Tests inject a deterministic fake kernel to exercise the full
    Spark path: schema, Arrow batching, null handling.
    """
    if kernel is None:
        raise NotImplementedError(
            "media feature extraction needs a kernel; codec/model libraries "
            "are not available in this environment — inject kernel=... "
        )
    out_schema = StructType(
        [f for f in df.schema.fields]
        + [StructField("features", ArrayType(FloatType()))]
    )

    def run(batches: Iterator) -> Iterator:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["features"] = [
                (kernel(bytes(b)) if b is not None else None) for b in pdf[blob_col]
            ]
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def frame_sample_plan(
    df: DataFrame, every_n: int = 10, bytes_per_frame: int = 1000
) -> DataFrame:
    """Video frame-sampling *plan* stub: emits (media_id, frame_index)
    rows for frames a decoder would materialize — demonstrates the
    explode shape without a codec.  ``bytes_per_frame`` stands in for
    the container's frame count until a real demuxer is injected."""
    n_frames = (
        F.coalesce(F.length(F.col("blob")), F.lit(0)) / bytes_per_frame
    ).cast("int")
    return df.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), F.greatest(n_frames, F.lit(1)) - 1, F.lit(every_n))).alias(
            "frame_index"
        ),
    )


def wav_meta(blob: bytes | None) -> tuple[int | None, int | None, int | None]:
    """(channels, sample_rate, n_samples) from RIFF/WAVE chunks —
    header-only byte walk, no audio decode.

    ``n_samples`` = data-chunk byte length / block align; duration_s =
    n_samples / sample_rate downstream.  Returns NULLs for anything
    that is not a well-formed WAVE.
    """
    if not blob or len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        return None, None, None
    channels = rate = block_align = None
    data_len = None
    i = 12
    n = len(blob)
    while i + 8 <= n:
        cid = blob[i : i + 4]
        clen = int.from_bytes(blob[i + 4 : i + 8], "little")
        body = blob[i + 8 : i + 8 + clen]
        if cid == b"fmt " and len(body) >= 16:
            channels = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            block_align = int.from_bytes(body[12:14], "little")
        elif cid == b"data":
            data_len = clen
        i += 8 + clen + (clen % 2)  # chunks are word-aligned
    n_samples = (
        data_len // block_align
        if data_len is not None and block_align
        else None
    )
    return channels, rate, n_samples


AUDIO_META_SCHEMA_FIELDS = [
    StructField("channels", IntegerType()),
    StructField("sample_rate", IntegerType()),
    StructField("n_samples", LongType()),
]


def decode_audio_meta(df: DataFrame, blob_col: str = "blob") -> DataFrame:
    """Arrow-batched WAVE metadata pass — same mapInPandas shape as
    ``decode_image_meta``; a real resample/transcode kernel drops into
    the same stage."""
    out_schema = StructType(
        [f for f in df.schema.fields] + AUDIO_META_SCHEMA_FIELDS
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            chs, rates, samps = [], [], []
            for blob in pdf[blob_col]:
                b = bytes(blob) if blob is not None else None
                c, r, s = wav_meta(b)
                chs.append(c)
                rates.append(r)
                samps.append(s)
            pdf = pdf.copy()
            pdf["channels"] = pd.array(chs, dtype="Int32")
            pdf["sample_rate"] = pd.array(rates, dtype="Int32")
            pdf["n_samples"] = pd.array(samps, dtype="Int64")
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    kernel: Callable | None = None,
    blob_col: str = "blob",
) -> DataFrame:
    """Image-resize stage: blob → resized blob + recorded target dims.

    ``kernel(bytes, w, h) -> bytes`` supplies the actual decoder/
    resampler (PIL/opencv — absent in this container, so without one
    this raises, mirroring ``extract_features``).  The Spark side —
    Arrow batching, null passthrough, output schema with the recorded
    target dimensions — is real and tested with an injected kernel.
    """
    if kernel is None:
        raise NotImplementedError(
            "image resize needs a kernel; codec libraries are not "
            "available in this environment — inject kernel=..."
        )
    out_schema = StructType(
        [f for f in df.schema.fields]
        + [
            StructField("resized", BinaryType()),
            StructField("out_width", IntegerType()),
            StructField("out_height", IntegerType()),
        ]
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            resized = [
                (kernel(bytes(b), width, height) if b is not None else None)
                for b in pdf[blob_col]
            ]
            pdf = pdf.copy()
            pdf["resized"] = resized
            pdf["out_width"] = pd.array(
                [width if b is not None else None for b in resized],
                dtype="Int32",
            )
            pdf["out_height"] = pd.array(
                [height if b is not None else None for b in resized],
                dtype="Int32",
            )
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def wav_pcm16(blob: bytes | None):
    """Mono int16 PCM samples from a RIFF/WAVE blob (numpy array), or
    None if the blob is not well-formed 16-bit PCM.  The chunk walk
    mirrors :func:`wav_meta`; this is the first kernel in the family
    that reads the SAMPLE BYTES, not just headers."""
    import numpy as np

    if not blob or len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        return None
    bits = None
    data = None
    i = 12
    n = len(blob)
    while i + 8 <= n:
        cid = blob[i : i + 4]
        clen = int.from_bytes(blob[i + 4 : i + 8], "little")
        body = blob[i + 8 : i + 8 + clen]
        if cid == b"fmt " and len(body) >= 16:
            bits = int.from_bytes(body[14:16], "little")
        elif cid == b"data":
            data = body
        i += 8 + clen + (clen % 2)
    if bits != 16 or data is None:
        return None
    return np.frombuffer(data[: len(data) - (len(data) % 2)], dtype="<i2")


AUDIO_ENERGY_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_frames", LongType()),
        StructField("total_energy", LongType()),
        StructField("peak_frame", LongType()),
        StructField("peak_energy", LongType()),
    ]
)


def audio_frame_energy(
    df: DataFrame, blob_col: str = "blob", frame: int = 256
) -> DataFrame:
    """Per-document PCM frame-energy pass: decode int16 samples
    (numpy, Arrow-batched), square-sum per ``frame``-sample window,
    emit exact integer totals and the peak frame (ties to the lower
    index).  This is the real decode-and-compute multimodal shape —
    the same mapInPandas stage a loudness/VAD/spectral kernel runs in;
    all outputs are exact int64 (|s| < 2^15 so a frame's energy is
    < 2^38), which is what makes the pass oracle-checkable.
    """
    import numpy as np
    import pandas as pd

    def run(batches):
        for pdf in batches:
            out = []
            for doc_id, b in zip(pdf["doc_id"], pdf[blob_col]):
                s = wav_pcm16(bytes(b) if b is not None else None)
                if s is None or len(s) == 0:
                    out.append((doc_id, 0, 0, None, None))
                    continue
                sq = s.astype(np.int64) ** 2
                n_frames = (len(sq) + frame - 1) // frame
                pad = n_frames * frame - len(sq)
                if pad:
                    sq = np.concatenate([sq, np.zeros(pad, dtype=np.int64)])
                per = sq.reshape(n_frames, frame).sum(axis=1)
                peak = int(per.argmax())  # argmax returns FIRST max: tie→lower
                out.append(
                    (
                        doc_id,
                        n_frames,
                        int(sq.sum()),
                        peak,
                        int(per[peak]),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id",
                    "n_frames",
                    "total_energy",
                    "peak_frame",
                    "peak_energy",
                ],
            )

    return df.select("doc_id", blob_col).mapInPandas(
        run, schema=AUDIO_ENERGY_SCHEMA
    )


def bmp_pixels(blob: bytes | None):
    """Top-down H×W×3 RGB uint8 array from an uncompressed 24-bit BMP
    blob (numpy), or None if the blob is not well-formed BI_RGB 24bpp.
    Handles the real layout traps: 4-byte row padding, bottom-up row
    order, and BGR channel order — the second kernel in the family
    that reads SAMPLE bytes (images), after the WAV PCM one."""
    import numpy as np

    if not blob or len(blob) < 54 or blob[:2] != b"BM":
        return None
    off = int.from_bytes(blob[10:14], "little")
    width = int.from_bytes(blob[18:22], "little", signed=True)
    height = int.from_bytes(blob[22:26], "little", signed=True)
    bpp = int.from_bytes(blob[28:30], "little")
    compression = int.from_bytes(blob[30:34], "little")
    if bpp != 24 or compression != 0 or width <= 0 or height == 0:
        return None
    h = abs(height)
    stride = ((3 * width + 3) // 4) * 4
    data = blob[off : off + stride * h]
    if len(data) < stride * h:
        return None
    rows = np.frombuffer(data, dtype=np.uint8).reshape(h, stride)
    bgr = rows[:, : 3 * width].reshape(h, width, 3)
    if height > 0:  # positive height = bottom-up storage
        bgr = bgr[::-1]
    return bgr[:, :, ::-1]  # BGR → RGB


IMAGE_LUMINANCE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_tiles", LongType()),
        StructField("total_lum", LongType()),
        StructField("peak_tile", LongType()),
        StructField("peak_lum", LongType()),
    ]
)


def image_tile_luminance(
    df: DataFrame, blob_col: str = "blob", tile: int = 8
) -> DataFrame:
    """Per-image tiled luminance pass: decode 24-bit BMP pixels (numpy,
    Arrow-batched), integer Rec.709 luminance per pixel
    (2126·R + 7152·G + 722·B — weights ×10⁴ so everything stays exact
    int64), sum per ``tile``×``tile`` tile (row-major tile ids,
    partial edge tiles zero-padded), and emit the total, the tile
    count, and the peak tile (ties to the lower tile id).  Same
    mapInPandas shape as audio_frame_energy — the stage a real
    thumbnail/blur/OCR-precheck kernel occupies; exact int64 outputs
    are what make the pass oracle-checkable.
    """
    import numpy as np
    import pandas as pd

    def run(batches):
        for pdf in batches:
            out = []
            for doc_id, b in zip(pdf["doc_id"], pdf[blob_col]):
                rgb = bmp_pixels(bytes(b) if b is not None else None)
                if rgb is None or rgb.size == 0:
                    out.append((doc_id, 0, 0, None, None))
                    continue
                lum = (
                    2126 * rgb[:, :, 0].astype(np.int64)
                    + 7152 * rgb[:, :, 1].astype(np.int64)
                    + 722 * rgb[:, :, 2].astype(np.int64)
                )
                h, w = lum.shape
                th = (h + tile - 1) // tile
                tw = (w + tile - 1) // tile
                padded = np.zeros((th * tile, tw * tile), dtype=np.int64)
                padded[:h, :w] = lum
                per = (
                    padded.reshape(th, tile, tw, tile)
                    .sum(axis=(1, 3))
                    .reshape(-1)
                )  # row-major tile ids
                peak = int(per.argmax())  # first max: tie → lower id
                out.append(
                    (doc_id, th * tw, int(lum.sum()), peak, int(per[peak]))
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id",
                    "n_tiles",
                    "total_lum",
                    "peak_tile",
                    "peak_lum",
                ],
            )

    return df.select("doc_id", blob_col).mapInPandas(
        run, schema=IMAGE_LUMINANCE_SCHEMA
    )


IMAGE_TILE_VECTOR_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("img_w", LongType()),
        StructField("img_h", LongType()),
        StructField("tile_sums", ArrayType(LongType())),
    ]
)


def image_tile_vector(
    df: DataFrame, blob_col: str = "blob", tile: int = 8
) -> DataFrame:
    """Per-image tile-luminance VECTOR (row-major int64 sums, partial
    edge tiles zero-padded) plus the decoded dimensions — the
    fingerprint-ready form of :func:`image_tile_luminance` (which
    reduces the same vector to totals).  Feeds perceptual-dedup
    bucketing: coarse-quantize each tile sum and group."""
    import numpy as np
    import pandas as pd

    def run(batches):
        for pdf in batches:
            out = []
            for doc_id, b in zip(pdf["doc_id"], pdf[blob_col]):
                rgb = bmp_pixels(bytes(b) if b is not None else None)
                if rgb is None or rgb.size == 0:
                    out.append((doc_id, 0, 0, None))
                    continue
                lum = (
                    2126 * rgb[:, :, 0].astype(np.int64)
                    + 7152 * rgb[:, :, 1].astype(np.int64)
                    + 722 * rgb[:, :, 2].astype(np.int64)
                )
                h, w = lum.shape
                th = (h + tile - 1) // tile
                tw = (w + tile - 1) // tile
                padded = np.zeros((th * tile, tw * tile), dtype=np.int64)
                padded[:h, :w] = lum
                per = (
                    padded.reshape(th, tile, tw, tile)
                    .sum(axis=(1, 3))
                    .reshape(-1)
                )
                out.append((doc_id, w, h, [int(x) for x in per]))
            yield pd.DataFrame(
                out, columns=["doc_id", "img_w", "img_h", "tile_sums"]
            )

    return df.select("doc_id", blob_col).mapInPandas(
        run, schema=IMAGE_TILE_VECTOR_SCHEMA
    )
