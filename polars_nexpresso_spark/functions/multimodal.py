"""Multimodal (image/audio/video) column plumbing.

Media is carried as opaque ``binary`` columns with a typed metadata struct —
the standard large-scale layout (payload bytes stay columnar in parquet;
metadata prunes without touching blobs). Decode / feature-extraction /
resize / frame-sampling run as Arrow-batched ``mapInPandas`` stages: the
Spark-side contract (schemas, batching, partition-preserving execution) is
real and tested.

Codec policy: **image decode is real when Pillow is importable**
(``fake=False`` decodes/resizes/features via PIL); without Pillow the real
path raises a clear ``NotImplementedError`` and the deterministic fake
implementation remains available — it derives output purely from the bytes
so results are reproducible and oracle-checkable (``octet_length``-style
features). **Audio decode is real for PCM WAV** via the stdlib ``wave``
module (``decode_audio``) — sample rate / channels / duration / RMS;
compressed audio (mp3/flac/ogg) would need soundfile/ffmpeg and raises the
same clear ``NotImplementedError``. **Video decode is real for
uncompressed RGB24 AVI** (``decode_video``): RIFF container parse via
stdlib ``struct`` plus raw-frame pixel decode via numpy — no codec
library needed, exactly the PCM-WAV policy; compressed streams use
imageio/PyAV when importable and raise ``NotImplementedError`` otherwise.

Scale notes: ``mapInPandas`` streams Arrow batches through one Python worker
per core with no shuffle; blob columns should be pruned before any wide
transform (select the binary column only inside the decode stage).
"""

from __future__ import annotations

from collections.abc import Iterator

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

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("content", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("format", StringType()),
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("n_bytes", LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("byte_mean", FloatType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def attach_media_meta(
    df: DataFrame, content_col: str, media_format: str
) -> DataFrame:
    """Wrap a raw binary column with the typed metadata struct."""
    return df.withColumn(
        "meta",
        F.struct(
            F.lit(media_format).alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.octet_length(F.col(content_col)).cast("long").alias("n_bytes"),
        ),
    )


def pil_available() -> bool:
    """True when Pillow is importable (checked on the driver; executors in
    the same environment see the same installation)."""
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def _require_codec(name: str):
    raise NotImplementedError(
        f"Real {name} decoding requires a codec library "
        "(Pillow for images; ffmpeg/soundfile for audio/video) that is not "
        "available in this environment. Pass fake=True for the deterministic "
        "byte-derived implementation."
    )


DECODE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mode", StringType()),
        StructField("n_bytes", LongType()),
    ]
)

RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("content", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def extract_features(
    df: DataFrame,
    *,
    id_col: str = "media_id",
    content_col: str = "content",
    n_features: int = 8,
    fake: bool = True,
) -> DataFrame:
    """Feature-extract each blob via Arrow-batched ``mapInPandas``.

    ``fake=True`` derives features purely from the bytes (length, mean byte
    value, per-stripe byte means) — deterministic, SQL-oracle-checkable.
    ``fake=False`` decodes each blob as an image with Pillow and computes
    the same shape over grayscale PIXELS (mean luminance + per-stripe
    means); raises ``NotImplementedError`` when Pillow is not installed.
    """
    if not fake and not pil_available():
        _require_codec("image")

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import numpy as np
        import pandas as pd

        if not fake:
            from PIL import Image
            import io

        for pdf in batches:
            out_rows = []
            for mid, blob in zip(pdf[id_col], pdf[content_col]):
                blob = blob or b""
                if fake:
                    arr = np.frombuffer(blob, dtype=np.uint8)
                else:
                    img = Image.open(io.BytesIO(blob)).convert("L")
                    arr = np.asarray(img, dtype=np.uint8).ravel()
                n = int(arr.size) if fake else len(blob)
                mean = float(arr.mean()) if arr.size else 0.0
                stripes = np.array_split(arr, n_features) if arr.size else []
                feats = [float(s.mean()) if s.size else 0.0 for s in stripes]
                feats += [0.0] * (n_features - len(feats))
                out_rows.append((int(mid), n, mean, feats))
            yield pd.DataFrame(
                out_rows, columns=["media_id", "n_bytes", "byte_mean", "features"]
            )

    return df.select(F.col(id_col), F.col(content_col)).mapInPandas(
        gen, schema=FEATURE_SCHEMA
    )


def decode_image(
    df: DataFrame,
    *,
    id_col: str = "media_id",
    content_col: str = "content",
    fake: bool = False,
) -> DataFrame:
    """Decode image blobs to ``(media_id, width, height, mode, n_bytes)``.

    Real path (default): Pillow header decode — cheap (no full raster for
    most formats) and the right first stage before any size/aspect filter.
    ``fake=True``: deterministic byte-derived dimensions for plumbing tests
    in codec-less environments.
    """
    if not fake and not pil_available():
        _require_codec("image")

    def gen(batches):
        import pandas as pd

        if not fake:
            from PIL import Image
            import io

        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[content_col]):
                blob = blob or b""
                if fake:
                    # Deterministic fake dims derived from content length.
                    w = len(blob) % 64 + 1
                    h = len(blob) % 48 + 1
                    rows.append((int(mid), w, h, "FAKE", len(blob)))
                else:
                    img = Image.open(io.BytesIO(blob))
                    rows.append(
                        (int(mid), img.width, img.height, img.mode, len(blob))
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "mode", "n_bytes"]
            )

    return df.select(F.col(id_col), F.col(content_col)).mapInPandas(
        gen, schema=DECODE_SCHEMA
    )


def resize_images(
    df: DataFrame,
    *,
    id_col: str = "media_id",
    content_col: str = "content",
    max_side: int = 256,
    fake: bool = False,
) -> DataFrame:
    """Thumbnail each image blob to fit ``max_side`` and re-encode as PNG.

    Real path: Pillow ``thumbnail`` (aspect-preserving). ``fake=True``
    emulates the 1→1 blob-transform shape by stride-sampling the bytes to at
    most ``max_side**2`` and reporting square fake dims — keeps the
    pipeline testable without codecs.
    """
    if not fake and not pil_available():
        _require_codec("image")

    def gen(batches):
        import pandas as pd

        if not fake:
            from PIL import Image
            import io

        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[content_col]):
                blob = blob or b""
                if fake:
                    stride = max(1, len(blob) // (max_side * max_side))
                    out = blob[::stride]
                    side = min(max_side, int(len(out) ** 0.5) or 1)
                    rows.append((int(mid), out, side, side))
                else:
                    img = Image.open(io.BytesIO(blob))
                    img.thumbnail((max_side, max_side))
                    buf = io.BytesIO()
                    img.save(buf, format="PNG")
                    rows.append((int(mid), buf.getvalue(), img.width, img.height))
            yield pd.DataFrame(
                rows, columns=["media_id", "content", "width", "height"]
            )

    return df.select(F.col(id_col), F.col(content_col)).mapInPandas(
        gen, schema=RESIZE_SCHEMA
    )


AUDIO_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("duration_sec", DoubleType()),
        StructField("rms", DoubleType()),
    ]
)

WAV_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("content", BinaryType()),
    ]
)


def synth_wav(
    df: DataFrame,
    *,
    id_col: str = "media_id",
    sample_rate: int = 8000,
    n_base: int = 100,
    n_mod: int = 50,
) -> DataFrame:
    """Deterministic 8-bit mono PCM WAV blob per row (test/demo source).

    Sample ``i`` of row ``id`` is ``(id*31 + i*7) % 256`` over
    ``n_base + id % n_mod`` samples — a closed form a SQL oracle can
    replay, so the REAL ``decode_audio`` path (header parse + PCM
    normalize + RMS) is hash-checkable end to end without audio files in
    the testdata.
    """

    def gen(batches):
        import io
        import wave

        import pandas as pd

        for pdf in batches:
            rows = []
            for mid in pdf[id_col]:
                mid = int(mid)
                n = n_base + mid % n_mod
                samples = bytes((mid * 31 + i * 7) % 256 for i in range(n))
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(1)
                    w.setframerate(sample_rate)
                    w.writeframes(samples)
                rows.append((mid, buf.getvalue()))
            yield pd.DataFrame(rows, columns=["media_id", "content"])

    return df.select(F.col(id_col)).mapInPandas(gen, schema=WAV_SCHEMA)


def decode_audio(
    df: DataFrame,
    *,
    id_col: str = "media_id",
    content_col: str = "content",
    audio_format: str = "wav",
    fake: bool = False,
) -> DataFrame:
    """Decode audio blobs to
    ``(media_id, sample_rate, n_channels, n_samples, duration_sec, rms)``.

    Real path (default, ``audio_format="wav"``): stdlib ``wave`` parse of
    PCM WAV — 8-bit unsigned / 16-bit / 32-bit signed PCM normalized to
    [-1, 1], RMS over all channels. Compressed formats (mp3/flac/ogg)
    need a codec library this environment does not ship — they raise
    ``NotImplementedError`` (same policy as image decode without Pillow).
    ``fake=True`` derives deterministic pseudo-audio features straight
    from the bytes (8 kHz mono, one byte = one sample) for plumbing tests
    with arbitrary blobs.

    Corrupt/truncated WAV blobs raise inside the stage — corrupt media in
    a pipeline should fail loudly, not silently skew features; pre-filter
    with a try-decode stage if tolerance is wanted.
    """
    if not fake and audio_format.lower() != "wav":
        _require_codec("audio")

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import io
        import wave

        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[content_col]):
                blob = blob or b""
                if fake:
                    arr = np.frombuffer(blob, dtype=np.uint8)
                    norm = (arr.astype(np.float64) - 128.0) / 128.0
                    sr, ch, n = 8000, 1, int(arr.size)
                else:
                    with wave.open(io.BytesIO(blob)) as w:
                        sr = w.getframerate()
                        ch = w.getnchannels()
                        n = w.getnframes()
                        width = w.getsampwidth()
                        frames = w.readframes(n)
                    if width == 1:
                        arr = np.frombuffer(frames, dtype=np.uint8)
                        norm = (arr.astype(np.float64) - 128.0) / 128.0
                    elif width == 2:
                        arr = np.frombuffer(frames, dtype="<i2")
                        norm = arr.astype(np.float64) / 32768.0
                    elif width == 4:
                        arr = np.frombuffer(frames, dtype="<i4")
                        norm = arr.astype(np.float64) / 2147483648.0
                    else:
                        raise NotImplementedError(
                            f"unsupported PCM sample width {width}"
                        )
                rms = float(np.sqrt(np.mean(norm**2))) if norm.size else 0.0
                duration = (n / sr) if sr else 0.0
                rows.append(
                    (int(mid), sr, ch, n, round(duration, 6), round(rms, 6))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "sample_rate",
                    "n_channels",
                    "n_samples",
                    "duration_sec",
                    "rms",
                ],
            )

    return df.select(F.col(id_col), F.col(content_col)).mapInPandas(
        gen, schema=AUDIO_SCHEMA
    )


VIDEO_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", LongType()),
        StructField("fps", DoubleType()),
        StructField("duration_sec", DoubleType()),
        StructField("mean_pixel", DoubleType()),
    ]
)

AVI_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("content", BinaryType()),
    ]
)


def video_codec_available() -> bool:
    """True when ``imageio`` — the library the compressed-stream branch
    of :func:`decode_video` actually imports — is importable. PyAV alone
    does NOT count: advertising it would let a compressed AVI reach an
    executor-side ``import imageio.v3`` ImportError instead of the
    documented NotImplementedError (round-5 advice). Uncompressed RGB
    AVI needs NO codec — the RIFF parse and raw-frame decode in
    :func:`decode_video` are pure stdlib + numpy, the same policy as
    PCM WAV in :func:`decode_audio`."""
    try:
        __import__("imageio")
        return True
    except ImportError:
        return False


def _build_avi(frames: list[bytes], width: int, height: int, fps: int) -> bytes:
    """Minimal real AVI container: RIFF('AVI ') → hdrl(avih + strl(strh,
    strf)) → movi('00db' raw RGB24 frames, top-down rows, no padding —
    width is chosen so the 3-byte-pixel stride is already 4-aligned).
    """
    import struct

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) % 2 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    def lst(subtype: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", subtype + payload)

    frame_bytes = width * height * 3
    n = len(frames)
    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        frame_bytes * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0,  # dwFlags
        n,  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        frame_bytes,  # dwSuggestedBufferSize
        width,
        height,
        0, 0, 0, 0,  # dwReserved
    )
    strh = struct.pack(
        "<4s4sI2HIIIIIIiI4h",
        b"vids", b"DIB ",
        0, 0, 0, 0,  # flags, priority, language, initial frames
        1, fps,  # dwScale / dwRate → fps
        0, n,  # start, length (frames)
        frame_bytes, 0,  # buffer size, quality=0
        frame_bytes,  # dwSampleSize
        0, 0, width, height,  # rcFrame
    )
    strf = struct.pack(
        "<IiiHHIIiiII",
        40, width, -height,  # biSize, biWidth, negative = top-down rows
        1, 24,  # biPlanes, biBitCount (RGB24)
        0,  # biCompression = BI_RGB (uncompressed)
        frame_bytes, 0, 0, 0, 0,
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(
        b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)
    ))
    movi = lst(b"movi", b"".join(chunk(b"00db", f) for f in frames))
    return chunk(b"RIFF", b"AVI " + hdrl + movi)


def _parse_avi(blob: bytes) -> tuple[int, int, float, int, list[bytes]]:
    """Walk the RIFF tree of an AVI blob; return (width, height, fps,
    compression, frames). Raises ``ValueError`` on a malformed container.
    """
    import struct

    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"AVI ":
        raise ValueError("not an AVI (RIFF) container")
    width = height = None
    fps = 0.0
    compression = 0
    frames: list[bytes] = []

    def walk(data: bytes) -> None:
        nonlocal width, height, fps, compression
        pos = 0
        while pos + 8 <= len(data):
            fourcc = data[pos:pos + 4]
            (size,) = struct.unpack_from("<I", data, pos + 4)
            payload = data[pos + 8:pos + 8 + size]
            if fourcc == b"LIST":
                walk(payload[4:])  # skip list subtype
            elif fourcc == b"avih":
                fields = struct.unpack_from("<14I", payload)
                if fields[0]:
                    fps = round(1_000_000 / fields[0], 6)
                width, height = fields[8], fields[9]
            elif fourcc == b"strf":
                (compression,) = struct.unpack_from("<I", payload, 16)
            elif fourcc in (b"00db", b"00dc"):
                frames.append(payload)
            pos += 8 + size + (size % 2)  # chunks are word-aligned

    walk(blob[12:])
    if width is None:
        raise ValueError("AVI missing avih header")
    return int(width), int(height), float(fps), int(compression), frames


def synth_avi(
    df: DataFrame,
    *,
    id_col: str = "media_id",
    width: int = 8,
    height: int = 6,
    fps: int = 10,
    n_base: int = 4,
    n_mod: int = 6,
) -> DataFrame:
    """Deterministic uncompressed RGB24 AVI blob per row (test/demo
    source; the video analog of :func:`synth_wav`).

    Byte ``i`` of frame ``f`` for row ``id`` is
    ``(id*31 + f*17 + i*7) % 256`` over ``width*height*3`` bytes and
    ``n_base + id % n_mod`` frames — a closed form a SQL oracle can
    replay, so the REAL ``decode_video`` path (RIFF parse + raw-frame
    numpy decode) is hash-checkable end to end without video files in
    the testdata. ``width*3`` must be 4-byte aligned (no row padding).
    """
    if (width * 3) % 4:
        raise ValueError("width*3 must be a multiple of 4 (no row padding)")

    def gen(batches):
        import pandas as pd

        n_px = width * height * 3
        for pdf in batches:
            rows = []
            for mid in pdf[id_col]:
                mid = int(mid)
                nf = n_base + mid % n_mod
                frames = [
                    bytes((mid * 31 + f * 17 + i * 7) % 256 for i in range(n_px))
                    for f in range(nf)
                ]
                rows.append((mid, _build_avi(frames, width, height, fps)))
            yield pd.DataFrame(rows, columns=["media_id", "content"])

    return df.select(F.col(id_col)).mapInPandas(gen, schema=AVI_SCHEMA)


def decode_video(
    df: DataFrame,
    *,
    id_col: str = "media_id",
    content_col: str = "content",
    fake: bool = False,
) -> DataFrame:
    """Decode video blobs to ``(media_id, width, height, n_frames, fps,
    duration_sec, mean_pixel)``.

    Real path (default): RIFF/AVI container parse (stdlib ``struct``)
    plus raw-frame pixel decode via numpy for uncompressed RGB
    (``BI_RGB``) streams — the video analog of the PCM-WAV audio path;
    no codec library needed. Compressed streams fall back to
    imageio/PyAV when importable and raise ``NotImplementedError``
    otherwise (same policy as image decode without Pillow). ``fake=True``
    derives the same output shape straight from the bytes for plumbing
    tests with arbitrary blobs.

    Corrupt containers raise inside the stage — corrupt media should
    fail loudly, not silently skew features.
    """
    have_codec = video_codec_available() if not fake else False

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[content_col]):
                blob = blob or b""
                if fake:
                    arr = np.frombuffer(blob, dtype=np.uint8)
                    mean = float(arr.mean()) if arr.size else 0.0
                    rows.append(
                        (int(mid), len(blob), 1, 1, 1.0, 1.0, round(mean, 6))
                    )
                    continue
                w, h, fps, compression, frames = _parse_avi(blob)
                if compression != 0:
                    if not have_codec:
                        _require_codec("video")
                    import imageio.v3 as iio  # pragma: no cover — codec envs

                    pixels = iio.imread(blob, index=None)  # pragma: no cover
                    arr = np.asarray(pixels, np.uint8).ravel()  # pragma: no cover
                    nf = int(pixels.shape[0])  # pragma: no cover
                else:
                    arr = (
                        np.frombuffer(b"".join(frames), dtype=np.uint8)
                        if frames
                        else np.array([], dtype=np.uint8)
                    )
                    nf = len(frames)
                mean = float(arr.mean()) if arr.size else 0.0
                duration = nf / fps if fps else 0.0
                rows.append(
                    (int(mid), w, h, nf, fps, round(duration, 6), round(mean, 6))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height", "n_frames",
                    "fps", "duration_sec", "mean_pixel",
                ],
            )

    return df.select(F.col(id_col), F.col(content_col)).mapInPandas(
        gen, schema=VIDEO_SCHEMA
    )


def sample_frames(df: DataFrame, *, every_n_bytes: int = 1024, fake: bool = True,
                  id_col: str = "media_id", content_col: str = "content") -> DataFrame:
    """Frame-sample a video-like blob: one output row per sampled offset.

    Fake implementation emits (media_id, frame_index, offset, frame_byte) per
    ``every_n_bytes`` — exercising the 1→N mapInPandas row-expansion shape a
    real frame sampler has. For real frame EXTRACTION from an
    uncompressed AVI use :func:`decode_video` / :func:`_parse_avi`;
    compressed codecs require imageio/PyAV.
    """
    if not fake:
        _require_codec("video")

    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("frame_index", IntegerType()),
            StructField("offset", LongType()),
            StructField("frame_byte", IntegerType()),
        ]
    )

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[content_col]):
                blob = blob or b""
                for i, off in enumerate(range(0, len(blob), every_n_bytes)):
                    rows.append((int(mid), i, off, blob[off]))
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_index", "offset", "frame_byte"]
            )

    return df.select(F.col(id_col), F.col(content_col)).mapInPandas(gen, schema=schema)


AHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("ahash", LongType()),
    ]
)


def image_ahash(
    df: DataFrame,
    *,
    id_col: str = "media_id",
    content_col: str = "content",
    fake: bool = False,
) -> DataFrame:
    """Perceptual AVERAGE-HASH of an image blob: 60-bit fingerprint for
    near-duplicate detection — the multimodal analog of the text
    simhash, and the other half of the image-dedup story next to
    :func:`decode_video` (decode gives features; this gives a
    fingerprint that pairs via ``dedup.hamming_pairs``).

    Real path (default): RIFF/AVI parse (same stdlib walker as
    :func:`decode_video`), FIRST frame only, integer grayscale
    ``(r+g+b) // 3`` per pixel, the first 60 pixels in scan order, bit
    ``p`` set iff ``gray[p] >= mean(gray[:60]) // 1`` (integer mean) —
    all-integer arithmetic, so a SQL oracle replays the hash bit for
    bit from the synthetic closed form while Spark computes it from the
    DECODED bytes. Frames smaller than 60 pixels zero-pad (deliberate:
    tiny thumbnails still fingerprint deterministically). Compressed
    streams follow :func:`decode_video`'s codec policy.

    ``fake=True`` hashes the blob's first 180 raw bytes with the same
    gray/threshold arithmetic — plumbing tests with arbitrary blobs.

    Returns ``(media_id, ahash)``; feed to
    ``hamming_pairs(out, "ahash", "media_id", bits=60)``.
    """
    have_codec = video_codec_available() if not fake else False

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import numpy as np
        import pandas as pd

        def pack(gray: "np.ndarray") -> int:
            g = np.zeros(60, dtype=np.int64)
            n = min(60, gray.size)
            g[:n] = gray[:n]
            mean = int(g.sum()) // 60
            bits = g >= mean
            return int((bits.astype(np.int64) << np.arange(60)).sum())

        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[content_col]):
                blob = blob or b""
                if fake:
                    raw = np.zeros(180, dtype=np.int64)
                    arr = np.frombuffer(blob[:180], dtype=np.uint8)
                    raw[: arr.size] = arr
                    gray = raw.reshape(-1, 3).sum(axis=1) // 3
                    rows.append((int(mid), pack(gray)))
                    continue
                w, h, fps, compression, frames = _parse_avi(blob)
                if compression != 0:
                    # Mirror decode_video's codec policy exactly: a
                    # compressed bitstream is never hashable as raw
                    # pixels — decode the first frame via imageio when
                    # available, raise otherwise.
                    if not have_codec:
                        _require_codec("video")
                    import imageio.v3 as iio  # pragma: no cover — codec envs

                    pixels = iio.imread(blob, index=0)  # pragma: no cover
                    first = np.asarray(  # pragma: no cover
                        pixels, np.uint8
                    ).ravel().astype(np.int64)
                else:
                    first = (
                        np.frombuffer(frames[0], dtype=np.uint8).astype(
                            np.int64
                        )
                        if frames
                        else np.zeros(0, dtype=np.int64)
                    )
                usable = first[: (first.size // 3) * 3]
                gray = usable.reshape(-1, 3).sum(axis=1) // 3
                rows.append((int(mid), pack(gray)))
            yield pd.DataFrame(rows, columns=["media_id", "ahash"])

    return df.select(F.col(id_col), F.col(content_col)).mapInPandas(
        gen, schema=AHASH_SCHEMA
    )


AFP_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("afp", LongType()),
    ]
)


def audio_fingerprint(
    df: DataFrame,
    *,
    id_col: str = "media_id",
    content_col: str = "content",
    fake: bool = False,
) -> DataFrame:
    """60-bit ENERGY-DELTA fingerprint of PCM audio: the audio analog of
    :func:`image_ahash`, completing the multimodal near-dup family
    (text simhash / image average-hash / this) over the shared
    ``dedup.hamming_pairs`` kernel.

    The decoded sample stream splits into 61 integer-boundary windows
    (``bounds[w] = w*n // 61``); window energy is the plain integer sum
    of the 0-255 sample values; bit ``i`` is set iff
    ``energy[i+1] >= energy[i]`` — the coarse loudness CONTOUR, which
    survives level shifts and codec dither the way the image hash
    survives brightness shifts (the Haitsma-Kalker/Shazam family's
    delta-sign idea in its simplest all-integer form, so a SQL oracle
    replays the hash bit for bit from the synthetic closed form).

    Real path: stdlib ``wave`` parse, same widths as
    :func:`decode_audio`; 16/32-bit PCM downshifts to the 0-255 grid
    (``(s >> 8*(width-1)) + 128``) so the arithmetic stays integer.
    Empty audio yields the all-ones fingerprint (0 >= 0), fine for
    dedup (empty blobs ARE duplicates of each other).
    ``fake=True`` treats raw blob bytes as 8-bit samples.

    Returns ``(media_id, afp)``; feed to
    ``hamming_pairs(out, "afp", "media_id", bits=60)``.
    """

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import io
        import wave

        import numpy as np
        import pandas as pd

        def pack(samples: "np.ndarray") -> int:
            n = int(samples.size)
            bounds = [(w * n) // 61 for w in range(62)]
            energy = [
                int(samples[bounds[w] : bounds[w + 1]].sum())
                for w in range(61)
            ]
            return sum(
                1 << i for i in range(60) if energy[i + 1] >= energy[i]
            )

        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[content_col]):
                blob = blob or b""
                if fake:
                    samples = np.frombuffer(blob, dtype=np.uint8).astype(
                        np.int64
                    )
                else:
                    with wave.open(io.BytesIO(blob)) as w:
                        width = w.getsampwidth()
                        frames = w.readframes(w.getnframes())
                    if width == 1:
                        samples = np.frombuffer(
                            frames, dtype=np.uint8
                        ).astype(np.int64)
                    elif width == 2:
                        samples = (
                            np.frombuffer(frames, dtype="<i2").astype(
                                np.int64
                            )
                            >> 8
                        ) + 128
                    elif width == 4:
                        samples = (
                            np.frombuffer(frames, dtype="<i4").astype(
                                np.int64
                            )
                            >> 24
                        ) + 128
                    else:
                        raise NotImplementedError(
                            f"unsupported PCM sample width {width}"
                        )
                rows.append((int(mid), pack(samples)))
            yield pd.DataFrame(rows, columns=["media_id", "afp"])

    return df.select(F.col(id_col), F.col(content_col)).mapInPandas(
        gen, schema=AFP_SCHEMA
    )
