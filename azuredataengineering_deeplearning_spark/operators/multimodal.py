"""Multimodal (image/audio/video) column plumbing (north-star).

Design: media are opaque ``binary`` columns + typed metadata columns.
The Spark-side machinery — schemas, Arrow-batched ``mapInPandas``
signatures, partition sizing — is real and tested; the *decoders* are
pluggable callables because the media libraries (PIL, torchaudio, ...)
are not in this container. ``deterministic_fake_decoder`` stands in for
tests; production swaps in a real decoder without touching the plumbing
(the reference's Ray ``map_batches`` actor pattern,
``ray_batch_embeddings_generator.py:97-112``, maps to exactly this
``mapInPandas`` shape).

Zip-member extraction (S13; ``async_scan_blob_zip_contents.py:12-45``)
is fully real — stdlib ``zipfile`` over the ``binaryFile`` source.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# magic-byte prefixes → format tag (hex, uppercase)
_MAGIC = [
    ("89504E47", "png"),
    ("FFD8FF", "jpeg"),
    ("47494638", "gif"),
    ("52494646", "riff"),  # wav/avi container
    ("494433", "mp3"),
    ("664C6143", "flac"),
    ("1A45DFA3", "mkv/webm"),
    ("00000018", "mp4"),
    ("504B0304", "zip"),
]


def binary_metadata(df: DataFrame, bin_col: str) -> DataFrame:
    """Attach typed metadata to an opaque binary column: byte size,
    64-bit content fingerprint, magic-byte format sniff — pure
    expressions, one scan, no decode."""
    head = F.upper(F.hex(F.substring(F.col(bin_col), 1, 4)))
    fmt = F.lit("unknown")
    for prefix, tag in reversed(_MAGIC):
        fmt = F.when(head.startswith(prefix), tag).otherwise(fmt)
    return df.withColumns(
        {
            f"{bin_col}_size": F.length(F.col(bin_col)),
            f"{bin_col}_fingerprint": F.xxhash64(F.col(bin_col)),
            f"{bin_col}_format": fmt,
        }
    )


def read_binary_files(spark: SparkSession, glob: str) -> DataFrame:
    """S13 source: (path, modificationTime, length, content) per file."""
    return spark.read.format("binaryFile").load(glob)


def unzip_members(df: DataFrame, content_col: str = "content") -> DataFrame:
    """S13: explode zip archives into one row per member
    (``async_scan_blob_zip_contents.py:12-45`` made distributed):
    Arrow-batched ``mapInPandas``, stdlib zipfile, no driver involvement.
    Output: (path, member_name, member_size, member_bytes)."""
    import pandas as pd

    schema = (
        "path string, member_name string, member_size long, member_bytes binary"
    )

    def explode_zip(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import io
        import zipfile

        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf[content_col]):
                try:
                    zf = zipfile.ZipFile(io.BytesIO(content))
                except zipfile.BadZipFile:
                    continue
                for info in zf.infolist():
                    if info.is_dir():
                        continue
                    rows.append(
                        (path, info.filename, info.file_size, zf.read(info))
                    )
            yield pd.DataFrame(
                rows, columns=["path", "member_name", "member_size", "member_bytes"]
            )

    return df.select("path", content_col).mapInPandas(explode_zip, schema)


# ---------------------------------------------------------------------------
# decode / feature-extract plumbing (decoder pluggable; fake for tests)
# ---------------------------------------------------------------------------

DecodeFn = Callable[[bytes], list[float]]


def deterministic_fake_decoder(n_features: int = 8) -> DecodeFn:
    """Deterministic stand-in decoder: features derived from a rolling
    byte hash — stable across runs/engines, media libs not required."""

    def decode(blob: bytes) -> list[float]:
        acc, out = 2166136261, []
        for i, byte in enumerate(blob or b"\x00"):
            acc = (acc ^ byte) * 16777619 % (1 << 32)
            if i % max(1, len(blob) // n_features) == 0 and len(out) < n_features:
                out.append((acc % 10_000) / 10_000.0)
        while len(out) < n_features:
            out.append(0.0)
        return out

    return decode


def decode_features(
    df: DataFrame,
    bin_col: str,
    id_col: str,
    decoder: DecodeFn | None = None,
    n_features: int = 8,
) -> DataFrame:
    """Decode/feature-extract over binary media → (id, features
    array<float>). Arrow-batched ``mapInPandas``; one decoder instance
    per partition (the actor-pool pattern); batch shape = Spark's Arrow
    batch. Pass a real decoder in production:

        decode_features(df, "content", "path", decoder=pil_resize_224)

    Raises NotImplementedError at *plan build* when no decoder is given
    — the stub contract for this container (no media libs)."""
    if decoder is None:
        raise NotImplementedError(
            "no media decoder available in this environment; pass decoder= "
            "(e.g. a PIL/torchaudio-backed callable) or use "
            "deterministic_fake_decoder() for plumbing tests"
        )
    import pandas as pd

    schema = f"{id_col} string, features array<float>"

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        fn = decoder  # per-partition closure (decoder state cached per task)
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype(str),
                    "features": [fn(b) for b in pdf[bin_col]],
                }
            )

    return df.select(F.col(id_col).cast("string"), bin_col).mapInPandas(run, schema)


FrameFn = Callable[[bytes, int], bytes]


def deterministic_fake_frame_extractor() -> FrameFn:
    """Stand-in frame extractor: 16 pseudo-random bytes derived from
    (blob, frame index) — stable across runs/engines, codecs not
    required."""
    import hashlib

    def extract(blob: bytes, idx: int) -> bytes:
        return hashlib.md5((blob or b"\x00") + idx.to_bytes(4, "big")).digest()

    return extract


def frame_sample(
    df: DataFrame,
    bin_col: str,
    id_col: str,
    n_frames_col: str,
    every_k: int = 10,
    extractor: FrameFn | None = None,
) -> DataFrame:
    """Frame sampling over opaque video blobs → (id, frame_index,
    frame) rows, one per every_k-th frame.

    The fan-out (which frames exist) is JVM-side — a ``sequence`` +
    ``explode`` over the typed ``n_frames`` metadata column, so the
    blob is NOT duplicated per frame at the logical level and partition
    sizing follows row counts, not frame counts. Extraction itself runs
    Arrow-batched in ``mapInPandas`` (same actor-pattern as
    :func:`decode_features`). No video codecs ship in this container:
    pass a real ``extractor`` in production or
    ``deterministic_fake_frame_extractor()`` for plumbing tests."""
    if extractor is None:
        raise NotImplementedError(
            "no video codec available in this environment; pass extractor= "
            "(e.g. an ffmpeg/PyAV-backed callable) or use "
            "deterministic_fake_frame_extractor() for plumbing tests"
        )
    import pandas as pd

    fan = df.select(
        F.col(id_col).cast("string").alias(id_col),
        F.col(bin_col).alias("__blob"),
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col(n_frames_col) - 1, F.lit(0)),
                F.lit(every_k),
            )
        ).alias("frame_index"),
    )
    schema = f"{id_col} string, frame_index int, frame binary"

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        fn = extractor
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "frame_index": pdf["frame_index"].astype("int32"),
                    "frame": [
                        fn(b, int(i))
                        for b, i in zip(pdf["__blob"], pdf["frame_index"])
                    ],
                }
            )

    return fan.mapInPandas(run, schema)


def image_dimensions(
    df: DataFrame,
    bin_col: str,
    out_prefix: str = "img_",
) -> DataFrame:
    """Codec-free image metadata: parse width/height/bit-depth straight
    from the container headers — PNG IHDR, JPEG SOFn markers, GIF
    logical screen descriptor — no imaging library involved, so this
    path is REAL in this container (unlike pixel decode, which stays a
    pluggable codec). The pre-decode size/aspect filter every image
    pipeline runs first: drop icons and monsters before paying for
    decode.

    Arrow-batched ``mapInPandas``; unknown/corrupt containers yield
    nulls rather than failing the scan. Appends ``<prefix>format/
    width/height/bits``."""
    import pandas as pd

    schema = (
        ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
        + f", {out_prefix}format string, {out_prefix}width int,"
        + f" {out_prefix}height int, {out_prefix}bits int"
    )

    def parse(b) -> tuple:
        if b is None:
            return (None, None, None, None)
        b = bytes(b)
        try:
            if b[:8] == b"\x89PNG\r\n\x1a\n" and b[12:16] == b"IHDR":
                w = int.from_bytes(b[16:20], "big")
                h = int.from_bytes(b[20:24], "big")
                return ("png", w, h, b[24])
            if b[:3] == b"\xff\xd8\xff":
                i, n = 2, len(b)
                while i + 9 < n:
                    if b[i] != 0xFF:
                        i += 1
                        continue
                    marker = b[i + 1]
                    if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                        i += 2
                        continue
                    seg_len = int.from_bytes(b[i + 2 : i + 4], "big")
                    if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                        bits = b[i + 4]
                        h = int.from_bytes(b[i + 5 : i + 7], "big")
                        w = int.from_bytes(b[i + 7 : i + 9], "big")
                        return ("jpeg", w, h, bits)
                    i += 2 + seg_len
                return ("jpeg", None, None, None)
            if b[:6] in (b"GIF87a", b"GIF89a"):
                w = int.from_bytes(b[6:8], "little")
                h = int.from_bytes(b[8:10], "little")
                return ("gif", w, h, (b[10] & 0x07) + 1)
        except (IndexError, ValueError):
            pass
        return (None, None, None, None)

    cols = [f"{out_prefix}format", f"{out_prefix}width", f"{out_prefix}height", f"{out_prefix}bits"]

    def fn(batches):
        for pdf in batches:
            parsed = [parse(v) for v in pdf[bin_col]]
            for j, c in enumerate(cols):
                vals = [p[j] for p in parsed]
                pdf[c] = pd.Series(
                    vals, index=pdf.index,
                    dtype="object" if j == 0 else "Int32",
                )
            yield pdf

    return df.mapInPandas(fn, schema=schema)


def audio_metadata(
    df: DataFrame,
    bin_col: str,
    out_prefix: str = "audio_",
) -> DataFrame:
    """Codec-free audio metadata: parse sample-rate/channels/bit-depth/
    duration from WAV (RIFF fmt + data chunks) and FLAC (STREAMINFO)
    headers — the audio sibling of :func:`image_dimensions`, real in
    this container because no codec touches the samples. Pre-decode
    filtering (drop 8 kHz mono phone audio, cap durations) happens
    here, before any expensive decode stage. Unknown containers yield
    nulls. Appends ``<prefix>format/sample_rate/channels/bits/
    duration_s``."""
    import pandas as pd

    schema = (
        ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
        + f", {out_prefix}format string, {out_prefix}sample_rate int,"
        + f" {out_prefix}channels int, {out_prefix}bits int,"
        + f" {out_prefix}duration_s double"
    )

    def parse(b):
        if b is None:
            return (None,) * 5
        b = bytes(b)
        try:
            if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
                i, n = 12, len(b)
                rate = ch = bits = None
                data_len = None
                while i + 8 <= n:
                    cid = b[i : i + 4]
                    clen = int.from_bytes(b[i + 4 : i + 8], "little")
                    if cid == b"fmt ":
                        ch = int.from_bytes(b[i + 10 : i + 12], "little")
                        rate = int.from_bytes(b[i + 12 : i + 16], "little")
                        bits = int.from_bytes(b[i + 22 : i + 24], "little")
                    elif cid == b"data":
                        data_len = clen
                    i += 8 + clen + (clen & 1)
                dur = (
                    data_len / (rate * ch * bits / 8)
                    if data_len and rate and ch and bits
                    else None
                )
                return ("wav", rate, ch, bits, dur)
            if b[:4] == b"fLaC" and len(b) >= 42 and (b[4] & 0x7F) == 0:
                # STREAMINFO: bytes 18-20 hold rate(20b)+ch(3b)+bits(5b-1)
                bits20 = int.from_bytes(b[18:21], "big")
                rate = bits20 >> 4
                ch = ((bits20 >> 1) & 0x07) + 1
                depth = ((bits20 & 0x01) << 4 | (b[21] >> 4)) + 1
                samples = ((b[21] & 0x0F) << 32) | int.from_bytes(b[22:26], "big")
                dur = samples / rate if rate and samples else None
                return ("flac", rate, ch, depth, dur)
        except (IndexError, ValueError, ZeroDivisionError):
            pass
        return (None,) * 5

    cols = [
        f"{out_prefix}format", f"{out_prefix}sample_rate",
        f"{out_prefix}channels", f"{out_prefix}bits", f"{out_prefix}duration_s",
    ]

    def fn(batches):
        for pdf in batches:
            parsed = [parse(v) for v in pdf[bin_col]]
            for j, c in enumerate(cols):
                dtype = "object" if j == 0 else ("Int32" if j < 4 else "float64")
                pdf[c] = pd.Series([p[j] for p in parsed], index=pdf.index, dtype=dtype)
            yield pdf

    return df.mapInPandas(fn, schema=schema)
