"""Multimodal column plumbing: opaque binary payloads + typed metadata.

A 100 TB multimodal corpus stores media as ``binary`` columns (or
pointers) beside typed metadata structs; decode / feature-extraction runs
as Arrow-batched pandas iterators (``mapInPandas``) so each executor
processes whole record batches without JVM<->Python row ping-pong.

The codec libraries (Pillow, torchaudio, av...) may be absent in a given
environment; :func:`decode_image` is the real Pillow decoder behind an
import gate (a clear driver-side error when Pillow is missing), while
the byte-arithmetic operators are deterministic stand-ins whose outputs
are pure functions of the bytes (therefore verifiable by the SQL
oracle).  Everything Spark-side — schemas, the Arrow batch path,
partition-parallel execution — is real and tested either way.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

if TYPE_CHECKING:
    import pandas as pd

__all__ = [
    "attach_binary_payload",
    "MEDIA_META_SCHEMA",
    "decode_media_meta",
    "IMAGE_META_SCHEMA",
    "decode_image",
    "RESIZED_SCHEMA",
    "resize_payload",
    "FRAME_SCHEMA",
    "sample_frames",
    "WINDOW_SCHEMA",
    "audio_windows",
]

#: Output schema of the metadata decoder (id + typed media metadata).
MEDIA_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
    ]
)


def attach_binary_payload(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, payload binary, media struct) — models a media table.

    The payload is the UTF-8 encoding of the text column (a deterministic
    stand-in for real image/audio bytes); the metadata struct carries the
    declared kind and byte length, the pattern a real ingest would use.
    """
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("doc_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.octet_length(payload).cast("bigint").alias("n_bytes"),
        ).alias("media"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in decoder: metadata as pure byte arithmetic.

    width  = n_bytes mod 640, height = first byte mod 480. Pure function
    of the payload, so the SQL oracle can recompute it — which verifies
    that the Arrow batch path delivered exactly the right bytes.
    """
    n = len(payload)
    return n, n % 640, (payload[0] % 480) if n else 0


def decode_media_meta(media_df: DataFrame) -> DataFrame:
    """Decode media metadata with a partition-parallel Arrow pandas iterator.

    This is the template for any real decoder: per-batch vectorized work,
    one output row per input row, typed output schema.
    """

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            decoded = pdf["payload"].map(_fake_decode)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": decoded.map(lambda t: t[0]),
                    "width": decoded.map(lambda t: t[1]),
                    "height": decoded.map(lambda t: t[2]),
                }
            )

    return media_df.select("doc_id", "payload").mapInPandas(decode, schema=MEDIA_META_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("resized", BinaryType()),
    ]
)


def resize_payload(media_df: DataFrame, target_bytes: int = 64) -> DataFrame:
    """'Resize' stand-in: truncate/stride the payload to ``target_bytes``.

    Models the image-resize stage of an ingest pipeline — a real
    implementation swaps the byte arithmetic for a codec call; the
    Spark-side contract (binary in, smaller binary out, 1:1 rows,
    Arrow-batched) is exactly this.
    """

    def resize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        def shrink(payload: bytes) -> bytes:
            if len(payload) <= target_bytes:
                return payload
            stride = len(payload) // target_bytes
            return payload[::stride][:target_bytes]

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["payload"].map(len),
                    "resized": pdf["payload"].map(shrink),
                }
            )

    return media_df.select("doc_id", "payload").mapInPandas(resize, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(
    media_df: DataFrame, frame_bytes: int = 16, every_nth: int = 4
) -> DataFrame:
    """Frame-sampling stand-in: split the payload into fixed-size
    'frames' and keep every ``every_nth``-th — the 1:N row expansion
    shape of video frame extraction (a real decoder emits JPEG frames;
    the partitioning, batch iteration, and exploding output schema are
    identical).
    """

    def sample(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        out_ids, out_idx, out_frames = [], [], []
        for pdf in batches:
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                frames = [
                    payload[off : off + frame_bytes]
                    for off in range(0, len(payload), frame_bytes)
                ]
                for i, frame in enumerate(frames[::every_nth]):
                    out_ids.append(doc_id)
                    out_idx.append(i)
                    out_frames.append(frame)
            yield pd.DataFrame(
                {"doc_id": out_ids, "frame_idx": out_idx, "frame": out_frames}
            )
            out_ids, out_idx, out_frames = [], [], []

    return media_df.select("doc_id", "payload").mapInPandas(sample, schema=FRAME_SCHEMA)


WINDOW_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("win_idx", LongType()),
        StructField("win_len", LongType()),
        StructField("window", BinaryType()),
    ]
)


def audio_windows(
    media_df: DataFrame, win_bytes: int = 32, hop_bytes: int = 16
) -> DataFrame:
    """Overlapping fixed-size windows over a binary payload — the
    audio-framing shape (STFT / feature windows: window length >= hop,
    consecutive windows overlap by ``win_bytes - hop_bytes``).

    Window ``k`` covers ``payload[k*hop : k*hop + win]`` for every ``k``
    with ``k*hop < len`` (the tail window may be short).  A real
    pipeline decodes PCM first and windows samples; the stand-in windows
    the raw bytes so the output is a pure function of the payload and an
    SQL oracle can re-derive every window.  The Spark-side contract —
    1:N Arrow-batched row expansion, per-window binary + index — is the
    real thing.
    """
    if hop_bytes <= 0 or win_bytes < hop_bytes:
        raise ValueError("need win_bytes >= hop_bytes > 0")

    def window(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out_ids, out_idx, out_len, out_win = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for k in range(-(-len(payload) // hop_bytes)):
                    w = payload[k * hop_bytes : k * hop_bytes + win_bytes]
                    out_ids.append(doc_id)
                    out_idx.append(k)
                    out_len.append(len(w))
                    out_win.append(w)
            yield pd.DataFrame(
                {
                    "doc_id": out_ids,
                    "win_idx": out_idx,
                    "win_len": out_len,
                    "window": out_win,
                }
            )

    return media_df.select("doc_id", "payload").mapInPandas(window, schema=WINDOW_SCHEMA)


#: Output schema of the real image decoder: id + actual codec metadata.
IMAGE_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("mode", StringType()),
    ]
)


def parse_image_header(payload) -> tuple:
    """``(width, height, mode)`` from an image payload's HEADER, pure
    Python, no codec dependency — PNM (P2/P3/P5/P6), PNG (IHDR), BMP
    (BITMAPINFOHEADER), GIF (87a/89a).

    Header fields are enough for the metadata pipeline stage (corpus
    triage filters on dimensions/mode before any pixel work), and
    parsing them needs no decompression, so this path runs in
    dependency-free environments where :func:`decode_image` (Pillow)
    gates out.  Corrupt/unknown payloads return ``(None, None, None)``
    — the NULL-dimension quality signal, same contract as
    :func:`decode_image`.
    """
    if not payload:
        return (None, None, None)
    try:
        magic2 = bytes(payload[:2])
        if magic2 in (b"P2", b"P3", b"P5", b"P6"):
            # PNM: ASCII header, whitespace-separated, '#' comments
            mode = "rgb" if magic2 in (b"P3", b"P6") else "gray"
            vals: list[int] = []
            i = 2
            limit = min(len(payload), 512)
            while len(vals) < 2 and i < limit:
                c = payload[i : i + 1]
                if c == b"#":
                    while i < limit and payload[i : i + 1] != b"\n":
                        i += 1
                elif c.isspace():
                    i += 1
                elif c.isdigit():
                    j = i
                    while j < limit and payload[j : j + 1].isdigit():
                        j += 1
                    vals.append(int(payload[i:j]))
                    i = j
                else:
                    return (None, None, None)
            if len(vals) == 2 and vals[0] > 0 and vals[1] > 0:
                return (vals[0], vals[1], mode)
            return (None, None, None)
        if (
            bytes(payload[:8]) == b"\x89PNG\r\n\x1a\n"
            and bytes(payload[12:16]) == b"IHDR"
            and len(payload) >= 26
        ):
            w = int.from_bytes(payload[16:20], "big")
            h = int.from_bytes(payload[20:24], "big")
            mode = {0: "gray", 2: "rgb", 3: "palette", 4: "graya", 6: "rgba"}.get(
                payload[25]
            )
            return (w, h, mode) if w > 0 and h > 0 else (None, None, None)
        if magic2 == b"BM" and len(payload) >= 30:
            w = int.from_bytes(payload[18:22], "little", signed=True)
            # negative height = top-down row order; dimensions are |h|
            h = abs(int.from_bytes(payload[22:26], "little", signed=True))
            bpp = int.from_bytes(payload[28:30], "little")
            mode = {1: "mono", 8: "gray", 24: "rgb", 32: "rgba"}.get(bpp, "bmp")
            return (w, h, mode) if w > 0 and h > 0 else (None, None, None)
        if bytes(payload[:6]) in (b"GIF87a", b"GIF89a") and len(payload) >= 10:
            w = int.from_bytes(payload[6:8], "little")
            h = int.from_bytes(payload[8:10], "little")
            return (w, h, "palette") if w > 0 and h > 0 else (None, None, None)
    except Exception:
        pass
    return (None, None, None)


def decode_image_meta(media_df: DataFrame) -> DataFrame:
    """Dependency-free image metadata decode: (doc_id, n_bytes, width,
    height, mode) via :func:`parse_image_header`, over the same Arrow
    ``mapInPandas`` plumbing as :func:`decode_image` — one vectorized
    batch map, no shuffle, embarrassingly parallel at corpus scale.
    """

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            decoded = pdf["payload"].map(parse_image_header)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["payload"].map(len),
                    "width": decoded.map(lambda t: t[0]),
                    "height": decoded.map(lambda t: t[1]),
                    "mode": decoded.map(lambda t: t[2]),
                }
            )

    return media_df.select("doc_id", "payload").mapInPandas(decode, schema=IMAGE_META_SCHEMA)


def decode_image(media_df: DataFrame) -> DataFrame:
    """Real image decode (Pillow): (doc_id, n_bytes, width, height, mode)
    per payload — same Arrow ``mapInPandas`` plumbing as
    :func:`decode_media_meta` with the codec swapped in.

    The import is checked ONCE on the driver (a clear error beats one
    ``ModuleNotFoundError`` per executor task); executors re-import
    inside the batch iterator as usual.  Undecodable payloads yield NULL
    dimensions rather than failing the whole partition — at corpus scale
    a fraction of corrupt media is the norm, and the NULL rows are the
    quality signal downstream filters key on.
    """
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "full image decoding requires Pillow; this environment is "
            "text-only. Header-level metadata (width/height/mode for "
            "PNM/PNG/BMP/GIF) is available dependency-free via "
            "decode_image_meta()."
        ) from exc

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import io

        import pandas as pd
        import PIL.Image

        def meta(payload: bytes):
            try:
                with PIL.Image.open(io.BytesIO(payload)) as img:
                    return img.width, img.height, img.mode
            except Exception:
                return None, None, None

        for pdf in batches:
            decoded = pdf["payload"].map(meta)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["payload"].map(len),
                    "width": decoded.map(lambda t: t[0]),
                    "height": decoded.map(lambda t: t[1]),
                    "mode": decoded.map(lambda t: t[2]),
                }
            )

    return media_df.select("doc_id", "payload").mapInPandas(decode, schema=IMAGE_META_SCHEMA)
