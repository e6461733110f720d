"""Multimodal column plumbing — opaque binary + typed metadata.

Image/audio/video payloads are ``binary`` columns with a metadata
struct; decode/feature-extraction runs as Arrow-batched ``mapInPandas``
so each executor processes whole record batches (the only sane shape
for media at 100 TB — bytes never leave the executor, Python sees
zero-copy Arrow buffers).

The actual codecs (PIL/librosa/ffmpeg) are NOT in this container, so
``decode_image_features`` computes deterministic byte-level features
and raises ``NotImplementedError`` from the clearly-marked codec hook
— the Spark-side plumbing (schema, batching, partitioning) is real and
tested; the codec swap-in is one function.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("mime_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("checksum", StringType()),
    ]
)


def attach_binary_payload(
    df: DataFrame, text_col: str = "text", mime: str = "application/octet-stream"
) -> DataFrame:
    """Materialize an opaque binary column + metadata struct.

    Test stand-in encodes the text column as UTF-8 bytes; in production
    the binary comes from the storage layer (parquet BINARY / blob
    refs) with identical downstream schema.
    """
    blob = F.encode(F.col(text_col), "UTF-8")
    return df.withColumn("media_blob", blob).withColumn(
        "media_meta",
        F.struct(
            F.lit(mime).alias("mime_type"),
            F.octet_length(blob).cast("long").alias("n_bytes"),
            F.md5(F.col(text_col)).alias("checksum"),
        ),
    )


FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("first_byte", IntegerType()),
        StructField("byte_sum_mod", LongType()),
        StructField("decode_status", StringType()),
    ]
)


def _decode_codec(blob: bytes) -> dict:
    """CODEC HOOK — swap in PIL/av/soundfile here when available."""
    raise NotImplementedError("media codecs not installed in this container")


def decode_image_features(df: DataFrame, blob_col: str = "media_blob") -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Real shape: mapInPandas over (doc_id, blob) record batches;
    deterministic byte-level features always computed; codec features
    attempted per-batch and marked 'stubbed' when unavailable.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf[blob_col]
            status = []
            for b in blobs:
                try:
                    _decode_codec(bytes(b))
                    status.append("decoded")
                except NotImplementedError:
                    status.append("stubbed")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": blobs.map(len).astype("int64"),
                    "first_byte": blobs.map(
                        lambda b: int(b[0]) if len(b) else -1
                    ).astype("int32"),
                    "byte_sum_mod": blobs.map(
                        lambda b: int(sum(b) % 1_000_003)
                    ).astype("int64"),
                    "decode_status": status,
                }
            )

    return df.select("doc_id", blob_col).mapInPandas(extract, FEATURE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("byte_offset", LongType()),
        StructField("frame_md5", StringType()),
    ]
)

#: synthetic fixed-size "frame" for the container-stub codec: real
#: decoders replace this with keyframe boundaries from the container
FRAME_BYTES = 32


def sample_video_frames(
    df: DataFrame, blob_col: str = "media_blob", every_n: int = 10
) -> DataFrame:
    """Frame sampling over opaque video payloads: emit every Nth frame
    as (doc_id, frame_idx, byte_offset, frame_md5).

    Arrow-batched ``mapInPandas``: each executor slices its batches'
    byte buffers locally — a 100 TB video corpus never moves bytes
    across the wire for sampling, only the tiny frame descriptors.
    Frames here are fixed FRAME_BYTES slices (the codec stub); a real
    demuxer swaps into the same loop without touching the Spark shape.
    The md5-of-slice output makes even the stub oracle-checkable.
    """
    import hashlib

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, offs, digests = [], [], [], []
            for doc_id, blob in zip(pdf["doc_id"], pdf[blob_col]):
                b = bytes(blob)
                n_frames = len(b) // FRAME_BYTES
                for k in range(0, n_frames, every_n):
                    off = k * FRAME_BYTES
                    ids.append(int(doc_id))
                    idxs.append(k)
                    offs.append(off)
                    digests.append(
                        hashlib.md5(b[off:off + FRAME_BYTES]).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "byte_offset": pd.Series(offs, dtype="int64"),
                    "frame_md5": pd.Series(digests, dtype="object"),
                }
            )

    return df.select("doc_id", blob_col).mapInPandas(sample, FRAME_SCHEMA)


AUDIO_WINDOW_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("window_idx", IntegerType()),
        StructField("byte_offset", LongType()),
        StructField("window_len", IntegerType()),
        StructField("energy", LongType()),
    ]
)


def extract_audio_windows(
    df: DataFrame, blob_col: str = "media_blob", window_bytes: int = 64
) -> DataFrame:
    """Windowed audio feature extraction over opaque payloads: one row
    per non-overlapping window with its integer energy (sum of byte
    values — the stub for RMS; a real soundfile/librosa decoder swaps
    into the same per-batch loop). The tail window is partial, as real
    frame-level audio pipelines emit it.

    Same 100 TB shape as the other media ops: Arrow-batched
    ``mapInPandas``, bytes sliced executor-locally, only the small
    (doc, window, energy) descriptors ever shuffle. Integer energies
    make the stub oracle-checkable.
    """

    def windows(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, offs, lens, energies = [], [], [], [], []
            for doc_id, blob in zip(pdf["doc_id"], pdf[blob_col]):
                b = bytes(blob)
                for k in range(0, max(len(b) + window_bytes - 1, 0) // window_bytes):
                    off = k * window_bytes
                    chunk = b[off:off + window_bytes]
                    ids.append(int(doc_id))
                    idxs.append(k)
                    offs.append(off)
                    lens.append(len(chunk))
                    energies.append(int(sum(chunk)))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "window_idx": pd.Series(idxs, dtype="int32"),
                    "byte_offset": pd.Series(offs, dtype="int64"),
                    "window_len": pd.Series(lens, dtype="int32"),
                    "energy": pd.Series(energies, dtype="int64"),
                }
            )

    return df.select("doc_id", blob_col).mapInPandas(windows, AUDIO_WINDOW_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("src_w", IntegerType()),
        StructField("resized_digest", StringType()),
    ]
)


def resize_raw_images(
    df: DataFrame,
    blob_col: str = "media_blob",
    id_col: str = "doc_id",
    out_w: int = 4,
    out_h: int = 4,
) -> DataFrame:
    """Nearest-neighbor resize over RAW grayscale payloads — the resize
    leg of the multimodal tier, with NO codec dependency: the blob is
    interpreted as a w×w byte grid (w = floor(sqrt(n_bytes)), the
    payload cropped to w²), and the output pixel (y, x) samples source
    byte (floor(y·w/out_h)·w + floor(x·w/out_w)) — integer arithmetic,
    engine-exact. Emits the md5 digest of the out_h×out_w gathered
    bytes so correctness pins the exact pixel selection, not a summary.

    Real Arrow plumbing: one mapInPandas pass, numpy byte views, no
    row-at-a-time Python. Scale shape is map-only. For a real codec
    format (JPEG/PNG), `_decode_codec` decodes first and this resize
    applies to its output array — the grid math is the same.
    """
    import hashlib

    import numpy as np
    import pandas as pd

    out_cols = [f.name for f in RESIZE_SCHEMA.fields]

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, digs = [], [], []
            for did, blob in zip(pdf[id_col], pdf[blob_col]):
                if blob is None:  # null payload: drop, like the oracle's
                    continue      # LENGTH(NULL) filter — never a crash
                buf = np.frombuffer(bytes(blob), dtype=np.uint8)
                w = int(len(buf) ** 0.5)
                if w < 1:
                    continue
                img = buf[: w * w].reshape(w, w)
                ys = (np.arange(out_h) * w) // out_h
                xs = (np.arange(out_w) * w) // out_w
                resized = img[np.ix_(ys, xs)]
                ids.append(did)
                ws.append(w)
                digs.append(hashlib.md5(resized.tobytes()).hexdigest())
            yield pd.DataFrame(
                {"doc_id": ids, "src_w": ws, "resized_digest": digs}
            )[out_cols]

    return df.select(F.col(id_col), F.col(blob_col)).mapInPandas(
        resize, RESIZE_SCHEMA
    )
