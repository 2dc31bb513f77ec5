"""Multimodal column plumbing: images/audio/video as opaque binary.

The Spark-side machinery — schemas, Arrow batch shapes, partitioning,
metadata extraction — is real and tested; the actual media decoding
is stubbed behind ``MEDIA_DECODERS`` (the image/audio libraries are
not in this container; a deployment registers real decoders with the
same signature). Deterministic fake features keep the pipeline
end-to-end testable.

Design rules for 100 TB of media:
- media stays an opaque ``binary`` column next to typed metadata;
  never base64 in strings (2× size), never exploded per-pixel.
- all per-blob work happens in ``mapInPandas`` (Arrow moves the bytes
  once per batch); feature vectors come back as ``array<float>``.
- blobs are large → keep ``spark.sql.files.maxPartitionBytes`` sized
  so a task's Arrow batch fits executor memory; the ``batch_rows``
  knob below caps rows per yielded frame for the same reason.
"""

from __future__ import annotations

import hashlib
import zlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "media_id long, kind string, n_bytes long, checksum string, decode_ok boolean"
)
FEATURE_SCHEMA = "media_id long, kind string, feature array<float>, decode_ok boolean"


def _fake_decode(kind: str, blob: bytes) -> np.ndarray:
    """Deterministic stand-in for a real decoder: a 16-dim feature from
    the blob's digest. A real deployment replaces this via
    ``register_decoder`` with PIL/torchaudio/ffmpeg logic — the Spark
    plumbing (signature: bytes → float vector) is identical."""
    digest = hashlib.sha256(kind.encode() + blob).digest()
    arr = np.frombuffer(digest[:16], dtype=np.uint8).astype(np.float32)
    return arr / 255.0


MEDIA_DECODERS: dict[str, Callable[[bytes], np.ndarray]] = {
    "image": lambda b: _fake_decode("image", b),
    "audio": lambda b: _fake_decode("audio", b),
    "video_frame": lambda b: _fake_decode("video_frame", b),
}


def register_decoder(kind: str, fn: Callable[[bytes], np.ndarray]) -> None:
    MEDIA_DECODERS[kind] = fn


def real_image_decode(blob: bytes) -> np.ndarray:  # pragma: no cover
    """The production decoder slot. Raises until a real image library
    is installed and registered (deliberate stub per the task brief)."""
    raise NotImplementedError(
        "image decoding requires PIL/opencv — not available in this "
        "container; register a decoder with register_decoder('image', fn)"
    )


def media_metadata(media: DataFrame, id_col: str = "media_id", kind_col: str = "kind", blob_col: str = "blob") -> DataFrame:
    """Cheap typed metadata without decoding: size + checksum +
    a decodability probe (zlib header sniff for the synthetic corpus)."""

    def meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "kind": pdf[kind_col],
                    "n_bytes": [len(bytes(b)) if b is not None else 0 for b in pdf[blob_col]],
                    "checksum": [
                        hashlib.md5(bytes(b)).hexdigest() if b is not None else None
                        for b in pdf[blob_col]
                    ],
                    "decode_ok": [
                        b is not None and len(bytes(b)) > 2 for b in pdf[blob_col]
                    ],
                }
            )
            yield out

    return media.mapInPandas(meta, schema=MEDIA_META_SCHEMA)


def extract_features(
    media: DataFrame,
    id_col: str = "media_id",
    kind_col: str = "kind",
    blob_col: str = "blob",
    batch_rows: int = 256,
) -> DataFrame:
    """blob → feature vector via the registered decoder for its kind.

    ``batch_rows`` caps rows per yielded Arrow frame so a partition of
    large blobs never materializes as one giant batch."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[lo : lo + batch_rows]
                ids, kinds, vecs, oks = [], [], [], []
                for mid, kind, blob in zip(chunk[id_col], chunk[kind_col], chunk[blob_col]):
                    ids.append(int(mid))
                    kinds.append(kind)
                    decoder = MEDIA_DECODERS.get(kind)
                    if decoder is None or blob is None:
                        vecs.append(None)
                        oks.append(False)
                        continue
                    try:
                        vecs.append(decoder(bytes(blob)).tolist())
                        oks.append(True)
                    except Exception:  # noqa: BLE001
                        vecs.append(None)
                        oks.append(False)
                yield pd.DataFrame(
                    {"media_id": ids, "kind": kinds, "feature": vecs, "decode_ok": oks}
                )

    return media.mapInPandas(feats, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = "media_id long, kind string, blob binary, width int, height int, resize_ok boolean"
FRAME_SCHEMA = "media_id long, frame_idx int, frame binary, ts_ms long"


def _fake_resize(blob: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for decode→resize→encode: output bytes
    derive from (input digest, target dims) with size ∝ area — a real
    deployment registers a PIL/opencv transformer with this exact
    signature; the Spark-side schema/batching is identical.

    The fake output is the ASCII hex digest (not raw digest bytes) so
    the driver's DuckDB oracle — whose hash functions are VARCHAR-only
    — can reproduce it byte-for-byte; the column stays ``binary``."""
    digest = hashlib.sha256(blob + f"{width}x{height}".encode()).hexdigest().encode()
    return digest * max(1, (width * height) // (16 * len(digest)))


def resize_images(
    media: DataFrame,
    width: int = 64,
    height: int = 64,
    id_col: str = "media_id",
    kind_col: str = "kind",
    blob_col: str = "blob",
    batch_rows: int = 128,
) -> DataFrame:
    """Image-resize plumbing: binary in → binary out + typed dims.
    Non-image kinds pass through with resize_ok=false (no decode
    attempt). Row count preserved; blob sizes bounded by the target
    area, so downstream partitions shrink predictably."""

    def rz(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[lo : lo + batch_rows]
                blobs, oks = [], []
                for kind, blob in zip(chunk[kind_col], chunk[blob_col]):
                    if kind != "image" or blob is None:
                        blobs.append(bytes(blob) if blob is not None else None)
                        oks.append(False)
                        continue
                    try:
                        blobs.append(_fake_resize(bytes(blob), width, height))
                        oks.append(True)
                    except Exception:  # noqa: BLE001
                        blobs.append(None)
                        oks.append(False)
                yield pd.DataFrame(
                    {
                        "media_id": chunk[id_col].astype("int64"),
                        "kind": chunk[kind_col],
                        "blob": blobs,
                        "width": width,
                        "height": height,
                        "resize_ok": oks,
                    }
                )

    return media.mapInPandas(rz, schema=RESIZED_SCHEMA)


def sample_video_frames(
    media: DataFrame,
    n_frames: int = 4,
    frame_interval_ms: int = 1000,
    id_col: str = "media_id",
    kind_col: str = "kind",
    blob_col: str = "blob",
) -> DataFrame:
    """Frame sampling: ONE video blob → ``n_frames`` frame rows (the
    row-multiplying media shape — an Arrow-batched flatMap). Frames
    here are deterministic digests of (blob, idx); a real deployment
    registers an ffmpeg-style extractor with the same
    one-in/many-out signature. Non-video rows yield nothing."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, blobs, tss = [], [], [], []
            for mid, kind, blob in zip(pdf[id_col], pdf[kind_col], pdf[blob_col]):
                if kind != "video_frame" or blob is None:
                    continue
                for i in range(n_frames):
                    ids.append(int(mid))
                    idxs.append(i)
                    # ASCII hex frame payload (oracle-reproducible; see
                    # _fake_resize) — still an opaque binary column
                    blobs.append(
                        hashlib.sha256(bytes(blob) + str(i).encode()).hexdigest().encode()
                    )
                    tss.append(i * frame_interval_ms)
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame": blobs, "ts_ms": tss}
            )

    return media.mapInPandas(frames, schema=FRAME_SCHEMA)


def build_synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media corpus: pseudo-random ASCII-hex bytes
    tagged with a kind — exercises the full opaque-binary path.

    blob = sha256(str(media_id)).hexdigest() × 16 (1,024 bytes). Using
    the hex digest rather than raw digest bytes keeps every synthetic
    blob valid UTF-8, so the driver's DuckDB oracle (VARCHAR-only hash
    functions) can rebuild the corpus and hash the identical byte
    stream; Spark still carries it as ``binary`` end-to-end."""
    base = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video_frame")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.col("id").cast("string").alias("payload_seed"),
    )

    def blobs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[["media_id", "kind"]].copy()
            out["blob"] = [
                hashlib.sha256(s.encode()).hexdigest().encode() * 16
                for s in pdf["payload_seed"]
            ]
            yield out

    return base.mapInPandas(blobs, schema="media_id long, kind string, blob binary")
