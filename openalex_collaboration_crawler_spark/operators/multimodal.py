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


# The deterministic synthetic decoders: ALWAYS available, used by the
# driver-gate `media_features` query explicitly (its DuckDB oracle
# mirrors the sha256 math), regardless of what autodetection wires
# into MEDIA_DECODERS on a machine that has real codec libraries.
SYNTHETIC_DECODERS: dict[str, Callable[[bytes], np.ndarray]] = {
    "image": lambda b: _fake_decode("image", b),
    "audio": lambda b: _fake_decode("audio", b),
    "video_frame": lambda b: _fake_decode("video_frame", b),
}

MEDIA_DECODERS: dict[str, Callable[[bytes], np.ndarray]] = dict(SYNTHETIC_DECODERS)

# kinds whose default decoder was upgraded to a real codec at import
# (empty in this container — no PIL/ffmpeg; see autodetect_codecs)
AVAILABLE_CODECS: dict[str, str] = {}


def register_decoder(kind: str, fn: Callable[[bytes], np.ndarray]) -> None:
    MEDIA_DECODERS[kind] = fn


def real_image_decode(blob: bytes) -> np.ndarray:
    """The production image decoder: PIL decode → grayscale → 4×4
    resize → 16-dim float feature in [0, 1] (same shape/range contract
    as the synthetic decoder, so the Spark plumbing is identical).
    Raises NotImplementedError when no image library is installed
    (this container — deliberate stub per the task brief)."""
    try:
        from PIL import Image  # noqa: PLC0415
    except ImportError as exc:  # pragma: no cover - container has no PIL
        raise NotImplementedError(
            "image decoding requires PIL/opencv — not available in this "
            "container; register a decoder with register_decoder('image', fn)"
        ) from exc
    import io  # noqa: PLC0415

    img = Image.open(io.BytesIO(blob)).convert("L").resize((4, 4))
    return np.asarray(img, dtype=np.float32).reshape(16) / 255.0


def _ffmpeg_bin() -> str | None:
    import shutil as _sh  # noqa: PLC0415

    return _sh.which("ffmpeg")


def real_audio_decode(blob: bytes) -> np.ndarray:
    """Production audio decoder: ffmpeg → mono 8 kHz s16 PCM → 16
    RMS-energy bins in [0, 1]. Raises when ffmpeg is absent."""
    ff = _ffmpeg_bin()
    if ff is None:  # pragma: no cover - container has no ffmpeg
        raise NotImplementedError(
            "audio decoding requires ffmpeg — not available in this "
            "container; register a decoder with register_decoder('audio', fn)"
        )
    import subprocess  # noqa: PLC0415

    out = subprocess.run(
        [ff, "-v", "error", "-i", "pipe:0", "-f", "s16le", "-ac", "1",
         "-ar", "8000", "pipe:1"],
        input=blob, capture_output=True, check=True,
    ).stdout
    pcm = np.frombuffer(out, dtype=np.int16).astype(np.float32) / 32768.0
    if pcm.size == 0:
        return np.zeros(16, dtype=np.float32)
    bins = np.array_split(pcm, 16)
    return np.array(
        [float(np.sqrt(np.mean(b * b))) if b.size else 0.0 for b in bins],
        dtype=np.float32,
    )


def real_video_frame_decode(blob: bytes) -> np.ndarray:
    """Production video decoder: ffmpeg first frame → gray 4×4 raw →
    16-dim float feature. Raises when ffmpeg is absent."""
    ff = _ffmpeg_bin()
    if ff is None:  # pragma: no cover - container has no ffmpeg
        raise NotImplementedError(
            "video decoding requires ffmpeg — not available in this "
            "container; register a decoder with "
            "register_decoder('video_frame', fn)"
        )
    import subprocess  # noqa: PLC0415

    out = subprocess.run(
        [ff, "-v", "error", "-i", "pipe:0", "-frames:v", "1", "-f", "rawvideo",
         "-pix_fmt", "gray", "-s", "4x4", "pipe:1"],
        input=blob, capture_output=True, check=True,
    ).stdout
    arr = np.frombuffer(out[:16], dtype=np.uint8).astype(np.float32)
    if arr.size < 16:  # pragma: no cover - corrupt stream
        arr = np.pad(arr, (0, 16 - arr.size))
    return arr / 255.0


def autodetect_codecs() -> dict[str, str]:
    """Detect optional codec libraries and wire the real decoders into
    ``MEDIA_DECODERS`` (VERDICT r3 next #8). Called once at import;
    idempotent, safe to re-call after installing a library. Kinds with
    no detected codec keep the declared synthetic stub. The driver
    gate is unaffected either way: `media_features` passes
    ``SYNTHETIC_DECODERS`` explicitly so its DuckDB oracle stays exact
    even on machines where detection succeeds."""
    try:
        import PIL  # noqa: F401, PLC0415

        register_decoder("image", real_image_decode)
        AVAILABLE_CODECS["image"] = "PIL"
    except ImportError:
        pass
    if _ffmpeg_bin() is not None:  # pragma: no cover - no ffmpeg here
        register_decoder("audio", real_audio_decode)
        register_decoder("video_frame", real_video_frame_decode)
        AVAILABLE_CODECS["audio"] = "ffmpeg"
        AVAILABLE_CODECS["video_frame"] = "ffmpeg"
    return dict(AVAILABLE_CODECS)


autodetect_codecs()


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
    decoders: dict[str, Callable[[bytes], np.ndarray]] | None = None,
) -> DataFrame:
    """blob → feature vector via the registered decoder for its kind.

    ``batch_rows`` caps rows per yielded Arrow frame so a partition of
    large blobs never materializes as one giant batch. ``decoders``
    pins an explicit decoder table (the driver gate passes
    ``SYNTHETIC_DECODERS`` so its exact oracle survives codec
    autodetection); None snapshots the module-level ``MEDIA_DECODERS``
    AT PLAN-BUILD TIME on the driver — so driver-side
    ``register_decoder`` calls reach executors via the serialized
    closure (executors are separate Python processes; resolving the
    module global there would silently ignore driver registrations)."""
    table = dict(decoders if decoders is not None else MEDIA_DECODERS)

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[lo : lo + batch_rows]
                ids, kinds, vecs, oks = [], [], [], []
                for mid, kind, blob in zip(chunk[id_col], chunk[kind_col], chunk[blob_col]):
                    ids.append(int(mid))
                    kinds.append(kind)
                    decoder = table.get(kind)
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
