"""Multimodal column plumbing: image/audio/video as opaque BINARY columns
with typed metadata, processed by Arrow-batched ``mapInPandas`` operators.

The Spark-side engineering here is real and tested — schemas, partitioning,
UDF signatures, batch shapes, header parsing on raw bytes. The actual
codec work (JPEG decode, resampling, frame extraction) is STUBBED: the
image/audio libraries are not in this container, so ``decode_image``
parses a deterministic fake header (magic 'IMG1' + big-endian u16
width/height + u8 channels) and ``resize_images`` / ``sample_frames``
compute on the parsed metadata; branches that would need a real codec
raise NotImplementedError behind an import-try, exactly where Pillow /
torchaudio / pyav would slot in.

Media table schema:
    media(asset_id BIGINT, kind STRING, bytes BINARY,
          meta MAP<STRING, STRING>)
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

MEDIA_SCHEMA = "asset_id BIGINT, kind STRING, bytes BINARY, meta MAP<STRING,STRING>"
MAGIC = b"IMG1"

try:  # real codecs would be imported here
    import PIL.Image as _pil  # noqa: F401

    HAVE_CODECS = True
except ImportError:
    HAVE_CODECS = False


def pack_fake_image(width: int, height: int, channels: int = 3, payload: bytes = b"") -> bytes:
    """Deterministic fake image container: 'IMG1' + u16 w + u16 h + u8 c."""
    return MAGIC + struct.pack(">HHB", width, height, channels) + payload


def synthetic_media(spark: SparkSession, n: int = 100, num_partitions: int | None = None) -> DataFrame:
    """Deterministic media table: asset i is a fake image whose dimensions
    derive from i (pure function — reproducible at any partitioning)."""
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].astype("int64")
            rows = {
                "asset_id": ids,
                "kind": ["image"] * len(ids),
                "bytes": [
                    pack_fake_image(64 + int(i) % 512, 48 + (int(i) * 7) % 512,
                                    3 if int(i) % 4 else 1,
                                    bytes([int(i) % 256]) * 16)
                    for i in ids
                ],
                "meta": [{"source": f"synthetic/{int(i)}"} for i in ids],
            }
            yield pd.DataFrame(rows)

    return spark.range(0, n, 1, num_partitions).mapInPandas(gen, MEDIA_SCHEMA)


DECODED_SCHEMA = (
    "asset_id BIGINT, width INT, height INT, channels INT, n_bytes BIGINT, valid BOOLEAN"
)


def decode_image_metadata(media: DataFrame) -> DataFrame:
    """Parse the image header per asset (Arrow-batched; bytes never leave
    the executor). With real codecs this is where PIL.Image.open goes."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "asset_id": pdf["asset_id"],
                "width": [], "height": [], "channels": [], "n_bytes": [], "valid": [],
            }
            for b in pdf["bytes"]:
                raw = bytes(b)
                ok = raw[:4] == MAGIC and len(raw) >= 9
                if ok:
                    w, h, c = struct.unpack(">HHB", raw[4:9])
                else:
                    w = h = c = 0
                out["width"].append(w)
                out["height"].append(h)
                out["channels"].append(c)
                out["n_bytes"].append(len(raw))
                out["valid"].append(ok)
            yield pd.DataFrame(out)

    return media.where(F.col("kind") == "image").select("asset_id", "bytes").mapInPandas(
        decode, DECODED_SCHEMA
    )


def resize_images(media: DataFrame, max_side: int = 256) -> DataFrame:
    """(asset_id, new_width, new_height, scale): the resize PLAN computed
    from decoded metadata (aspect-preserving fit into max_side²). The
    pixel-level resample needs a real codec; `resize_pixels` below raises
    until one is present."""
    meta = decode_image_metadata(media).where("valid")
    scale = F.least(
        F.lit(1.0),
        F.lit(float(max_side)) / F.greatest(F.col("width"), F.col("height")),
    )
    return meta.select(
        "asset_id",
        F.round(F.col("width") * scale).cast("int").alias("new_width"),
        F.round(F.col("height") * scale).cast("int").alias("new_height"),
        F.round(scale, 6).alias("scale"),
    )


def resize_pixels(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Pixel-level resample — requires a real image codec (Pillow), which
    this container doesn't ship. The Spark plumbing (batch shape, schema)
    is `resize_images`; this entry point guards the codec boundary."""
    if not HAVE_CODECS:
        raise NotImplementedError(
            "pixel resample needs an image codec (PIL); only the metadata "
            "plan (resize_images) is available in this environment"
        )
    raise NotImplementedError("codec path reserved for environments with PIL")


FEATURE_SCHEMA = "asset_id BIGINT, embedding ARRAY<FLOAT>"


def extract_features(media: DataFrame, dim: int = 64) -> DataFrame:
    """(asset_id, embedding): content-derived feature vector per asset —
    the Arrow-batched extraction stage a real encoder (CLIP/wav2vec)
    slots into. Without model weights in this container the feature is a
    deterministic L2-normalized byte histogram (mod-``dim`` bincount of
    the raw bytes): identical content ⇒ identical embedding, so the
    downstream similarity operators (``operators/similarity``: ANN top-k,
    near-dup) compose end-to-end and are testable. Bytes never leave the
    executors; output matches the embeddings-table schema, so everything
    that runs on ``embeddings.parquet`` runs on extracted features."""

    def feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            embs = []
            for b in pdf["bytes"]:
                raw = np.frombuffer(bytes(b), dtype=np.uint8)
                h = np.bincount(raw % dim, minlength=dim).astype("float32")
                n = float(np.linalg.norm(h))
                embs.append((h / n).tolist() if n else h.tolist())
            yield pd.DataFrame({"asset_id": pdf["asset_id"], "embedding": embs})

    return media.select("asset_id", "bytes").mapInPandas(feat, FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 10, n_frames_meta_key: str = "n_frames") -> DataFrame:
    """(asset_id, frame_idx): deterministic frame-sampling plan for video
    assets — frame count from metadata (a real demuxer would probe the
    container); indices exploded JVM-side."""
    vids = media.where(F.col("kind") == "video").select(
        "asset_id",
        F.coalesce(
            F.element_at(F.col("meta"), n_frames_meta_key).cast("int"), F.lit(0)
        ).alias("n_frames"),
    )
    return vids.select(
        "asset_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_idx"),
    ).where(F.col("n_frames") > 0)
