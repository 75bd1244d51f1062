"""Multimodal column plumbing: image/audio/video as opaque BINARY columns
with typed metadata, processed by Arrow-batched ``mapInPandas`` operators.

The Spark-side engineering — schemas, partitioning, UDF signatures, batch
shapes, header parsing on raw bytes — is real and tested. The PIXEL path
is real too for the uncompressed formats a pure-numpy decoder covers:

* PPM (P6) and BMP (24-bit BI_RGB) decode to (h, w, 3) uint8 arrays
  (``_decode_array``), golden-pixel tested;
* ``resize_pixels`` runs an actual nearest-neighbor resample over those
  arrays and re-encodes PPM bytes, deterministically;
* compressed formats (JPEG/PNG/...) need a real codec — Pillow is used
  when importable, otherwise that branch raises NotImplementedError
  (this container ships no PIL), exactly where the codec slots in.

The synthetic 'IMG1' container (magic + u16 w/h + u8 c) remains the
metadata-only fixture for the header-parsing plumbing tests.

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


def synthetic_media_ppm(
    spark: SparkSession, n: int = 50, num_partitions: int | None = None
) -> DataFrame:
    """Deterministic REAL-image media table: asset i is a binary PPM (P6)
    gradient image, pixel(y, x, c) = (3x + 5y + 11i + 7c) mod 256, with
    dimensions derived from i. Pure function of (i) — identical bytes at
    any partitioning — and decodable by any PPM reader, so the decode /
    resize pixel path is exercised on actual image data."""
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids = pdf["id"].astype("int64")
            rows = {"asset_id": [], "kind": [], "bytes": [], "meta": []}
            for i in ids:
                i = int(i)
                w, h = 8 + i % 13, 6 + (i * 3) % 17
                x = np.arange(w, dtype=np.int64)
                y = np.arange(h, dtype=np.int64)
                c = np.arange(3, dtype=np.int64)
                px = (
                    (3 * x[None, :, None] + 5 * y[:, None, None] + 11 * i + 7 * c[None, None, :])
                    % 256
                ).astype(np.uint8)
                rows["asset_id"].append(i)
                rows["kind"].append("image")
                rows["bytes"].append(pack_ppm(px))
                rows["meta"].append({"source": f"synthetic-ppm/{i}"})
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
                w = h = c = 0
                ok = False
                if raw[:4] == MAGIC and len(raw) >= 9:
                    w, h, c = struct.unpack(">HHB", raw[4:9])
                    ok = True
                elif raw[:2] == b"P6":
                    try:
                        px = _decode_array(raw)
                        if px is not None:
                            h, w, c = px.shape
                            ok = True
                    except NotImplementedError:
                        pass
                elif raw[:2] == b"BM" and len(raw) >= 54:
                    w = int.from_bytes(raw[18:22], "little", signed=True)
                    h = abs(int.from_bytes(raw[22:26], "little", signed=True))
                    c = int.from_bytes(raw[28:30], "little") // 8
                    ok = True
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


def pack_ppm(pixels) -> bytes:
    """Encode an (h, w, 3) uint8 array as a binary PPM (P6)."""
    h, w = pixels.shape[0], pixels.shape[1]
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.tobytes()


def _decode_array(raw: bytes):
    """Decode raw image bytes to an (h, w, 3) uint8 numpy array.

    Pure-numpy real decoders for the uncompressed formats:
    * PPM P6 (magic ``P6``, ASCII header incl. ``#`` comments, maxval 255)
    * BMP 24-bit uncompressed BI_RGB (bottom-up or top-down, 4-byte row
      padding, BGR→RGB)

    Compressed formats fall through to Pillow when available; otherwise
    NotImplementedError marks the codec boundary. Returns None for bytes
    that are not an image at all (caller records valid=false)."""
    import io
    import numpy as np

    if raw[:2] == b"P6":
        # header: 'P6' <ws> width <ws> height <ws> maxval <single ws>
        pos, fields = 2, []
        while len(fields) < 3:
            while pos < len(raw) and raw[pos : pos + 1].isspace():
                pos += 1
            if raw[pos : pos + 1] == b"#":  # comment to end of line
                while pos < len(raw) and raw[pos : pos + 1] != b"\n":
                    pos += 1
                continue
            start = pos
            while pos < len(raw) and not raw[pos : pos + 1].isspace():
                pos += 1
            fields.append(int(raw[start:pos]))
        pos += 1  # the single whitespace after maxval
        w, h, maxval = fields
        if maxval != 255:
            raise NotImplementedError("PPM maxval != 255 needs 16-bit handling")
        n = w * h * 3
        if len(raw) - pos < n:
            return None
        return np.frombuffer(raw, dtype=np.uint8, count=n, offset=pos).reshape(h, w, 3)
    if raw[:2] == b"BM" and len(raw) >= 54:
        off = int.from_bytes(raw[10:14], "little")
        w = int.from_bytes(raw[18:22], "little", signed=True)
        h = int.from_bytes(raw[22:26], "little", signed=True)
        bpp = int.from_bytes(raw[28:30], "little")
        comp = int.from_bytes(raw[30:34], "little")
        if bpp != 24 or comp != 0:
            raise NotImplementedError(
                f"BMP bpp={bpp} compression={comp}: only 24-bit BI_RGB is "
                "decoded without a codec library"
            )
        top_down = h < 0
        h = abs(h)
        stride = (w * 3 + 3) & ~3  # rows padded to 4 bytes
        if len(raw) - off < stride * h:
            return None
        rows = np.frombuffer(
            raw, dtype=np.uint8, count=stride * h, offset=off
        ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
        if not top_down:
            rows = rows[::-1]
        return rows[:, :, ::-1].copy()  # BGR → RGB
    if raw[:4] == MAGIC:
        return None  # metadata-only synthetic container: no pixel payload
    if HAVE_CODECS:
        img = _pil.open(io.BytesIO(raw)).convert("RGB")
        return np.asarray(img, dtype=np.uint8)
    raise NotImplementedError(
        "compressed image formats need a codec library (Pillow); this "
        "environment decodes PPM P6 and 24-bit BMP natively"
    )


def _resize_nn(px, max_side: int):
    """Deterministic nearest-neighbor fit into max_side² (floor index
    mapping, the classic integer NN resample); never upscales."""
    import numpy as np

    h, w = px.shape[0], px.shape[1]
    scale = min(1.0, float(max_side) / float(max(w, h)))
    nw, nh = max(1, int(round(w * scale))), max(1, int(round(h * scale)))
    if (nw, nh) == (w, h):
        return px
    yi = (np.arange(nh) * h) // nh
    xi = (np.arange(nw) * w) // nw
    return px[yi][:, xi]


RESIZED_SCHEMA = (
    "asset_id BIGINT, new_width INT, new_height INT, fmt STRING, bytes BINARY"
)


def resize_pixels(media: DataFrame, max_side: int = 256) -> DataFrame:
    """(asset_id, new_width, new_height, fmt, bytes): REAL pixel-level
    nearest-neighbor resample, Arrow-batched — decode (PPM/BMP natively,
    PIL when present), resample, re-encode PPM. Assets whose bytes don't
    decode to pixels (the metadata-only IMG1 fixture, truncated files)
    are dropped; unsupported compressed formats raise at the codec
    boundary. Bytes never leave the executors."""

    def rz(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"asset_id": [], "new_width": [], "new_height": [], "fmt": [], "bytes": []}
            for aid, b in zip(pdf["asset_id"], pdf["bytes"]):
                px = _decode_array(bytes(b))
                if px is None:
                    continue
                small = _resize_nn(px, max_side)
                out["asset_id"].append(int(aid))
                out["new_width"].append(int(small.shape[1]))
                out["new_height"].append(int(small.shape[0]))
                out["fmt"].append("ppm")
                out["bytes"].append(pack_ppm(small))
            yield pd.DataFrame(out)

    return media.where(F.col("kind") == "image").select("asset_id", "bytes").mapInPandas(
        rz, RESIZED_SCHEMA
    )


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


AUDIO_SCHEMA = (
    "asset_id BIGINT, sample_rate INT, channels INT, n_samples BIGINT, "
    "duration_ms DOUBLE, rms DOUBLE, peak INT, valid BOOLEAN"
)


def pack_wav(samples, sample_rate: int, channels: int = 1) -> bytes:
    """Real RIFF/WAVE container around 16-bit little-endian PCM — the audio
    sibling of ``pack_ppm``: bytes any WAV reader (incl. stdlib ``wave``)
    decodes. ``samples`` is an int array, interleaved when channels > 1."""
    import numpy as np

    data = np.asarray(samples).astype("<i2").tobytes()
    fmt = b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, channels, sample_rate,
        sample_rate * 2 * channels, 2 * channels, 16,
    )
    body = b"WAVE" + fmt + b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def synthetic_media_wav(
    spark: SparkSession, n: int = 50, num_partitions: int | None = None
) -> DataFrame:
    """Deterministic REAL-audio media table: asset i is a mono 16-bit PCM
    WAV whose integer waveform s[t] = ((1009*i + 97*t) mod 4001) - 2000
    and length/rate derive from i. Pure function of i — identical bytes at
    any partitioning — and decodable by any WAV reader."""
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids = pdf["id"].astype("int64")
            rows = {"asset_id": [], "kind": [], "bytes": [], "meta": []}
            for i in ids:
                i = int(i)
                t = np.arange(400 + i % 37, dtype=np.int64)
                s = (1009 * i + 97 * t) % 4001 - 2000
                rate = 8000 * (1 + i % 3)
                rows["asset_id"].append(i)
                rows["kind"].append("audio")
                rows["bytes"].append(pack_wav(s, rate))
                rows["meta"].append({"source": f"synthetic-wav/{i}"})
            yield pd.DataFrame(rows)

    return spark.range(0, n, 1, num_partitions).mapInPandas(gen, MEDIA_SCHEMA)


def _decode_wav(raw: bytes):
    """(sample_rate, channels, samples int16 ndarray) from RIFF/PCM-16
    bytes; walks the chunk list (real files carry LIST/INFO chunks between
    fmt and data). Raises ValueError on anything that is not PCM-16 WAV."""
    import numpy as np

    if len(raw) < 12 or raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE container")
    pos, rate, channels, bits, data = 12, None, None, None, None
    while pos + 8 <= len(raw):
        cid, sz = raw[pos : pos + 4], struct.unpack("<I", raw[pos + 4 : pos + 8])[0]
        body = raw[pos + 8 : pos + 8 + sz]
        if cid == b"fmt ":
            audio_fmt, channels, rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if audio_fmt != 1 or bits != 16:
                raise ValueError(f"unsupported WAV encoding fmt={audio_fmt} bits={bits}")
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    return rate, channels, np.frombuffer(data, dtype="<i2")


def decode_audio_stats(media: DataFrame) -> DataFrame:
    """Real audio decode + per-asset stats via Arrow-batched mapInPandas:
    parse the RIFF/PCM WAV container, then vectorized numpy over the
    sample buffer — duration, RMS, peak. Undecodable bytes yield
    valid=false rows instead of failing the job (same contract as
    ``decode_image_metadata``). This is the quality-filter stage of an
    audio corpus pipeline (drop silence: rms ≈ 0; drop clipped: peak =
    32767), and its output joins back on asset_id."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {k: [] for k in (
                "asset_id", "sample_rate", "channels", "n_samples",
                "duration_ms", "rms", "peak", "valid",
            )}
            for aid, b in zip(pdf["asset_id"], pdf["bytes"]):
                try:
                    rate, ch, s = _decode_wav(bytes(b))
                    n = len(s) // ch
                    x = s.astype("float64")
                    out["sample_rate"].append(rate)
                    out["channels"].append(ch)
                    out["n_samples"].append(n)
                    out["duration_ms"].append(1000.0 * n / rate)
                    out["rms"].append(float(np.sqrt(np.mean(x * x))) if len(s) else 0.0)
                    out["peak"].append(int(np.max(np.abs(s))) if len(s) else 0)
                    out["valid"].append(True)
                except (ValueError, struct.error):
                    for k, v in (("sample_rate", 0), ("channels", 0), ("n_samples", 0),
                                 ("duration_ms", 0.0), ("rms", 0.0), ("peak", 0),
                                 ("valid", False)):
                        out[k].append(v)
                out["asset_id"].append(aid)
            yield pd.DataFrame(out)

    return media.where(F.col("kind") == "audio").select("asset_id", "bytes").mapInPandas(
        decode, AUDIO_SCHEMA
    )
