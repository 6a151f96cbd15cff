"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

Images are REALLY decoded: a pure-numpy parser handles PPM (P6) / PGM (P5)
and uncompressed 24/32-bit BMP -- no external image library needed.  The
fixtures and the driver query generate real PPM payloads, so
``extract_image_features`` computes features from actual pixels and
``strict=True`` passes end to end.  Payloads in other containers (JPEG,
PNG, ...) fall back to a deterministic byte-derived fake unless
``strict=True``, which raises -- swapping in PIL/pyav changes only
:func:`decode_image`'s fallback branch.  Video frame EXTRACTION is real
for the fixture container (a concatenated-PPM stream, MJPEG-like): frames
are demuxed and per-frame features computed from actual pixels; mp4/webm
and friends would need pyav and fall back (or raise under strict).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_DDL = (
    "media_id LONG, kind STRING, payload BINARY, width INT, height INT, "
    "sample_rate INT, n_frames INT"
)


# ---------- pure-numpy image codecs ----------

def encode_ppm(pixels: np.ndarray) -> bytes:
    """(H, W, 3) uint8 -> binary PPM (P6)."""
    h, w = pixels.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        pixels, dtype=np.uint8).tobytes()


def _ppm_header(buf: bytes) -> tuple[bytes, list[int], int]:
    """(magic, [w, h, maxval], body offset); '#' comments allowed."""
    magic = buf[:2]
    pos = 2
    vals: list[int] = []
    while len(vals) < 3 and pos < len(buf):
        c = buf[pos:pos + 1]
        if c in b" \t\r\n":
            pos += 1
        elif c == b"#":
            nl = buf.find(b"\n", pos)
            pos = len(buf) if nl < 0 else nl + 1
        elif c.isdigit():
            end = pos
            while end < len(buf) and buf[end:end + 1].isdigit():
                end += 1
            vals.append(int(buf[pos:end]))
            pos = end
        else:
            raise ValueError(f"bad PPM header byte {c!r}")
    return magic, vals, pos + 1  # single whitespace after maxval


def decode_ppm(buf: bytes) -> np.ndarray:
    """Binary PPM (P6) / PGM (P5) -> (H, W, 3) uint8."""
    magic, (w, h, maxval), off = _ppm_header(buf)
    if maxval != 255:
        raise ValueError(f"only 8-bit PPM supported, maxval={maxval}")
    ch = 3 if magic == b"P6" else 1
    body = np.frombuffer(buf, dtype="u1", count=w * h * ch, offset=off)
    img = body.reshape(h, w, ch)
    return np.repeat(img, 3, axis=2) if ch == 1 else img


def decode_bmp(buf: bytes) -> np.ndarray:
    """Uncompressed 24/32-bit BMP (BI_RGB) -> (H, W, 3) uint8."""
    if buf[:2] != b"BM":
        raise ValueError("not a BMP")
    data_off = int.from_bytes(buf[10:14], "little")
    w = int.from_bytes(buf[18:22], "little", signed=True)
    h = int.from_bytes(buf[22:26], "little", signed=True)
    bpp = int.from_bytes(buf[28:30], "little")
    comp = int.from_bytes(buf[30:34], "little")
    if comp != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    bottom_up = h > 0
    h = abs(h)
    nb = bpp // 8
    stride = (w * nb + 3) // 4 * 4
    rows = np.frombuffer(buf, dtype="u1", count=stride * h,
                         offset=data_off).reshape(h, stride)
    px = rows[:, : w * nb].reshape(h, w, nb)
    rgb = px[:, :, 2::-1]  # BGR(A) -> RGB
    return np.ascontiguousarray(rgb[::-1] if bottom_up else rgb)


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """PCM16 mono -> RIFF/WAVE bytes (stdlib-parsable audio container)."""
    data = np.ascontiguousarray(samples, dtype="<i2").tobytes()
    return (b"RIFF" + (36 + len(data)).to_bytes(4, "little") + b"WAVE"
            + b"fmt " + (16).to_bytes(4, "little")
            + (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
            + sample_rate.to_bytes(4, "little")
            + (sample_rate * 2).to_bytes(4, "little")
            + (2).to_bytes(2, "little") + (16).to_bytes(2, "little")
            + b"data" + len(data).to_bytes(4, "little") + data)


def decode_wav(buf: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 -> ((n, channels) int16 samples, sample_rate).
    Pure-numpy chunk walker; raises on compressed/float WAV."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    rate = channels = bits = None
    data = None
    while pos + 8 <= len(buf):
        cid = buf[pos:pos + 4]
        size = int.from_bytes(buf[pos + 4:pos + 8], "little")
        body = buf[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = int.from_bytes(body[0:2], "little")
            if fmt != 1:
                raise ValueError(f"only PCM WAV supported, format={fmt}")
            channels = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
            if bits != 16:
                raise ValueError(f"only 16-bit PCM supported, bits={bits}")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    samples = np.frombuffer(data, dtype="<i2")
    return samples.reshape(-1, channels), rate


def decode_ppm_stream(buf: bytes) -> list[np.ndarray]:
    """Concatenated binary PPM frames (the fixture 'video' container, an
    MJPEG-like stream with a stdlib-parsable codec) -> list of (H, W, 3)
    frames.  Each frame is self-delimiting: header + w*h*3 body bytes."""
    frames: list[np.ndarray] = []
    pos = 0
    n = len(buf)
    while pos < n:
        magic, (w, h, maxval), off = _ppm_header(buf[pos:pos + 64])
        if magic != b"P6" or maxval != 255:
            raise ValueError(f"bad PPM frame at offset {pos}")
        body_off = pos + off
        frames.append(np.frombuffer(buf, dtype="u1", count=w * h * 3,
                                    offset=body_off).reshape(h, w, 3))
        pos = body_off + w * h * 3
    return frames


def decode_image(payload: bytes, strict: bool = False) -> np.ndarray | None:
    """payload -> (H, W, 3) uint8 pixels.  Real decode for PPM/PGM/BMP;
    None (or raise, if strict) for containers this environment can't parse
    without an image library."""
    head = bytes(payload[:2]) if payload else b""
    if head in (b"P6", b"P5"):
        return decode_ppm(bytes(payload))
    if head == b"BM":
        return decode_bmp(bytes(payload))
    if strict:
        raise NotImplementedError(
            f"container {head!r} needs an image library (PIL/pyav) not "
            "present here; PPM/PGM/BMP decode natively")
    return None


def _fake_features(payload: bytes, out_elems: int) -> np.ndarray:
    """Deterministic byte-derived fallback for undecodable payloads."""
    raw = np.frombuffer(payload or b"\x00", dtype="u1")
    reps = int(np.ceil(out_elems / max(len(raw), 1)))
    return np.tile(raw, reps)[:out_elems].astype(np.float32) / 256.0


def image_features(pixels: np.ndarray, feat_dim: int) -> np.ndarray:
    """Pixels -> fixed-dim features: normalized grayscale histogram
    (feat_dim - 4 bins) + [mean_r, mean_g, mean_b, std_gray] / 255."""
    gray = pixels.astype(np.float32).mean(axis=2)
    bins = max(feat_dim - 4, 1)
    hist, _ = np.histogram(gray, bins=bins, range=(0.0, 256.0))
    hist = hist.astype(np.float32) / max(gray.size, 1)
    tail = np.array([pixels[:, :, 0].mean(), pixels[:, :, 1].mean(),
                     pixels[:, :, 2].mean(), gray.std()], dtype=np.float32) / 255.0
    return np.concatenate([hist, tail])[:feat_dim].astype(np.float32)


def synth_media_table(spark, docs: DataFrame, kind: str = "image") -> DataFrame:
    """Deterministic media table with REAL (decodable) PPM payloads whose
    pixels are a pure function of doc_id -- the image-pipeline fixture.
    Dims are plain modular functions of the id (not hash-derived) so an
    ANSI-SQL oracle can recompute every pixel closed-form
    (:func:`image_channel_sums_oracle_sql`)."""
    # videos are short (<=12 frames) so the concatenated-PPM payloads stay
    # small; images carry a single frame
    n_frames = (F.pmod(F.col("doc_id") * 13, F.lit(12)) + 1 if kind == "video"
                else F.lit(1))
    meta = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit(kind).alias("kind"),
        (F.pmod(F.col("doc_id"), F.lit(48)) + 16).cast("int").alias("width"),
        (F.pmod(F.col("doc_id") * 7, F.lit(48)) + 16).cast("int").alias("height"),
        F.lit(16000).cast("int").alias("sample_rate"),
        n_frames.cast("int").alias("n_frames"),
    )

    def frame_pixels(mid: int, w: int, h: int, f: int) -> np.ndarray:
        yy, xx = np.mgrid[0:h, 0:w].astype(np.int64)
        base = np.int64(mid) + np.int64(f) * 7
        return np.stack([
            (xx * 3 + base) % 256,
            (yy * 5 + base * 7) % 256,
            (xx + yy + base * 13) % 256,
        ], axis=2).astype(np.uint8)

    def audio_samples(mid: int) -> np.ndarray:
        # closed-form PCM16 so a SQL oracle can recompute every sample
        n = (int(mid) % 50 + 10) * 80
        i = np.arange(n, dtype=np.int64)
        return ((i * 31 + int(mid) * 17) % 65536 - 32768).astype("<i2")

    def gen(it):
        for pdf in it:
            payloads = []
            for mid, w, h, nf in zip(pdf["media_id"], pdf["width"],
                                     pdf["height"], pdf["n_frames"]):
                if kind == "audio":
                    payloads.append(encode_wav(audio_samples(mid), 16000))
                else:
                    payloads.append(b"".join(
                        encode_ppm(frame_pixels(mid, w, h, f))
                        for f in range(nf)))
            out = pdf.copy()
            out["payload"] = payloads
            yield out[["media_id", "kind", "payload", "width", "height",
                       "sample_rate", "n_frames"]]

    return meta.mapInPandas(gen, MEDIA_DDL)


def extract_image_features(media: DataFrame, feat_dim: int = 64,
                           strict: bool = False) -> DataFrame:
    """payload -> fixed-dim float feature vector (Arrow-batched kernel)
    from REAL decoded pixels (PPM/PGM/BMP); non-decodable payloads use the
    deterministic byte fallback unless ``strict``."""

    def feats(it):
        for pdf in it:
            mats = []
            for p in pdf["payload"]:
                px = decode_image(p, strict)
                mats.append(image_features(px, feat_dim) if px is not None
                            else _fake_features(p, feat_dim))
            yield pd.DataFrame({
                "media_id": pdf["media_id"].to_numpy(),
                "features": [m.tolist() for m in mats],
            })

    return media.filter(F.col("kind") == "image").select("media_id", "payload") \
        .mapInPandas(feats, "media_id long, features array<float>")


def image_channel_sums(media: DataFrame, strict: bool = True) -> DataFrame:
    """Exact per-channel pixel sums from REAL decoded pixels -- the
    oracle-checkable face of the image pipeline.  The fixture pixels are a
    closed-form function of (media_id, x, y) (synth_media_table), so a
    DuckDB oracle recomputes these integers exactly
    (:func:`image_channel_sums_oracle_sql`); equality proves the PPM
    decode read every pixel."""

    def sums(it):
        for pdf in it:
            rows = {"media_id": pdf["media_id"].to_numpy(),
                    "width": [], "height": [],
                    "sum_r": [], "sum_g": [], "sum_b": []}
            for p in pdf["payload"]:
                px = decode_image(p, strict)
                if px is None:
                    px = np.zeros((0, 0, 3), dtype=np.uint8)
                rows["height"].append(px.shape[0])
                rows["width"].append(px.shape[1])
                s = px.astype(np.int64).sum(axis=(0, 1))
                rows["sum_r"].append(int(s[0]))
                rows["sum_g"].append(int(s[1]))
                rows["sum_b"].append(int(s[2]))
            yield pd.DataFrame(rows)

    return media.filter(F.col("kind") == "image").select("media_id", "payload") \
        .mapInPandas(sums, "media_id long, width int, height int, "
                           "sum_r long, sum_g long, sum_b long")


def image_channel_sums_oracle_sql(table: str = "documents") -> str:
    """DuckDB recomputation of :func:`image_channel_sums` over the
    synth_media_table fixture: pixel (x, y) of media m is
    ((3x + m) % 256, (5y + 7m) % 256, (x + y + 13m) % 256) with
    w = m % 48 + 16, h = 7m % 48 + 16 -- all plain modular arithmetic."""
    return f"""
        WITH m AS (
          SELECT doc_id AS media_id,
                 CAST(doc_id % 48 + 16 AS INT) AS width,
                 CAST((doc_id * 7) % 48 + 16 AS INT) AS height
          FROM {table}
        )
        SELECT media_id, width, height,
               CAST(height * list_sum(list_transform(
                 range(0, width), x -> (3 * x + media_id) % 256))
                 AS BIGINT) AS sum_r,
               CAST(width * list_sum(list_transform(
                 range(0, height), y -> (5 * y + 7 * media_id) % 256))
                 AS BIGINT) AS sum_g,
               CAST(list_sum(list_transform(flatten(list_transform(
                 range(0, height), y -> list_transform(
                   range(0, width), x -> (x + y + 13 * media_id) % 256))),
                 v -> v)) AS BIGINT) AS sum_b
        FROM m
    """


def resize_images(media: DataFrame, target_w: int = 224, target_h: int = 224,
                  strict: bool = False) -> DataFrame:
    """Real nearest-neighbor resample for decodable payloads: new PPM
    payload + updated typed metadata.  Undecodable payloads pass through
    (or raise under ``strict``)."""

    def rs(it):
        for pdf in it:
            payloads = []
            for p in pdf["payload"]:
                px = decode_image(p, strict)
                if px is None:
                    payloads.append(p)
                    continue
                h, w = px.shape[:2]
                yi = (np.arange(target_h) * h // target_h).clip(0, h - 1)
                xi = (np.arange(target_w) * w // target_w).clip(0, w - 1)
                payloads.append(encode_ppm(px[yi][:, xi]))
            yield pd.DataFrame({
                "media_id": pdf["media_id"].to_numpy(),
                "payload": payloads,
                "width": np.full(len(pdf), target_w, dtype=np.int32),
                "height": np.full(len(pdf), target_h, dtype=np.int32),
            })

    return media.filter(F.col("kind") == "image") \
        .select("media_id", "payload", "width", "height") \
        .mapInPandas(rs, "media_id long, payload binary, width int, height int")


def extract_audio_features(media: DataFrame, strict: bool = True) -> DataFrame:
    """Exact audio stats from REAL decoded PCM: (media_id, sample_rate,
    n_samples, sum_samples, max_abs).  The fixture samples are a
    closed-form function of (media_id, i), so a DuckDB oracle recomputes
    these integers exactly (:func:`audio_features_oracle_sql`) -- equality
    proves the WAV decode read every sample."""

    def feats(it):
        for pdf in it:
            rows = {"media_id": pdf["media_id"].to_numpy(),
                    "sample_rate": [], "n_samples": [],
                    "sum_samples": [], "max_abs": []}
            for p in pdf["payload"]:
                p = bytes(p)
                if p[:4] == b"RIFF":
                    samples, rate = decode_wav(p)
                    mono = samples.astype(np.int64).sum(axis=1)
                elif strict:
                    raise NotImplementedError(
                        f"audio container {p[:4]!r} needs an audio library; "
                        "RIFF/WAVE PCM decodes natively")
                else:
                    mono, rate = np.zeros(0, dtype=np.int64), 0
                rows["sample_rate"].append(rate)
                rows["n_samples"].append(len(mono))
                rows["sum_samples"].append(int(mono.sum()))
                rows["max_abs"].append(int(np.abs(mono).max(initial=0)))
            yield pd.DataFrame(rows)

    return media.filter(F.col("kind") == "audio").select("media_id", "payload") \
        .mapInPandas(feats, "media_id long, sample_rate int, n_samples int, "
                            "sum_samples long, max_abs long")


def audio_features_oracle_sql(table: str = "documents") -> str:
    """DuckDB recomputation of :func:`extract_audio_features` over the
    synth_media_table audio fixture: sample i of media m is
    (31i + 17m) % 65536 - 32768 with n = (m % 50 + 10) * 80."""
    return f"""
        WITH m AS (
          SELECT doc_id AS media_id,
                 (doc_id % 50 + 10) * 80 AS n FROM {table}
        ), s AS (
          SELECT media_id, n,
                 list_transform(range(0, n),
                   i -> (31 * i + 17 * media_id) % 65536 - 32768) AS vals
          FROM m
        )
        SELECT media_id,
               CAST(16000 AS INT) AS sample_rate,
               CAST(n AS INT) AS n_samples,
               CAST(list_sum(vals) AS BIGINT) AS sum_samples,
               CAST(list_max(list_transform(vals, v -> abs(v))) AS BIGINT) AS max_abs
        FROM s
    """


def sample_frames(media: DataFrame, every_n: int = 10, feat_dim: int = 16,
                  strict: bool = False) -> DataFrame:
    """Frame sampling for video rows with REAL frame extraction: the
    fixture container is a concatenated-PPM stream (MJPEG-like, stdlib
    parsable), decoded ONCE per video inside the batch kernel -- each
    kept frame's features come from its actual pixels.  The payload is
    never exploded per frame (a per-frame explode would shuffle the whole
    video once per kept frame).  Containers needing a real demuxer
    (mp4/webm) fall back to the deterministic byte fake, or raise under
    ``strict``."""

    def fr(it):
        for pdf in it:
            mids, idxs, feats = [], [], []
            for mid, p, nf in zip(pdf["media_id"], pdf["payload"],
                                  pdf["n_frames"]):
                p = bytes(p)
                frames = None
                if p[:2] == b"P6":
                    frames = decode_ppm_stream(p)
                elif strict:
                    raise NotImplementedError(
                        f"video container {p[:2]!r} needs a demuxer "
                        "(pyav) not present here; concatenated-PPM "
                        "streams decode natively")
                for f in range(0, int(nf), every_n):
                    mids.append(mid)
                    idxs.append(f)
                    if frames is not None and f < len(frames):
                        feats.append(image_features(frames[f], feat_dim).tolist())
                    else:
                        feats.append(_fake_features(p, feat_dim).tolist())
            yield pd.DataFrame({
                "media_id": np.array(mids, dtype=np.int64),
                "frame_idx": np.array(idxs, dtype=np.int32),
                "frame_feat": feats,
            })

    return (media.filter(F.col("kind") == "video")
            .select("media_id", "payload", "n_frames")
            .mapInPandas(fr, "media_id long, frame_idx int, "
                             "frame_feat array<float>"))
