"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The Spark-side plumbing (schema, partitioning, UDF signature, Arrow batch
shape) is real and tested; the actual media *decode* is stubbed behind a
deterministic fake because the image/audio libraries are not in this
container (``set_decoder`` swaps in a real one, e.g. PIL/librosa, on a
cluster that has them).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame, functions as F

MEDIA_DDL = (
    "media_id long, modality string, mime string, width int, height int, "
    "duration_ms int, payload binary"
)


def synthesize_media(spark, n: int = 256, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    rng = np.random.default_rng(seed)
    rows = []
    modalities = [("image", "image/png"), ("audio", "audio/wav"), ("video", "video/mp4")]
    for i in range(n):
        modality, mime = modalities[i % 3]
        size = int(rng.integers(64, 4096))
        payload = rng.integers(0, 256, size=size, dtype=np.int64).astype(np.uint8).tobytes()
        rows.append((i, modality, mime, int(rng.integers(16, 512)),
                     int(rng.integers(16, 512)), int(rng.integers(100, 60_000)), payload))
    return spark.createDataFrame(rows, MEDIA_DDL)


def media_from_documents(docs: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """Derive a media table from a real document table: payload = the
    UTF-8 text bytes as an opaque binary column + typed metadata. Gives
    the multimodal plumbing a relational provenance (a SQL oracle can
    recompute the fake-decoder features from the same table), unlike a
    driver-synthesized table."""
    mod = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col(id_col) % 3 + 1).cast("int"))
    mimes = F.element_at(
        F.array(F.lit("image/png"), F.lit("audio/wav"), F.lit("video/mp4")),
        (F.col(id_col) % 3 + 1).cast("int"))
    return docs.select(
        F.col(id_col).alias("media_id"),
        mod.alias("modality"),
        mimes.alias("mime"),
        (F.length(text_col) % 512 + 16).cast("int").alias("width"),
        (F.length(text_col) % 256 + 16).cast("int").alias("height"),
        (F.length(text_col) * 100).cast("int").alias("duration_ms"),
        F.encode(text_col, "UTF-8").alias("payload"),
    )


def _fake_decode(payload, modality: str) -> np.ndarray:
    """Deterministic stand-in for a real media decoder: a fixed-length
    feature vector derived from the payload digest. A real deployment
    replaces this via :func:`set_decoder` (e.g. PIL decode + resize +
    channel means; librosa MFCCs; frame-sampled video embeddings)."""
    if payload is None:
        return np.zeros(1, dtype=np.float64)  # null payload -> zero features
    h = hashlib.sha256(payload).digest()
    return np.frombuffer(h, dtype=np.uint8).astype(np.float64) / 255.0


_DECODER = _fake_decode


def set_decoder(fn) -> None:
    """Swap in a real decoder: fn(payload, modality) -> np.ndarray.

    ``payload`` arrives as a zero-copy memoryview of the Arrow data buffer
    (wrap in bytes() if the target library insists on bytes) — except for
    a NULL payload row, which arrives as ``None`` (NOT an empty
    memoryview: a zero-length payload and a null payload are distinct;
    ADVICE r3). ``modality`` is the row's modality string, or ``None`` if
    that column is null."""
    global _DECODER
    _DECODER = fn


# ---- real media decode: RIFF/WAVE PCM (pure numpy, no dependencies) ---------

WAV_SAMPLE_RATE = 8000


def decode_wav(payload) -> np.ndarray:
    """A REAL media decoder with zero third-party dependencies: parse a
    RIFF/WAVE container and return the mono PCM-16 samples as int16.
    Walks the chunk list (fmt / data may be preceded by LIST etc.),
    validates PCM format 1 @ 16 bits, and reads the data chunk with one
    np.frombuffer. Raises ValueError on anything malformed — decode
    failures must be loud, not zero-features."""
    b = bytes(payload)
    if len(b) < 44 or b[0:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt_ok, data = 12, False, None
    while pos + 8 <= len(b):
        cid = b[pos:pos + 4]
        size = int.from_bytes(b[pos + 4:pos + 8], "little")
        body = b[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt = int.from_bytes(body[0:2], "little")
            channels = int.from_bytes(body[2:4], "little")
            bits = int.from_bytes(body[14:16], "little")
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV: fmt={audio_fmt} ch={channels} bits={bits}")
            fmt_ok = True
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if not fmt_ok or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    return np.frombuffer(data, dtype="<i2")


def wav_feature_decoder(payload, modality=None) -> np.ndarray:
    """Decoder for :func:`extract_features`: real WAV decode + integer
    features [n_samples, sum(|s|), s_0, max(s)] — integer-exact in
    float64, so a SQL oracle recomputing the same arithmetic hash-matches
    bit for bit."""
    s = decode_wav(payload).astype(np.int64)
    if len(s) == 0:
        return np.zeros(4, dtype=np.float64)
    return np.array([len(s), np.abs(s).sum(), s[0], s.max()], dtype=np.float64)


def synthesize_wav_media(docs: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """Real RIFF/WAVE payloads with SQL-derivable PCM content, rooted in a
    relational table: document d gets ``n = length(text) % 64 + 16`` mono
    16-bit samples ``s_k = (d*31 + k*7) % 65536 - 32768`` at 8 kHz. The
    WAV container + :func:`decode_wav` are then the only untrusted links
    between the relational oracle and the decoded features — exactly what
    the multimodal_real_decode gate exercises. (Per-payload container
    assembly loops per row: fixture machinery, not a pipeline hot path;
    the length pass is an Arrow kernel.)"""
    import pyarrow as pa_mod

    def udf(iterator):
        for tbl in iterator:
            ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
            import pyarrow.compute as pc_mod
            lens = pc_mod.utf8_length(tbl.column(text_col)) \
                .to_numpy(zero_copy_only=False)
            payloads = []
            for d, ln in zip(ids, lens):
                n = ln % 64 + 16
                k = np.arange(n, dtype=np.int64)
                s = ((int(d) * 31 + k * 7) % 65536 - 32768).astype("<i2")
                data = s.tobytes()
                hdr = (b"RIFF" + (36 + len(data)).to_bytes(4, "little") + b"WAVE"
                       + b"fmt " + (16).to_bytes(4, "little")
                       + (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
                       + WAV_SAMPLE_RATE.to_bytes(4, "little")
                       + (WAV_SAMPLE_RATE * 2).to_bytes(4, "little")
                       + (2).to_bytes(2, "little") + (16).to_bytes(2, "little")
                       + b"data" + len(data).to_bytes(4, "little"))
                payloads.append(hdr + data)
            yield pa_mod.RecordBatch.from_arrays(
                [pa_mod.array(ids, type=pa_mod.int64()),
                 pa_mod.array(["audio"] * len(ids), type=pa_mod.string()),
                 pa_mod.array(payloads, type=pa_mod.binary())],
                names=["media_id", "modality", "payload"])

    return docs.select(id_col, text_col).mapInArrow(
        udf, "media_id long, modality string, payload binary")


# ---- real media decode: PPM (P6) images (pure numpy, no dependencies) -------


def decode_ppm(payload) -> np.ndarray:
    """A real binary-PPM (P6) image decoder: parse the whitespace/comment-
    separated header (magic, width, height, maxval) and return the pixels
    as an (h, w, 3) uint8 array. Raises ValueError on anything malformed
    — same loud-failure contract as decode_wav."""
    b = bytes(payload)
    if b[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(b) and b[pos:pos + 1].isspace():
            pos += 1
        if b[pos:pos + 1] == b"#":  # comment to end of line
            while pos < len(b) and b[pos:pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(b) and not b[pos:pos + 1].isspace():
            pos += 1
        if pos == start:
            raise ValueError("truncated PPM header")
        fields.append(int(b[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255 or w <= 0 or h <= 0:
        raise ValueError(f"unsupported PPM: {w}x{h} maxval={maxval}")
    data = b[pos:pos + w * h * 3]
    if len(data) != w * h * 3:
        raise ValueError("PPM data shorter than header promises")
    return np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3)


def ppm_feature_decoder(payload, modality=None) -> np.ndarray:
    """Decoder for :func:`extract_features`: real PPM decode + integer
    features [n_pixels, sum(R channel), sum(all bytes), max byte] —
    integer-exact in float64 for the SQL oracle."""
    img = decode_ppm(payload).astype(np.int64)
    return np.array([img.shape[0] * img.shape[1], img[:, :, 0].sum(),
                     img.sum(), img.max()], dtype=np.float64)


def synthesize_ppm_media(docs: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """Real P6 PPM payloads with SQL-derivable pixel content: document d
    gets a ``w = length(text) % 8 + 2`` × ``h = d % 6 + 2`` RGB image with
    byte ``(d*7 + y*5 + x*3 + c) % 256`` at row-major position (y, x, c).
    Same gate design as synthesize_wav_media: the container + decode_ppm
    are the only untrusted links."""
    import pyarrow as pa_mod

    def udf(iterator):
        for tbl in iterator:
            ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
            import pyarrow.compute as pc_mod
            lens = pc_mod.utf8_length(tbl.column(text_col)) \
                .to_numpy(zero_copy_only=False)
            payloads = []
            for d, ln in zip(ids, lens):
                d = int(d)
                w, h = ln % 8 + 2, d % 6 + 2
                i = np.arange(w * h * 3, dtype=np.int64)
                y, x, c = i // (w * 3), (i % (w * 3)) // 3, i % 3
                pix = ((d * 7 + y * 5 + x * 3 + c) % 256).astype(np.uint8)
                payloads.append(b"P6\n%d %d\n255\n" % (w, h) + pix.tobytes())
            yield pa_mod.RecordBatch.from_arrays(
                [pa_mod.array(ids, type=pa_mod.int64()),
                 pa_mod.array(["image"] * len(ids), type=pa_mod.string()),
                 pa_mod.array(payloads, type=pa_mod.binary())],
                names=["media_id", "modality", "payload"])

    return docs.select(id_col, text_col).mapInArrow(
        udf, "media_id long, modality string, payload binary")


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize of an (h, w, c) array — the pure-numpy
    'resize' stage of the decode → resize → feature chain. Source index
    for output (y, x) is (y*h // out_h, x*w // out_w): integer arithmetic,
    so a SQL oracle can recompute resized pixels exactly."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h, dtype=np.int64) * h) // out_h
    xs = (np.arange(out_w, dtype=np.int64) * w) // out_w
    return img[ys[:, None], xs[None, :]]


def sample_frames(payload, frame_bytes: int, every_k: int) -> list:
    """Frame-sample an opaque concatenated-fixed-size-frames video
    payload: zero-copy memoryview slices of every k-th frame (the brief's
    frame-sample stage; a real container parser would replace the
    fixed-size assumption via set_decoder)."""
    if frame_bytes <= 0 or every_k <= 0:
        raise ValueError("frame_bytes and every_k must be positive")
    mv = memoryview(payload)
    n = len(mv) // frame_bytes
    return [mv[i * frame_bytes:(i + 1) * frame_bytes]
            for i in range(0, n, every_k)]


def ppm_resized_feature_decoder(payload, modality=None,
                                out_h: int = 3, out_w: int = 3) -> np.ndarray:
    """decode → resize → feature: integer features of the nearest-neighbor
    resized image [n_resized_pixels, sum(all), max, top-left R]."""
    img = resize_nearest(decode_ppm(payload), out_h, out_w).astype(np.int64)
    return np.array([out_h * out_w, img.sum(), img.max(), img[0, 0, 0]],
                    dtype=np.float64)


def extract_features(df: DataFrame, feature_dim: int = 32,
                     decoder=None) -> DataFrame:
    """payload -> float feature vector via mapInArrow. The only per-item
    Python is the decode call itself (inherently per-item — a real PIL /
    librosa decoder consumes one payload at a time); everything around it
    is zero-copy: payloads are memoryview slices of the Arrow data buffer
    (never materialized as Python bytes lists), the modality column is
    dictionary-encoded (one Python string per DISTINCT modality), and the
    feature matrix goes back to Arrow as one flat buffer. Partitioning:
    repartition upstream by media_id so decode parallelism matches cores.

    ``decoder``: per-call decoder override (e.g. :func:`wav_feature_decoder`);
    defaults to the module-level one installed via :func:`set_decoder`."""
    import pyarrow.compute as pc

    def udf(iterator):
        for tbl in iterator:
            ids = tbl.column("media_id")
            pay = tbl.column("payload")
            if isinstance(pay, pa.ChunkedArray):
                pay = pay.combine_chunks()
            n = len(pay)
            if n:
                # BinaryArray layout: buffers = [validity, int32 offsets,
                # data]; honor the array's slice offset
                offs = np.frombuffer(pay.buffers()[1], dtype=np.int32)[
                    pay.offset : pay.offset + n + 1]
                data = memoryview(pay.buffers()[2])
            else:
                offs, data = np.zeros(1, dtype=np.int32), memoryview(b"")
            # null payload rows reach the decoder as None (a zero-length
            # slice would be indistinguishable from a genuinely empty
            # payload — ADVICE r3); null modality likewise maps to None
            pay_null = (np.asarray(pay.is_null()) if n and pay.null_count
                        else np.zeros(n, dtype=bool))
            d = pc.dictionary_encode(tbl.column("modality"))
            idx_arr = d.indices
            if idx_arr.null_count:
                idx_arr = idx_arr.fill_null(-1)
            mod_idx = np.asarray(idx_arr)
            mods = d.dictionary.to_pylist()  # distinct modalities only
            feats = np.zeros((n, feature_dim), dtype=np.float64)
            dec = decoder or _DECODER
            for i in range(n):
                pl = None if pay_null[i] else data[offs[i]:offs[i + 1]]
                m = mods[mod_idx[i]] if mod_idx[i] >= 0 else None
                v = dec(pl, m)
                feats[i, : min(feature_dim, len(v))] = v[:feature_dim]
            offsets = pa.array(np.arange(n + 1, dtype=np.int32) * feature_dim,
                               type=pa.int32())
            values = pa.array(feats.ravel(), type=pa.float64())
            yield pa.RecordBatch.from_arrays(
                [ids, pa.ListArray.from_arrays(offsets, values)],
                names=["media_id", "features"],
            )

    src = df.select("media_id", "modality", "payload")
    return src.mapInArrow(udf, "media_id long, features array<double>")


def media_stats(df: DataFrame) -> DataFrame:
    """Typed-metadata aggregation — stays entirely JVM-side."""
    return (
        df.groupBy("modality")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.length("payload")).alias("total_bytes"),
            F.avg("width").alias("avg_width"),
            F.avg("duration_ms").alias("avg_duration_ms"),
        )
    )
