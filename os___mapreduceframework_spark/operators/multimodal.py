"""Multimodal column plumbing (charter extension).

Images/audio/video are opaque ``binary`` columns with a typed metadata
struct riding alongside. The Spark-side plumbing -- schema, partitioning,
Arrow batch shape, Pandas-UDF signatures -- is real and tested. Decode
is REAL for one container per modality, none needing a codec library:
RIFF/WAVE PCM audio (stdlib ``wave``), Netpbm P6 RGB images (hand
parser), and YUV4MPEG2 (Y4M) raw-frame video (hand parser). Compressed
codecs (JPEG/PNG/H.26x) are NOT decodable here -- they need PIL/ffmpeg,
absent from this container -- so ``decode_media`` rejects those types
with a plain ``ValueError`` (an unsupported-input error, not a stub);
a clearly-marked deterministic fake exercises the pipeline for them.

The fixture corpus has no binary media, so payloads are manufactured
from ``documents.text`` (utf-8 bytes). That choice is irrelevant to the
plumbing: at 100 TB the payload column is parquet binary either way, the
feature extraction is ``mapInPandas`` (Arrow-batched, linear, no
shuffle), and metadata predicates prune at the scan before any bytes are
decoded.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from os___mapreduceframework_spark.queries import query
from os___mapreduceframework_spark.sources import load_table

FAKE_FEATURE_DIM = 8


AUDIO_SAMPLE_RATE = 8000


def make_wav(doc_id: int) -> bytes:
    """Deterministic mono 8-bit PCM WAV payload for ``doc_id`` (stdlib
    ``wave`` encoder): n_samples = doc_id % 256 + 64 samples of the
    byte pattern (i * k) % 256 with k = doc_id % 7 + 1. A real RIFF/WAVE
    container -- the decode side parses it with the stdlib reader, so
    the encode/decode round-trip exercises a genuine media format."""
    import io
    import wave

    n = doc_id % 256 + 64
    k = doc_id % 7 + 1
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(AUDIO_SAMPLE_RATE)
        w.writeframes(bytes((i * k) % 256 for i in range(n)))
    return buf.getvalue()


def make_ppm(doc_id: int) -> bytes:
    """Deterministic P6 (binary Netpbm) RGB image payload for
    ``doc_id``: width = doc_id % 13 + 4, height = doc_id % 9 + 4,
    pixel (x, y) channel c = (3x + 7y + 11c + doc_id) % 256. A real
    image container (header + raw RGB triplets) that needs no codec
    library to read or write."""
    w = doc_id % 13 + 4
    h = doc_id % 9 + 4
    header = f"P6\n{w} {h}\n255\n".encode()
    body = bytes(
        (3 * x + 7 * y + 11 * c + doc_id) % 256
        for y in range(h)
        for x in range(w)
        for c in range(3)
    )
    return header + body


VIDEO_FPS = "25:1"


def make_y4m(doc_id: int) -> bytes:
    """Deterministic YUV4MPEG2 (C444) video payload for ``doc_id``:
    width = doc_id % 6 + 4, height = doc_id % 4 + 3, n_frames =
    doc_id % 5 + 2; pixel (x, y) of frame t has Y = (3x + 7y + 5t +
    doc_id) % 256, U = (Y + 85) % 256, V = (Y + 170) % 256. A real
    video container (stream header + FRAME markers + raw planar
    rasters) that needs no codec library to write or read."""
    w = doc_id % 6 + 4
    h = doc_id % 4 + 3
    n_frames = doc_id % 5 + 2
    out = [f"YUV4MPEG2 W{w} H{h} F{VIDEO_FPS} Ip A1:1 C444\n".encode()]
    for t in range(n_frames):
        out.append(b"FRAME\n")
        base = [3 * x + 7 * y + 5 * t + doc_id for y in range(h) for x in range(w)]
        out.append(bytes(b % 256 for b in base))  # Y
        out.append(bytes((b + 85) % 256 for b in base))  # U
        out.append(bytes((b + 170) % 256 for b in base))  # V
    return b"".join(out)


def decode_media(payload: bytes, media_type: str):
    """Decode an opaque media payload into pixels/samples/frames.

    One REAL decoder per modality, stdlib-only: ``audio/wav`` via the
    stdlib ``wave`` module (RIFF header parse + PCM frame extraction),
    ``image/ppm`` via a Netpbm P6 parser (maxval<=255, comment- and
    whitespace-tolerant header), and ``video/y4m`` via a YUV4MPEG2
    parser (stream header + per-FRAME markers + raw planar rasters).
    Compressed codecs (JPEG/PNG/H.26x) need PIL/ffmpeg, which this
    container lacks; those media types raise ``ValueError`` like any
    other unsupported input. The Spark plumbing around them (binary
    column in, typed features out via mapInPandas) is real either way.
    """
    if media_type == "audio/wav":
        import io
        import wave

        try:
            ctx = wave.open(io.BytesIO(payload), "rb")
        except (wave.Error, EOFError) as exc:
            # the wave module signals a truncated/zero-length/non-RIFF
            # payload with its own Error (or bare EOFError on b"");
            # normalize to the module-wide ValueError contract
            raise ValueError(f"not a decodable WAV payload: {exc}") from exc
        with ctx as w:
            if w.getsampwidth() != 1:
                # list(frames) below is one-byte-per-sample: a wider PCM
                # would silently misdecode into meaningless half-words
                raise ValueError(
                    f"only 8-bit PCM supported; got sample width "
                    f"{w.getsampwidth()}"
                )
            frames = w.readframes(w.getnframes())
            return {
                "n_channels": w.getnchannels(),
                "sample_width": w.getsampwidth(),
                "sample_rate": w.getframerate(),
                "samples": list(frames),  # 8-bit PCM: one byte per sample
            }
    if media_type == "image/ppm":
        # header = magic, width, height, maxval as whitespace-separated
        # tokens; '#' starts a comment through end-of-line
        pos, tokens = 0, []
        while len(tokens) < 4:
            if pos >= len(payload):  # header ends before 4 tokens
                raise ValueError("truncated ppm header")
            if payload[pos : pos + 1] == b"#":
                nl = payload.find(b"\n", pos)
                if nl < 0:
                    raise ValueError("truncated ppm header")
                pos = nl + 1
                continue
            if payload[pos : pos + 1].isspace():
                pos += 1
                continue
            end = pos
            # bound by len(): b"" is not whitespace, so an unterminated
            # final token would otherwise scan forever
            while end < len(payload) and not payload[end : end + 1].isspace():
                end += 1
            tokens.append(payload[pos:end])
            pos = end
        if tokens[0] != b"P6":
            raise ValueError(f"not a P6 ppm: magic {tokens[0]!r}")
        width, height, maxval = (int(t) for t in tokens[1:4])
        if maxval > 255:
            raise ValueError("16-bit ppm not supported")
        pos += 1  # single whitespace after maxval
        raster = payload[pos : pos + 3 * width * height]
        if len(raster) != 3 * width * height:
            raise ValueError("truncated ppm raster")
        return {
            "width": width,
            "height": height,
            "pixels": list(raster),  # RGB interleaved, row-major
        }
    if media_type == "video/y4m":
        # YUV4MPEG2: one ASCII stream-header line, then per-frame
        # "FRAME[ params]\n" markers each followed by a raw planar
        # raster. Only C444 (full-res chroma: 3 * w * h bytes/frame)
        # is accepted -- subsampled layouts have different plane sizes.
        nl = payload.find(b"\n")
        if nl < 0:
            raise ValueError("truncated y4m stream header")
        parts = payload[:nl].split(b" ")
        if parts[0] != b"YUV4MPEG2":
            raise ValueError(f"not a y4m stream: magic {parts[0]!r}")
        width = height = 0
        colorspace = b"C420"  # the spec default when no C tag present
        frame_rate = ""
        for p in parts[1:]:
            if p.startswith(b"W"):
                width = int(p[1:])
            elif p.startswith(b"H"):
                height = int(p[1:])
            elif p.startswith(b"C"):
                colorspace = p
            elif p.startswith(b"F"):
                frame_rate = p[1:].decode("ascii")
        if width <= 0 or height <= 0:
            raise ValueError("y4m header missing W/H")
        if colorspace != b"C444":
            raise ValueError(f"only C444 y4m supported; got {colorspace!r}")
        frame_bytes = 3 * width * height
        pos, frames = nl + 1, []
        while pos < len(payload):
            marker_end = payload.find(b"\n", pos)
            if marker_end < 0 or not payload[pos:marker_end].startswith(b"FRAME"):
                raise ValueError("bad or truncated y4m FRAME marker")
            start = marker_end + 1
            raster = payload[start : start + frame_bytes]
            if len(raster) != frame_bytes:
                raise ValueError("truncated y4m frame raster")
            frames.append(raster)  # Y plane, U plane, V plane (w*h each)
            pos = start + frame_bytes
        return {
            "width": width,
            "height": height,
            "frame_rate": frame_rate,
            "n_frames": len(frames),
            "frames": frames,
        }
    raise ValueError(
        f"unsupported media type {media_type!r}: compressed codecs "
        "(JPEG/PNG/H.26x) require image/video libraries not present in "
        "this container; supported: audio/wav, image/ppm, video/y4m"
    )


def fake_features(payload: bytes, dim: int = FAKE_FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for a decoded-media feature vector:
    md5-seeded floats in [0, 1). Stable across runs and engines."""
    h = hashlib.md5(payload).digest()
    return [h[i] / 255.0 for i in range(dim)]


def encoded_media(docs, make_fn, label: str = "payload"):
    """(doc_id, payload binary): synthesize a deterministic media
    payload per doc via ``make_fn(doc_id)`` inside ONE Arrow-batched
    mapInPandas stage -- the encode step shared by the audio/image
    decode queries (one definition, not three copies)."""

    def encode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": pdf["doc_id"].map(lambda d: make_fn(int(d))),
                }
            )

    return docs.mapInPandas(encode, schema="doc_id long, payload binary")


def with_media_columns(docs: DataFrame) -> DataFrame:
    """(doc_id, payload binary, meta struct): the multimodal schema.

    meta carries media_type plus deterministic fake dimensions; at scale
    these metadata fields are what filters prune on (never the bytes).
    """
    return docs.select(
        "doc_id",
        F.col("text").cast("binary").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("media_type"),
            (F.col("doc_id") % 640 + 16).cast("int").alias("width"),
            (F.col("doc_id") % 480 + 16).cast("int").alias("height"),
        ).alias("meta"),
    )


def extract_features(media: DataFrame, with_embedding: bool = True) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow-batched; each batch stays columnar until the per-payload
    Python call (the decode itself -- the one genuinely Python step).
    Output schema: doc_id, n_bytes, n_space_bytes[, feat array<double>].

    ``with_embedding=False`` skips the per-payload feature hash: Spark
    cannot column-prune THROUGH a mapInPandas black box, so a caller
    that only wants the byte statistics would otherwise still pay the
    md5 + Arrow serialization of a vector it immediately drops.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            # NULL payload (failed fetch/decode): every derived column
            # goes NULL, mirroring the oracles' octet_length(NULL)/
            # md5(NULL) propagation -- len(None) crashed the batch
            cols = {
                "doc_id": pdf["doc_id"],
                "n_bytes": payloads.map(lambda b: None if b is None else len(b)),
                "n_space_bytes": payloads.map(
                    lambda b: None if b is None else b.count(b" ")
                ),
            }
            if with_embedding:
                # [None] * dim, not None: the embed query posexplodes
                # the vector, and the oracle emits dim rows of NULL val
                # for a NULL doc (explode of a NULL array emits none)
                cols["feat"] = payloads.map(
                    lambda b: [None] * FAKE_FEATURE_DIM
                    if b is None
                    else fake_features(b)
                )
            yield pd.DataFrame(cols)

    schema = "doc_id long, n_bytes long, n_space_bytes long"
    if with_embedding:
        schema += ", feat array<double>"
    return media.mapInPandas(batches, schema=schema)


@query(
    "multimodal_meta",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS payload_md5,
           'text/plain' AS media_type,
           CAST(doc_id % 640 + 16 AS INT) AS width
    FROM documents
    ORDER BY doc_id
    """,
    doc="Binary payload column + typed metadata struct: byte length, "
    "content hash, and scan-prunable metadata fields.",
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = with_media_columns(load_table(spark, sf_dir, "documents"))
    return m.select(
        "doc_id",
        F.length("payload").alias("n_bytes"),
        F.md5("payload").alias("payload_md5"),
        F.col("meta.media_type").alias("media_type"),
        F.col("meta.width").alias("width"),
    ).orderBy("doc_id")


@query(
    "multimodal_features",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           length(text) - length(replace(text, ' ', '')) AS n_space_bytes
    FROM documents
    ORDER BY doc_id
    """,
    doc="mapInPandas feature extraction over the binary payload "
    "(Arrow-batched Pandas UDF -- the real multimodal hot path); the "
    "SQL-checkable features (byte counts) are oracled, the md5-seeded "
    "fake embedding is covered by unit tests.",
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = with_media_columns(load_table(spark, sf_dir, "documents"))
    return (
        extract_features(m, with_embedding=False)
        .select("doc_id", "n_bytes", "n_space_bytes")
        .orderBy("doc_id")
    )


RESIZE_TARGET = 224  # aspect-preserving fit box (pixels)
MAX_FRAMES = 8  # frames sampled per video


def resize_media(media: DataFrame, target: int = RESIZE_TARGET) -> DataFrame:
    """Aspect-preserving resize plumbing via mapInPandas: compute the
    fit-into-box output dimensions (pure integer math, oracle-checkable)
    and produce the resized payload. The pixel resample itself is the
    stubbed decode step -- the stand-in truncates the payload to the
    output pixel budget, keeping the bytes-in/bytes-out dataflow and
    Arrow batch shape real. Output: doc_id, out_w, out_h, n_bytes_out.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            w, h = pdf["width"], pdf["height"]
            long_side = w.combine(h, max)
            out_w = (w * target) // long_side
            out_h = (h * target) // long_side
            budget = out_w * out_h
            # NULL payload -> NULL n_bytes_out (the oracle's
            # least(NULL, budget)); dims still compute from metadata
            resized = [
                None if p is None else p[:b]
                for p, b in zip(pdf["payload"], budget)
            ]  # decode_media()+resample at 100 TB; deterministic stub here
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "out_w": out_w,
                    "out_h": out_h,
                    "n_bytes_out": [
                        None if r is None else len(r) for r in resized
                    ],
                }
            )

    flat = media.select(
        "doc_id", "payload", F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )
    return flat.mapInPandas(
        batches, schema="doc_id long, out_w long, out_h long, n_bytes_out long"
    )


@query(
    "multimodal_resize",
    oracle=f"""
    WITH m AS (
      SELECT doc_id,
             octet_length(encode(text)) AS n_bytes,
             doc_id % 640 + 16 AS w, doc_id % 480 + 16 AS h
      FROM documents
    )
    SELECT doc_id,
           (w * {RESIZE_TARGET}) // greatest(w, h) AS out_w,
           (h * {RESIZE_TARGET}) // greatest(w, h) AS out_h,
           -- CASE, not bare least(): DuckDB's LEAST ignores NULL args,
           -- but a NULL payload has no resized bytes at all
           CASE WHEN n_bytes IS NULL THEN NULL
                ELSE least(n_bytes, ((w * {RESIZE_TARGET}) // greatest(w, h))
                           * ((h * {RESIZE_TARGET}) // greatest(w, h)))
           END AS n_bytes_out
    FROM m
    ORDER BY doc_id
    """,
    doc="Aspect-preserving resize over the media column (fit into "
    f"{RESIZE_TARGET}px box): mapInPandas computes output dims and the "
    "resized payload per Arrow batch. Dimensions and the byte budget "
    "are integer math the oracle verifies exactly; the pixel resample "
    "is the stubbed decode (truncation stand-in keeps the dataflow "
    "real). Scan-local, no shuffle until the manifest sort.",
)
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = with_media_columns(load_table(spark, sf_dir, "documents"))
    return resize_media(m).orderBy("doc_id")


@query(
    "multimodal_frame_sample",
    oracle=f"""
    WITH v AS (
      SELECT doc_id, doc_id % 300 + 30 AS n_frames,
             (doc_id % 300 + 30 + {MAX_FRAMES - 1}) // {MAX_FRAMES} AS step
      FROM documents
    )
    SELECT doc_id, n_frames, CAST(f AS BIGINT) AS frame_idx
    FROM v, unnest(range(0, n_frames, step)) AS u(f)
    ORDER BY doc_id, frame_idx
    """,
    doc="Video frame sampling: per-video uniform stride over the frame "
    f"index space (ceil stride caps the sample at {MAX_FRAMES} frames "
    "exactly), realized as sequence()+explode so the sample plan is "
    "relational and the per-frame decode (stubbed) only ever sees "
    "sampled indices. Frame count rides in metadata -- the bytes are "
    "untouched until a downstream decode consumes the sampled frames.",
)
def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    v = docs.select(
        "doc_id",
        (F.col("doc_id") % 300 + 30).alias("n_frames"),
    ).withColumn(
        "step", F.floor((F.col("n_frames") + MAX_FRAMES - 1) / MAX_FRAMES)
    )
    return (
        v.select(
            "doc_id",
            "n_frames",
            F.explode(
                F.sequence(F.lit(0).cast("long"), F.col("n_frames") - 1, F.col("step"))
            ).alias("frame_idx"),
        )
        .orderBy("doc_id", "frame_idx")
    )


@query(
    "multimodal_audio_decode",
    oracle=f"""
    WITH v AS (
      -- rid: decode is PER PAYLOAD ROW, so a replayed/duplicated doc
      -- row must yield its own (identical) output row, not merge its
      -- samples into a doubled per-doc_id sum
      SELECT ROW_NUMBER() OVER () AS rid, doc_id,
             doc_id % 256 + 64 AS n, doc_id % 7 + 1 AS k
      FROM documents
    )
    SELECT v.doc_id,
           {AUDIO_SAMPLE_RATE} AS sample_rate,
           CAST(v.n AS BIGINT) AS n_samples,
           CAST(SUM((u.i * v.k) % 256) AS BIGINT) AS sum_amp,
           CAST(MAX((u.i * v.k) % 256) AS BIGINT) AS max_amp
    FROM v, unnest(range(0, v.n)) AS u(i)
    GROUP BY v.rid, v.doc_id, v.n
    ORDER BY doc_id
    """,
    doc="REAL media decode end-to-end, stdlib-only: a deterministic "
    "mono 8-bit PCM WAV is encoded per document (stdlib wave writer), "
    "flows through the binary payload column as Arrow batches, and is "
    "decoded back by decode_media('audio/wav') -- a genuine RIFF/WAVE "
    "parse, not a fake -- inside mapInPandas; the decoded sample "
    "statistics (count, sum, max of PCM bytes) match a closed-form "
    "DuckDB oracle exactly. Proves the multimodal plumbing carries and "
    "decodes a real container format; image/video stay stubbed only "
    "because their codecs need libraries this environment lacks.",
)
def q_multimodal_audio_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def decode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [decode_media(p, "audio/wav") for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "sample_rate": [d["sample_rate"] for d in decoded],
                    "n_samples": [len(d["samples"]) for d in decoded],
                    "sum_amp": [sum(d["samples"]) for d in decoded],
                    "max_amp": [max(d["samples"]) for d in decoded],
                }
            )

    media = encoded_media(docs, make_wav)
    return media.mapInPandas(
        decode,
        schema="doc_id long, sample_rate int, n_samples bigint, "
        "sum_amp bigint, max_amp bigint",
    ).orderBy("doc_id")


@query(
    "multimodal_embed",
    oracle=f"""
    SELECT doc_id,
           CAST(u.i AS INT) AS dim,
           ROUND(('0x' || substr(md5(text), CAST(2 * u.i + 1 AS INT), 2))::BIGINT
                 / 255.0, 6) AS val
    FROM documents, unnest(range(0, {FAKE_FEATURE_DIM})) AS u(i)
    ORDER BY doc_id, dim
    """,
    doc="Full multimodal embedding pipeline: binary payload -> "
    "mapInPandas -> array<double> feature column. The stand-in decode "
    "is md5-seeded (real decode stubbed behind decode_media), which "
    "makes even this Python-side path exactly oracle-checkable: the "
    "oracle recomputes the same md5-derived components in SQL. The "
    "vector is posexploded to scalar (doc_id, dim, val) rows for the "
    "output: the driver's canonicalizer sorts/hashes the result frame "
    "and cannot hash a top-level array column (r04 red row), and "
    "exploded scalars are the repo-wide convention for vector outputs.",
)
def q_multimodal_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = with_media_columns(load_table(spark, sf_dir, "documents"))
    return (
        extract_features(m)
        .select("doc_id", F.posexplode("feat").alias("dim", "val"))
        .select("doc_id", "dim", F.round("val", 6).alias("val"))
        .orderBy("doc_id", "dim")
    )


_DFT_BINS = (1, 8, 32)


@query(
    "multimodal_audio_spectrum",
    oracle="""
    WITH d AS (
      -- rid: per-payload-row decode (see multimodal_audio_decode)
      SELECT ROW_NUMBER() OVER () AS rid, doc_id,
             doc_id % 256 + 64 AS n, doc_id % 7 + 1 AS k
      FROM documents
    ),
    s AS (
      SELECT rid, doc_id, n, i, CAST((i * k) % 256 AS DOUBLE) AS x
      FROM d, unnest(range(0, n)) AS u(i)
    )
    SELECT doc_id,
           CAST(ANY_VALUE(n) AS BIGINT) AS n_samples,
           ROUND(SQRT(POW(SUM(x * COS(2 * PI() * 1 * i / n)), 2)
                    + POW(SUM(x * SIN(2 * PI() * 1 * i / n)), 2)), 2) AS mag_b1,
           ROUND(SQRT(POW(SUM(x * COS(2 * PI() * 8 * i / n)), 2)
                    + POW(SUM(x * SIN(2 * PI() * 8 * i / n)), 2)), 2) AS mag_b8,
           ROUND(SQRT(POW(SUM(x * COS(2 * PI() * 32 * i / n)), 2)
                    + POW(SUM(x * SIN(2 * PI() * 32 * i / n)), 2)), 2) AS mag_b32
    FROM s
    GROUP BY rid, doc_id
    ORDER BY doc_id
    """,
    doc="Spectral feature extraction on REAL decoded audio: the WAV "
    "payload (stdlib-encoded RIFF container) is decoded back to PCM "
    "samples inside mapInPandas and three DFT bin magnitudes are "
    "computed with vectorized numpy -- the decode->DSP-feature hop of "
    "an audio curation pipeline, Arrow-batched, no per-row Python. The "
    "oracle re-derives the identical sample sequence arithmetically "
    "and evaluates the same DFT sums in SQL, so the decoded bytes and "
    "the feature math are both value-checked.",
)
def q_multimodal_audio_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def spectrum(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            out = {"doc_id": [], "n_samples": []}
            for b in _DFT_BINS:
                out[f"mag_b{b}"] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                d = decode_media(payload, "audio/wav")
                x = np.asarray(d["samples"], dtype=np.float64)
                n = len(x)
                i = np.arange(n, dtype=np.float64)
                out["doc_id"].append(doc_id)
                out["n_samples"].append(n)
                for b in _DFT_BINS:
                    w = 2.0 * math.pi * b * i / n
                    mag = math.hypot(float(x @ np.cos(w)), float(x @ np.sin(w)))
                    out[f"mag_b{b}"].append(round(mag, 2))
            yield pd.DataFrame(out)

    media = encoded_media(docs, make_wav)
    # schema derived from _DFT_BINS so the constant actually
    # parameterizes the operator (the oracle is generated from it too)
    mag_cols = ", ".join(f"mag_b{b} double" for b in _DFT_BINS)
    return media.mapInPandas(
        spectrum,
        schema=f"doc_id long, n_samples bigint, {mag_cols}",
    ).orderBy("doc_id")


@query(
    "multimodal_image_decode",
    oracle="""
    WITH v AS (
      -- rid: per-payload-row decode (see multimodal_audio_decode)
      SELECT ROW_NUMBER() OVER () AS rid, doc_id,
             doc_id % 13 + 4 AS w, doc_id % 9 + 4 AS h
      FROM documents
    ),
    px AS (
      SELECT v.rid, v.doc_id, v.w, v.h, ux.x, uy.y,
             (3 * ux.x + 7 * uy.y + v.doc_id) % 256 AS r,
             (3 * ux.x + 7 * uy.y + 11 + v.doc_id) % 256 AS g,
             (3 * ux.x + 7 * uy.y + 22 + v.doc_id) % 256 AS b,
             CAST(FLOOR(uy.y * 2.0 / v.h) AS INT) AS qy,
             CAST(FLOOR(ux.x * 2.0 / v.w) AS INT) AS qx
      FROM v,
           unnest(range(0, v.w)) AS ux(x),
           unnest(range(0, v.h)) AS uy(y)
    )
    SELECT doc_id,
           CAST(MAX(w) AS INT) AS width,
           CAST(MAX(h) AS INT) AS height,
           CAST(SUM(r) AS BIGINT) AS sum_r,
           CAST(SUM(g) AS BIGINT) AS sum_g,
           CAST(SUM(b) AS BIGINT) AS sum_b,
           CAST(ROUND(AVG(CASE WHEN qy = 0 AND qx = 0 THEN r END), 4)
                AS DOUBLE) AS pool_r00,
           CAST(ROUND(AVG(CASE WHEN qy = 0 AND qx = 1 THEN r END), 4)
                AS DOUBLE) AS pool_r01,
           CAST(ROUND(AVG(CASE WHEN qy = 1 AND qx = 0 THEN r END), 4)
                AS DOUBLE) AS pool_r10,
           CAST(ROUND(AVG(CASE WHEN qy = 1 AND qx = 1 THEN r END), 4)
                AS DOUBLE) AS pool_r11
    FROM px
    GROUP BY rid, doc_id
    ORDER BY doc_id
    """,
    doc="REAL image decode end-to-end, stdlib-only (the image sibling "
    "of multimodal_audio_decode): a deterministic P6 Netpbm RGB image "
    "is encoded per document, flows through the binary payload column "
    "as Arrow batches, and is decoded back by a genuine PPM header+ "
    "raster parse inside mapInPandas -- then ACTUALLY resized (2x2 "
    "mean-pool of the red plane, the real average-pooling a thumbnail "
    "pipeline runs) alongside per-channel pixel sums. Every output is "
    "matched by a closed-form DuckDB oracle over the same pixel "
    "formula. JPEG/PNG stay stubbed only because their codecs need "
    "libraries this environment lacks; the container handling, batch "
    "shape, and pooling math here are the real thing.",
)
def q_multimodal_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def decode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                d = decode_media(bytes(payload), "image/ppm")
                w, h = d["width"], d["height"]
                arr = np.asarray(d["pixels"], dtype="int64").reshape(h, w, 3)
                yy = np.arange(h) * 2 // h
                xx = np.arange(w) * 2 // w
                pools = {
                    f"pool_r{qy}{qx}": round(
                        float(arr[yy == qy][:, xx == qx, 0].mean()), 4
                    )
                    for qy in (0, 1)
                    for qx in (0, 1)
                }
                rows.append(
                    {
                        "doc_id": doc_id,
                        "width": w,
                        "height": h,
                        "sum_r": int(arr[:, :, 0].sum()),
                        "sum_g": int(arr[:, :, 1].sum()),
                        "sum_b": int(arr[:, :, 2].sum()),
                        **pools,
                    }
                )
            yield pd.DataFrame(rows)

    media = encoded_media(docs, make_ppm)
    return media.mapInPandas(
        decode,
        schema="doc_id long, width int, height int, sum_r bigint, "
        "sum_g bigint, sum_b bigint, pool_r00 double, pool_r01 double, "
        "pool_r10 double, pool_r11 double",
    ).orderBy("doc_id")


@query(
    "multimodal_video_decode",
    oracle="""
    WITH v AS (
      -- rid: per-payload-row decode (see multimodal_audio_decode)
      SELECT ROW_NUMBER() OVER () AS rid, doc_id,
             doc_id % 6 + 4 AS w, doc_id % 4 + 3 AS h,
             doc_id % 5 + 2 AS nf
      FROM documents
    ),
    px AS (
      SELECT v.rid, v.doc_id, v.w, v.h, v.nf, tt.t, xx.x, yy.y,
             (3 * xx.x + 7 * yy.y + 5 * tt.t + v.doc_id) % 256 AS yv
      FROM v,
           unnest(range(0, v.nf)) AS tt(t),
           unnest(range(0, v.w)) AS xx(x),
           unnest(range(0, v.h)) AS yy(y)
    )
    SELECT doc_id,
           CAST(MAX(w) AS INT) AS width,
           CAST(MAX(h) AS INT) AS height,
           CAST(MAX(nf) AS BIGINT) AS n_frames,
           CAST(SUM(yv) AS BIGINT) AS sum_y,
           CAST(SUM((yv + 85) % 256 + (yv + 170) % 256) AS BIGINT) AS sum_uv,
           CAST(SUM(CASE WHEN t > 0 THEN
                 ABS(yv - (3 * x + 7 * y + 5 * (t - 1) + doc_id) % 256)
               ELSE 0 END) AS BIGINT) AS motion_abs,
           CAST(SUM(CASE WHEN t = nf - 1 THEN yv ELSE 0 END) AS BIGINT)
             AS sum_y_last
    FROM px
    GROUP BY rid, doc_id
    ORDER BY doc_id
    """,
    doc="REAL video decode end-to-end, stdlib-only (closing the "
    "modality triple with multimodal_audio_decode and "
    "multimodal_image_decode): a deterministic YUV4MPEG2 C444 stream "
    "is encoded per document, flows through the binary payload column "
    "as Arrow batches, and is decoded back by a genuine Y4M stream "
    "parse (header tags, per-FRAME markers, planar rasters) inside "
    "mapInPandas -- then per-video features a curation pipeline runs: "
    "plane sums across frames, frame-to-frame MOTION (sum |Y_t - "
    "Y_{t-1}|, the temporal feature only video has), and the last "
    "frame's luma mass. All integer outputs, matched exactly by a "
    "closed-form DuckDB oracle over the same pixel formula. Compressed "
    "codecs (H.26x) stay unsupported: they need ffmpeg, absent here.",
)
def q_multimodal_video_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def decode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                d = decode_media(bytes(payload), "video/y4m")
                w, h, n = d["width"], d["height"], d["n_frames"]
                planes = (
                    np.frombuffer(b"".join(d["frames"]), dtype=np.uint8)
                    .astype(np.int64)
                    .reshape(n, 3, h * w)
                )
                luma = planes[:, 0, :]
                rows.append(
                    {
                        "doc_id": doc_id,
                        "width": w,
                        "height": h,
                        "n_frames": n,
                        "sum_y": int(luma.sum()),
                        "sum_uv": int(planes[:, 1:, :].sum()),
                        "motion_abs": int(np.abs(np.diff(luma, axis=0)).sum()),
                        "sum_y_last": int(luma[-1].sum()),
                    }
                )
            yield pd.DataFrame(rows)

    media = encoded_media(docs, make_y4m)
    return media.mapInPandas(
        decode,
        schema="doc_id long, width int, height int, n_frames bigint, "
        "sum_y bigint, sum_uv bigint, motion_abs bigint, sum_y_last bigint",
    ).orderBy("doc_id")
