"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio decode libraries are not available in this environment, so the
decode step is a clearly-marked deterministic stub; everything Spark-side
is real: binary column handling, Arrow-batched mapInPandas over bytes,
stable output schema, partition-preserving batch shape. The stub derives
"decoded" metadata purely from the byte length, which makes the whole
pipeline SQL-oracle-checkable (octet_length in DuckDB).
"""

from __future__ import annotations

from pyspark.sql import functions as F

MM_SCHEMA = "doc_id long, n_bytes long, width int, height int, n_frames int"


def _fake_decode_meta(n_bytes: int) -> tuple[int, int, int]:
    """STUB: stands in for image/video decode (no codec libs here).
    Deterministic pure function of payload size."""
    width = 64 + n_bytes % 640
    height = 64 + (n_bytes * 7) % 480
    n_frames = 1 + n_bytes % 30
    return width, height, n_frames


def mm_decode_meta(spark, sf_dir):
    """Binary payload -> decoded metadata via Arrow-batched mapInPandas.

    The payload is synthesized from `text` (UTF-8 bytes) since the test
    tables carry no real media; on a production table this is the
    image/audio bytes column and _fake_decode_meta is replaced by a real
    decoder (PIL/ffmpeg) with the same Spark plumbing.
    """
    import pandas as pd

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )

    def decode(batches):
        for pdf in batches:
            n = pdf["payload"].map(len)
            meta = n.map(_fake_decode_meta)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n.astype("int64"),
                    "width": meta.map(lambda m: m[0]).astype("int32"),
                    "height": meta.map(lambda m: m[1]).astype("int32"),
                    "n_frames": meta.map(lambda m: m[2]).astype("int32"),
                }
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
    aspect ratio (integer floor like a real thumbnailer). The decode is
    the stub; the dim arithmetic and plumbing are the real pipeline."""
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
    duration derived from payload size (stub decode: 10 ms per byte).
    Emits (doc_id, win_start_ms, win_end_ms) rows -- the shape a feature
    extractor (mel spectrogram etc.) consumes per window."""
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
