"""Multimodal-column queries: binary payload plumbing over mapInPandas
(north-star ops). The media table is synthesized deterministically from
``documents`` (multimodal/binary_ops.py), so the *metadata* outputs of the
Arrow-batched decode path are SQL-predictable — the oracle cross-checks the
real mapInPandas plumbing against closed-form arithmetic. The payload
checksum (bytes-level) is rows-only.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cinegraph_spark.multimodal.binary_ops import (
    extract_features,
    frame_sample_plan,
    synth_media,
)
from cinegraph_spark.queries import register
from cinegraph_spark.queries.util import T
from cinegraph_spark.session import ensure_shipped

# header: 'MEDIA|<kind>|<w>|<h>|<dur>' ; payload = header \n text (ascii)
_KIND_SQL = "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END"
_W_SQL = "(doc_id % 64) * 16 + 16"
_H_SQL = "(doc_id % 48) * 16 + 16"
_DUR_SQL = "(doc_id % 9000) + 1000"
_HEADER_SQL = (
    f"'MEDIA|' || {_KIND_SQL} || '|' || CAST({_W_SQL} AS VARCHAR) || '|' "
    f"|| CAST({_H_SQL} AS VARCHAR) || '|' || CAST({_DUR_SQL} AS VARCHAR)"
)


@register(
    "media_payload_checksums",
    f"""
    WITH p AS (
      SELECT doc_id AS media_id,
             {_HEADER_SQL} || chr(10) || coalesce(text, '') AS s
      FROM documents
    )
    SELECT media_id,
           CAST(strlen(s) AS BIGINT) AS n_bytes,
           CAST(sum(i * ascii(substr(s, CAST(i AS INT), 1))) % 1000000007
                AS BIGINT) AS checksum
    FROM p, unnest(range(1, least(strlen(s), 1024) + 1)) AS u(i)
    GROUP BY media_id, s
    """,
    tags=("multimodal", "mapinpandas"),
)
def media_payload_checksums(spark, sf_dir):
    """Position-weighted payload checksum per media row (the byte-touching
    half of the decode path — mapInPandas over the raw bytes). The oracle
    recomputes it character-wise in SQL, which is byte-exact here because
    the fixture corpus is printable ASCII (verified: utf-8 bytes == chars
    at every SF); on a non-ASCII corpus this oracle would diverge and the
    check would drop back to rows-only."""
    ensure_shipped(spark)  # workers must import the binary_ops kernels
    media = synth_media(T(spark, sf_dir, "documents"))
    return extract_features(media).select("media_id", "n_bytes", "checksum")


@register(
    "media_frame_sample_plan",
    f"""
    WITH video AS (
      SELECT doc_id AS media_id, {_DUR_SQL} AS dur
      FROM documents WHERE doc_id % 3 = 2
    )
    SELECT media_id,
           CAST(f // 1000 AS INT) AS frame_id,
           CAST(f AS INT)         AS frame_ts_ms
    FROM video, unnest(range(0, dur, 1000)) AS u(f)
    """,
    tags=("multimodal", "frames"),
)
def media_frame_sample_plan(spark, sf_dir):
    """Frame-sampling row explosion (M2's windowize pattern in the time
    domain): one row per (video, 1s frame tick)."""
    ensure_shipped(spark)  # workers must import the binary_ops kernels
    media = synth_media(T(spark, sf_dir, "documents"))
    plan = frame_sample_plan(media, every_ms=1000)
    return plan.select(
        "media_id",
        F.col("frame_id").cast("int").alias("frame_id"),
        F.col("frame_ts_ms").cast("int").alias("frame_ts_ms"),
    )


@register(
    "media_kind_profile",
    f"""
    SELECT {_KIND_SQL} AS kind,
           count(*) AS n,
           CAST(sum(len({_HEADER_SQL}) + 1 + strlen(coalesce(text, ''))) AS BIGINT) AS total_bytes,
           CAST(max({_W_SQL}) AS BIGINT) AS max_width
    FROM documents GROUP BY 1
    """,
    tags=("multimodal", "agg"),
)
def media_kind_profile(spark, sf_dir):
    """Storage profile per modality (scan stays on metadata; payloads are
    column-pruned away — verify with .explain: ReadSchema excludes payload
    when this runs against a stored media table)."""
    ensure_shipped(spark)  # workers must import the binary_ops kernels
    media = synth_media(T(spark, sf_dir, "documents"))
    sizes = media.groupBy("kind").agg(
        F.count("*").alias("n"),
        F.sum(F.length("payload")).cast("long").alias("total_bytes"),
    )
    widths = (
        extract_features(media)
        .groupBy("kind")
        .agg(F.max("width").cast("long").alias("max_width"))
    )
    return sizes.join(widths, "kind")


# NOTE: registered last within this module on purpose — it was already
# driver-verified in round 2, so the not-yet-verified media queries above
# claim the earlier registry slots (see queries/__init__.py::load_all).
@register(
    "media_feature_extract",
    f"""
    SELECT doc_id AS media_id,
           {_KIND_SQL} AS kind,
           CAST(len({_HEADER_SQL}) + 1 + strlen(coalesce(text, '')) AS BIGINT) AS n_bytes,
           'MEDIA' AS header,
           CAST({_W_SQL} AS INT)   AS width,
           CAST({_H_SQL} AS INT)   AS height,
           CAST({_DUR_SQL} AS INT) AS duration_ms
    FROM documents
    """,
    tags=("multimodal", "mapinpandas"),
)
def media_feature_extract(spark, sf_dir):
    """Binary decode path (Arrow-batched mapInPandas with the deterministic
    fake decoder) — metadata output cross-checked against closed-form SQL.
    Real codecs plug into the same kernel point (binary_ops.real_decoder)."""
    ensure_shipped(spark)  # workers must import the binary_ops kernels
    media = synth_media(T(spark, sf_dir, "documents"))
    return extract_features(media).drop("checksum")
