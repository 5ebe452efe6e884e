"""Multimodal columns (north-star ops): image/audio/video as opaque
``binary`` payloads with typed metadata, processed through Arrow-batched
``mapInPandas``.

The decode/resize/frame-sample kernels require codec libraries not present
in this container, so the kernel layer is pluggable: ``decoder=None`` uses a
clearly-marked deterministic FAKE (metadata parsed from the payload header
bytes we synthesize) and the real libraries raise NotImplementedError at the
single marked point. Everything Spark-side — schemas, partition sizing,
UDF signatures, Arrow batch shapes — is real and tested.

Scale notes: payloads ride the scan as binary columns; mapInPandas streams
Arrow batches so one task never materializes more than
``spark.sql.execution.arrow.maxRecordsPerBatch`` payloads; feature outputs
are small fixed-width rows, so the stage shrinks data massively — the right
shape for a 100 TB media crawl.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: output schema of extract_features
FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, header string, "
    "checksum long, width int, height int, duration_ms int"
)


def synth_media(documents: DataFrame) -> DataFrame:
    """Deterministic media table derived from documents: payload = utf-8
    bytes of the text prefixed with a fake 16-byte header encoding
    (width, height, duration). Stands in for real image/audio blobs."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod("doc_id", F.lit(3)) + 1).cast("int"),
    )
    w = (F.pmod("doc_id", F.lit(64)) * 16 + 16).cast("int")
    h = (F.pmod("doc_id", F.lit(48)) * 16 + 16).cast("int")
    dur = (F.pmod("doc_id", F.lit(9000)) + 1000).cast("int")
    header = F.concat_ws(
        "|", F.lit("MEDIA"), kind, w.cast("string"), h.cast("string"), dur.cast("string")
    )
    return documents.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        # coalesce: NULL text must yield a header-only payload, not a
        # NULL payload — concat NULL-propagates, and a NULL payload row
        # silently drops out of every byte-level oracle while the decode
        # path sees None (r17 adversarial sweep)
        F.encode(
            F.concat(header, F.lit("\n"), F.coalesce(F.col("text"), F.lit(""))),
            "utf-8",
        ).alias("payload"),
        F.create_map(
            F.lit("source"), F.col("source"), F.lit("lang"), F.col("lang")
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> dict:
    """Deterministic FAKE decoder: parses the synthetic header. A real
    deployment swaps this for PIL/ffmpeg et al."""
    head, _, _body = payload.partition(b"\n")
    parts = head.decode("utf-8", "replace").split("|")
    if len(parts) == 5 and parts[0] == "MEDIA":
        return {
            "header": parts[0],
            "width": int(parts[2]),
            "height": int(parts[3]),
            "duration_ms": int(parts[4]),
        }
    return {"header": "RAW", "width": -1, "height": -1, "duration_ms": -1}


def real_decoder(payload: bytes) -> dict:  # pragma: no cover - env-gated
    """The marked integration point for real codecs."""
    raise NotImplementedError(
        "image/audio codecs are not installed in this environment; "
        "inject a decoder into extract_features(decoder=...)"
    )


def extract_features(
    media: DataFrame, decoder: Callable[[bytes], dict] | None = None
) -> DataFrame:
    """Decode/inspect every payload via Arrow-batched mapInPandas."""
    decode = decoder or _fake_decode

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "header": [m["header"] for m in metas],
                    # cheap rolling checksum over the payload bytes
                    "checksum": [
                        sum((i + 1) * b for i, b in enumerate(p[:1024])) % 1000000007
                        for p in pdf["payload"]
                    ],
                    "width": [m["width"] for m in metas],
                    "height": [m["height"] for m in metas],
                    "duration_ms": [m["duration_ms"] for m in metas],
                }
            )

    return media.mapInPandas(fn, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling *plan*: one output row per (video, frame_ts) — the
    windowize pattern (M2) applied to the time domain. The actual pixel
    decode is the pluggable kernel; the row explosion, which is the
    Spark-side cost, is real."""
    video = media.filter(F.col("kind") == "video")
    feats = extract_features(video).select("media_id", "duration_ms")
    return video.join(feats, "media_id").select(
        "media_id",
        F.posexplode(
            F.sequence(
                F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms)
            )
        ).alias("frame_id", "frame_ts_ms"),
    )
