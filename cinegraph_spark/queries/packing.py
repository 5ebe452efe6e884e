"""Sequence packing for training-data pipelines: concatenate documents in a
deterministic order and cut the token stream into fixed-capacity chunks
(the GPT-style "concat-and-chunk" batch layout). The reference has no such
operator (its windowizer slices *within* a document, ``model.py:174-177``);
packing is the corpus-level dual and a core op for any 100 TB pretraining
pipeline: it turns ragged documents into uniform training rows.

Semantics are deliberately shard-local: documents are packed per ``source``
(ordered by ``doc_id``), so each shard's token stream is independent. That
is both what real pipelines do (packing never crosses shard boundaries —
workers own shards) and what makes the op scale: the running token total is
a shard-local window prefix-sum, no global ordering. As of round 9 the
per-source prefix-sum is additionally HIERARCHICAL (sub-sharded on
``doc_id DIV 256`` inside each source, shard totals cumulated over the
tiny shard relation, offsets broadcast back) so even a single
pathologically huge source never serializes through one reducer — same
math, bit-identical output.

Capacity is 512 tokens to match the windowizer's model context
(``settings.py`` CHUNK_SIZE); all arithmetic is integer-exact, so oracle
parity is bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from cinegraph_spark.operators.windowize import tokenize_whitespace
from cinegraph_spark.queries import register
from cinegraph_spark.queries.util import T

CAPACITY = 512

#: Hierarchical-packing shard width: docs are prefix-summed inside
#: doc_id-range shards of this span, then shard totals are cumulated over
#: the (corpus/SHARD_SPAN)-row shard relation. Monotone in doc_id, so the
#: two-level sum is bit-identical to the flat per-split prefix-sum.
SHARD_SPAN = 256

# cum_before = tokens of all earlier docs in the same source shard
# (doc_id order). DuckDB's empty-frame sum is NULL -> coalesce to 0.
_PACKED_CTE = f"""
    toks AS (
      SELECT doc_id, source,
             CAST(len(list_filter(string_split_regex(
                 regexp_replace(text, '^[ \\t\\n\\r\\f]+|[ \\t\\n\\r\\f]+$', '', 'g'), '[ \\t\\n\\r\\f]+'),
                 t -> t <> '')) AS BIGINT) AS n_tok
      FROM documents
    ),
    packed AS (
      SELECT doc_id, source, n_tok,
             CAST(coalesce(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS cum_before
      FROM toks WHERE n_tok > 0
    ),
    spans AS (
      SELECT doc_id, source, n_tok, cum_before,
             CAST(cum_before // {CAPACITY} AS BIGINT)               AS chunk_first,
             CAST((cum_before + n_tok - 1) // {CAPACITY} AS BIGINT) AS chunk_last
      FROM packed
    )
"""


@register(
    "pack_chunks_per_source",
    f"""
    WITH {_PACKED_CTE}
    SELECT doc_id, source, n_tok, cum_before, chunk_first, chunk_last,
           chunk_last - chunk_first + 1 AS n_chunks_spanned
    FROM spans
    """,
    tags=("packing", "llm-pipeline"),
)
def pack_chunks_per_source(spark, sf_dir):
    """Per-document chunk span under concat-and-chunk packing: where each
    document's tokens land in its source shard's 512-token chunk stream.

    The prefix-sum is HIERARCHICAL (round 9 — same trick as the
    training-prep composite, closing the documented limitation at the top
    of this module): a flat ``Window.partitionBy("source")`` serializes
    each source's entire token stream through one reducer, so one
    pathologically huge source becomes a single-task straggler at 100 TB.
    Instead: (1) intra-shard prefix-sum inside (source, doc_id DIV 256)
    sub-shards — bounded tasks however big the source; (2) cumulate shard
    totals over the tiny (corpus/256)-row shard relation; (3) broadcast
    the offsets back. shard is monotone in doc_id within a source, so the
    two-level sum is bit-identical to the flat per-source prefix-sum —
    same oracle, same hash. A document spanning a chunk boundary reports
    the full inclusive span."""
    d = T(spark, sf_dir, "documents").select(
        "doc_id", "source", tokenize_whitespace(F.col("text")).alias("tokens")
    )
    d = d.select(
        "doc_id", "source", F.size("tokens").cast("long").alias("n_tok")
    ).filter(F.col("n_tok") > 0)
    # Lazy localCheckpoint: `d` has TWO consumers (the intra-shard window
    # branch and the shard-totals rollup) with different exchange shapes,
    # so ReuseExchange cannot unify them — without this the expensive
    # regex tokenize of every document runs once per branch (same hazard
    # and fix as pipeline_training_data_prep's `labeled`). The
    # materialized frame is 4 narrow columns.
    d = d.withColumn(
        "shard", (F.col("doc_id") / SHARD_SPAN).cast("long")
    ).localCheckpoint(eager=False)
    w_in = (
        Window.partitionBy("source", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    intra_before = F.coalesce(
        F.sum("n_tok").over(w_in), F.lit(0).cast("long")
    )
    w_sh = (
        Window.partitionBy("source")
        .orderBy("shard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    shard_offsets = (
        d.groupBy("source", "shard")
        .agg(F.sum("n_tok").alias("sh_tok"))
        .select(
            "source",
            "shard",
            F.coalesce(F.sum("sh_tok").over(w_sh), F.lit(0).cast("long")).alias(
                "sh_off"
            ),
        )
    )
    s = (
        d.select(
            "doc_id",
            "source",
            "shard",
            "n_tok",
            intra_before.alias("intra_before"),
        )
        .join(
            F.broadcast(
                shard_offsets.withColumnsRenamed(
                    {"source": "_so_source", "shard": "_so_shard"}
                )
            ),
            # null-safe on source: a NULL source is a real shard (window
            # partitioning groups it; both engines agree) but a plain
            # equality join silently drops its documents from the packing
            # (r17 adversarial sweep)
            (F.col("source").eqNullSafe(F.col("_so_source")))
            & (F.col("shard") == F.col("_so_shard")),
        )
        .select(
            "doc_id",
            "source",
            "n_tok",
            (F.col("sh_off") + F.col("intra_before")).alias("cum_before"),
        )
    ).select(
        "*",
        (F.col("cum_before") / CAPACITY).cast("long").alias("chunk_first"),
        ((F.col("cum_before") + F.col("n_tok") - 1) / CAPACITY)
        .cast("long")
        .alias("chunk_last"),
    )
    return s.select(
        "doc_id",
        "source",
        "n_tok",
        "cum_before",
        "chunk_first",
        "chunk_last",
        (F.col("chunk_last") - F.col("chunk_first") + 1).alias("n_chunks_spanned"),
    )


@register(
    "pack_chunk_manifest",
    f"""
    WITH {_PACKED_CTE},
    contrib AS (
      SELECT source, unnest(generate_series(chunk_first, chunk_last)) AS chunk_id,
             doc_id, cum_before, n_tok
      FROM spans
    )
    SELECT source, chunk_id,
           count(*)        AS n_docs,
           CAST(sum(least(cum_before + n_tok, (chunk_id + 1) * {CAPACITY})
                    - greatest(cum_before, chunk_id * {CAPACITY})) AS BIGINT)
                           AS n_tok_filled,
           min(doc_id)     AS first_doc,
           max(doc_id)     AS last_doc
    FROM contrib
    GROUP BY source, chunk_id
    """,
    tags=("packing", "llm-pipeline"),
)
def pack_chunk_manifest(spark, sf_dir):
    """The chunk-side view of packing: for every (source, chunk) training
    row, how many documents contribute, how many tokens fill it (CAPACITY
    everywhere except each shard's ragged final chunk), and the contributing
    doc-id range — the manifest a data loader needs to map a training row
    back to its provenance. Explode of the per-doc chunk span (bounded:
    a doc adds ceil(n_tok/512)+1 rows max) then one hash agg on
    (source, chunk)."""
    spans = pack_chunks_per_source(spark, sf_dir)
    contrib = spans.select(
        "source",
        F.explode(F.sequence("chunk_first", "chunk_last")).alias("chunk_id"),
        "doc_id",
        "cum_before",
        "n_tok",
    )
    fill = F.least(
        F.col("cum_before") + F.col("n_tok"), (F.col("chunk_id") + 1) * CAPACITY
    ) - F.greatest(F.col("cum_before"), F.col("chunk_id") * CAPACITY)
    return contrib.groupBy("source", "chunk_id").agg(
        F.count("*").alias("n_docs"),
        F.sum(fill).cast("bigint").alias("n_tok_filled"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


def _prep_oracle_sql() -> str:
    from cinegraph_spark.functions.text_clean import clean_subtitles_sql
    from cinegraph_spark.queries.util import SCRAMBLE_SQL

    return f"""
    WITH base AS (
      SELECT doc_id, {clean_subtitles_sql("text")} AS cleaned FROM documents
    ),
    tok AS (
      SELECT doc_id, md5(cleaned) AS h,
             list_filter(string_split_regex(
                 regexp_replace(cleaned, '^[ \\t\\n\\r\\f]+|[ \\t\\n\\r\\f]+$', '', 'g'), '[ \\t\\n\\r\\f]+'),
                 t -> t <> '') AS tokens
      FROM base
    ),
    stats AS (
      SELECT doc_id, h, CAST(len(tokens) AS BIGINT) AS n_tok,
             CAST(len(list_distinct(tokens)) AS BIGINT) AS n_uniq
      FROM tok
    ),
    q AS (SELECT *, (n_tok >= 40 AND n_uniq * 100 >= 37 * n_tok) AS pass_q
          FROM stats),
    surv AS (SELECT h, min(doc_id) AS survivor_id FROM q WHERE pass_q
             GROUP BY h),
    labeled AS (
      SELECT q.doc_id, q.h, q.n_tok, q.pass_q,
             CASE WHEN NOT q.pass_q THEN 'dropped_quality'
                  WHEN q.doc_id <> s.survivor_id THEN 'dropped_dup'
                  ELSE 'kept' END AS status
      FROM q LEFT JOIN surv s ON s.h = q.h
    ),
    kept AS (
      SELECT doc_id, n_tok,
             CASE WHEN {SCRAMBLE_SQL} < 800 THEN 'train'
                  WHEN {SCRAMBLE_SQL} < 900 THEN 'val'
                  ELSE 'test' END AS split
      FROM labeled WHERE status = 'kept'
    ),
    packed AS (
      SELECT doc_id, split,
             CAST(coalesce(sum(n_tok) OVER (PARTITION BY split ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 // {CAPACITY} AS BIGINT) AS chunk_first
      FROM kept
    )
    SELECT l.doc_id, l.status, l.n_tok, p.split, p.chunk_first
    FROM labeled l LEFT JOIN packed p ON p.doc_id = l.doc_id
    """


@register(
    "pipeline_training_data_prep",
    _prep_oracle_sql(),
    tags=("pipeline", "llm-pipeline", "composite", "dedup", "packing"),
)
def pipeline_training_data_prep(spark, sf_dir):
    """The whole training-data prep pipeline as ONE declarative plan —
    clean → quality-gate → exact-dedup survivors → deterministic split →
    sequence packing — proving a user can run their end-to-end workload,
    not just the stages in isolation. Every document gets a verdict:
    dropped_quality (failed the word-count / unique-ratio gates, computed
    on CLEANED text), dropped_dup (an earlier doc has byte-identical
    cleaned text), or kept — and every kept doc gets its content-hash
    split (train/val/test, partitioning-independent) and its first
    512-token chunk index within that split's packed stream.

    One plan, Catalyst fuses the stages: the clean chain and gates are
    map-only codegen, dedup is one md5 hash-shuffle, the split is a
    map-side expression. Packing is a HIERARCHICAL prefix-sum: `split`
    has only three values, so a flat `Window.partitionBy("split")` would
    serialize each split's entire kept corpus through one reducer at
    100 TB. Instead each doc gets a shard = doc_id DIV {SHARD_SPAN}
    (monotone in doc_id, so shard order IS doc order), the running total
    inside each (split, shard) is a well-partitioned window, per-shard
    token totals are rolled up and cumulated over the shard relation
    (n_docs/{SHARD_SPAN} rows — the only per-split window left touches
    that tiny pre-aggregated set, and the span is a knob: raise it or
    recurse for another 256x headroom), and the shard offsets broadcast
    back map-side. cum_before = shard_offset + intra_shard_prefix is the
    same integer, so the five-stage composite keeps its bit-exact oracle
    while no stage funnels the corpus through 3 partitions."""
    from cinegraph_spark.functions.text_clean import clean_subtitles
    from cinegraph_spark.queries.util import scramble, spread

    # spread the single-split scan before the clean/tokenize chain (r19,
    # guide §2.5): the regex-heavy per-doc stage otherwise runs on one
    # task; hash-by-doc_id, all downstream measures integer or keyed
    d = spread(
        T(spark, sf_dir, "documents").select("doc_id", "text"), "doc_id"
    )
    cleaned = clean_subtitles(F.col("text"))
    toks = tokenize_whitespace(cleaned)
    stats = d.select(
        "doc_id",
        F.md5(cleaned).alias("h"),
        F.size(toks).cast("long").alias("n_tok"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_uniq"),
    )
    q = stats.withColumn(
        "pass_q",
        (F.col("n_tok") >= 40)
        & (F.col("n_uniq") * 100 >= 37 * F.col("n_tok")),
    )
    surv = (
        q.filter("pass_q")
        .groupBy("h")
        .agg(F.min("doc_id").alias("survivor_id"))
    )
    # Lazy localCheckpoint: `labeled` has THREE consumers (the final
    # verdict join, and — via `kept` — the intra-shard window and the
    # shard-totals rollup). Materializing this narrow per-doc frame (6
    # small columns) on first action runs the expensive clean/tokenize/
    # dedup lineage exactly once; without it Spark recomputes the chain
    # per consumer — ReuseExchange does not unify these branch shapes
    # (measured ~2x the composite's wall time).
    labeled = (
        q.join(surv, "h", "left")
        .withColumn(
            "status",
            F.when(~F.col("pass_q"), "dropped_quality")
            .when(F.col("doc_id") != F.col("survivor_id"), "dropped_dup")
            .otherwise("kept"),
        )
        .localCheckpoint(eager=False)
    )
    scr = scramble(F.col("doc_id"))
    kept = labeled.filter(F.col("status") == "kept").select(
        "doc_id",
        "n_tok",
        F.when(scr < 800, "train")
        .when(scr < 900, "val")
        .otherwise("test")
        .alias("split"),
    )
    kept = kept.withColumn(
        "shard", (F.col("doc_id") / SHARD_SPAN).cast("long")
    )
    w_in = (
        Window.partitionBy("split", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    intra = kept.select(
        "doc_id",
        "split",
        "shard",
        F.coalesce(F.sum("n_tok").over(w_in), F.lit(0)).alias("intra_before"),
    )
    w_sh = (
        Window.partitionBy("split")
        .orderBy("shard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    shard_offsets = (
        kept.groupBy("split", "shard")
        .agg(F.sum("n_tok").alias("sh_tok"))
        .select(
            "split",
            "shard",
            F.coalesce(F.sum("sh_tok").over(w_sh), F.lit(0)).alias("sh_off"),
        )
    )
    packed = intra.join(
        F.broadcast(shard_offsets), ["split", "shard"]
    ).select(
        F.col("doc_id").alias("p_doc"),
        "split",
        ((F.col("sh_off") + F.col("intra_before")) / CAPACITY)
        .cast("long")
        .alias("chunk_first"),
    )
    return labeled.join(
        packed, labeled["doc_id"] == packed["p_doc"], "left"
    ).select("doc_id", "status", "n_tok", "split", "chunk_first")
