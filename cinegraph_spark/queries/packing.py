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
a plain window prefix-sum partitioned by source, one shuffle, no global
ordering. A single pathologically huge source would need sub-shard salting
(split on ``scramble(doc_id) % n``) — same math, finer partition key.

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

# cum_before = tokens of all earlier docs in the same source shard
# (doc_id order). DuckDB's empty-frame sum is NULL -> coalesce to 0.
_PACKED_CTE = f"""
    toks AS (
      SELECT doc_id, source,
             CAST(len(list_filter(string_split_regex(
                 regexp_replace(text, '(?s)^\\s+|\\s+$', '', 'g'), '\\s+'),
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
    One window prefix-sum per source (a single hash shuffle on the shard
    key); everything after the cumsum is map-only arithmetic. A document
    spanning a chunk boundary reports the full inclusive span."""
    d = T(spark, sf_dir, "documents").select(
        "doc_id", "source", tokenize_whitespace(F.col("text")).alias("tokens")
    )
    d = d.select(
        "doc_id", "source", F.size("tokens").cast("long").alias("n_tok")
    ).filter(F.col("n_tok") > 0)
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tok").over(w), F.lit(0).cast("long"))
    s = d.select(
        "doc_id",
        "source",
        "n_tok",
        cum_before.alias("cum_before"),
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
