"""Vector math over ``array<float/double>`` columns — pure SQL expressions.

Re-expresses the reference's vector ops (SURVEY §2.8):

- V2 euclidean distance ``np.linalg.norm(x - c)`` (``graph_creator.py:351``)
- cosine similarity — the declared pgvector HNSW capability
  (``db/models/embedding.py:15-17``) re-expressed exactly; ANN variants live
  in ``operators/similarity.py``.

All functions use ``zip_with``/``aggregate`` higher-order functions: they run
inside the JVM on the array values with no Python crossing, so a 100 TB scan
computing cosine against a broadcast query vector is a map-only codegen
stage.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product of two equal-length numeric arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    """L2 norm of a numeric array."""
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def euclidean(a: Column, b: Column) -> Column:
    """V2 — ``sqrt(sum((a_i-b_i)^2))`` (``graph_creator.py:351``)."""
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL-safe on zero vectors — a zero-norm side
    yields NULL (ranked last under ``desc`` ordering) instead of an ANSI
    DIVIDE_BY_ZERO crash. Spark 4 defaults ``spark.sql.ansi.enabled=true``,
    where plain ``0.0/0.0`` RAISES rather than returning NULL, so the
    denominator must be nulled explicitly: one all-zero embedding (the
    typical encoder output for empty text) would otherwise kill every ANN
    top-k query it appears in."""
    return dot(a, b) / F.nullif(norm(a) * norm(b), F.lit(0.0))


def scale(a: Column, s: Column | float) -> Column:
    """Multiply every element by a scalar."""
    s_col = F.lit(s) if not isinstance(s, Column) else s
    return F.transform(a, lambda x: x * s_col)


def add(a: Column, b: Column) -> Column:
    return F.zip_with(a, b, lambda x, y: x + y)


def sub(a: Column, b: Column) -> Column:
    return F.zip_with(a, b, lambda x, y: x - y)
