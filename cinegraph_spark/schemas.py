"""Single-definition schema registry (SURVEY §1.3).

The reference declares each schema three times (SQL DDL
``services/db_service/db_init.sql:4-28``, SQLAlchemy models
``db/models/*.py``, pydantic ``api/base_models.py``); here every schema is a
StructType declared once, schema-on-write, no inference in production paths.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

#: Emotion label order — fixed by the reference classifier head
#: (``emotion_analysis/model.py:86``).
EMOTIONS: tuple[str, ...] = ("sadness", "joy", "love", "anger", "fear", "surprise")

#: Sliding-window defaults (``emotion_analysis/model.py:26-28``).
WINDOW_SIZE = 512
STRIDE = 256

#: Feature-column naming — ``{emotion}_act{1..3}`` then ``{emotion}_std``
#: (``clustering/graph_creator.py:60-69``).
NUM_ACTS = 3
FEATURE_COLS: tuple[str, ...] = tuple(
    f"{e}_act{a}" for a in range(1, NUM_ACTS + 1) for e in EMOTIONS
) + tuple(f"{e}_std" for e in EMOTIONS)


def _struct(*fields: tuple[str, object]) -> StructType:
    return StructType([StructField(n, t, True) for n, t in fields])


# --- reference-shaped tables (FIXTURES.md §B) -------------------------------

#: Raw subtitle corpus: one row per movie file (``scraping/scraper.py:137-153``).
SUBTITLES_RAW = _struct(
    ("movie_id", LongType()),
    ("title", StringType()),
    ("year", IntegerType()),
    ("raw_text", StringType()),
)

#: Per-window emotion scores (``emotion_analysis/model.py:172-177``).
EMOTION_WINDOWS = _struct(
    ("movie_id", LongType()),
    ("window_id", IntegerType()),
    ("window_start", IntegerType()),
    ("window_end", IntegerType()),
    *[(e, DoubleType()) for e in EMOTIONS],
)

#: 24-dim clustering features + movie name (``clustering/graph_creator.py:60-69``).
MOVIE_FEATURES = _struct(
    ("movie", StringType()),
    *[(c, DoubleType()) for c in FEATURE_COLS],
)

#: Serving tables — exact shapes from ``services/db_service/db_init.sql:4-28``.
GRAPH = _struct(
    ("id", LongType()),
    ("path", StringType()),  # dot-separated materialized path, root == 'root'
    ("name", StringType()),
    ("type", StringType()),  # 'root' | 'node' | 'leaf'
    ("children_count", IntegerType()),
)
MOVIES = _struct(
    ("id", LongType()),
    ("title", StringType()),
    ("year", IntegerType()),
    ("other_data", StringType()),  # JSON string (reference JSONB)
    ("graph_id", LongType()),
)
EMBEDDINGS6 = _struct(
    ("id", LongType()),
    ("movie_id", LongType()),
    ("window_id", IntegerType()),
    ("embedding", ArrayType(FloatType())),  # VECTOR(6)
)

# --- driver test tables (/root/testdata, FIXTURES.md §A) --------------------

REGION = _struct(("r_regionkey", IntegerType()), ("r_name", StringType()))
NATION = _struct(
    ("n_nationkey", IntegerType()),
    ("n_name", StringType()),
    ("n_regionkey", IntegerType()),
)
CUSTOMER = _struct(
    ("c_custkey", LongType()),
    ("c_name", StringType()),
    ("c_nationkey", IntegerType()),
    ("c_acctbal", DoubleType()),
    ("c_mktsegment", StringType()),
)
SUPPLIER = _struct(
    ("s_suppkey", LongType()),
    ("s_name", StringType()),
    ("s_nationkey", IntegerType()),
    ("s_acctbal", DoubleType()),
)
PART = _struct(
    ("p_partkey", LongType()),
    ("p_name", StringType()),
    ("p_brand", StringType()),
    ("p_type", StringType()),
    ("p_size", IntegerType()),
    ("p_retailprice", DoubleType()),
)
ORDERS = _struct(
    ("o_orderkey", LongType()),
    ("o_custkey", LongType()),
    ("o_orderstatus", StringType()),
    ("o_totalprice", DoubleType()),
    ("o_orderdate", TimestampNTZType()),
    ("o_orderpriority", StringType()),
)
LINEITEM = _struct(
    ("l_orderkey", LongType()),
    ("l_partkey", LongType()),
    ("l_suppkey", LongType()),
    ("l_linenumber", IntegerType()),
    ("l_quantity", DoubleType()),
    ("l_extendedprice", DoubleType()),
    ("l_discount", DoubleType()),
    ("l_tax", DoubleType()),
    ("l_returnflag", StringType()),
    ("l_linestatus", StringType()),
    ("l_shipdate", TimestampNTZType()),
)
EVENTS = _struct(
    ("event_id", LongType()),
    ("ts", TimestampNTZType()),
    ("user_id", LongType()),
    ("event_type", StringType()),
    ("value", DoubleType()),
    ("props", StringType()),  # JSON
)
DOCUMENTS = _struct(
    ("doc_id", LongType()),
    ("text", StringType()),
    ("lang", StringType()),
    ("source", StringType()),
    ("n_chars", LongType()),
)
EMBEDDINGS = _struct(
    ("vec_id", LongType()),
    ("embedding", ArrayType(FloatType())),
    ("label", IntegerType()),
)

#: Multimodal table shape — opaque payload + typed metadata (north-star ops).
MEDIA = _struct(
    ("media_id", LongType()),
    ("kind", StringType()),  # 'image' | 'audio' | 'video'
    ("payload", BinaryType()),
    ("meta", MapType(StringType(), StringType())),
)

#: All driver test tables, name → schema.
TEST_TABLES: dict[str, StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}
