"""String-function queries (F1-F11, SURVEY §2.3) over ``documents``.

The driver's documents are clean word-soup, so each query first *decorates*
the text with the subtitle artifacts a real corpus has (SRT timestamps,
bracketed directions, HTML tags, speaker labels, filler words — the classes
in FIXTURES.md §B1), identically in Spark and DuckDB, then applies the
cleaning function under test. This makes every regex actually fire.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cinegraph_spark.functions.text_clean import (
    clean_subtitles,
    clean_subtitles_sql,
    cleaning_fn,
    cleaning_sql,
)
from cinegraph_spark.queries import register
from cinegraph_spark.queries.util import T

# Deterministic subtitle-artifact decoration. Every piece exercises a
# cleaning rule; built identically in both engines from (doc_id, text).
_DECOR_SPARK = None


def _decorated_spark(doc_id, text):
    return F.concat(
        F.lit("WEBVTT\n\n1\n00:00:01,000 --> 00:00:04,000\n"),
        F.lit("[music] JOHN: <i>Well</i>, um... "),
        text,
        F.lit("\n"),
        F.pmod(doc_id, F.lit(100)).cast("string"),
        F.lit("\n(laughs) -- Mary: gonna be OKAY!\n<v Bob> {applause} d'accord\n"),
    )


_DECOR_SQL = (
    "('WEBVTT' || chr(10) || chr(10) || '1' || chr(10) || "
    "'00:00:01,000 --> 00:00:04,000' || chr(10) || "
    "'[music] JOHN: <i>Well</i>, um... ' || text || chr(10) || "
    "CAST(doc_id % 100 AS VARCHAR) || chr(10) || "
    "'(laughs) -- Mary: gonna be OKAY!' || chr(10) || "
    "'<v Bob> {applause} d''accord' || chr(10))"
)


def _register_single(fname: str):
    @register(
        f"strfn_{fname}",
        f"SELECT doc_id, {cleaning_sql(fname, _DECOR_SQL)} AS cleaned\n"
        "FROM documents",
        tags=("strings", "scalar-fn"),
        doc=f"Single cleaning function {fname} applied to decorated text.",
    )
    def _q(spark, sf_dir, fname=fname):
        d = T(spark, sf_dir, "documents")
        decorated = _decorated_spark(F.col("doc_id"), F.col("text"))
        return d.select("doc_id", cleaning_fn(fname)(decorated).alias("cleaned"))


for _f in (
    "remove_timestamps",
    "remove_brackets_content",
    "remove_html_tags",
    "remove_speaker_labels",
    "remove_dialog_punctuation",
    "remove_newlines",
    "remove_non_alphabetic",
    "remove_filler_words",
    "lowercase_text",
    "normalize_whitespace",
    "clean_titles",
):
    _register_single(_f)


@register(
    "strfn_clean_chain",
    f"SELECT doc_id, {clean_subtitles_sql(_DECOR_SQL)} AS cleaned\nFROM documents",
    tags=("strings", "pipeline"),
)
def strfn_clean_chain(spark, sf_dir):
    """The full deterministic 10-step cleaning chain
    (``mozno_potikat_langchain.ipynb`` cell 13) as ONE codegen'd column
    expression — map-only, zero shuffles, the 100 TB text-cleaning path."""
    d = T(spark, sf_dir, "documents")
    decorated = _decorated_spark(F.col("doc_id"), F.col("text"))
    return d.select("doc_id", clean_subtitles(decorated).alias("cleaned"))


@register(
    "strfn_title_year_parse",
    """
    SELECT doc_id,
           trim(regexp_replace(title_raw, '\\s*\\(\\d{4}\\)\\s*$', '')) AS title,
           CAST(coalesce(nullif(regexp_extract(title_raw, '\\((\\d{4})\\)\\s*$', 1), ''), '1800') AS BIGINT) AS year
    FROM (SELECT doc_id,
                 'Movie ' || CAST(doc_id AS VARCHAR) ||
                 CASE WHEN doc_id % 3 = 0 THEN '' ELSE ' (' || CAST(1900 + doc_id % 120 AS VARCHAR) || ')' END
                 AS title_raw
          FROM documents)
    """,
    tags=("strings", "parse"),
)
def strfn_title_year_parse(spark, sf_dir):
    """P3 — ``"Title (year)"`` parse with default year 1800
    (``scraping/scraper.py:75-88``); every third title lacks the year."""
    d = T(spark, sf_dir, "documents")
    title_raw = F.concat(
        F.lit("Movie "),
        F.col("doc_id").cast("string"),
        F.when(F.pmod("doc_id", F.lit(3)) == 0, F.lit("")).otherwise(
            F.concat(
                F.lit(" ("),
                (F.lit(1900) + F.pmod("doc_id", F.lit(120))).cast("string"),
                F.lit(")"),
            )
        ),
    )
    year_str = F.regexp_extract(title_raw, r"\((\d{4})\)\s*$", 1)
    return d.select(
        "doc_id",
        F.trim(F.regexp_replace(title_raw, r"\s*\(\d{4}\)\s*$", "")).alias("title"),
        F.coalesce(F.nullif(year_str, F.lit("")), F.lit("1800"))
        .cast("long")
        .alias("year"),
    )


@register(
    "strfn_fuzzy_name_pairs_blocked",
    """
    WITH names AS (SELECT DISTINCT p_name FROM part),
    blocked AS (SELECT p_name, split_part(p_name, ' ', 1) AS blk FROM names)
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_dist
    FROM blocked a
    JOIN blocked b ON a.blk = b.blk AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= 4
    """,
    tags=("strings", "fuzzy", "dedup", "blocking"),
)
def strfn_fuzzy_name_pairs_blocked(spark, sf_dir):
    """Blocked fuzzy-match join: near-identical part names at edit distance
    ≤ 4, compared only within a cheap blocking key (first token) — the
    standard entity-resolution shape. Two scale decisions: (1) the fuzzy
    comparison runs on the DISTINCT-name dictionary, not the row stream, so
    its cost is bounded by vocabulary size however many rows repeat a name;
    (2) the blocked equi-join keys the shuffle on the block, so no
    cross-join exists and a block's cost is |block|² — the blocking key is
    the knob that keeps blocks small (compose keys — first token × length
    band — if a corpus makes one block degenerate). levenshtein computes
    identically in Spark and DuckDB → exact oracle."""
    names = (
        T(spark, sf_dir, "part")
        .select("p_name")
        .distinct()
        .withColumn("blk", F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)))
    )
    a = names.select(F.col("p_name").alias("name_a"), "blk")
    b = names.select(F.col("p_name").alias("name_b"), "blk")
    return (
        a.join(b, "blk")
        .filter(F.col("name_a") < F.col("name_b"))
        .withColumn(
            "edit_dist",
            F.levenshtein(F.col("name_a"), F.col("name_b")).cast("long"),
        )
        .filter(F.col("edit_dist") <= 4)
        .select("name_a", "name_b", "edit_dist")
    )
