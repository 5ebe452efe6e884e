"""Reference-pipeline queries: clean → tokenize → windowize → score →
features (SURVEY §2.4/§2.5, the engine's flagship end-to-end slice).

The driver's ``documents`` table stands in for the subtitle corpus. Window
geometry is scaled down (window 32 / stride 16 vs the reference's 512/256 —
same formulas, ``emotion_analysis/model.py:26-27``) so the ~20-100-token
documents produce multi-window, multi-act frames.

Every query here is fully deterministic (stub scorer) and oracle-checked;
the hot path is pure column arithmetic — two hash aggregations end-to-end.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cinegraph_spark.operators.features import (
    act_assign_sql,
    centroid,
    movie_features,
    standard_scale,
)
from cinegraph_spark.operators.scoring import stub_scores, stub_scores_sql
from cinegraph_spark.operators.windowize import tokenize_whitespace, windowize
from cinegraph_spark.queries import register
from cinegraph_spark.queries.util import T, r4
from cinegraph_spark.schemas import EMOTIONS, NUM_ACTS

W, S = 32, 16  # window/stride (test geometry; reference uses 512/256)

FEATURE_COLS = [
    f"{e}_act{a}" for a in range(1, NUM_ACTS + 1) for e in EMOTIONS
] + [f"{e}_std" for e in EMOTIONS]


def _spark_windows(spark, sf_dir):
    from cinegraph_spark.queries.util import spread

    # spread the single-split corpus scan before the tokenize + windowize
    # + scoring chain (r19, guide §2.5): the whole per-doc compute of
    # every pipeline_* query otherwise runs on one task at any core
    # count; hash-by-doc_id keeps per-doc work and fold order identical
    d = spread(
        T(spark, sf_dir, "documents").select("doc_id", "text"), "doc_id"
    ).select("doc_id", tokenize_whitespace(F.col("text")).alias("tokens"))
    return windowize(d, "doc_id", window_size=W, stride=S)


def _spark_scored(spark, sf_dir):
    return stub_scores(_spark_windows(spark, sf_dir), "doc_id")


# --- shared oracle CTEs -----------------------------------------------------

# list_filter drops the [''] DuckDB's split returns on empty/whitespace-only
# text, matching Spark's tokenize_whitespace (empty array → no tokens, no
# windows); without it the oracle would emit 1 phantom token per empty doc.
_TOKS_CTE = (
    "toks AS (SELECT doc_id, list_filter(string_split_regex("
    "regexp_replace(text, '^[ \\t\\n\\r\\f]+|[ \\t\\n\\r\\f]+$', '', 'g'), '[ \\t\\n\\r\\f]+'), t -> t <> '')"
    " AS tokens FROM documents)"
)

_WIN_CTE = (
    f"win AS (SELECT doc_id, tokens, len(tokens) AS n, "
    f"unnest(range(0, len(tokens), {S})) AS window_start "
    f"FROM toks WHERE len(tokens) > 0)"
)

_SCORE_COLS_SQL = stub_scores_sql(
    f"tokens[window_start + 1 : window_start + {W}]",
    "doc_id",
    f"(window_start // {S})",
)

_SCORED_CTE = (
    "scored AS (SELECT doc_id, "
    f"CAST(window_start // {S} AS INT) AS window_id, "
    "CAST(window_start AS INT) AS window_start, "
    f"CAST(least(window_start + {W}, n) AS INT) AS window_end, "
    + ", ".join(_SCORE_COLS_SQL)
    + " FROM win)"
)


def _features_sql() -> str:
    """Oracle SQL producing the 24-dim feature frame from ``scored``."""
    acts = act_assign_sql("window_id", "_n")
    act_means = ", ".join(
        f"round(avg(CASE WHEN _act = {a} THEN {e} END), 4) AS {e}_act{a + 1}"
        for a in range(NUM_ACTS)
        for e in EMOTIONS
    )
    stds = ", ".join(f"round(stddev_samp({e}), 4) AS {e}_std" for e in EMOTIONS)
    return f"""
    counted AS (
      SELECT s.*, c._n FROM scored s
      JOIN (SELECT doc_id, count(*) AS _n FROM scored GROUP BY doc_id
            HAVING count(*) >= {NUM_ACTS}) c USING (doc_id)
    ),
    with_act AS (SELECT *, {acts} AS _act FROM counted),
    feat AS (
      SELECT doc_id, {act_means}, {stds}
      FROM with_act GROUP BY doc_id
    )
    """


@register(
    "pipeline_token_windows",
    f"""
    WITH {_TOKS_CTE}, {_WIN_CTE}
    SELECT doc_id,
           CAST(window_start // {S} AS INT)        AS window_id,
           CAST(window_start AS INT)               AS window_start,
           CAST(least(window_start + {W}, n) AS INT) AS window_end,
           CAST(n AS INT)                          AS n_tokens
    FROM win
    """,
    tags=("pipeline", "windowize"),
)
def pipeline_token_windows(spark, sf_dir):
    """M2 window bookkeeping: ceil(n/stride) windows per doc with exact
    start/end semantics (``model.py:174-177``)."""
    d = T(spark, sf_dir, "documents").select(
        "doc_id", tokenize_whitespace(F.col("text")).alias("tokens")
    )
    n = F.size("tokens")
    return (
        windowize(d.withColumn("n_tokens", n.cast("int")), "doc_id", window_size=W, stride=S, keep_tokens=False)
        .join(
            d.select("doc_id", F.size("tokens").cast("int").alias("n_tokens")),
            "doc_id",
        )
        .select("doc_id", "window_id", "window_start", "window_end", "n_tokens")
    )


@register(
    "pipeline_window_scores",
    f"""
    WITH {_TOKS_CTE}, {_WIN_CTE}, {_SCORED_CTE}
    SELECT doc_id, window_id, window_start, window_end,
           {', '.join(f'round({e}, 6) AS {e}' for e in EMOTIONS)}
    FROM scored
    """,
    tags=("pipeline", "scoring"),
)
def pipeline_window_scores(spark, sf_dir):
    """M4 — the per-window emotion frame with the deterministic stub scorer
    (production model rides hf_scorer/mapInPandas instead; SURVEY §2.4)."""
    s = _spark_scored(spark, sf_dir)
    return s.select(
        "doc_id",
        "window_id",
        "window_start",
        "window_end",
        *[F.round(e, 6).alias(e) for e in EMOTIONS],
    )


@register(
    "pipeline_movie_features",
    f"""
    WITH {_TOKS_CTE}, {_WIN_CTE}, {_SCORED_CTE}, {_features_sql()}
    SELECT * FROM feat
    """,
    tags=("pipeline", "features"),
)
def pipeline_movie_features(spark, sf_dir):
    """A1-A3 — np.array_split act means + sample std, 24 features per doc,
    short docs (<3 windows) dropped (P2)."""
    # movie_features consumes its window frame twice (eligibility agg +
    # act assignment); the lazy checkpoint runs the regex/tokenize-heavy
    # scoring chain once (r19 — the token-budget/training-prep pattern)
    return movie_features(
        _spark_scored(spark, sf_dir).localCheckpoint(eager=False),
        key_col="doc_id",
        round_to=4,
    )


@register(
    "pipeline_scaled_features",
    f"""
    WITH {_TOKS_CTE}, {_WIN_CTE}, {_SCORED_CTE}, {_features_sql()},
    unrounded AS (
      SELECT doc_id,
             {', '.join(f"avg(CASE WHEN _act = {a} THEN {e} END) AS {e}_act{a + 1}" for a in range(NUM_ACTS) for e in EMOTIONS)},
             {', '.join(f"stddev_samp({e}) AS {e}_std" for e in EMOTIONS)}
      FROM with_act GROUP BY doc_id
    )
    SELECT doc_id,
           {', '.join(f"round(({c} - avg({c}) OVER ()) / (CASE WHEN stddev_pop({c}) OVER () = 0 THEN 1.0 ELSE stddev_pop({c}) OVER () END), 4) + 0 AS {c}" for c in FEATURE_COLS)}
    FROM unrounded
    """,
    tags=("pipeline", "features", "scaling"),
)
def pipeline_scaled_features(spark, sf_dir):
    """A4 — StandardScaler semantics: global mean / population std
    (ddof=0; the per-movie std feature itself is ddof=1 — the reference's
    deliberate asymmetry, ``graph_creator.py:102-114``)."""
    # two collapse points (r19): movie_features reads the scored frame
    # twice, and standard_scale reads the feature frame twice (global
    # stats agg + the scaled scan) — without the lazy checkpoints the
    # scoring chain executed four times per run (540-line plan)
    feats = movie_features(
        _spark_scored(spark, sf_dir).localCheckpoint(eager=False),
        key_col="doc_id",
    )
    scaled = standard_scale(feats, "doc_id", FEATURE_COLS)
    return scaled.select(
        "doc_id", *[F.round(c, 4).alias(c) for c in FEATURE_COLS]
    )


@register(
    "pipeline_corpus_centroid",
    f"""
    WITH {_TOKS_CTE}, {_WIN_CTE}, {_SCORED_CTE}, {_features_sql()},
    unrounded AS (
      SELECT doc_id,
             {', '.join(f"avg(CASE WHEN _act = {a} THEN {e} END) AS {e}_act{a + 1}" for a in range(NUM_ACTS) for e in EMOTIONS)},
             {', '.join(f"stddev_samp({e}) AS {e}_std" for e in EMOTIONS)}
      FROM with_act GROUP BY doc_id
    )
    SELECT {', '.join(f'round(avg({c}), 4) AS {c}' for c in FEATURE_COLS)},
           count(*) AS n_docs
    FROM unrounded
    """,
    tags=("pipeline", "centroid"),
)
def pipeline_corpus_centroid(spark, sf_dir):
    """A5 — the global centroid over unscaled features
    (``graph_creator.py:389``)."""
    # same double-read collapse as pipeline_movie_features (r19)
    feats = movie_features(
        _spark_scored(spark, sf_dir).localCheckpoint(eager=False),
        key_col="doc_id",
    )
    return feats.agg(
        *[r4(F.avg(c)).alias(c) for c in FEATURE_COLS],
        F.count("*").alias("n_docs"),
    )


@register(
    "pipeline_dominant_emotion",
    f"""
    WITH {_TOKS_CTE}, {_WIN_CTE}, {_SCORED_CTE},
    means AS (
      SELECT doc_id, {', '.join(f'avg({e}) AS {e}' for e in EMOTIONS)}
      FROM scored GROUP BY doc_id
    )
    SELECT doc_id,
           CASE {' '.join(f"WHEN {e} >= greatest({', '.join(EMOTIONS)}) THEN '{e}'" for e in EMOTIONS)}
           END AS dominant
    FROM means
    """,
    tags=("pipeline", "agg"),
)
def pipeline_dominant_emotion(spark, sf_dir):
    """A8 — idxmax over the 6 emotion means (``experiments/clustering.ipynb``
    cell 2); ties resolve to the first emotion in label order, identically in
    both engines."""
    s = _spark_scored(spark, sf_dir)
    means = s.groupBy("doc_id").agg(*[F.avg(e).alias(e) for e in EMOTIONS])
    gmax = F.greatest(*[F.col(e) for e in EMOTIONS])
    dominant = F.when(F.col(EMOTIONS[0]) >= gmax, EMOTIONS[0])
    for e in EMOTIONS[1:]:
        dominant = dominant.when(F.col(e) >= gmax, e)
    return means.select("doc_id", dominant.alias("dominant"))


@register(
    "pipeline_arc_smoothed",
    f"""
    WITH {_TOKS_CTE}, {_WIN_CTE}, {_SCORED_CTE}
    SELECT doc_id, window_id,
           round(avg(joy) OVER (PARTITION BY doc_id ORDER BY window_id
                                ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING),
                 4) AS joy_smooth
    FROM scored
    """,
    tags=("pipeline", "grouped-map", "applyInPandas"),
)
def pipeline_arc_smoothed(spark, sf_dir):
    """The sentiment-arc smoothing the reference's frontend roadmap implies
    (`README.md:78` — per-movie emotion arcs over time), as a grouped-map
    ``applyInPandas``: each doc's window sequence arrives as ONE pandas
    frame (Arrow batch), centered rolling(3) mean per emotion. The oracle
    is the equivalent SQL window frame — pinning that the pandas path and
    the relational path agree exactly. At scale the shuffle key is doc_id
    and each group is a movie's ~hundreds of windows — safely in-memory."""
    import pandas as pd

    def smooth(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("window_id")
        pdf["joy_smooth"] = (
            pdf["joy"].rolling(3, center=True, min_periods=1).mean().round(4)
        )
        return pdf[["doc_id", "window_id", "joy_smooth"]]

    scored = _spark_scored(spark, sf_dir).select("doc_id", "window_id", "joy")
    return scored.groupBy("doc_id").applyInPandas(
        smooth, "doc_id long, window_id int, joy_smooth double"
    )
