"""Text-analysis queries (north-star LLM-pipeline ops): token counting,
quality scoring, language-ID heuristic, document fingerprinting.

All pure column arithmetic (integer-exact where possible) so every query is
oracle-checked. At 100 TB each is a map-only scan — no shuffles except the
final tiny aggregations.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cinegraph_spark.operators.windowize import tokenize_whitespace
from cinegraph_spark.queries import register
from cinegraph_spark.queries.util import T, r4

# list_filter drops the [''] DuckDB's split returns on empty/whitespace-only
# text — parity with Spark's tokenize_whitespace (empty array).
_TOKS_CTE = (
    "toks AS (SELECT doc_id, lang, source, n_chars, text, "
    "list_filter(string_split_regex("
    "regexp_replace(text, '^[ \\t\\n\\r\\f]+|[ \\t\\n\\r\\f]+$', '', 'g'), '[ \\t\\n\\r\\f]+'), t -> t <> '')"
    " AS tokens FROM documents)"
)

#: stopword list for the quality score (English function words).
_STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

#: language marker words for the n-gram/lexicon langid heuristic.
_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is"),
    "es": ("el", "la", "de", "que"),
    "de": ("der", "und", "die", "das"),
    "fr": ("le", "et", "les", "des"),
    "zh": ("de", "shi", "le", "bu"),
}


@register(
    "text_token_stats",
    f"""
    WITH {_TOKS_CTE}
    SELECT doc_id,
           CAST(len(tokens) AS BIGINT)  AS n_tokens,
           CAST(len(text) AS BIGINT)    AS n_chars_actual,
           n_chars                      AS n_chars_declared,
           round(list_sum(list_transform(tokens, t -> CAST(len(t) AS BIGINT)))
                 * 1.0 / len(tokens), 4) AS avg_token_len,
           CAST(list_max(list_transform(tokens, t -> CAST(len(t) AS BIGINT))) AS BIGINT)
                                        AS max_token_len,
           CAST(len(list_distinct(tokens)) AS BIGINT) AS n_distinct_tokens
    FROM toks
    """,
    tags=("textstats", "tokens"),
)
def text_token_stats(spark, sf_dir):
    """Whitespace token counting + length stats (the BPE-ish tokenizer path
    is the regex in text_bpe_token_count)."""
    d = T(spark, sf_dir, "documents").select(
        "doc_id",
        "text",
        "n_chars",
        tokenize_whitespace(F.col("text")).alias("tokens"),
    )
    tok_lens = F.transform("tokens", lambda t: F.length(t).cast("long"))
    return d.select(
        "doc_id",
        F.size("tokens").cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars_actual"),
        F.col("n_chars").alias("n_chars_declared"),
        F.round(
            # try_divide, not /: a zero-token document (empty/whitespace
            # text) makes the denominator 0, which under Spark 4's
            # default ANSI mode KILLS the whole query instead of giving
            # the NULL DuckDB's division yields (r17 adversarial sweep)
            F.try_divide(
                F.aggregate(
                    tok_lens, F.lit(0).cast("long"), lambda a, x: a + x
                )
                * F.lit(1.0),
                F.size("tokens"),
            ),
            4,
        ).alias("avg_token_len"),
        F.array_max(tok_lens).cast("long").alias("max_token_len"),
        F.size(F.array_distinct("tokens")).cast("long").alias("n_distinct_tokens"),
    )


@register(
    "text_bpe_token_count",
    r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '([a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 \t\n\r\f])', 1)) AS BIGINT)
             AS n_bpe_tokens,
           CAST(len(regexp_extract_all(text, '([a-zA-Z]+)', 1)) AS BIGINT) AS n_word_tokens,
           CAST(len(regexp_extract_all(text, '([0-9]+)', 1)) AS BIGINT)    AS n_number_tokens
    FROM documents
    """,
    tags=("textstats", "tokens", "bpe"),
)
def text_bpe_token_count(spark, sf_dir):
    """BPE-ish pre-tokenization count: alpha runs, digit runs, and isolated
    punctuation (the GPT-2-style pre-tokenizer split classes)."""
    d = T(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(
            F.regexp_extract_all(
                "text", F.lit(r"([a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 \t\n\r\f])"), F.lit(1)
            )
        )
        .cast("long")
        .alias("n_bpe_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(r"([a-zA-Z]+)"), F.lit(1)))
        .cast("long")
        .alias("n_word_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(r"([0-9]+)"), F.lit(1)))
        .cast("long")
        .alias("n_number_tokens"),
    )


#: quality-score oracle SQL, factored so the token-budget selection query
#: can reuse the exact same CTEs (drift between the two would silently
#: de-align their oracles)
_QUALITY_CTES = f"""{_TOKS_CTE},
    stats AS (
      SELECT doc_id,
             CAST(len(tokens) AS BIGINT) AS n_tok,
             CAST(CASE WHEN tokens IS NULL THEN NULL
                  ELSE coalesce(list_sum(list_transform(tokens,
                    t -> CASE WHEN list_contains({list(_STOPWORDS)!r}, lower(t))
                              THEN 1 ELSE 0 END)), 0) END AS BIGINT) AS n_stop,
             CAST(len(regexp_replace(text, '[^a-zA-Z ]', '', 'g')) AS BIGINT) AS n_alpha,
             CAST(greatest(len(text), 1) AS BIGINT) AS n_chr
      FROM toks
    )"""

#: 4-decimal rounding happens in INTEGER arithmetic (half-up:
#: (20000*numer + denom) // (2*denom), then one exact /10000.0), never on
#: a double: Spark's round() works on the double's SHORTEST DECIMAL repr
#: while DuckDB rounds the binary value, and a quality landing exactly on
#: a .00005 decimal edge (true rational 0.25175 — r18 sf1 sweep, 5 of
#: 50k docs) rounds differently in the two engines. Integer units make
#: the half-up deterministic and identical everywhere.
_QUALITY_SELECT = """SELECT doc_id, n_tok, n_stop,
           CAST((20000 * n_alpha + n_chr) // (2 * n_chr) AS DOUBLE)
             / 10000.0 AS alpha_ratio,
           CAST((20000 * (4 * least(n_tok, 50) * greatest(n_tok, 1) * n_chr
                          + 150 * least(5 * n_stop, greatest(n_tok, 1)) * n_chr
                          + 150 * n_alpha * greatest(n_tok, 1))
                 + 500 * greatest(n_tok, 1) * n_chr)
                // (1000 * greatest(n_tok, 1) * n_chr) AS DOUBLE)
             / 10000.0 AS quality
    FROM stats"""


@register(
    "text_quality_score",
    f"""
    WITH {_QUALITY_CTES}
    {_QUALITY_SELECT}
    """,
    tags=("textstats", "quality"),
)
def text_quality_score(spark, sf_dir):
    """Composite quality score in [0,1]: length signal, stopword density,
    alphabetic-character ratio — the C4/Gopher-style cheap quality gates.

    quality = 0.4·min(n_tok/50,1) + 0.3·min(5·n_stop/n_tok,1) + 0.3·alpha_ratio,
    evaluated as ONE exact integer numerator / denominator so both engines
    divide identical int64s (bit-identical double → identical rounding;
    float association order is engine-specific otherwise)."""
    d = T(spark, sf_dir, "documents").select(
        "doc_id", "text", tokenize_whitespace(F.col("text")).alias("tokens")
    )
    n_tok = F.size("tokens").cast("long")
    n_stop = F.aggregate(
        F.transform(
            "tokens",
            lambda t: F.when(
                F.lower(t).isin(*_STOPWORDS), F.lit(1)
            ).otherwise(F.lit(0)),
        ),
        F.lit(0),
        lambda a, x: a + x,
    ).cast("long")
    n_alpha = F.length(F.regexp_replace("text", "[^a-zA-Z ]", "")).cast("long")
    n_chr = F.greatest(F.length("text").cast("long"), F.lit(1))
    t_safe = F.greatest(n_tok, F.lit(1))
    numer = (
        F.lit(4) * F.least(n_tok, F.lit(50)) * t_safe * n_chr
        + F.lit(150) * F.least(F.lit(5) * n_stop, t_safe) * n_chr
        + F.lit(150) * n_alpha * t_safe
    )
    denom = F.lit(500) * t_safe * n_chr
    # integer half-up to 4 decimals, then ONE exact double division — see
    # the _QUALITY_SELECT comment (engines round decimal-edge doubles
    # differently; integers round identically everywhere)
    return d.select(
        "doc_id",
        n_tok.alias("n_tok"),
        n_stop.alias("n_stop"),
        n_alpha.alias("n_alpha"),
        n_chr.alias("n_chr"),
        numer.alias("q_numer"),
        denom.alias("q_denom"),
    ).selectExpr(
        "doc_id",
        "n_tok",
        "n_stop",
        "CAST((20000 * n_alpha + n_chr) DIV (2 * n_chr) AS DOUBLE)"
        " / 10000.0 AS alpha_ratio",
        "CAST((20000 * q_numer + q_denom) DIV (2 * q_denom) AS DOUBLE)"
        " / 10000.0 AS quality",
    )


def _langid_votes_sql() -> str:
    cols = []
    for lang, markers in _LANG_MARKERS.items():
        cols.append(
            # DuckDB's list_sum([]) is NULL while Spark's aggregate with a
            # 0 seed is 0, so empty-token docs coalesce to 0; NULL tokens
            # (NULL text) stay NULL on both sides — unknown text casts no
            # votes rather than zero votes
            f"CASE WHEN tokens IS NULL THEN NULL "
            f"ELSE coalesce(list_sum(list_transform(tokens, t -> CASE WHEN "
            f"list_contains({list(markers)!r}, lower(t)) THEN 1 ELSE 0 END)), 0) END "
            f"AS v_{lang}"
        )
    return ", ".join(cols)


@register(
    "text_langid_heuristic",
    f"""
    WITH {_TOKS_CTE},
    votes AS (SELECT doc_id, lang AS declared_lang, {_langid_votes_sql()} FROM toks)
    SELECT doc_id, declared_lang,
           CASE {' '.join(f"WHEN v_{lang} >= greatest(v_en, v_es, v_de, v_fr, v_zh) AND v_{lang} > 0 THEN '{lang}'" for lang in _LANG_MARKERS)}
                ELSE 'und' END AS detected_lang,
           CAST(greatest(v_en, v_es, v_de, v_fr, v_zh) AS BIGINT) AS top_votes
    FROM votes
    """,
    tags=("textstats", "langid"),
)
def text_langid_heuristic(spark, sf_dir):
    """Lexicon-vote language ID (marker function words per language);
    deterministic first-match tie-break, 'und' when no marker fires."""
    d = T(spark, sf_dir, "documents").select(
        "doc_id",
        F.col("lang").alias("declared_lang"),
        tokenize_whitespace(F.col("text")).alias("tokens"),
    )
    def _vote_col(markers):
        # closure factory: a default-arg lambda would change the UDF arity
        # Spark inspects (transform passes (elem, idx) to 2-ary lambdas)
        return F.aggregate(
            F.transform(
                "tokens",
                lambda t: F.when(F.lower(t).isin(*markers), F.lit(1)).otherwise(
                    F.lit(0)
                ),
            ),
            F.lit(0),
            lambda a, x: a + x,
        )

    votes = d.select(
        "doc_id",
        "declared_lang",
        *[
            _vote_col(markers).alias(f"v_{lang}")
            for lang, markers in _LANG_MARKERS.items()
        ],
    )
    gmax = F.greatest(*[F.col(f"v_{lang}") for lang in _LANG_MARKERS])
    detected = F.lit(None).cast("string")
    expr = None
    for lang in _LANG_MARKERS:
        cond = (F.col(f"v_{lang}") >= gmax) & (F.col(f"v_{lang}") > 0)
        expr = F.when(cond, lang) if expr is None else expr.when(cond, lang)
    detected = expr.otherwise("und")
    return votes.select(
        "doc_id",
        "declared_lang",
        detected.alias("detected_lang"),
        gmax.cast("long").alias("top_votes"),
    )


@register(
    "text_fingerprint",
    f"""
    WITH {_TOKS_CTE},
    flat AS (
      SELECT doc_id, unnest(tokens) AS tok,
             generate_subscripts(tokens, 1) AS pos
      FROM toks
    )
    SELECT doc_id,
           CAST(sum((31 * len(tok) + ascii(substr(tok, 1, 1))) * pos) % 1000000007
                AS BIGINT) AS fingerprint,
           count(*) AS n_terms
    FROM flat GROUP BY doc_id
    """,
    tags=("textstats", "fingerprint"),
)
def text_fingerprint(spark, sf_dir):
    """Order-sensitive document fingerprint: position-weighted polynomial
    over (token length, first char) — integer-exact in both engines."""
    d = T(spark, sf_dir, "documents").select(
        "doc_id", tokenize_whitespace(F.col("text")).alias("tokens")
    )
    flat = d.select("doc_id", F.posexplode("tokens").alias("pos0", "tok")).select(
        "doc_id", (F.col("pos0") + 1).alias("pos"), "tok"
    )
    term = (
        (F.lit(31) * F.length("tok") + F.ascii(F.substring("tok", 1, 1)))
        * F.col("pos")
    ).cast("long")
    return flat.groupBy("doc_id").agg(
        (F.sum(term) % 1000000007).cast("long").alias("fingerprint"),
        F.count("*").alias("n_terms"),
    )


@register(
    "text_source_lang_profile",
    """
    SELECT source, lang,
           count(*)                 AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           round(avg(n_chars), 4)   AS avg_chars
    FROM documents
    GROUP BY source, lang
    """,
    tags=("textstats", "profile"),
)
def text_source_lang_profile(spark, sf_dir):
    """Corpus profile by (source, lang) — the partition-planning stats a
    100 TB ingest runs first."""
    d = T(spark, sf_dir, "documents")
    return d.groupBy("source", "lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        r4(F.avg("n_chars")).alias("avg_chars"),
    )


@register(
    "text_tfidf_top_terms",
    f"""
    WITH {_TOKS_CTE},
    flat AS (SELECT doc_id, lower(unnest(tokens)) AS term FROM toks),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM flat GROUP BY 1, 2),
    n_docs AS (SELECT count(*) AS n FROM documents),
    df AS (SELECT term, count(DISTINCT doc_id) AS df FROM flat GROUP BY term),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, df.df,
             round(tf.tf * (ln((n.n + 1.0) / (df.df + 1.0)) + 1.0), 4)
               AS tfidf
      FROM tf JOIN df USING (term) CROSS JOIN n_docs n
    )
    SELECT doc_id, term, tf, df, tfidf, CAST(rnk AS BIGINT) AS rnk
    FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                       ORDER BY tfidf DESC, term) AS rnk
          FROM scored)
    WHERE rnk <= 3
    """,
    tags=("textstats", "tfidf", "topk"),
)
def text_tfidf_top_terms(spark, sf_dir):
    """Top-3 TF-IDF terms per document (smoothed sklearn-style idf:
    ln((N+1)/(df+1)) + 1). The corpus-statistics join every retrieval /
    quality pipeline needs: tf is a (doc, term) hash agg, df a term agg —
    both map-side combined; the df table is vocabulary-sized and joins the
    tf rows on the term key; per-doc top-3 is the C6 window idiom. At
    100 TB the df side is the only broadcast-unfriendly piece — it shuffles
    on term, never on documents."""
    from pyspark.sql import Window

    d = T(spark, sf_dir, "documents").select(
        "doc_id", tokenize_whitespace(F.col("text")).alias("tokens")
    )
    flat = d.select("doc_id", F.explode("tokens").alias("t0")).select(
        "doc_id", F.lower("t0").alias("term")
    )
    tf = flat.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    # corpus size as a broadcast one-row aggregate — no driver job at build
    n_docs = T(spark, sf_dir, "documents").agg(F.count("*").alias("_n"))
    df = flat.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    scored = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.round(
                F.col("tf")
                * (F.log((F.col("_n") + 1.0) / (F.col("df") + 1.0)) + 1.0),
                4,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "term", "tf", "df", "tfidf", "rnk")
    )


@register(
    "text_udtf_sentence_split",
    r"""
    WITH parts AS (
      SELECT doc_id, i,
             regexp_replace(part, '^[ \t\n\r\f]+|[ \t\n\r\f]+$', '', 'g') AS sentence
      FROM (SELECT doc_id,
                   unnest(string_split_regex(text, '[.!?]+')) AS part,
                   generate_subscripts(string_split_regex(text, '[.!?]+'), 1)
                     AS i
            FROM documents)
    ),
    kept AS (
      SELECT doc_id, sentence,
             CAST(row_number() OVER (PARTITION BY doc_id ORDER BY i) - 1
                  AS INTEGER) AS sent_idx
      FROM parts WHERE sentence <> ''
    )
    SELECT doc_id, sent_idx, sentence,
           CAST(len(string_split_regex(sentence, '[ \t\n\r\f]+')) AS INTEGER) AS n_words
    FROM kept
    """,
    tags=("text", "udtf"),
)
def text_udtf_sentence_split(spark, sf_dir):
    """Python UDTF (PySpark 4 table function) exploding each document into
    numbered sentences — the row-multiplying UDF surface the reference's
    chunk splitter (F12) would ride today. Registered and applied with a
    LATERAL join; the oracle reproduces the split/trim/number semantics in
    SQL. UDTFs run in Python workers — fine for row-expanding text ops off
    the relational hot path (the plan tests pin that hot paths stay
    JVM-side)."""
    import re

    from pyspark.sql.functions import udtf

    # explicit ASCII whitespace class, NOT str.strip()/str.split(): Python
    # treats unicode spaces (NBSP, thin space) and \x0B as whitespace while
    # the RE2 oracle's \s-free class does not — the explicit class makes the
    # trim and word count engine-portable on hostile text (r17 sweep)
    _ws_trim = re.compile(r"^[ \t\n\r\f]+|[ \t\n\r\f]+$")
    _ws_split = re.compile(r"[ \t\n\r\f]+")

    @udtf(returnType="sent_idx int, sentence string, n_words int")
    class SentenceSplit:
        def eval(self, text: str):
            idx = 0
            for part in re.split(r"[.!?]+", text or ""):
                part = _ws_trim.sub("", part)
                if part:
                    yield idx, part, len(_ws_split.split(part))
                    idx += 1

    spark.udtf.register("sentence_split", SentenceSplit)
    T(spark, sf_dir, "documents").createOrReplaceTempView("_docs_udtf")
    return spark.sql(
        "SELECT d.doc_id, s.sent_idx, s.sentence, s.n_words "
        "FROM _docs_udtf d, LATERAL sentence_split(d.text) s"
    )


@register(
    "text_pii_redact",
    """
    WITH pii AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@example.com from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                  || '.7 call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
               AS t
      FROM documents
    ),
    counted AS (
      SELECT doc_id, t,
             CAST(len(regexp_extract_all(t, '[A-Za-z0-9._]+@[A-Za-z0-9.-]+')) AS BIGINT) AS n_email,
             CAST(len(regexp_extract_all(t, '([0-9]{1,3}\\.){3}[0-9]{1,3}')) AS BIGINT)  AS n_ip,
             CAST(len(regexp_extract_all(t, '[0-9]{3}-[0-9]{4}')) AS BIGINT)             AS n_phone
      FROM pii
    )
    SELECT doc_id, n_email, n_ip, n_phone,
           md5(regexp_replace(regexp_replace(regexp_replace(t,
                 '[A-Za-z0-9._]+@[A-Za-z0-9.-]+', '[EMAIL]', 'g'),
                 '([0-9]{1,3}\\.){3}[0-9]{1,3}', '[IP]', 'g'),
                 '[0-9]{3}-[0-9]{4}', '[PHONE]', 'g')) AS redacted_md5
    FROM counted
    """,
    tags=("textstats", "pii", "llm-pipeline"),
)
def text_pii_redact(spark, sf_dir):
    """PII detection + redaction (email / IPv4 / phone → typed placeholders)
    — the scrub pass every public-corpus pipeline runs before training. The
    fixture text is digit-free, so the query first plants deterministic PII
    derived from doc_id (same construction in both engines), then counts and
    redacts it; the md5 of the redacted text pins the full transform, not
    just the counts. Map-only JVM regex chain — same shape as the F1–F11
    cleaning chain; redaction order (email → IP → phone) matters and is
    identical in both engines."""
    d = T(spark, sf_dir, "documents")
    t = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com from 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".7 call 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    email = r"[A-Za-z0-9._]+@[A-Za-z0-9.-]+"
    ipv4 = r"([0-9]{1,3}\.){3}[0-9]{1,3}"
    phone = r"[0-9]{3}-[0-9]{4}"
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, email, "[EMAIL]"), ipv4, "[IP]"
        ),
        phone,
        "[PHONE]",
    )
    return d.select(
        "doc_id",
        F.regexp_count(t, F.lit(email)).cast("long").alias("n_email"),
        F.regexp_count(t, F.lit(ipv4)).cast("long").alias("n_ip"),
        F.regexp_count(t, F.lit(phone)).cast("long").alias("n_phone"),
        F.md5(redacted).alias("redacted_md5"),
    )


@register(
    "text_quality_filter_gopher",
    f"""
    WITH {_TOKS_CTE},
    stats AS (
      SELECT doc_id,
             CAST(len(tokens) AS BIGINT) AS n_tok,
             CAST(len(list_distinct(tokens)) AS BIGINT) AS n_uniq,
             CAST(coalesce(list_sum(list_transform(tokens,
                  t -> CAST(len(t) AS BIGINT))), 0)
                  AS BIGINT) AS sum_len,
             CAST(list_contains(tokens, 'the') AS INT)
               + CAST(list_contains(tokens, 'a') AS INT) AS n_stophits
      FROM toks
    )
    SELECT doc_id, n_tok,
           CAST(n_tok >= 40 AS INT)                            AS pass_words,
           CAST(n_uniq * 100 >= 37 * n_tok AS INT)             AS pass_uniq,
           CAST(sum_len >= 3 * n_tok AND sum_len <= 10 * n_tok AS INT) AS pass_wlen,
           CAST(n_stophits >= 2 AS INT)                        AS pass_stop,
           CAST(n_tok >= 40 AND n_uniq * 100 >= 37 * n_tok
                AND sum_len >= 3 * n_tok AND sum_len <= 10 * n_tok
                AND n_stophits >= 2 AS INT)                    AS keep
    FROM stats
    """,
    tags=("textstats", "quality", "llm-pipeline"),
)
def text_quality_filter_gopher(spark, sf_dir):
    """Gopher-style hard quality gates as boolean columns: minimum word
    count, unique-word ratio (repetition filter), mean-word-length band,
    and required stopwords — each rule exposed as its own flag so a pipeline
    can audit *why* a document was dropped, `keep` = AND of all four.
    All ratio comparisons are cross-multiplied to exact int64 arithmetic
    (n_uniq/n_tok >= 0.37 becomes n_uniq*100 >= 37*n_tok), so the oracle
    match is bit-exact with no float thresholds. Map-only scan; thresholds
    chosen to split the fixture corpus non-trivially (331/357/500/317 of 500
    docs pass the four gates at sf0.01)."""
    d = T(spark, sf_dir, "documents").select(
        "doc_id", tokenize_whitespace(F.col("text")).alias("tokens")
    )
    n_tok = F.size("tokens").cast("long")
    n_uniq = F.size(F.array_distinct("tokens")).cast("long")
    sum_len = F.aggregate(
        F.transform("tokens", lambda t: F.length(t).cast("long")),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    n_stop = (
        F.array_contains("tokens", "the").cast("int")
        + F.array_contains("tokens", "a").cast("int")
    )
    pass_words = (n_tok >= 40).cast("int")
    pass_uniq = (n_uniq * 100 >= 37 * n_tok).cast("int")
    pass_wlen = ((sum_len >= 3 * n_tok) & (sum_len <= 10 * n_tok)).cast("int")
    pass_stop = (n_stop >= 2).cast("int")
    return d.select(
        "doc_id",
        n_tok.alias("n_tok"),
        pass_words.alias("pass_words"),
        pass_uniq.alias("pass_uniq"),
        pass_wlen.alias("pass_wlen"),
        pass_stop.alias("pass_stop"),
        (
            (pass_words == 1) & (pass_uniq == 1) & (pass_wlen == 1) & (pass_stop == 1)
        ).cast("int").alias("keep"),
    )


@register(
    "text_repetition_stats",
    f"""
    WITH {_TOKS_CTE},
    g2 AS (
      SELECT doc_id, array_to_string(tokens[i : i + 1], ' ') AS g
      FROM toks, unnest(range(1, greatest(len(tokens), 2))) AS u(i)
      WHERE len(tokens) >= 2
    ),
    cnt AS (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY doc_id, g),
    agg AS (
      SELECT doc_id,
             CAST(sum(c) AS BIGINT)   AS n_bigrams,
             CAST(count(*) AS BIGINT) AS n_distinct,
             CAST(max(c) AS BIGINT)   AS top_count
      FROM cnt GROUP BY doc_id
    )
    SELECT doc_id, n_bigrams, n_distinct, top_count,
           round((n_bigrams - n_distinct) * 1.0 / n_bigrams, 4) AS dup_frac,
           CAST((n_bigrams - n_distinct) * 20 > n_bigrams AS INT) AS repetitive
    FROM agg
    """,
    tags=("textstats", "quality", "llm-pipeline"),
)
def text_repetition_stats(spark, sf_dir):
    """Within-document repetition stats (the Gopher repetition-filter
    family): per doc, total vs distinct word-bigram counts, the most
    repeated bigram's count, the duplicate-bigram fraction, and a
    ``repetitive`` flag at the 5% line (integer cross-multiplied — exact in
    both engines; flags 102/500 fixture docs). Shape: bigram explode →
    (doc, gram) hash count → per-doc agg; the (doc, gram) key is
    high-cardinality but map-side combine collapses it before the shuffle,
    and nothing is corpus-global — the scan parallelizes per doc at any
    corpus size."""
    d = T(spark, sf_dir, "documents").select(
        "doc_id", tokenize_whitespace(F.col("text")).alias("tokens")
    ).filter(F.size("tokens") >= 2)
    g2 = d.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("tokens") - 1),
                lambda i: F.array_join(F.slice("tokens", i, 2), " "),
            )
        ).alias("g"),
    )
    cnt = g2.groupBy("doc_id", "g").agg(F.count("*").alias("c"))
    agg = cnt.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_bigrams"),
        F.count("*").cast("bigint").alias("n_distinct"),
        F.max("c").cast("bigint").alias("top_count"),
    )
    dup = F.col("n_bigrams") - F.col("n_distinct")
    return agg.select(
        "doc_id",
        "n_bigrams",
        "n_distinct",
        "top_count",
        F.round(dup * 1.0 / F.col("n_bigrams"), 4).alias("dup_frac"),
        (dup * 20 > F.col("n_bigrams")).cast("int").alias("repetitive"),
    )


@register(
    "sample_token_budget_greedy",
    f"""
    WITH {_QUALITY_CTES},
    qual AS ({_QUALITY_SELECT}),
    sel AS (
      SELECT doc_id, n_tok,
             CAST(round(quality * 10000) AS BIGINT) AS qmilli
      FROM qual
    ),
    ord AS (
      SELECT *,
             CAST(coalesce(sum(n_tok) OVER (
               ORDER BY qmilli DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS BIGINT) AS cum_before
      FROM sel
    ),
    tot AS (SELECT (4 * CAST(sum(n_tok) AS BIGINT)) // 10 AS budget FROM sel)
    SELECT doc_id, n_tok, qmilli, cum_before
    FROM ord, tot
    WHERE cum_before < budget
    ORDER BY cum_before, doc_id
    """,
    tags=("sampling", "budget", "quality", "llm-pipeline"),
)
def sample_token_budget_greedy(spark, sf_dir):
    """Token-budget-constrained corpus selection: rank every document by
    its composite quality score (descending, doc_id tiebreak) and keep
    documents greedily until 40% of the corpus's total tokens are
    consumed — the canonical "best data under a token budget" mixing
    step. A document is selected iff the cumulative token count BEFORE it
    is under budget, so the straddling document is included and the rule
    is deterministic on any partitioning.

    Integer-exact ordering: the 4-decimal quality score becomes
    ``qmilli = round(quality * 10000)`` (identical IEEE doubles in both
    engines make the round identical), and the budget is
    ``(4 * total_tokens) div 10`` — no float thresholds anywhere.

    100 TB shape — the global prefix-sum is HIERARCHICAL, never a
    one-reducer window (the round-7 packing lesson): documents hash into
    <= 101 quality buckets (``qmilli div 100`` — bucket order equals
    quality order by construction), the intra-bucket running sum windows
    on the bucket key in parallel, bucket totals cumulate on a 101-row
    relation, and offsets broadcast back. Budget and offsets are two
    1-row/101-row broadcasts against the scored corpus scan."""
    from pyspark.sql import Window

    q = text_quality_score(spark, sf_dir).select(
        "doc_id",
        "n_tok",
        F.round(F.col("quality") * 10000).cast("long").alias("qmilli"),
    )
    # lazy localCheckpoint: this 4-small-column frame feeds THREE
    # consumers (the intra-bucket window, and — via the bucket totals —
    # the offsets and the budget); without it the regex-heavy quality
    # chain re-runs per consumer (r18, same pattern as
    # pipeline_training_data_prep's labeled frame)
    q = q.withColumn("bucket", F.expr("qmilli div 100")).localCheckpoint(
        eager=False
    )
    w_intra = (
        Window.partitionBy("bucket")
        .orderBy(F.desc("qmilli"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    scored = q.withColumn(
        "intra_before", F.coalesce(F.sum("n_tok").over(w_intra), F.lit(0))
    )
    btot = q.groupBy("bucket").agg(F.sum("n_tok").alias("btot"))
    w_bucket = Window.orderBy(F.desc("bucket")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    boff = btot.select(
        "bucket",
        F.coalesce(F.sum("btot").over(w_bucket), F.lit(0)).alias("bucket_before"),
    )
    budget = btot.agg(
        F.expr("(4 * CAST(sum(btot) AS BIGINT)) div 10").alias("budget")
    )
    return (
        scored.join(F.broadcast(boff), "bucket")
        .crossJoin(F.broadcast(budget))
        .withColumn(
            "cum_before",
            (F.col("bucket_before") + F.col("intra_before")).cast("long"),
        )
        .filter(F.col("cum_before") < F.col("budget"))
        .select("doc_id", "n_tok", "qmilli", "cum_before")
        .orderBy("cum_before", "doc_id")
    )


@register(
    "text_vocab_oov_rate",
    f"""
    WITH {_TOKS_CTE},
    freq AS (
      SELECT t AS tok, count(*) AS c
      FROM toks, unnest(tokens) AS u(t) GROUP BY t
    ),
    vocab AS (
      SELECT list(tok ORDER BY tok) AS v
      FROM (SELECT tok FROM freq ORDER BY c DESC, tok LIMIT 15)
    )
    SELECT doc_id,
           CAST(len(tokens) AS BIGINT) AS n_tok,
           CAST(len(list_filter(tokens, t -> NOT list_contains(v, t)))
                AS BIGINT) AS n_oov,
           CAST((20000 * len(list_filter(tokens, t -> NOT list_contains(v, t)))
                 + greatest(len(tokens), 1))
                // (2 * greatest(len(tokens), 1)) AS DOUBLE)
             / 10000.0 AS oov_rate
    FROM toks, vocab
    ORDER BY doc_id
    """,
    tags=("textstats", "vocab", "llm-pipeline"),
)
def text_vocab_oov_rate(spark, sf_dir):
    """Tokenizer-vocabulary coverage: build the top-15 corpus vocabulary
    by token frequency (count desc, token asc tiebreak — deterministic),
    then score every document's out-of-vocabulary token count and rate.
    The coverage analysis run before committing to a tokenizer/vocab
    size on a new corpus.

    100 TB shape: one explode+count shuffle builds the frequency table
    (map-side combined, vocabulary-bounded); the top-V rows collapse to a
    ONE-ROW array relation that is broadcast — the per-document probe is
    then a map-only array_contains scan, no join shuffle of the exploded
    corpus."""
    d = T(spark, sf_dir, "documents").select(
        "doc_id", tokenize_whitespace(F.col("text")).alias("tokens")
    )
    freq = (
        d.select(F.explode("tokens").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
    )
    top = freq.orderBy(F.desc("c"), F.asc("tok")).limit(15)
    vocab = top.agg(F.sort_array(F.collect_list("tok")).alias("v"))
    n_oov = F.size(
        F.filter("tokens", lambda t: ~F.array_contains("v", t))
    ).cast("long")
    return (
        d.crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            F.size("tokens").cast("long").alias("n_tok"),
            n_oov.alias("n_oov"),
        )
        .selectExpr(
            "doc_id",
            "n_tok",
            "n_oov",
            # integer half-up to 4 decimals (the r18 decimal-edge rule:
            # engines round edge doubles differently; int64 identical)
            "CAST((20000 * n_oov + greatest(n_tok, 1))"
            " DIV (2 * greatest(n_tok, 1)) AS DOUBLE) / 10000.0"
            " AS oov_rate",
        )
        .orderBy("doc_id")
    )
