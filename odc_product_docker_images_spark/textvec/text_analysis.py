"""Text analysis (SURVEY.md §2.10 X4 + training-pipeline extras).

Tokenization (U5 generator/explode), corpus stats, n-gram-heuristic
language ID, quality scoring, token counting, and document fingerprinting.
All pure Column expressions — at 100 TB these run inside the scan's
codegen stage; the only shuffles are the final small aggregations.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.det import (
    davg,
    dec_cast,
    dround,
    dsum,
    exact_double,
    sql_davg,
    sql_dec_cast,
    sql_dround,
    sql_dsum,
    sql_exact_double,
)
from ..io import fanout, load
from ..registry import register


def _toks(col: str = "text") -> Column:
    return F.split(F.col(col), " ")


@register(
    "explode_tokens",
    oracle="""
        SELECT w AS token, COUNT(*) AS n
        FROM (SELECT UNNEST(STRING_SPLIT(text, ' ')) AS w FROM documents)
        GROUP BY w
        ORDER BY n DESC, token
        LIMIT 20
    """,
)
def explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U5/X4: document → token stream (generator) + top-20 word count —
    the canonical explode/UDTF shape."""
    dc = load(spark, sf_dir, "documents")
    return (
        dc.select(F.explode(_toks()).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(20)
    )


@register(
    "text_lang_stats",
    oracle=f"""
        SELECT lang,
               COUNT(*) AS n_docs,
               {sql_davg("n_chars", "avg_chars")},
               {sql_davg("LEN(STRING_SPLIT(text, ' '))", "avg_tokens")},
               COUNT(DISTINCT source) AS n_sources
        FROM documents
        GROUP BY lang
    """,
)
def text_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: per-language corpus profile."""
    dc = load(spark, sf_dir, "documents")
    return dc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        davg("n_chars", "avg_chars"),
        davg(F.size(_toks()).cast("double"), "avg_tokens"),
        F.countDistinct("source").alias("n_sources"),
    )


# Tiny per-language marker lists (the n-gram/stopword heuristic shape; the
# fixture vocab is shared across langs, so scores — not ground truth — are
# the point of the operator).
_MARKERS = {
    "en": ["the", "a", "value", "table"],
    "de": ["der", "die", "und", "batch"],
    "es": ["el", "la", "query", "fast"],
}
_LANG_ORDER = ["en", "de", "es"]


def _marker_score(lang: str) -> Column:
    lits = F.array(*[F.lit(w) for w in _MARKERS[lang]])
    return F.size(F.array_intersect(F.array_distinct(_toks()), lits))


def _marker_score_sql(lang: str) -> str:
    lst = ", ".join(f"'{w}'" for w in _MARKERS[lang])
    return (
        f"LEN(LIST_INTERSECT(LIST_DISTINCT(STRING_SPLIT(text, ' ')), [{lst}]))"
    )


@register(
    "text_lang_id",
    oracle=f"""
        SELECT doc_id,
               CAST({_marker_score_sql('en')} AS INTEGER) AS score_en,
               CAST({_marker_score_sql('de')} AS INTEGER) AS score_de,
               CAST({_marker_score_sql('es')} AS INTEGER) AS score_es,
               CASE
                 WHEN {_marker_score_sql('en')} >= {_marker_score_sql('de')}
                  AND {_marker_score_sql('en')} >= {_marker_score_sql('es')} THEN 'en'
                 WHEN {_marker_score_sql('de')} >= {_marker_score_sql('es')} THEN 'de'
                 ELSE 'es'
               END AS predicted_lang
        FROM documents
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: marker-overlap language ID — score per language = distinct-token
    overlap with a marker list; argmax with a fixed tie order (en>de>es)."""
    dc = load(spark, sf_dir, "documents")
    s = {lang: _marker_score(lang) for lang in _LANG_ORDER}
    predicted = (
        F.when((s["en"] >= s["de"]) & (s["en"] >= s["es"]), "en")
        .when(s["de"] >= s["es"], "de")
        .otherwise("es")
    )
    return dc.select(
        "doc_id",
        s["en"].cast("int").alias("score_en"),
        s["de"].cast("int").alias("score_de"),
        s["es"].cast("int").alias("score_es"),
        predicted.alias("predicted_lang"),
    )


@register(
    "text_quality",
    oracle="""
        SELECT doc_id,
               CAST(n_chars AS BIGINT) AS n_chars,
               CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tokens,
               ROUND(LIST_SUM(LIST_TRANSFORM(STRING_SPLIT(text, ' '),
                     t -> CAST(LEN(t) AS DOUBLE))) / LEN(STRING_SPLIT(text, ' ')), 6)
                 AS avg_token_len,
               ROUND(LEN(LIST_DISTINCT(STRING_SPLIT(text, ' ')))
                     / LEN(STRING_SPLIT(text, ' ')), 6) AS ttr,
               CAST(LEN(STRING_SPLIT(text, ' ')) BETWEEN 20 AND 200
                    AND LEN(LIST_DISTINCT(STRING_SPLIT(text, ' ')))
                        / LEN(STRING_SPLIT(text, ' ')) > 0.2 AS INTEGER) AS passes
        FROM documents
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: quality scoring — length band, mean token length, type-token
    ratio, pass/fail gate (the C4-style heuristic filter shape)."""
    dc = load(spark, sf_dir, "documents")
    toks = _toks()
    n_tok = F.size(toks)
    avg_len = (
        F.aggregate(
            F.transform(toks, lambda t: F.length(t).cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        / n_tok
    )
    ttr = F.size(F.array_distinct(toks)) / n_tok
    passes = (n_tok.between(20, 200) & (ttr > 0.2)).cast("int")
    return dc.select(
        "doc_id",
        F.col("n_chars").cast("bigint").alias("n_chars"),
        n_tok.cast("bigint").alias("n_tokens"),
        F.round(avg_len, 6).alias("avg_token_len"),
        F.round(ttr, 6).alias("ttr"),
        passes.alias("passes"),
    )


@register(
    "text_token_count",
    oracle="""
        SELECT doc_id,
               CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS ws_tokens,
               CAST(LEN(REGEXP_EXTRACT_ALL(text, '[a-z0-9]+')) AS BIGINT) AS re_tokens,
               CAST(CEIL(n_chars / 4.0) AS BIGINT) AS bpe_estimate
        FROM documents
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: token counting three ways — whitespace, regex word-ish tokens,
    and the chars/4 BPE estimate used for quick budget math."""
    dc = load(spark, sf_dir, "documents")
    return dc.select(
        "doc_id",
        F.size(_toks()).cast("bigint").alias("ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit("[a-z0-9]+"), 0)).cast("bigint").alias(
            "re_tokens"
        ),
        F.ceil(F.col("n_chars") / 4.0).cast("bigint").alias("bpe_estimate"),
    )


@register(
    "text_tfidf",
    oracle="""
        WITH tok AS (
            SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS term FROM documents
        ),
        tf AS (
            SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term
        ),
        dfs AS (SELECT term, COUNT(*) AS df_n FROM tf GROUP BY term),
        n AS (SELECT COUNT(*) AS n_docs FROM documents)
        SELECT doc_id, term, tf, df_n, tfidf, rank FROM (
            SELECT tf.doc_id, tf.term, tf.tf, dfs.df_n,
                   CAST(tf.tf AS DOUBLE)
                     * ROUND(LN(CAST(n.n_docs AS DOUBLE) / CAST(dfs.df_n AS DOUBLE)), 6)
                     AS tfidf,
                   ROW_NUMBER() OVER (
                       PARTITION BY tf.doc_id
                       ORDER BY CAST(tf.tf AS DOUBLE)
                         * ROUND(LN(CAST(n.n_docs AS DOUBLE) / CAST(dfs.df_n AS DOUBLE)), 6)
                         DESC, tf.term
                   ) AS rank
            FROM tf JOIN dfs USING (term) CROSS JOIN n
        ) WHERE rank <= 5
    """,
)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: tf-idf featurization, expr form — top-5 terms per document.

    The ``ml.feature.HashingTF``/``IDF`` pipeline computes the same scores
    into an opaque Vector column; here the whole thing is three relational
    stages (tf group, df group, broadcast of the 1-row corpus count), so it
    stays inside codegen, partial-aggregates map-side, and emits hashable
    scalars.  idf = ln(N/df) rounded 6 dp (libm convention); the tf·idf
    product is then IEEE-exact on both engines — re-rounding it would hit
    the short-decimal midpoint trap."""
    dc = load(spark, sf_dir, "documents")
    tf = (
        dc.select("doc_id", F.explode(_toks()).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfs = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_n"))
    n = dc.agg(F.count(F.lit(1)).alias("n_docs"))
    idf = F.round(F.log(F.col("n_docs").cast("double") / F.col("df_n").cast("double")), 6)
    scored = (
        tf.join(dfs, "term")
        .crossJoin(F.broadcast(n))
        .withColumn("tfidf", F.col("tf").cast("double") * idf)
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
        .select("doc_id", "term", "tf", "df_n", "tfidf", "rank")
    )


@register(
    "text_ngrams",
    oracle="""
        SELECT bigram, COUNT(*) AS n FROM (
            SELECT doc_id,
                   UNNEST(LIST_TRANSFORM(
                       RANGE(1, LEN(STRING_SPLIT(text, ' '))),
                       i -> STRING_SPLIT(text, ' ')[i] || ' ' || STRING_SPLIT(text, ' ')[i+1]
                   )) AS bigram
            FROM documents
        )
        GROUP BY bigram
        ORDER BY n DESC, bigram
        LIMIT 20
    """,
)
def text_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: word-bigram generation (``ml.feature.NGram`` semantics as a pure
    expression: zip the token array with its shift) + top-20 corpus counts.
    Guarded for docs with <2 tokens — Spark's negative-length ``slice``
    would otherwise wrap (same trap as ``sequence``; see SNIPPETS)."""
    dc = load(spark, sf_dir, "documents")
    toks = _toks()
    n_tok = F.size(toks)
    bigrams = F.when(
        n_tok >= 2,
        F.zip_with(
            F.slice(toks, 1, n_tok - 1),
            F.slice(toks, 2, n_tok - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        dc.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(20)
    )


@register(
    "text_fingerprint",
    oracle="""
        SELECT doc_id,
               MD5(ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT(STRING_SPLIT(text, ' '))), ' '))
                 AS fingerprint
        FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: canonical-form fingerprint — hash of the sorted distinct token
    set (catches reorderings/shuffles exact-hash misses)."""
    dc = load(spark, sf_dir, "documents")
    return dc.select(
        "doc_id",
        F.md5(F.array_join(F.array_sort(F.array_distinct(_toks())), " ")).alias("fingerprint"),
    )


@register(
    "text_zipf",
    oracle="""
        WITH tok AS (
            SELECT w AS token, COUNT(*) AS n
            FROM (SELECT UNNEST(STRING_SPLIT(text, ' ')) AS w FROM documents)
            GROUP BY w
        ), ranked AS (
            SELECT token, n,
                   ROW_NUMBER() OVER (ORDER BY n DESC, token) AS rnk
            FROM tok
        )
        SELECT COUNT(*) AS n_top,
               ROUND(REGR_SLOPE(LN(CAST(n AS DOUBLE)),
                                LN(CAST(rnk AS DOUBLE))), 5) AS zipf_slope,
               ROUND(REGR_R2(LN(CAST(n AS DOUBLE)),
                             LN(CAST(rnk AS DOUBLE))), 5) AS zipf_r2,
               MAX(n) AS max_freq
        FROM ranked WHERE rnk <= 100
    """,
)
def text_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: Zipf fit over the corpus frequency spectrum — the
    natural-language sanity gate a training pipeline runs per shard
    (synthetic / boilerplate-heavy corpora bend away from slope ≈ -1).
    One token hash-agg (map-side partial) + a top-100 rank (tiny) +
    ``regr_slope`` on the log-log curve.  libm (ln) + multi-pass stat →
    round 5 dp per det.py policy; single output row."""
    dc = load(spark, sf_dir, "documents")
    counts = (
        dc.select(F.explode(_toks()).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.orderBy(F.desc("n"), F.asc("token"))
    ranked = counts.withColumn("rnk", F.row_number().over(w)).where(F.col("rnk") <= 100)
    ln_n = F.log(F.col("n").cast("double"))
    ln_r = F.log(F.col("rnk").cast("double"))
    return ranked.agg(
        F.count(F.lit(1)).alias("n_top"),
        F.round(F.regr_slope(ln_n, ln_r), 5).alias("zipf_slope"),
        F.round(F.regr_r2(ln_n, ln_r), 5).alias("zipf_r2"),
        F.max("n").alias("max_freq"),
    )


_EMAIL_RE = "[a-z0-9._]+@[a-z0-9]+[.][a-z]+"
_IP_RE = "10[.][0-9]+[.][0-9]+[.][0-9]+"


@register(
    "text_pii_scrub",
    oracle=f"""
        WITH injected AS (
            SELECT doc_id,
                   text || ' contact user' || doc_id || '@example.com at 10.0.'
                        || (doc_id % 256) || '.' || ((doc_id * 7) % 256) AS raw
            FROM documents
        )
        SELECT doc_id,
               LEN(REGEXP_EXTRACT_ALL(raw, '{_EMAIL_RE}')) AS n_emails,
               LEN(REGEXP_EXTRACT_ALL(raw, '{_IP_RE}')) AS n_ips,
               MD5(REGEXP_REPLACE(REGEXP_REPLACE(raw, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                                  '{_IP_RE}', '<IP>', 'g')) AS scrubbed_md5
        FROM injected
    """,
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: PII redaction — the scrub pass every training-data pipeline runs
    before tokenization.  The fixture corpus is a synthetic word soup with
    no real PII, so the key deterministically INJECTS an email + IPv4 per
    doc (derived from doc_id), then scrubs with the same regex family on
    both engines and cross-checks match counts and the md5 of the scrubbed
    text.  Patterns stay in the portable intersection of Java regex and
    RE2 (character classes only — no lookaround/backrefs).  Pure per-row
    expression work: at 100 TB this rides the scan's codegen stage with
    zero shuffle."""
    dc = load(spark, sf_dir, "documents")
    raw = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id"),
        F.lit("@example.com at 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit("."),
        ((F.col("doc_id") * 7) % 256).cast("string"),
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(raw, _EMAIL_RE, "<EMAIL>"), _IP_RE, "<IP>"
    )
    return dc.select(
        "doc_id",
        F.regexp_count(raw, F.lit(_EMAIL_RE)).cast("bigint").alias("n_emails"),
        F.regexp_count(raw, F.lit(_IP_RE)).cast("bigint").alias("n_ips"),
        F.md5(scrubbed).alias("scrubbed_md5"),
    )


@register(
    "text_token_entropy",
    oracle=f"""
        WITH tf AS (
            SELECT doc_id, w AS token, COUNT(*) AS c
            FROM (SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS w
                  FROM documents)
            GROUP BY doc_id, w
        ), a AS (
            SELECT doc_id,
                   CAST(SUM(c) AS BIGINT) AS n,
                   COUNT(*) AS n_types,
                   {sql_dsum(
                       "CAST(c AS DOUBLE) * "
                       + sql_dround("LN(CAST(c AS DOUBLE))"),
                       "s_clnc",
                   )}
            FROM tf GROUP BY doc_id
        ), h AS (
            SELECT doc_id, n, n_types,
                   {sql_dround("LN(CAST(n AS DOUBLE))")}
                       - s_clnc / CAST(n AS DOUBLE) AS entropy
            FROM a
        )
        SELECT doc_id, n AS n_tokens, n_types, entropy,
               CASE WHEN n_types > 1
                    THEN entropy
                         / ({sql_dround("LN(CAST(n_types AS DOUBLE))")})
                    ELSE CAST(0.0 AS DOUBLE) END AS norm_entropy
        FROM h
    """,
)
def text_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: per-document Shannon token entropy — the vocabulary-diversity
    quality signal (machine-generated spam and keyword-stuffed pages sit
    far below natural text; `text_repetition` catches the extreme case,
    entropy ranks the whole spectrum).  H(d) = ln n − (Σ c·ln c)/n over
    the doc's token counts (the algebraic form needs NO second pass for
    p = c/n — one grouped aggregate after the (doc, token) count), plus
    the normalized H/ln(types) in [0, 1].

    Scale shape: token explode → (doc, token) hash count → per-doc agg;
    two linear shuffles on doc-sided keys, state bounded by per-doc
    vocabulary.  Determinism: the libm ln is rounded at 6 dp per term
    (the survival-curve policy), c·ln-term products ride the decimal-sum
    path, and the closing ops are single IEEE expressions on identical
    operands."""
    tf = (
        load(spark, sf_dir, "documents")
        .repartition(fanout(spark), "doc_id")  # single-file input: parallelize the explode
        .select("doc_id", F.explode(_toks()).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    cd = F.col("c").cast("double")
    a = tf.groupBy("doc_id").agg(
        F.sum("c").alias("n"),
        F.count(F.lit(1)).alias("n_types"),
        dsum(cd * dround(F.log(cd)), "s_clnc"),
    )
    h = dround(F.log(F.col("n").cast("double"))) - F.col("s_clnc") / F.col(
        "n"
    ).cast("double")
    return a.select(
        "doc_id",
        F.col("n").alias("n_tokens"),
        "n_types",
        h.alias("entropy"),
        F.when(
            F.col("n_types") > 1,
            h / dround(F.log(F.col("n_types").cast("double"))),
        )
        .otherwise(F.lit(0.0))
        .alias("norm_entropy"),
    )


_RAKE_STOP = ("a", "the")  # delimiter stopwords for phrase carving


@register(
    "text_keyphrase_rake",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, w, pos,
                   w IN {_RAKE_STOP!r} AS stop
            FROM (SELECT doc_id,
                         UNNEST(STRING_SPLIT(text, ' ')) AS w,
                         GENERATE_SUBSCRIPTS(STRING_SPLIT(text, ' '), 1) AS pos
                  FROM documents)
        ), nonstop AS (
            SELECT doc_id, w, pos,
                   pos - ROW_NUMBER() OVER (
                       PARTITION BY doc_id ORDER BY pos) AS island
            FROM toks WHERE NOT stop
        ), plen AS (
            SELECT doc_id, w, pos, island,
                   COUNT(*) OVER (PARTITION BY doc_id, island) AS phrase_len
            FROM nonstop
        ), wstat AS (
            SELECT doc_id, w, pos, island, phrase_len,
                   COUNT(*) OVER (PARTITION BY w) AS freq,
                   CAST(SUM(phrase_len) OVER (PARTITION BY w) AS BIGINT)
                       AS degree
            FROM plen
        )
        SELECT doc_id,
               STRING_AGG(w, ' ' ORDER BY pos) AS phrase,
               COUNT(*) AS n_words,
               {sql_dsum(
                   'CAST(degree AS DOUBLE) / CAST(freq AS DOUBLE)', 'score'
               )}
        FROM wstat
        GROUP BY doc_id, island
        HAVING COUNT(*) >= 2
    """,
)
def text_keyphrase_rake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: RAKE keyphrase extraction (Rose et al. 2010) — carve each
    document into candidate phrases at stopword delimiters
    (gaps-and-islands over token positions), score words by
    degree/frequency over the whole candidate corpus, and score each
    phrase as the sum of its word scores.

    Spark-first: word frequency AND degree are WINDOWS over the single
    phrase-word stream (partition by word), and phrase length is a
    window over (doc, island) — no join-back of word scores onto
    phrases, so the candidate subtree plans once (the branch-duplication
    rule).  One scan, three hash Exchanges (doc-island, word, final
    group), everything else map-side.  Determinism: degree/freq is one
    IEEE divide of exact ints; the per-phrase sum rides the decimal
    path."""
    toks = (
        load(spark, sf_dir, "documents")
        .repartition(fanout(spark), "doc_id")  # single-file input: parallelize the explode
        .select("doc_id", F.posexplode(_toks()).alias("pos0", "w"))
        .select("doc_id", "w", (F.col("pos0") + 1).alias("pos"))
    )
    nonstop = toks.where(~F.col("w").isin(*_RAKE_STOP)).withColumn(
        "island",
        F.col("pos")
        - F.row_number().over(Window.partitionBy("doc_id").orderBy("pos")),
    )
    plen = nonstop.withColumn(
        "phrase_len",
        F.count(F.lit(1)).over(Window.partitionBy("doc_id", "island")),
    )
    ww = Window.partitionBy("w")
    wstat = plen.select(
        "doc_id",
        "w",
        "pos",
        "island",
        F.count(F.lit(1)).over(ww).alias("freq"),
        F.sum("phrase_len").over(ww).cast("bigint").alias("degree"),
    )
    return (
        wstat.groupBy("doc_id", "island")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "w"))),
                    lambda x: x["w"],
                ),
                " ",
            ).alias("phrase"),
            F.count(F.lit(1)).alias("n_words"),
            dsum(
                F.col("degree").cast("double") / F.col("freq").cast("double"),
                "score",
            ),
        )
        .where(F.col("n_words") >= 2)
        .drop("island")
    )


_FH_BUCKETS = 256  # hashed feature space (power of two)


@register(
    "text_feature_hashing",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, w FROM (
                SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS w
                FROM documents)
        ), hashed AS (
            SELECT doc_id,
                   ((STRPOS('0123456789abcdef', SUBSTR(MD5(w), 1, 1)) - 1) * 16
                    + (STRPOS('0123456789abcdef', SUBSTR(MD5(w), 2, 1)) - 1))
                   % {_FH_BUCKETS} AS bucket
            FROM tok
        ), cells AS (
            SELECT doc_id, bucket, COUNT(*) AS c
            FROM hashed GROUP BY doc_id, bucket
        )
        SELECT doc_id,
               COUNT(*) AS n_buckets,
               CAST(SUM(c) AS BIGINT) AS n_tokens,
               STRING_AGG(CAST(bucket AS VARCHAR) || ':' ||
                          CAST(c AS VARCHAR), ',' ORDER BY bucket)
                   AS features
        FROM cells GROUP BY doc_id
    """,
)
def text_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: hashing-trick featurization (the HashingVectorizer /
    Weinberger et al. 2009 shape) — tokens hash into a fixed
    {_FH_BUCKETS}-bucket feature space, per-doc bucket counts serialize
    as a sparse ``bucket:count`` vector.  No vocabulary pass, no fit
    state, memory independent of vocabulary size — the featurizer that
    works when the corpus is 100 TB and the vocab is unbounded.

    Scale shape: hash + bucket are map-side codegen on the token stream
    (md5 first byte — engine-identical, the bootstrap-key discipline);
    ONE (doc, bucket) hash agg with map-side partials, then the per-doc
    rollup reuses the doc-prefix partitioning.  All integers; the sparse
    string renders identically on both engines."""
    digits = "0123456789abcdef"
    bucket = (
        F.expr(f"locate(substr(md5(w), 1, 1), '{digits}') - 1") * 16
        + F.expr(f"locate(substr(md5(w), 2, 1), '{digits}') - 1")
    ) % _FH_BUCKETS
    cells = (
        load(spark, sf_dir, "documents")
        .repartition(fanout(spark), "doc_id")  # single-file input: parallelize the explode
        .select("doc_id", F.explode(_toks()).alias("w"))
        .groupBy("doc_id", bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return cells.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("bucket", "c"))),
                lambda x: F.concat_ws(
                    ":", x["bucket"].cast("string"), x["c"].cast("string")
                ),
            ),
            ",",
        ).alias("features"),
    )


_GOPHER_STOPS = ("the", "a", "value", "table", "row")  # ≥2 must appear


@register(
    "text_quality_gopher",
    oracle=f"""
        WITH t AS (
            SELECT doc_id,
                   STRING_SPLIT(text, ' ') AS ws,
                   LEN(STRING_SPLIT(text, ' ')) AS n_words
            FROM documents
        ), m AS (
            SELECT doc_id, n_words,
                   LIST_SUM(LIST_TRANSFORM(ws, w -> CAST(LEN(w) AS DOUBLE)))
                     / CAST(n_words AS DOUBLE) AS mean_wlen,
                   CAST(LEN(LIST_FILTER(ws,
                       w -> REGEXP_MATCHES(w, '[#%$]'))) AS DOUBLE)
                     / CAST(n_words AS DOUBLE) AS symbol_ratio,
                   CAST(LEN(LIST_FILTER(ws,
                       w -> REGEXP_MATCHES(w, '[a-z]'))) AS DOUBLE)
                     / CAST(n_words AS DOUBLE) AS alpha_ratio,
                   CAST(LEN(LIST_INTERSECT(LIST_DISTINCT(ws),
                       {list(_GOPHER_STOPS)!r})) AS INTEGER) AS n_stop_hits
            FROM t
        )
        SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
               ROUND(mean_wlen, 6) AS mean_wlen,
               ROUND(symbol_ratio, 6) AS symbol_ratio,
               ROUND(alpha_ratio, 6) AS alpha_ratio,
               n_stop_hits,
               CAST(n_words BETWEEN 50 AND 100000
                    AND mean_wlen BETWEEN CAST(3.0 AS DOUBLE)
                                      AND CAST(10.0 AS DOUBLE)
                    AND symbol_ratio <= CAST(0.1 AS DOUBLE)
                    AND alpha_ratio >= CAST(0.8 AS DOUBLE)
                    AND n_stop_hits >= 2 AS INTEGER) AS passes_gopher
        FROM m
    """,
)
def text_quality_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: the Gopher quality-rule battery (Rae et al. 2021, App. A) —
    the published heuristic gate beside ``text_quality``'s C4-style
    check: word-count band, mean word length 3-10, symbol-to-word ratio,
    alphabetic-word ratio, and the ≥2-stopword requirement.  Real
    curation stacks run exactly this battery before any model-based
    filter.

    All pure codegen array/ratio expressions riding the scan — zero
    shuffles (plan-pinned); ratios are single IEEE divides of exact
    counts compared against exact-decimal thresholds (same operands both
    engines), rounded 6 dp only for OUTPUT."""
    ws = _toks()
    n = F.size(ws)
    nd = n.cast("double")
    mean_wlen = (
        F.aggregate(
            F.transform(ws, lambda w: F.length(w).cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        / nd
    )
    symbol_ratio = (
        F.size(F.filter(ws, lambda w: w.rlike("[#%$]"))).cast("double") / nd
    )
    alpha_ratio = (
        F.size(F.filter(ws, lambda w: w.rlike("[a-z]"))).cast("double") / nd
    )
    stops = F.array(*[F.lit(s) for s in _GOPHER_STOPS])
    n_stop = F.size(F.array_intersect(F.array_distinct(ws), stops)).cast("int")
    passes = (
        n.between(50, 100000)
        & mean_wlen.between(3.0, 10.0)
        & (symbol_ratio <= 0.1)
        & (alpha_ratio >= 0.8)
        & (n_stop >= 2)
    ).cast("int")
    return load(spark, sf_dir, "documents").select(
        "doc_id",
        n.cast("bigint").alias("n_words"),
        F.round(mean_wlen, 6).alias("mean_wlen"),
        F.round(symbol_ratio, 6).alias("symbol_ratio"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        n_stop.alias("n_stop_hits"),
        passes.alias("passes_gopher"),
    )


@register(
    "text_readability",
    oracle="""
        WITH counts AS (
            SELECT doc_id,
                   LEN(LIST_FILTER(STRING_SPLIT(text, ' '), x -> x <> ''))
                       AS n_words,
                   GREATEST(1, LEN(REGEXP_REPLACE(text, '[^.!?]', '', 'g')))
                       AS n_sentences,
                   GREATEST(1, LEN(LIST_FILTER(
                       REGEXP_SPLIT_TO_ARRAY(LOWER(text), '[^aeiouy]+'),
                       x -> x <> ''))) AS n_syllables
            FROM documents
        )
        SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
               CAST(n_sentences AS BIGINT) AS n_sentences,
               CAST(n_syllables AS BIGINT) AS n_syllables,
               CAST(CAST(CAST(ROUND((CAST(CAST((CASE WHEN ABS((CAST(206.835 AS DOUBLE) - CAST(1.015 AS DOUBLE) * (CAST(n_words AS DOUBLE) / n_sentences) - CAST(84.6 AS DOUBLE) * (CAST(n_syllables AS DOUBLE) / n_words))) < 5e-11 THEN CAST(0.0 AS DOUBLE) ELSE (CAST(206.835 AS DOUBLE) - CAST(1.015 AS DOUBLE) * (CAST(n_words AS DOUBLE) / n_sentences) - CAST(84.6 AS DOUBLE) * (CAST(n_syllables AS DOUBLE) / n_words)) END) AS VARCHAR) AS DECIMAL(30,10))), 6) AS DECIMAL(24,6)) * CAST(1000000 AS DECIMAL(8,0)) AS BIGINT) AS DOUBLE) / 1000000.0 AS flesch,
               CAST(CAST(CAST(ROUND((CAST(CAST((CASE WHEN ABS((CAST(0.39 AS DOUBLE) * (CAST(n_words AS DOUBLE) / n_sentences) + CAST(11.8 AS DOUBLE) * (CAST(n_syllables AS DOUBLE) / n_words) - CAST(15.59 AS DOUBLE))) < 5e-11 THEN CAST(0.0 AS DOUBLE) ELSE (CAST(0.39 AS DOUBLE) * (CAST(n_words AS DOUBLE) / n_sentences) + CAST(11.8 AS DOUBLE) * (CAST(n_syllables AS DOUBLE) / n_words) - CAST(15.59 AS DOUBLE)) END) AS VARCHAR) AS DECIMAL(30,10))), 6) AS DECIMAL(24,6)) * CAST(1000000 AS DECIMAL(8,0)) AS BIGINT) AS DOUBLE) / 1000000.0 AS fk_grade
        FROM counts
        WHERE n_words > 0
    """,
)
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: Flesch reading-ease + Flesch-Kincaid grade per document — the
    classic readability features of a quality-filter stack (vocabulary
    metrics live in text_quality/text_quality_gopher; this adds the
    sentence/syllable axis).  Syllables use the standard vowel-group
    proxy (maximal [aeiouy]+ runs); sentence count is terminal-punct
    chars with a floor of 1 (the synthetic corpus has none — the words
    and syllable terms still fully exercise the formulas; real corpora
    light up the sentence term).  Pure map pass, zero shuffle; every
    count is an exact integer, the formulas are fixed IEEE chains on
    CAST-to-double literals (bare-literal DECIMAL trap), rounded 6 dp."""
    dc = load(spark, sf_dir, "documents")
    words = F.size(F.filter(F.split("text", " "), lambda x: x != ""))
    sents = F.greatest(
        F.lit(1), F.length(F.regexp_replace("text", r"[^.!?]", ""))
    )
    syll = F.greatest(
        F.lit(1),
        F.size(F.filter(F.split(F.lower("text"), "[^aeiouy]+"), lambda x: x != "")),
    )
    counts = dc.select(
        "doc_id",
        words.alias("n_words"),
        sents.alias("n_sentences"),
        syll.alias("n_syllables"),
    ).where(F.col("n_words") > 0)
    wps = F.col("n_words").cast("double") / F.col("n_sentences")
    spw = F.col("n_syllables").cast("double") / F.col("n_words")
    return counts.select(
        "doc_id",
        F.col("n_words").cast("long").alias("n_words"),
        F.col("n_sentences").cast("long").alias("n_sentences"),
        F.col("n_syllables").cast("long").alias("n_syllables"),
        dround(
            F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw
        ).alias("flesch"),
        dround(F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59)).alias(
            "fk_grade"
        ),
    )


_PMI_MIN_COUNT = 5


@register(
    "text_collocations_pmi",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, pos, tok AS a
            FROM (
                SELECT doc_id,
                       GENERATE_SUBSCRIPTS(STRING_SPLIT(text, ' '), 1) AS pos,
                       UNNEST(STRING_SPLIT(text, ' ')) AS tok
                FROM documents
            ) WHERE tok <> ''
        ), stream AS (
            SELECT a,
                   LEAD(a) OVER (PARTITION BY doc_id ORDER BY pos) AS b
            FROM toks
        ), g AS (
            SELECT a, b, CAST(COUNT(*) AS BIGINT) AS c
            FROM stream GROUP BY a, b
        ), u AS (
            SELECT a, CAST(SUM(c) AS BIGINT) AS ua,
                   CAST(SUM(SUM(c)) OVER () AS BIGINT) AS n_tok
            FROM g GROUP BY a
        ), big AS (
            SELECT g.a, g.b, g.c, ua.ua, ub.ua AS ub, ua.n_tok,
                   CAST(SUM(g.c) OVER () AS BIGINT) AS n_big
            FROM g
            JOIN u ua ON g.a = ua.a
            JOIN u ub ON g.b = ub.a
            WHERE g.b IS NOT NULL
        )
        SELECT a AS w1, b AS w2, c AS pair_count, ua AS c1, ub AS c2,
               {sql_dround(
                   "LN((CAST(c AS DOUBLE) / n_big)"
                   " / ((CAST(ua AS DOUBLE) / n_tok)"
                   " * (CAST(ub AS DOUBLE) / n_tok)))"
               )} AS pmi
        FROM big WHERE c >= {_PMI_MIN_COUNT}
    """,
)
def text_collocations_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: PMI-ranked bigram collocations (count floor {_PMI_MIN_COUNT})
    — the phrase-mining statistic (Church & Hanks) behind tokenizer
    merge candidates and stop-phrase lists; the pointwise complement of
    ``text_lm_bigram``'s conditional probabilities.

    Single corpus pass: the token stream gets its successor via one
    lead window per doc, and ONE (a, b) count aggregate feeds
    everything — unigram counts fall out of the same grouped table
    (every token occurs exactly once as a row's first element, so
    Σ_b c(a,b) = unigram(a)), then join back as two broadcast sides.
    No second tokenization branch.  The global token/bigram totals are
    wall windows over the distinct-unigram/-bigram tables (vocab-sized,
    not corpus-sized).  PMI's log rounds 6 dp; everything else is exact
    integer ratios."""
    dc = load(spark, sf_dir, "documents")
    toks = dc.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos", "a"),
    ).where(F.col("a") != "")
    stream = toks.select(
        "a",
        F.lead("a").over(Window.partitionBy("doc_id").orderBy("pos")).alias("b"),
    )
    # persisted: three consumers (bigram side + both unigram join sides)
    # would otherwise re-tokenize the corpus; g is vocab^2-bounded, not
    # corpus-sized (the documented multi-consumer exception)
    g = (
        stream.groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .persist()
    )
    wall = Window.partitionBy(F.lit(0)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    u = (
        g.groupBy("a")
        .agg(F.sum("c").cast("long").alias("ua"))
        .withColumn("n_tok", F.sum("ua").over(wall).cast("long"))
    )
    big = (
        g.where(F.col("b").isNotNull())
        .join(
            F.broadcast(u.select(F.col("a").alias("ja"), "ua", "n_tok")),
            F.col("a") == F.col("ja"),
        )
        .drop("ja")
        .join(
            F.broadcast(u.select(F.col("a").alias("jb"), F.col("ua").alias("ub"))),
            F.col("b") == F.col("jb"),
        )
        .drop("jb")
        .withColumn("n_big", F.sum("c").over(wall).cast("long"))
    )
    pmi = dround(
        F.log(
            (F.col("c").cast("double") / F.col("n_big"))
            / (
                (F.col("ua").cast("double") / F.col("n_tok"))
                * (F.col("ub").cast("double") / F.col("n_tok"))
            )
        )
    )
    return big.where(F.col("c") >= _PMI_MIN_COUNT).select(
        F.col("a").alias("w1"),
        F.col("b").alias("w2"),
        F.col("c").alias("pair_count"),
        F.col("ua").alias("c1"),
        F.col("ub").alias("c2"),
        pmi.alias("pmi"),
    )


@register(
    "text_js_divergence",
    oracle=f"""
        WITH toks AS (
            SELECT CAST(source = 'src0' AS INTEGER) AS is_p, tok
            FROM (
                SELECT source, UNNEST(STRING_SPLIT(text, ' ')) AS tok
                FROM documents
            ) WHERE tok <> ''
        ), counts AS (
            SELECT tok,
                   CAST(SUM(is_p) AS BIGINT) AS cp,
                   CAST(COUNT(*) - SUM(is_p) AS BIGINT) AS cq
            FROM toks GROUP BY tok
        ), tot AS (
            SELECT CAST(SUM(cp) AS BIGINT) AS np, CAST(SUM(cq) AS BIGINT) AS nq
            FROM counts
        ), probs AS (
            SELECT CAST(cp AS DOUBLE)
                       / NULLIF(CAST(np AS DOUBLE), CAST(0.0 AS DOUBLE)) AS p,
                   CAST(cq AS DOUBLE)
                       / NULLIF(CAST(nq AS DOUBLE), CAST(0.0 AS DOUBLE)) AS q
            FROM counts CROSS JOIN tot
        ), terms AS (
            SELECT CASE WHEN p > 0.0 THEN {sql_dround(
                       "p * LN(p / ((p + q) / 2.0))"
                   )} ELSE CAST(0.0 AS DOUBLE) END AS kp,
                   CASE WHEN q > 0.0 THEN {sql_dround(
                       "q * LN(q / ((p + q) / 2.0))"
                   )} ELSE CAST(0.0 AS DOUBLE) END AS kq
            FROM probs
        )
        SELECT {sql_dsum("kp", "kl_p_m")},
               {sql_dsum("kq", "kl_q_m")},
               {sql_dround(
                   "((" + sql_exact_double("SUM(" + sql_dec_cast("kp") + ")")
                   + ") + (" + sql_exact_double("SUM(" + sql_dec_cast("kq") + ")")
                   + ")) / 2.0"
               )} AS js_divergence
        FROM terms
    """,
)
def text_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4++: Jensen-Shannon divergence between the src0 token
    distribution and the rest of the corpus — the bounded, symmetric
    corpus-mix drift measure (the text twin of profile_drift_psi's
    numeric PSI; 0 = identical mixes, ln 2 = disjoint).  JS = ½KL(P‖M)
    + ½KL(Q‖M), M the midpoint — finite even for tokens one side has
    never seen, which is why retraining monitors use it over raw KL.

    One token-count pass (vocab-bounded table), totals broadcast back,
    per-token ln terms round 6 dp into decimal sums; the halved sum
    rounds 6 dp."""
    dc = load(spark, sf_dir, "documents")
    toks = dc.select(
        (F.col("source") == "src0").cast("int").alias("is_p"),
        F.explode(F.split("text", " ")).alias("tok"),
    ).where(F.col("tok") != "")
    counts = toks.groupBy("tok").agg(
        F.sum("is_p").cast("long").alias("cp"),
        (F.count(F.lit(1)) - F.sum("is_p")).cast("long").alias("cq"),
    )
    wall = Window.partitionBy(F.lit(0)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    probs = counts.select(
        (
            F.col("cp").cast("double")
            / F.nullif(F.sum("cp").over(wall).cast("double"), F.lit(0.0))
        ).alias("p"),
        (
            F.col("cq").cast("double")
            / F.nullif(F.sum("cq").over(wall).cast("double"), F.lit(0.0))
        ).alias("q"),
    )
    m = (F.col("p") + F.col("q")) / 2.0
    kp = F.when(
        F.col("p") > 0.0, dround(F.col("p") * F.log(F.col("p") / m))
    ).otherwise(F.lit(0.0))
    kq = F.when(
        F.col("q") > 0.0, dround(F.col("q") * F.log(F.col("q") / m))
    ).otherwise(F.lit(0.0))
    terms = probs.select(kp.alias("kp"), kq.alias("kq"))
    skp = exact_double(F.sum(dec_cast("kp")))
    skq = exact_double(F.sum(dec_cast("kq")))
    return terms.agg(
        dsum("kp", "kl_p_m"),
        dsum("kq", "kl_q_m"),
        dround((skp + skq) / F.lit(2.0)).alias("js_divergence"),
    )


_BURST_MIN_DOCS = 20  # report tokens with support in >= this many docs


@register(
    "text_burstiness",
    oracle=f"""
        WITH dt AS (
            SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c
            FROM (
                SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS tok
                FROM documents
            ) WHERE tok <> ''
            GROUP BY doc_id, tok
        ), nd AS (
            SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs FROM dt
        ), stats AS (
            SELECT tok,
                   CAST(COUNT(*) AS BIGINT) AS df,
                   CAST(SUM(c) AS BIGINT) AS tf,
                   CAST(SUM(c * c) AS BIGINT) AS tf2,
                   MAX(n_docs) AS n_docs
            FROM dt CROSS JOIN nd
            GROUP BY tok
        )
        SELECT tok, df, tf,
               {sql_dround("CAST(tf AS DOUBLE) / n_docs")} AS mean_per_doc,
               {sql_dround(
                   "(CAST(tf2 AS DOUBLE) / n_docs"
                   " - (CAST(tf AS DOUBLE) / n_docs)"
                   " * (CAST(tf AS DOUBLE) / n_docs))"
                   " / (CAST(tf AS DOUBLE) / n_docs)"
               )} AS burstiness
        FROM stats WHERE df >= {_BURST_MIN_DOCS}
    """,
)
def text_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: per-token burstiness — the variance-to-mean (Fano) ratio of a
    token's per-document counts over the WHOLE corpus (docs without the
    token count as zeros, handled in closed form: only Σc and Σc² are
    needed, zeros contribute nothing): Church-style burstiness
    separates topical content words (bursty, ratio >> 1) from function
    words (Poisson-ish, ratio ≈ 1) — a feature TF-IDF misses and
    curation keyword extractors use.

    One (doc, token) count pass; per-token sufficient statistics are
    exact integers; the corpus doc count broadcasts from a 1-row
    aggregate; the two ratios round 6 dp.  df floor keeps the report
    table reviewable."""
    dc = load(spark, sf_dir, "documents")
    dt = (
        dc.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .where(F.col("tok") != "")
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    nd = dt.agg(F.countDistinct("doc_id").cast("long").alias("n_docs"))
    stats = (
        dt.crossJoin(F.broadcast(nd))
        .groupBy("tok")
        .agg(
            F.count(F.lit(1)).cast("long").alias("df"),
            F.sum("c").cast("long").alias("tf"),
            F.sum(F.col("c") * F.col("c")).cast("long").alias("tf2"),
            F.max("n_docs").alias("n_docs"),
        )
    )
    mean = F.col("tf").cast("double") / F.col("n_docs")
    var = F.col("tf2").cast("double") / F.col("n_docs") - mean * mean
    return stats.where(F.col("df") >= _BURST_MIN_DOCS).select(
        "tok",
        "df",
        "tf",
        dround(mean).alias("mean_per_doc"),
        dround(var / mean).alias("burstiness"),
    )


_MATTR_W, _MATTR_S = 20, 10  # window tokens / stride


@register(
    "text_mattr",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id,
                   LIST_FILTER(STRING_SPLIT(text, ' '), x -> x <> '') AS ts
            FROM documents
        ), spec AS (
            SELECT doc_id, ts, LEN(ts) AS n_tok,
                   (LEN(ts) - {_MATTR_W}) // {_MATTR_S} + 1 AS n_win
            FROM toks WHERE LEN(ts) >= {_MATTR_W}
        ), ttrs AS (
            SELECT doc_id, n_tok, n_win,
                   LIST_TRANSFORM(RANGE(0, n_win), w ->
                       CAST(LEN(LIST_DISTINCT(
                           ts[w * {_MATTR_S} + 1 : w * {_MATTR_S} + {_MATTR_W}]
                       )) AS DOUBLE) / {_MATTR_W}) AS rs
            FROM spec
        )
        SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tokens,
               CAST(n_win AS BIGINT) AS n_windows,
               {sql_dround(
                   "LIST_SUM(rs) / n_win"
               )} AS mattr
        FROM ttrs
    """,
)
def text_mattr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: MATTR — moving-average type-token ratio over {_MATTR_W}-token
    windows (stride {_MATTR_S}): the length-invariant lexical-diversity
    measure (plain TTR collapses as documents grow, which is why
    curation stacks window it).  Whole computation is higher-order ARRAY
    expressions — split once, transform over window starts, distinct
    per slice — zero shuffle, zero Python, codegen throughout.  Window
    ratios are exact k/{_MATTR_W} grid values; their mean is a short
    fixed-order fold on both engines, rounded 6 dp.  Docs shorter than
    one window drop (standard MATTR convention)."""
    dc = load(spark, sf_dir, "documents")
    toks = dc.select(
        "doc_id",
        F.filter(F.split("text", " "), lambda x: x != "").alias("ts"),
    )
    spec = toks.where(F.size("ts") >= _MATTR_W).select(
        "doc_id",
        "ts",
        F.size("ts").alias("n_tok"),
        (
            F.floor((F.size("ts") - _MATTR_W) / _MATTR_S).cast("int") + 1
        ).alias("n_win"),
    )
    rs = F.expr(
        f"transform(sequence(0, n_win - 1), w -> "
        f"cast(size(array_distinct(slice(ts, w * {_MATTR_S} + 1, {_MATTR_W})))"
        f" as double) / {_MATTR_W})"
    )
    ttrs = spec.select(
        "doc_id",
        F.col("n_tok").cast("long").alias("n_tokens"),
        F.col("n_win").cast("long").alias("n_windows"),
        rs.alias("rs"),
    )
    return ttrs.select(
        "doc_id",
        "n_tokens",
        "n_windows",
        dround(
            F.aggregate("rs", F.lit(0.0), lambda a, v: a + v) / F.col("n_windows")
        ).alias("mattr"),
    )


@register(
    "text_fertility_stats",
    oracle=f"""
        WITH d AS (
            SELECT lang, source,
                   CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS toks,
                   CAST(LENGTH(text) AS BIGINT) AS chars,
                   CAST(OCTET_LENGTH(CAST(text AS BLOB)) AS BIGINT) AS bytes
            FROM documents
        )
        SELECT lang, source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(toks) AS BIGINT) AS total_tokens,
               CAST(SUM(chars) AS BIGINT) AS total_chars,
               CAST(SUM(bytes) AS BIGINT) AS total_bytes,
               CASE WHEN SUM(toks) > 0 THEN {sql_dround(
                   "SUM(chars) / CAST(SUM(toks) AS DOUBLE)")} END
                   AS chars_per_token,
               CASE WHEN SUM(toks) > 0 THEN {sql_dround(
                   "SUM(bytes) / CAST(SUM(toks) AS DOUBLE)")} END
                   AS bytes_per_token,
               {sql_dround("SUM(toks) / CAST(COUNT(*) AS DOUBLE)")}
                   AS tokens_per_doc
        FROM d GROUP BY lang, source
    """,
)
def text_fertility_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: tokenizer-fertility profile per (lang, source) — chars/token,
    bytes/token, tokens/doc from the whitespace segmentation
    (`text_token_count`'s convention): the table a pretraining budget is
    planned from, and the per-language fairness diagnostic (a tokenizer
    with 2× the fertility on one language halves its effective context
    and doubles its training cost — why multilingual corpora audit this
    before mixing).  UTF-8 byte counts come from the blob length so
    multi-byte scripts actually differ from their char counts.  One
    map-side-combinable pass; exact integer sums, single IEEE ratio
    divisions (empty-token groups emit NULL via identical guards)."""
    dc = load(spark, sf_dir, "documents")
    d = dc.select(
        "lang",
        "source",
        F.size(_toks()).cast("long").alias("toks"),
        F.length("text").cast("long").alias("chars"),
        F.octet_length("text").cast("long").alias("bytes"),
    )
    toks, chars, bts = F.col("toks"), F.col("chars"), F.col("bytes")
    agg = d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(toks).cast("long").alias("total_tokens"),
        F.sum(chars).cast("long").alias("total_chars"),
        F.sum(bts).cast("long").alias("total_bytes"),
    )
    tt = F.col("total_tokens")
    return agg.select(
        "lang",
        "source",
        "n_docs",
        "total_tokens",
        "total_chars",
        "total_bytes",
        F.when(
            tt > 0, dround(F.col("total_chars") / tt.cast("double"))
        ).alias("chars_per_token"),
        F.when(
            tt > 0, dround(F.col("total_bytes") / tt.cast("double"))
        ).alias("bytes_per_token"),
        dround(tt / F.col("n_docs").cast("double")).alias("tokens_per_doc"),
    )
