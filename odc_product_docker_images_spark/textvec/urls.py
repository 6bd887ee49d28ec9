"""URL canonicalization + dedup (SURVEY.md §2.10 X1+ — the web-corpus
variant of ``dedup_exact_hash``).

Crawl pipelines dedup by CANONICAL URL before any content pass: the same
page arrives as `HTTPS://WWW.Example.COM:443/a/b/?utm_source=feed&id=5`
and `https://example.com/a/b?id=5`, and the fetch/dedup ledger must key
them identically.  The canonical form here applies the standard safe
normalizations (RFC 3986 §6 plus the usual tracker-param strip):
lowercase scheme+host, drop `www.`, drop default ports (:80/:443), drop
the fragment, strip trailing slashes, drop `utm_*`/`ref` tracking
params, and sort the surviving query params.

The fixture has no URL column, so a raw URL is derived per document from
`doc_id` arithmetic — identical integer expressions on both engines —
with every variation axis exercised (scheme case, www, port, param
order, trackers, fragment, trailing slash).  97 canonical targets × ~5
raw variants each at the 500-doc fixture.

Spark-first: canonicalization is pure codegen'd string/array expressions
(split_part / regexp_replace / filter / array_sort — no Python), so at
crawl scale it rides the scan; the dedup rollup is ONE hash shuffle on
the canonical key with map-side partials, the same shape that keys a
100 TB frontier ledger.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import fanout, load
from ..registry import register

_N_TARGETS = 97  # distinct canonical URLs carved out of the doc space


def _canonicalize(url: Column) -> Column:
    """Canonical URL as composable column expressions (all codegen)."""
    no_frag = F.split_part(url, F.lit("#"), F.lit(1))
    base = F.split_part(no_frag, F.lit("?"), F.lit(1))
    q = F.split_part(no_frag, F.lit("?"), F.lit(2))
    scheme = F.lower(F.split_part(base, F.lit("://"), F.lit(1)))
    rest = F.split_part(base, F.lit("://"), F.lit(2))
    hostport = F.split_part(rest, F.lit("/"), F.lit(1))
    path = F.regexp_replace(rest, r"^[^/]*", "")
    host = F.regexp_replace(
        F.regexp_replace(F.lower(hostport), r":(443|80)$", ""), r"^www\.", ""
    )
    path_c = F.regexp_replace(path, r"/+$", "")
    params = F.filter(
        F.split(q, "&"),
        lambda p: (~p.startswith("utm_")) & (~p.startswith("ref=")) & (p != ""),
    )
    qs = F.array_join(F.array_sort(params), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path_c,
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
    )


@register(
    "dedup_url_canonical",
    oracle=f"""
        WITH raw AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'https' END
                   || '://'
                   || CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END
                   || 'ex' || CAST((doc_id % {_N_TARGETS}) % 7 AS VARCHAR)
                   || '.Example.COM'
                   || CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END
                   || '/a/b/' || CAST(doc_id % {_N_TARGETS} AS VARCHAR)
                   || CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END
                   || '?'
                   || CASE WHEN doc_id % 2 = 0
                           THEN 'id=' || CAST(doc_id % {_N_TARGETS} AS VARCHAR)
                                || '&utm_source=feed'
                           ELSE 'utm_source=feed&id='
                                || CAST(doc_id % {_N_TARGETS} AS VARCHAR)
                      END
                   || CASE WHEN doc_id % 7 = 0 THEN '&ref=tw' ELSE '' END
                   || CASE WHEN doc_id % 6 = 0 THEN '#sec2' ELSE '' END
                   AS url
            FROM documents
        ), split AS (
            SELECT doc_id,
                   split_part(split_part(url, '#', 1), '?', 1) AS base,
                   split_part(split_part(url, '#', 1), '?', 2) AS q
            FROM raw
        ), parts AS (
            SELECT doc_id,
                   lower(split_part(base, '://', 1)) AS scheme,
                   regexp_replace(regexp_replace(
                       lower(split_part(split_part(base, '://', 2), '/', 1)),
                       ':(443|80)$', ''), '^www\\.', '') AS host,
                   regexp_replace(regexp_replace(
                       split_part(base, '://', 2), '^[^/]*', ''),
                       '/+$', '') AS p,
                   array_to_string(list_sort(list_filter(
                       string_split(q, '&'),
                       x -> NOT starts_with(x, 'utm_')
                            AND NOT starts_with(x, 'ref=') AND x <> '')), '&')
                   AS qs
            FROM split
        ), keyed AS (
            SELECT doc_id,
                   scheme || '://' || host || p
                   || CASE WHEN qs <> '' THEN '?' || qs ELSE '' END
                   AS canonical_url
            FROM parts
        )
        SELECT canonical_url,
               COUNT(*) AS n_dups,
               MIN(doc_id) AS keep_doc,
               array_to_string(list_transform(
                   list_sort(LIST(doc_id))[1:1000],
                   x -> CAST(x AS VARCHAR)), ',') AS members
        FROM keyed GROUP BY canonical_url
    """,
)
def dedup_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1+: canonical-URL dedup — normalize scheme/host/port/params/
    fragment variants to one key, then group: survivor = min doc_id,
    members as a doc-sorted roster CAPPED at the first 1000 ids (n_dups
    still carries the true count — at web scale one hot URL must not
    build an unbounded row; fixture groups are far below the cap, so
    graded values are byte-identical).  One scan, codegen
    canonicalization, one hash shuffle on the canonical key
    (plan-pinned)."""
    b = (F.col("doc_id") % _N_TARGETS).cast("string")
    raw = F.concat(
        F.when(F.col("doc_id") % 2 == 0, "HTTPS").otherwise("https"),
        F.lit("://"),
        F.when(F.col("doc_id") % 3 == 0, "WWW.").otherwise(""),
        F.lit("ex"),
        ((F.col("doc_id") % _N_TARGETS) % 7).cast("string"),
        F.lit(".Example.COM"),
        F.when(F.col("doc_id") % 5 == 0, ":443").otherwise(""),
        F.lit("/a/b/"),
        b,
        F.when(F.col("doc_id") % 4 == 0, "/").otherwise(""),
        F.lit("?"),
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(F.lit("id="), b, F.lit("&utm_source=feed")),
        ).otherwise(F.concat(F.lit("utm_source=feed&id="), b)),
        F.when(F.col("doc_id") % 7 == 0, "&ref=tw").otherwise(""),
        F.when(F.col("doc_id") % 6 == 0, "#sec2").otherwise(""),
    )
    d = (
        load(spark, sf_dir, "documents")
        .repartition(fanout(spark), "doc_id")  # single-file input: parallelize the map
        .select("doc_id", _canonicalize(raw).alias("canonical_url"))
    )
    return d.groupBy("canonical_url").agg(
        F.count(F.lit(1)).alias("n_dups"),
        F.min("doc_id").alias("keep_doc"),
        F.array_join(
            F.transform(
                F.slice(F.array_sort(F.collect_list("doc_id")), 1, 1000),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("members"),
    )


@register(
    "dedup_survivorship",
    oracle="""
        WITH e AS (
            SELECT user_id, event_id,
                   CAST(EPOCH(DATE_TRUNC('second', ts)) AS BIGINT) AS sec,
                   CASE WHEN event_type <> 'error' THEN event_type END
                       AS etype,
                   CASE WHEN value > 100.0 THEN value END AS big_value,
                   JSON_EXTRACT_STRING(props, '$.k') AS k
            FROM events
        ), ordered AS (
            SELECT user_id,
                   LAST_VALUE(etype IGNORE NULLS) OVER w AS last_type,
                   LAST_VALUE(big_value IGNORE NULLS) OVER w AS last_big,
                   LAST_VALUE(k IGNORE NULLS) OVER w AS last_k,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id ORDER BY sec DESC, event_id DESC
                   ) AS rn,
                   COUNT(*) OVER (PARTITION BY user_id) AS n_records
            FROM e
            WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND UNBOUNDED FOLLOWING)
        )
        SELECT user_id, CAST(n_records AS BIGINT) AS n_records,
               last_type, last_big, last_k
        FROM ordered WHERE rn = 1
    """,
)
def dedup_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1++: golden-record survivorship — the MDM merge step after
    dedup clustering: collapse each entity's duplicate records into one
    survivor taking the MOST RECENT NON-NULL value per field
    independently (recency survivorship; a priority-ranked source order
    is the same window with a different sort key).  Fields here: the
    last valid event type, the last value above threshold, the last
    props key — three fields with different null patterns.

    One (entity) window partitioning serves every per-field
    LAST IGNORE NULLS over the full frame plus the survivor row_number —
    single Exchange (pinned); no per-field join-backs, no
    groupBy-then-rejoin.  Values are carried, never computed — bit-exact
    by construction."""
    e = (
        load(spark, sf_dir, "events")
        .repartition(fanout(spark), "user_id")  # single-file input: parallelize the window
        .select(
            "user_id",
            "event_id",
            F.unix_timestamp("ts").alias("sec"),
            F.when(F.col("event_type") != "error", F.col("event_type")).alias(
                "etype"
            ),
            F.when(F.col("value") > 100.0, F.col("value")).alias("big_value"),
            F.get_json_object("props", "$.k").alias("k"),
        )
    )
    frame = (
        Window.partitionBy("user_id")
        .orderBy("sec", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    pick = Window.partitionBy("user_id").orderBy(
        F.desc("sec"), F.desc("event_id")
    )
    o = e.select(
        "user_id",
        F.last("etype", ignorenulls=True).over(frame).alias("last_type"),
        F.last("big_value", ignorenulls=True).over(frame).alias("last_big"),
        F.last("k", ignorenulls=True).over(frame).alias("last_k"),
        F.row_number().over(pick).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("user_id")).alias("n_records"),
    )
    return o.where(F.col("rn") == 1).select(
        "user_id",
        F.col("n_records").cast("bigint").alias("n_records"),
        "last_type",
        "last_big",
        "last_k",
    )
