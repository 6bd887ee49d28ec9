"""File-level Bloom-filter skipping (SURVEY.md §2.7 extension — the
point-lookup companion to min/max data skipping).

Range stats (``table_data_skipping``) prune selective RANGE scans but do
nothing for point lookups on a hash-distributed key: every file's
min/max straddles every key.  Real table formats solve this with a
per-file Bloom filter in the manifest; a reader tests each probe key
against each file's filter and opens only candidate files — never a
false negative, a bounded false-positive tax.

The demo keeps the "file" as an explicit bucket column (the manifest
abstraction the versioned-table keys already use), so the WHOLE
mechanism — bitset build, probe, candidate counting, and the
restricted read — is relational and full-oracle verifiable, including
the false-positive count.  The build is one bit_or aggregate per
bucket (map-side combinable, 4 bigint words per file); the probe is a
≤#files-row broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..registry import register

_N_BUCKETS = 16
# 3 multiplicative hashes over 4 x 62-bit words (sign bit unused: DuckDB
# errors on signed << 63); constants are odd mixers
_HASHES = (2654435761, 40503, 2246822519)
_BITS = 248  # 4 words x 62 bits

_PROBES = (777, 1234, 4242, 9001, 123456789)  # last one absent


def _positions_sql(key: str) -> list[str]:
    return [f"(CAST({key} AS BIGINT) * {h} % {_BITS})" for h in _HASHES]


@register(
    "table_bloom_skipping",
    oracle=f"""
        WITH data AS (
            SELECT event_id, value,
                   CAST(event_id AS BIGINT) % {_N_BUCKETS} AS bucket
            FROM events
        ), bits AS (
            SELECT bucket, word, BIT_OR(bit) AS w
            FROM (
                SELECT bucket, pos // 62 AS word,
                       (1::BIGINT << (pos % 62)) AS bit
                FROM data
                CROSS JOIN UNNEST(ARRAY[{", ".join(_positions_sql("event_id"))}])
                    AS t(pos)
            ) GROUP BY bucket, word
        ), blooms AS (
            SELECT bucket,
                   MAX(CASE WHEN word = 0 THEN w ELSE 0 END) AS w0,
                   MAX(CASE WHEN word = 1 THEN w ELSE 0 END) AS w1,
                   MAX(CASE WHEN word = 2 THEN w ELSE 0 END) AS w2,
                   MAX(CASE WHEN word = 3 THEN w ELSE 0 END) AS w3
            FROM bits GROUP BY bucket
        ), probes AS (
            SELECT UNNEST(ARRAY[{", ".join(str(p) for p in _PROBES)}])
                AS probe_key
        ), cand AS (
            SELECT p.probe_key, b.bucket
            FROM probes p CROSS JOIN blooms b
            WHERE {" AND ".join(
                "(CASE (" + pos + ") // 62"
                " WHEN 0 THEN b.w0 WHEN 1 THEN b.w1"
                " WHEN 2 THEN b.w2 ELSE b.w3 END"
                " & (1::BIGINT << ((" + pos + ") % 62))) != 0"
                for pos in _positions_sql("p.probe_key")
            )}
        )
        SELECT c.probe_key,
               CAST(COUNT(*) AS BIGINT) AS n_candidate_buckets,
               CAST(COUNT(d.event_id) AS BIGINT) AS n_rows_found,
               CAST(MAX(CAST(c.bucket =
                    CAST(c.probe_key AS BIGINT) % {_N_BUCKETS}
                    AS INTEGER)) AS INT) AS own_bucket_is_candidate
        FROM cand c
        LEFT JOIN data d
          ON d.bucket = c.bucket AND d.event_id = c.probe_key
        GROUP BY c.probe_key
    """,
)
def table_bloom_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage layer: per-file Bloom bitsets + point-lookup pruning.
    Build: every row scatters its 3 hash bit positions (explode), one
    bit_or aggregate folds them into 4 bigint words per bucket — the
    manifest entry.  Probe: each lookup key tests its 3 bits against
    every bucket's words on a ≤{_N_BUCKETS}-row broadcast; only
    candidate buckets are read for the actual rows.  The output proves
    the two Bloom guarantees relationally: ``own_bucket_is_candidate``
    is always 1 for present keys (no false negatives), and
    ``n_candidate_buckets`` counts the false-positive tax (absent key
    {_PROBES[-1]} still gets ≥0 candidates but 0 rows).  At 100 TB the
    build is map-side combinable into #files·4 words and the probe cost
    is independent of data size."""
    ev = load(spark, sf_dir, "events").select(
        "event_id",
        (F.col("event_id").cast("long") % _N_BUCKETS).alias("bucket"),
    )
    pos = F.explode(
        F.array(
            *[
                (F.col("event_id").cast("long") * F.lit(h)) % _BITS
                for h in _HASHES
            ]
        )
    ).alias("pos")
    bits = (
        ev.select("bucket", pos)
        .select(
            "bucket",
            (F.col("pos") / 62).cast("long").alias("word"),
            F.expr("shiftleft(1L, cast(pos % 62 as int))").alias("bit"),
        )
        .groupBy("bucket", "word")
        .agg(F.bit_or("bit").alias("w"))
    )
    blooms = bits.groupBy("bucket").agg(
        *[
            F.max(F.when(F.col("word") == j, F.col("w")).otherwise(0)).alias(f"w{j}")
            for j in range(4)
        ]
    )
    probes = spark.range(1).select(
        F.explode(F.array(*[F.lit(p).cast("long") for p in _PROBES])).alias(
            "probe_key"
        )
    )
    conds = []
    for h in _HASHES:
        p = (F.col("probe_key") * F.lit(h)) % _BITS
        word_val = (
            F.when((p / 62).cast("long") == 0, F.col("w0"))
            .when((p / 62).cast("long") == 1, F.col("w1"))
            .when((p / 62).cast("long") == 2, F.col("w2"))
            .otherwise(F.col("w3"))
        )
        bit = F.expr(f"shiftleft(1L, cast((probe_key * {h}) % {_BITS} % 62 as int))")
        conds.append(word_val.bitwiseAND(bit) != 0)
    cand = (
        probes.crossJoin(F.broadcast(blooms))
        .where(conds[0] & conds[1] & conds[2])
        .select("probe_key", F.col("bucket").alias("cbucket"))
    )
    hit = cand.join(
        ev.select(F.col("event_id").alias("d_id"), F.col("bucket").alias("d_bucket")),
        (F.col("d_bucket") == F.col("cbucket"))
        & (F.col("d_id") == F.col("probe_key")),
        "left",
    )
    return hit.groupBy("probe_key").agg(
        F.count(F.lit(1)).cast("long").alias("n_candidate_buckets"),
        F.count("d_id").cast("long").alias("n_rows_found"),
        F.max(
            (F.col("cbucket") == F.col("probe_key") % _N_BUCKETS).cast("int")
        )
        .cast("int")
        .alias("own_bucket_is_candidate"),
    )


@register(
    "agg_bitmap_distinct",
    oracle="""
        WITH days AS (
            SELECT DATE_TRUNC('day', ts) AS day,
                   DATE_TRUNC('week', ts) AS week,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS day_distinct
            FROM events GROUP BY 1, 2
        ), weeks AS (
            SELECT DATE_TRUNC('week', ts) AS week,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS week_distinct
            FROM events GROUP BY 1
        )
        SELECT d.day, d.week, d.day_distinct, w.week_distinct
        FROM days d JOIN weeks w ON d.week = w.week
    """,
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct users per day AND per week from MERGEABLE roaring-
    style bitmaps (the Kylin/Druid pre-aggregation trick): each
    (period, word) row holds a 62-bit slice of the user-id bitmap, the
    day grain is one bit_or pass, and the week grain RE-AGGREGATES the
    day bitmaps with another bit_or — exact distinct counts compose
    across rollup grains without ever re-scanning the corpus, which HLL
    can only do approximately.  Counts come from bit_count popcounts.

    The oracle computes both grains with plain COUNT(DISTINCT) — bitmap
    path == plain distinct is the correctness claim.  At 100 TB the
    bitmap table is (periods × occupied words) rows — sparse in the id
    domain — and every merge is map-side combinable."""
    ev = load(spark, sf_dir, "events").select(
        F.date_trunc("day", "ts").alias("day"),
        F.date_trunc("week", "ts").alias("week"),
        (F.col("user_id").cast("long") / 62).cast("long").alias("word"),
        F.expr("shiftleft(1L, cast(user_id % 62 as int))").alias("bit"),
    )
    # persisted: the day and week grains both consume it (words-bounded)
    day_words = (
        ev.groupBy("day", "week", "word").agg(F.bit_or("bit").alias("w")).persist()
    )
    days = day_words.groupBy("day", "week").agg(
        F.sum(F.bit_count("w")).cast("long").alias("day_distinct")
    )
    weeks = (
        day_words.groupBy("week", "word")
        .agg(F.bit_or("w").alias("ww"))  # bitmap MERGE across days
        .groupBy("week")
        .agg(F.sum(F.bit_count("ww")).cast("long").alias("week_distinct"))
    )
    return days.join(F.broadcast(weeks), "week").select(
        "day", "week", "day_distinct", "week_distinct"
    )


def _sql_hex_to_int(col: str, n_chars: int = 8) -> str:
    """First n hex chars of a lowercase hex string → BIGINT, engine-free
    (no hex-parse builtin shared by both engines): positional
    STRPOS-digit arithmetic."""
    terms = " + ".join(
        f"(STRPOS('0123456789abcdef', SUBSTR({col}, {i + 1}, 1)) - 1)"
        f" * {16 ** (n_chars - 1 - i)}"
        for i in range(n_chars)
    )
    return f"CAST({terms} AS BIGINT)"


@register(
    "table_content_checksum",
    oracle=f"""
        WITH rows_h AS (
            SELECT MD5(
                       CAST(event_id AS VARCHAR) || '|'
                       || CAST(user_id AS VARCHAR) || '|'
                       || event_type || '|'
                       || CAST(value AS VARCHAR)
                   ) AS h
            FROM events
        ), words AS (
            SELECT {_sql_hex_to_int("h")} AS w1,
                   {_sql_hex_to_int("SUBSTR(h, 9)")} AS w2
            FROM rows_h
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(BIT_XOR(w1) AS BIGINT) AS checksum_a,
               CAST(BIT_XOR(w2) AS BIGINT) AS checksum_b
        FROM words
    """,
)
def table_content_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7++: order-insensitive table content fingerprint — XOR-fold of
    per-row md5 words over a canonical column encoding: the
    replication/migration verification primitive ("did the copy land
    bit-identical?") that never needs a sort or a diff join.  XOR makes
    the checksum partition- and order-independent and map-side
    combinable; any single-row change flips it.  Cross-engine exactness
    rides two established bridges: md5 is identical hex on both engines,
    and double→string casts are shortest-repr on both (the det.py
    VARCHAR-hop guarantee), so the canonical encoding matches
    byte-for-byte.  Two 32-bit words from the digest keep the fold in
    exact BIGINT space on both sides."""
    ev = load(spark, sf_dir, "events")
    h = F.md5(
        F.concat_ws(
            "|",
            F.col("event_id").cast("string"),
            F.col("user_id").cast("string"),
            F.col("event_type"),
            F.col("value").cast("string"),
        )
    )
    rows_h = ev.select(h.alias("h"))
    w1 = F.conv(F.substring("h", 1, 8), 16, 10).cast("long")
    w2 = F.conv(F.substring("h", 9, 8), 16, 10).cast("long")
    return rows_h.select(w1.alias("w1"), w2.alias("w2")).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.expr("bit_xor(w1)").cast("long").alias("checksum_a"),
        F.expr("bit_xor(w2)").cast("long").alias("checksum_b"),
    )
