"""Scalar function families (SURVEY.md §2.7 F1-F9).

Reference analogs: band arithmetic and log/sqrt stretches (F1), scene-id /
path parsing in the workers (F2), solar-day grouping and epoch bucketing
(F3, ``group_by='solar_day'``), JSON job specs and STAC-ish metadata docs
(F5), measurement dicts (F7), QA bitfields (F8, in projections.py), and
UUID/content addressing of datasets (F9).

All of these are built-in Column expressions — JVM-side, whole-stage
codegen, zero Python in the row path.  libm-backed functions (pow/ln) are
rounded to 6 dp for oracle parity (JVM vs C++ last-ulp); algebraic ops and
sqrt are IEEE-exact and left unrounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.det import davg as _davg
from ..functions.det import sql_davg as _sql_davg
from ..io import load
from ..registry import register


@register(
    "scalar_math",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               ABS(l_quantity - 25) AS abs_dev,
               l_extendedprice / l_quantity AS unit_price,
               SQRT(l_extendedprice) AS root_price,
               ROUND(POW(l_quantity, 1.5), 6) AS qty_pow,
               ROUND(LN(l_extendedprice), 6) AS log_price,
               LEAST(l_quantity, 100 * l_discount) AS lo,
               GREATEST(l_quantity, 100 * l_discount) AS hi
        FROM lineitem
    """,
)
def scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1: math family — band stretches (log/sqrt), clipping (least/
    greatest), unit normalization."""
    lf = load(spark, sf_dir, "lineitem")
    q, p, d = F.col("l_quantity"), F.col("l_extendedprice"), F.col("l_discount")
    return lf.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(q - 25).alias("abs_dev"),
        # raw quotient, not ROUND(x, 2): IEEE division is engine-identical, but
        # decimal rounding of values with short exact decimal forms hits
        # half-up(JVM) vs scaled-double(DuckDB) boundary disagreements
        (p / q).alias("unit_price"),
        F.sqrt(p).alias("root_price"),
        F.round(F.pow(q, 1.5), 6).alias("qty_pow"),
        F.round(F.log(p), 6).alias("log_price"),
        F.least(q, 100 * d).alias("lo"),
        F.greatest(q, 100 * d).alias("hi"),
    )


@register(
    "scalar_string",
    oracle="""
        SELECT c_custkey,
               UPPER(c_name) AS name_upper,
               SUBSTR(c_name, 1, 8) AS name_prefix,
               CONCAT(c_mktsegment, '#', CAST(c_custkey AS VARCHAR)) AS seg_key,
               CAST(LENGTH(c_name) AS INTEGER) AS name_len,
               REGEXP_EXTRACT(c_name, '([0-9]+)', 1) AS id_digits,
               LPAD(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
               REPLACE(c_name, 'Customer', 'Cust') AS name_short
        FROM customer
    """,
)
def scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2: string family — scene-id parsing / output-path templating
    (worker naming code)."""
    cu = load(spark, sf_dir, "customer")
    return cu.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat(F.col("c_mktsegment"), F.lit("#"), F.col("c_custkey").cast("string")).alias(
            "seg_key"
        ),
        F.length("c_name").alias("name_len"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("id_digits"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_padded"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("name_short"),
    )


@register(
    "scalar_date",
    oracle="""
        SELECT o_orderkey,
               CAST(YEAR(o_orderdate) AS INTEGER) AS yr,
               CAST(MONTH(o_orderdate) AS INTEGER) AS mo,
               CAST(DAY(o_orderdate) AS INTEGER) AS dom,
               CAST(QUARTER(o_orderdate) AS INTEGER) AS qtr,
               DATE_TRUNC('month', o_orderdate) AS month_start,
               CAST(DATE_DIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER)
                 AS days_since_epoch,
               CAST(EPOCH(o_orderdate) AS BIGINT) AS unix_sec,
               CAST(LAST_DAY(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
               CAST(DAYOFWEEK(o_orderdate) + 1 AS INTEGER) AS dow
        FROM orders
    """,
)
def scalar_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3: date/time family — solar-day grouping key, epoch bucketing,
    month/season keys.  (DuckDB's DAYOFWEEK is 0=Sunday vs Spark's
    1=Sunday — the oracle shifts to match.)"""
    od = load(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return od.select(
        "o_orderkey",
        F.year(d).alias("yr"),
        F.month(d).alias("mo"),
        F.dayofmonth(d).alias("dom"),
        F.quarter(d).alias("qtr"),
        F.date_trunc("month", d).alias("month_start"),
        F.datediff(d.cast("date"), F.lit("1995-01-01").cast("date")).alias("days_since_epoch"),
        F.unix_timestamp(d).alias("unix_sec"),
        F.last_day(d).cast("timestamp").alias("month_end"),
        F.dayofweek(d).alias("dow"),
    )


@register(
    "scalar_json",
    oracle="""
        SELECT event_id,
               CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) AS k_val,
               CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) * 2 AS k_doubled,
               CAST(JSON_EXTRACT_STRING(props, '$.missing') AS BIGINT) AS k_missing
        FROM events
    """,
)
def scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5: JSON family — job-spec / metadata-doc field extraction (the
    Redis job payload parse in every worker)."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_val"),
        (F.get_json_object("props", "$.k").cast("bigint") * 2).alias("k_doubled"),
        F.get_json_object("props", "$.missing").cast("bigint").alias("k_missing"),
    )


@register(
    "scalar_array",
    oracle="""
        SELECT vec_id,
               CAST(LEN(embedding) AS INTEGER) AS dim,
               embedding[1] AS first_val,
               ROUND(LIST_SUM(LIST_TRANSFORM(embedding,
                     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 6) AS sq_norm,
               LIST_MAX(embedding) AS max_val
        FROM embeddings
    """,
)
def scalar_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6: array family — per-pixel band vectors / embeddings.  Fold-based
    sum-of-squares (``F.aggregate``) is the JVM-side pattern the cosine
    kernel builds on; 64-element folds round(6)-stable."""
    em = load(spark, sf_dir, "embeddings")
    sq = F.aggregate(
        "embedding",
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    return em.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).alias("first_val"),
        F.round(sq, 6).alias("sq_norm"),
        F.array_max("embedding").alias("max_val"),
    )


@register("scalar_map")  # ⊘oracle: DuckDB MAP literal/serialization differs — rows-only
def scalar_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7: map family — measurement-name→value dicts (metadata docs).
    Build a map per row, read it back via element_at/map_keys."""
    ev = load(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("k"), F.get_json_object("props", "$.k"),
    )
    # Serialize the map: the driver canonicalizer hashes cells, and a map
    # column reaches pandas as an unhashable dict — scalars only.
    return ev.select(
        "event_id",
        F.to_json(m).alias("meta_json"),
        F.element_at(m, F.lit("type")).alias("meta_type"),
        F.size(F.map_keys(m)).alias("n_keys"),
    )


@register(
    "scalar_hash",
    oracle="""
        SELECT doc_id,
               MD5(text) AS text_md5,
               SHA256(text) AS text_sha256
        FROM documents
    """,
)
def scalar_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9: hash family — dataset UUID/content addressing.  md5/sha256 are
    oracle-matched; ``xxhash64`` (no DuckDB twin) is the engine's fast path
    for 100 TB content keys — used in dedup_exact_hash."""
    dc = load(spark, sf_dir, "documents")
    return dc.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("text", 256).alias("text_sha256"),
    )


@register(
    "scalar_map_canonical",
    oracle="""
        SELECT event_id,
               'bucket=' || (CASE WHEN value > 100 THEN 'hi' ELSE 'lo' END)
                 || ';k=' || COALESCE(JSON_EXTRACT_STRING(props, '$.k'), '~missing~')
                 || ';src=events;type=' || event_type AS canon,
               CAST(4 AS INTEGER) AS n_keys,
               CAST(1 AS INTEGER) AS has_k,
               'bucket=' || (CASE WHEN value > 100 THEN 'hi' ELSE 'lo' END)
                 || ';k=' || COALESCE(JSON_EXTRACT_STRING(props, '$.k'), '~missing~')
                 || ';type=' || event_type AS canon_nosrc
        FROM events
    """,
)
def scalar_map_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 with a FULL oracle: the map family verified through an
    engine-neutral canonical form.  ``scalar_map`` stays rows-only because
    DuckDB's MAP serialization differs; here the whole Spark map pipeline —
    ``create_map`` → ``map_concat`` → ``map_contains_key`` →
    ``map_filter`` → ``map_entries`` → sort → join — collapses to a
    deterministic ``k=v;...`` string that DuckDB reconstructs flat, so any
    defect in Spark's map machinery (lost entry, wrong concat precedence,
    unstable entry order) breaks the value hash.

    The extracted JSON value is coalesced to a sentinel on BOTH sides: a
    NULL map value would be silently dropped by Spark's ``array_join``
    while NULL-ing the whole ``||`` chain in DuckDB — a data-dependent
    hash break (and it keeps n_keys=4 / has_k=1 structurally true)."""
    ev = load(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("k"), F.coalesce(F.get_json_object("props", "$.k"), F.lit("~missing~")),
        F.lit("bucket"), F.when(F.col("value") > 100, "hi").otherwise("lo"),
    )
    m2 = F.map_concat(m, F.create_map(F.lit("src"), F.lit("events")))

    def canon(mp):
        entries = F.array_sort(F.map_entries(mp))
        return F.array_join(
            F.transform(entries, lambda e: F.concat(e["key"], F.lit("="), e["value"])),
            ";",
        )

    no_src = F.map_filter(m2, lambda k, v: k != F.lit("src"))
    return ev.select(
        "event_id",
        canon(m2).alias("canon"),
        F.size(F.map_keys(m2)).alias("n_keys"),
        F.map_contains_key(m2, F.lit("k")).cast("int").alias("has_k"),
        canon(no_src).alias("canon_nosrc"),
    )


@register(
    "scalar_variant",
    oracle="""
        SELECT event_id,
               CAST(props ->> 'k' AS BIGINT) AS k,
               CAST(props ->> 'missing' AS BIGINT) AS missing_field,
               'OBJECT<k: BIGINT>' AS vschema,
               CAST(CAST(props ->> 'k' AS BIGINT) % 10 AS BIGINT) AS k_bucket
        FROM events
    """,
)
def scalar_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5+ modern path: the VARIANT type (Spark 4) — semi-structured
    documents parsed ONCE into the binary variant encoding, then typed
    path extraction (``variant_get``), schema introspection
    (``schema_of_variant``), and missing-path NULL semantics.  This is
    the engine's answer to the reference's metadata documents at 100 TB:
    parse cost is paid once per row, every downstream extraction is a
    cheap binary probe instead of a re-parse (the classic
    ``get_json_object``-per-field trap re-parses the string for EVERY
    field).  The oracle reads the same fields through DuckDB's JSON
    operators; the variant schema string is pinned literally (the fixture
    docs are uniformly ``{"k": <int>}``)."""
    ev = load(spark, sf_dir, "events")
    v = F.parse_json("props")
    return ev.select(
        "event_id",
        F.variant_get(v, "$.k", "bigint").alias("k"),
        F.variant_get(v, "$.missing", "bigint").alias("missing_field"),
        F.schema_of_variant(v).alias("vschema"),
        (F.variant_get(v, "$.k", "bigint") % 10).alias("k_bucket"),
    )


@register(
    "scalar_solar_day",
    oracle="""
        WITH t AS (
            SELECT CAST(EPOCH(DATE_TRUNC('second', ts)) AS BIGINT) AS sec,
                   CAST(FLOOR(((value % 360.0) - 180.0) * 240.0) AS BIGINT)
                     AS off_sec,
                   event_type, value
            FROM events
        )
        SELECT CAST(FLOOR((sec + off_sec) / 86400.0) AS BIGINT) AS solar_day,
               CAST(DATE '1970-01-01' + CAST(CAST(FLOOR((sec + off_sec)
                 / 86400.0) AS BIGINT) AS INTEGER) AS TIMESTAMP) AS solar_date,
               COUNT(*) AS n_obs,
               CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
               CAST(MIN(off_sec) AS BIGINT) AS min_off,
               CAST(MAX(off_sec) AS BIGINT) AS max_off
        FROM t
        GROUP BY 1, 2
    """,
)
def scalar_solar_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3+/r5: solar-day grouping — the reference's
    ``group_by='solar_day'`` applies a LONGITUDE-dependent offset before
    day truncation so scenes observed on the same local solar day group
    together across the dateline (⟨pub⟩ datacube-core :
    ``datacube/api/core.py :: Datacube.group_datasets``; the offset is
    longitude · 240 s, i.e. 86400 s / 360°).  Longitude synthesizes from
    ``value`` into [-180, 180); the offset floors to whole seconds and the
    day key floors the shifted epoch — explicit FLOOR on BOTH sides (the
    DuckDB CAST-rounds trap).  Epochs truncate to whole seconds on both
    sides before arithmetic (nanos fixtures make raw EPOCH fractional).
    One codegen'd projection + one grouped shuffle — the same plan as any
    calendar-day rollup; the solar correction is free key arithmetic."""
    ev = load(spark, sf_dir, "events")
    sec = F.unix_timestamp("ts")
    off = F.floor(((F.col("value") % F.lit(360.0)) - F.lit(180.0)) * F.lit(240.0)).cast(
        "bigint"
    )
    day = F.floor((sec + off) / F.lit(86400.0)).cast("bigint")
    return (
        ev.select(
            day.alias("solar_day"),
            F.date_add(F.lit("1970-01-01").cast("date"), day.cast("int"))
            .cast("timestamp")
            .alias("solar_date"),
            "event_type",
            off.alias("off_sec"),
        )
        .groupBy("solar_day", "solar_date")
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.countDistinct("event_type").alias("n_types"),
            F.min("off_sec").alias("min_off"),
            F.max("off_sec").alias("max_off"),
        )
    )


_GH_BITS = 15  # per-axis bits -> 6 base32 chars (30 interleaved bits)
_GH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"
_sql_davg_value = _sql_davg("value", "avg_value")


def _gh_cell_sql(expr: str, domain: float) -> str:
    """DuckDB twin of the per-axis cell index (floor + clamp)."""
    n = 1 << _GH_BITS
    return (
        f"LEAST(CAST(FLOOR(({expr}) / CAST({domain!r} AS DOUBLE)"
        f" * CAST({float(n)!r} AS DOUBLE)) AS BIGINT), {n - 1})"
    )


def _gh_interleave_sql(ix: str, iy: str) -> str:
    """Morton-interleave two 15-bit indices (x takes even bit slots)."""
    # Each shift term is fully parenthesized: SQL's + binds tighter than
    # <<, so a bare `a << 2 + b << 3` chain regroups catastrophically.
    terms = []
    for k in range(_GH_BITS):
        terms.append(f"(((({ix}) >> {k}) & 1) << {2 * k})")
        terms.append(f"(((({iy}) >> {k}) & 1) << {2 * k + 1})")
    return " + ".join(terms)


def _gh_b32_sql(code: str, nchars: int) -> str:
    """Base32-encode the top ``nchars`` 5-bit digits of a 30-bit code."""
    parts = []
    for i in range(nchars):
        shift = (6 - 1 - i) * 5
        parts.append(
            f"SUBSTRING('{_GH_ALPHABET}', CAST((({code}) >> {shift}) & 31 AS INTEGER) + 1, 1)"
        )
    return " || ".join(parts)


@register(
    "scalar_geohash",
    oracle=f"""
        WITH cells AS (
            SELECT value,
                   {_gh_cell_sql('value', 490.0)} AS ix,
                   {_gh_cell_sql('CAST(user_id AS DOUBLE)', 150.0)} AS iy
            FROM events
        ), coded AS (
            SELECT value, {_gh_interleave_sql('ix', 'iy')} AS code FROM cells
        )
        SELECT {_gh_b32_sql('code', 4)} AS geohash4,
               COUNT(*) AS n,
               {_sql_davg_value}
        FROM coded
        GROUP BY 1
    """,
)
def scalar_geohash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10/S6+: geohash spatial-key encoding — the string form of the
    Z-order curve the storage layer already clusters by
    (``table_zorder_skipping``), here as a pure scalar expression chain:
    per-axis cell index (floor + clamp on the synthetic (value, user_id)
    coordinate convention the polygon keys use), 15+15-bit Morton
    interleave as a shift/mask sum, base32 digits via substring lookup —
    all codegen'd integer arithmetic, no UDF, identical literal-for-
    literal on both engines (floor runs on the same IEEE product, so the
    cell boundary is the same bit pattern).  Rolled up at 4-char
    precision: cell, count, mean value.  At 100 TB the geohash prefix is
    the canonical spatial partition/bucket key — this expression IS the
    ingest-time clustering function."""
    n = 1 << _GH_BITS

    def cell(col, domain: float):
        raw = F.floor(col / F.lit(domain) * F.lit(float(n))).cast("long")
        return F.least(raw, F.lit(n - 1))

    ix = cell(F.col("value"), 490.0)
    iy = cell(F.col("user_id").cast("double"), 150.0)
    ev = load(spark, sf_dir, "events")
    cells = ev.select("value", ix.alias("ix"), iy.alias("iy"))
    code = None
    for k in range(_GH_BITS):
        xbit = F.shiftleft(F.shiftright(F.col("ix"), k).bitwiseAND(F.lit(1)), 2 * k)
        ybit = F.shiftleft(
            F.shiftright(F.col("iy"), k).bitwiseAND(F.lit(1)), 2 * k + 1
        )
        term = xbit + ybit
        code = term if code is None else code + term
    coded = cells.select("value", code.alias("code"))
    gh = F.concat(
        *[
            F.expr(
                f"SUBSTRING('{_GH_ALPHABET}', CAST((code >> {(6 - 1 - i) * 5}) & 31 AS INT) + 1, 1)"
            )
            for i in range(4)
        ]
    )
    return coded.groupBy(gh.alias("geohash4")).agg(
        F.count(F.lit(1)).alias("n"), _davg("value", "avg_value")
    )


@register(
    "scalar_map_gate",
    oracle="""
        SELECT event_id,
               event_type AS meta_type,
               CAST(2 AS INTEGER) AS n_keys,
               JSON_EXTRACT_STRING(props, '$.k') IS NOT NULL AS has_k,
               TRUE AS json_roundtrip_ok
        FROM events
    """,
)
def scalar_map_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 quality gate — pins the ⊘rows-only ``scalar_map`` key's map
    machinery through engine-neutral projections, so a map regression
    flips a driver hash row (``scalar_map_canonical`` covers map ALGEBRA;
    this covers the rows-only key's OWN output, serialization included):

    - ``meta_type``: the value ``scalar_map`` read back out of its map
      via ``element_at`` must equal the source ``event_type`` — a direct
      cross-engine value, not a boolean.
    - ``n_keys``: ``create_map`` of two literal keys always carries 2
      entries (a NULL VALUE does not drop its key) — an algorithm fact,
      not a storage fact, so the literal pin is scale-sound.
    - ``has_k``: JSON extraction agreement between Spark's
      ``get_json_object`` and DuckDB's ``JSON_EXTRACT_STRING`` on the
      same props column (both NULL for missing paths).
    - ``json_roundtrip_ok``: ``from_json(to_json(map))`` must restore
      the exact entries — Spark 4's ``to_json`` KEEPS null-valued map
      entries (``"k":null``), verified empirically, so the restored size
      equals ``n_keys`` and every lookup null-safe-equals the source.

    Shape: the production key's projection joined back to the events
    scan on event_id — one equi-join, no aggregation; all comparisons
    are codegen'd expressions (``from_json`` is JVM-side)."""
    sm = scalar_map(spark, sf_dir)
    ev = load(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").alias("src_k"),
    )
    m2 = F.from_json("meta_json", "map<string,string>")
    j = sm.join(ev, "event_id")
    rt_ok = (
        F.element_at(m2, F.lit("type")).eqNullSafe(F.col("event_type"))
        & F.element_at(m2, F.lit("k")).eqNullSafe(F.col("src_k"))
        & (F.size(F.map_keys(m2)) == F.col("n_keys"))
    )
    return j.select(
        "event_id",
        "meta_type",
        "n_keys",
        F.col("src_k").isNotNull().alias("has_k"),
        rt_ok.alias("json_roundtrip_ok"),
    )
