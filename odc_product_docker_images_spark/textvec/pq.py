"""Product quantization (SURVEY.md §2.10 X3 — the ANN index's storage tier).

`sim_quantize_int8` is the 4× memory path; PQ (Jégou et al., "Product
Quantization for Nearest Neighbor Search", TPAMI'11) is the 24×+ path
every large ANN index (FAISS IVF-PQ) actually ships: split each vector
into M subvectors, quantize each against its own K-entry codebook, store
M small codes per vector.  Distance evaluation against a query then
becomes M table lookups (ADC) — that part is ``sim_ann_ivf``'s probe
shape; THIS key pins the encode step with a full oracle.

Spark-first shape — assignment WITHOUT a shuffle: the codebook (K seed
vectors, the same deterministic first-K seeding as ``sim_kmeans_step``;
a production pipeline trains it with that key's loop) aggregates to ONE
row holding an array of (centroid_id, vector) structs, broadcast onto the
vector scan; per row, each subspace's argmin is ``array_min`` over a
``transform`` of the codebook (struct ordering = (dist, id) — the
tie-break is built into the comparison), all pure JVM expressions.  The
plan has no Exchange at all between the scan and the output: encode at
100 TB is embarrassingly parallel, exactly as it should be.

Determinism: subspace distances fold left-to-right over the same element
order in both engines and round 6 dp (dround) BEFORE the argmin; the
reconstruction error is the fixed-order sum of the four rounded minima
(one IEEE expression tree, identical on both sides).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.det import dround, sql_dround
from ..io import load
from ..registry import register

_M = 4  # subspaces
_SUB = 16  # dims per subspace (64 = 4 x 16)
_K = 8  # codebook entries per subspace


def _sql_sub_dist(m: int) -> str:
    """Squared L2 over subspace m, written against the FULL vectors with
    index offsets (no slicing) — same element order as the Spark fold."""
    expr = (
        f"LIST_SUM(LIST_TRANSFORM(RANGE(1, {_SUB + 1}),"
        f" i -> (e[{m * _SUB} + i] - ce[{m * _SUB} + i])"
        f" * (e[{m * _SUB} + i] - ce[{m * _SUB} + i])))"
    )
    return sql_dround(expr)


_ORACLE = f"""
    WITH v AS (
        SELECT vec_id, LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings
    ), c AS (
        SELECT vec_id AS centroid_id, e AS ce FROM v WHERE vec_id < {_K}
    ), d AS (
        SELECT v.vec_id, m.m, c.centroid_id,
               CASE m.m {" ".join(f"WHEN {m} THEN {_sql_sub_dist(m)}" for m in range(_M))} END AS dist
        FROM v CROSS JOIN RANGE(0, {_M}) m(m) CROSS JOIN c
    ), a AS (
        SELECT vec_id, m, centroid_id, dist,
               ROW_NUMBER() OVER (PARTITION BY vec_id, m
                                  ORDER BY dist, centroid_id) AS rn
        FROM d
    )
    SELECT vec_id,
           {", ".join(f"CAST(MAX(CASE WHEN m = {m} THEN centroid_id END) AS BIGINT) AS code_{m}" for m in range(_M))},
           {" + ".join(f"MAX(CASE WHEN m = {m} THEN dist END)" for m in range(_M))} AS recon_err
    FROM a WHERE rn = 1
    GROUP BY vec_id
"""


@register("sim_quantize_pq", oracle=_ORACLE)
def sim_quantize_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 storage path #2: PQ encode — per-vector (code_0..code_3,
    reconstruction error) against the deterministic first-K codebook.
    One broadcast of a single codebook row, zero Exchanges after the scan
    (plan-pinned): each subspace argmin is ``array_min`` over a
    ``transform`` of the codebook array — the struct comparison's
    (dist, centroid_id) field order IS the tie-break."""
    v = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("e")
    )
    codebook = (
        v.where(F.col("vec_id") < _K)
        .select(F.struct(F.col("vec_id").alias("centroid_id"), F.col("e").alias("ce")).alias("c"))
        .agg(F.sort_array(F.collect_list("c")).alias("cb"))
    )

    def best(m: int) -> Column:
        def dist(c: Column) -> Column:
            sq = F.zip_with(
                F.slice(F.col("e"), m * _SUB + 1, _SUB),
                F.slice(c["ce"], m * _SUB + 1, _SUB),
                lambda x, y: (x - y) * (x - y),
            )
            return dround(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x))

        return F.array_min(
            F.transform(
                F.col("cb"),
                lambda c: F.struct(dist(c).alias("dist"), c["centroid_id"].alias("centroid_id")),
            )
        )

    enc = v.crossJoin(F.broadcast(codebook)).select(
        "vec_id", *[best(m).alias(f"b{m}") for m in range(_M)]
    )
    recon = F.col("b0.dist") + F.col("b1.dist") + F.col("b2.dist") + F.col("b3.dist")
    return enc.select(
        "vec_id",
        *[F.col(f"b{m}.centroid_id").alias(f"code_{m}") for m in range(_M)],
        recon.alias("recon_err"),
    )


_NQ = 4  # probe queries (vec_id < _NQ)
_TOPK = 5


@register(
    "sim_ann_pq_adc",
    oracle=f"""
        WITH v AS (
            SELECT vec_id, LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS e
            FROM embeddings
        ), c AS (
            SELECT vec_id AS centroid_id, e AS ce FROM v WHERE vec_id < {_K}
        ), d AS (
            SELECT v.vec_id, m.m, c.centroid_id,
               CASE m.m {" ".join(f"WHEN {m} THEN {_sql_sub_dist(m)}" for m in range(_M))} END AS dist
            FROM v CROSS JOIN RANGE(0, {_M}) m(m) CROSS JOIN c
        ), codes AS (
            SELECT vec_id, m, centroid_id AS code FROM (
                SELECT vec_id, m, centroid_id,
                       ROW_NUMBER() OVER (PARTITION BY vec_id, m
                                          ORDER BY dist, centroid_id) AS rn
                FROM d
            ) WHERE rn = 1
        ), dtab AS (
            -- the query-side distance tables ARE the same d CTE restricted
            -- to the probe vectors (ADC: distances from q's subvectors to
            -- every codebook entry)
            SELECT vec_id AS q_id, m, centroid_id, dist
            FROM d WHERE vec_id < {_NQ}
        ), approx AS (
            -- rounding through the dround twin BEFORE the rank: the four
            -- lookup terms sum in different orders on the two sides, and
            -- both ranking and output must compare the identical rounded
            -- double (grid sums land far from the 6-dp midpoints)
            SELECT t.q_id, s.vec_id,
                   {sql_dround("SUM(t.dist)")} AS approx_d2
            FROM codes s
            JOIN dtab t ON t.m = s.m AND t.centroid_id = s.code
            GROUP BY t.q_id, s.vec_id
        )
        SELECT q_id, vec_id, approx_d2, CAST(rnk AS BIGINT) AS rnk
        FROM (
            SELECT q_id, vec_id, approx_d2,
                   ROW_NUMBER() OVER (PARTITION BY q_id
                                      ORDER BY approx_d2, vec_id) AS rnk
            FROM approx
        ) WHERE rnk <= {_TOPK}
    """,
)
def sim_ann_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3: the PQ SEARCH half — Asymmetric Distance Computation.  Each
    probe query precomputes M×K distance tables to the codebook (rides
    the same one-row broadcast as the encode); the approximate distance
    to every stored vector is then M ARRAY LOOKUPS on its codes — no
    touch of the original vectors, which is the entire point of a PQ
    index: the scan reads M small codes per row, distance evaluation is
    additive lookups, and the only shuffle is the final per-query top-k.
    Full oracle: the identical ADC pipeline in SQL (codes via argmin
    CTE, table join, rank).

    Determinism: table entries round 6 dp before the sum; the 4-term sum
    is re-rounded (dround twin) because summation order differs between
    the lookup expression and the oracle's SUM; rank ties break on
    vec_id."""
    scored = _adc_scored(spark, sf_dir)
    w = Window.partitionBy("q_id").orderBy("approx_d2", "vec_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= _TOPK)
        .select("q_id", "vec_id", "approx_d2", F.col("rnk").cast("long").alias("rnk"))
    )


def _vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("e")
    )


def _adc_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(q_id, vec_id, approx_d2) for every (probe query, stored vector)
    pair — the shared ADC pipeline behind the top-k key and the rerank
    funnel."""
    v = _vectors(spark, sf_dir)
    codebook = (
        v.where(F.col("vec_id") < _K)
        .select(F.struct(F.col("vec_id").alias("centroid_id"), F.col("e").alias("ce")).alias("c"))
        .agg(F.sort_array(F.collect_list("c")).alias("cb"))
    )

    def sub_dist(c: Column, m: int) -> Column:
        sq = F.zip_with(
            F.slice(F.col("e"), m * _SUB + 1, _SUB),
            F.slice(c["ce"], m * _SUB + 1, _SUB),
            lambda x, y: (x - y) * (x - y),
        )
        return dround(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x))

    # NOTE: transform() lambdas must take exactly ONE parameter — a second
    # parameter (even a defaulted `m=m` closure trick) makes PySpark bind
    # it as the ARRAY INDEX and silently garbles the expression.  Bind the
    # subspace with a factory instead.
    def code_at(m: int):
        return lambda c: F.struct(
            sub_dist(c, m).alias("dist"), c["centroid_id"].alias("centroid_id")
        )

    def tab_at(m: int):
        return lambda c: sub_dist(c, m)

    # stored side: codes only (the PQ index), map-side encode as above
    with_cb = v.crossJoin(F.broadcast(codebook))
    codes = with_cb.select(
        "vec_id",
        *[
            F.array_min(F.transform(F.col("cb"), code_at(m)))["centroid_id"].alias(
                f"code_{m}"
            )
            for m in range(_M)
        ],
    )
    # query side: per-query M distance tables, sorted by centroid_id so
    # element_at(tab, code+1) is the lookup (cb is sort_array'ed)
    qtabs = (
        with_cb.where(F.col("vec_id") < _NQ)
        .select(
            F.col("vec_id").alias("q_id"),
            *[F.transform(F.col("cb"), tab_at(m)).alias(f"t{m}") for m in range(_M)],
        )
    )
    paired = codes.crossJoin(F.broadcast(qtabs))
    lk = [
        F.element_at(F.col(f"t{m}"), F.col(f"code_{m}").cast("int") + 1)
        for m in range(_M)
    ]
    approx = ((lk[0] + lk[1]) + lk[2]) + lk[3]
    return paired.select("q_id", "vec_id", dround(approx).alias("approx_d2"))


_CAND = 20  # ADC funnel width feeding the exact reranker


@register(
    "sim_rerank_adc_exact",
    oracle=f"""
        WITH v AS (
            SELECT vec_id, LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS e
            FROM embeddings
        ), c AS (
            SELECT vec_id AS centroid_id, e AS ce FROM v WHERE vec_id < {_K}
        ), d AS (
            SELECT v.vec_id, m.m, c.centroid_id,
               CASE m.m {" ".join(f"WHEN {m} THEN {_sql_sub_dist(m)}" for m in range(_M))} END AS dist
            FROM v CROSS JOIN RANGE(0, {_M}) m(m) CROSS JOIN c
        ), codes AS (
            SELECT vec_id, m, centroid_id AS code FROM (
                SELECT vec_id, m, centroid_id,
                       ROW_NUMBER() OVER (PARTITION BY vec_id, m
                                          ORDER BY dist, centroid_id) AS rn
                FROM d
            ) WHERE rn = 1
        ), dtab AS (
            SELECT vec_id AS q_id, m, centroid_id, dist
            FROM d WHERE vec_id < {_NQ}
        ), approx AS (
            SELECT t.q_id, s.vec_id, {sql_dround("SUM(t.dist)")} AS approx_d2
            FROM codes s JOIN dtab t ON t.m = s.m AND t.centroid_id = s.code
            GROUP BY t.q_id, s.vec_id
        ), cand AS (
            SELECT q_id, vec_id FROM (
                SELECT q_id, vec_id,
                       ROW_NUMBER() OVER (PARTITION BY q_id
                                          ORDER BY approx_d2, vec_id) AS rn
                FROM approx
            ) WHERE rn <= {_CAND}
        ), exact AS (
            SELECT cand.q_id, cand.vec_id,
                   {sql_dround(f"LIST_SUM(LIST_TRANSFORM(RANGE(1, {_M * _SUB + 1}),"
                               " i -> (q.e[i] - s.e[i]) * (q.e[i] - s.e[i])))")}
                       AS exact_d2
            FROM cand
            JOIN v q ON q.vec_id = cand.q_id
            JOIN v s ON s.vec_id = cand.vec_id
        )
        SELECT q_id, vec_id, exact_d2, CAST(rnk AS BIGINT) AS rnk
        FROM (
            SELECT q_id, vec_id, exact_d2,
                   ROW_NUMBER() OVER (PARTITION BY q_id
                                      ORDER BY exact_d2, vec_id) AS rnk
            FROM exact
        ) WHERE rnk <= {_TOPK}
    """,
)
def sim_rerank_adc_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3: the production retrieval FUNNEL — stage 1 reads only PQ codes
    (ADC lookups: cheap, approximate) to cut the corpus to 20 candidates
    per query; stage 2 reads the FULL vectors for just those candidates
    and reranks by exact squared-L2.  This two-stage shape is why a PQ
    index exists: the expensive exact math touches candidates-per-query
    rows, never the corpus, and the candidate fetch is an equi-join on
    vec_id that prunes straight into the vector table's storage at scale
    (bucket/z-order on vec_id).  Both stages are deterministic (dround
    before every rank, vec_id tie-breaks), so the WHOLE funnel carries a
    full oracle — the same two-stage SQL, proving funnel == funnel."""
    scored = _adc_scored(spark, sf_dir)
    wa = Window.partitionBy("q_id").orderBy("approx_d2", "vec_id")
    cand = (
        scored.withColumn("rn", F.row_number().over(wa))
        .where(F.col("rn") <= _CAND)
        .select("q_id", "vec_id")
    )
    v = _vectors(spark, sf_dir)
    qv = v.select(F.col("vec_id").alias("q_id"), F.col("e").alias("qe")).where(
        F.col("q_id") < _NQ
    )
    sv = v.select("vec_id", F.col("e").alias("se"))
    sq = F.zip_with("qe", "se", lambda x, y: (x - y) * (x - y))
    exact = (
        cand.join(F.broadcast(qv), "q_id")
        .join(sv, "vec_id")
        .select(
            "q_id",
            "vec_id",
            dround(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x)).alias(
                "exact_d2"
            ),
        )
    )
    we = Window.partitionBy("q_id").orderBy("exact_d2", "vec_id")
    return (
        exact.withColumn("rnk", F.row_number().over(we))
        .where(F.col("rnk") <= _TOPK)
        .select("q_id", "vec_id", "exact_d2", F.col("rnk").cast("long").alias("rnk"))
    )


_NPROBE_F = 2  # IVF probes per query in the full funnel

_SQL_FULL_DIST = sql_dround(
    f"LIST_SUM(LIST_TRANSFORM(RANGE(1, {_M * _SUB + 1}),"
    " i -> (e[i] - be[i]) * (e[i] - be[i])))"
)


@register(
    "sim_ivf_pq_funnel",
    oracle=f"""
        WITH v AS (
            SELECT vec_id, LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS e
            FROM embeddings
        ), c AS (
            SELECT vec_id AS centroid_id, e AS ce FROM v WHERE vec_id < {_K}
        ), ivf AS (
            SELECT vec_id AS bucket_id, e AS be FROM v WHERE vec_id < {_K}
        ), bd AS (
            SELECT v.vec_id, i.bucket_id, {_SQL_FULL_DIST} AS bdist
            FROM v CROSS JOIN ivf i
        ), brk AS (
            SELECT vec_id, bucket_id,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY bdist, bucket_id) AS rn
            FROM bd
        ), assign AS (
            SELECT vec_id, bucket_id FROM brk WHERE rn = 1
        ), probe AS (
            SELECT vec_id AS q_id, bucket_id FROM brk
            WHERE vec_id < {_NQ} AND rn <= {_NPROBE_F}
        ), candpairs AS (
            SELECT p.q_id, a.vec_id
            FROM probe p JOIN assign a ON a.bucket_id = p.bucket_id
        ), d AS (
            SELECT v.vec_id, m.m, c.centroid_id,
               CASE m.m {" ".join(f"WHEN {m} THEN {_sql_sub_dist(m)}" for m in range(_M))} END AS dist
            FROM v CROSS JOIN RANGE(0, {_M}) m(m) CROSS JOIN c
        ), codes AS (
            SELECT vec_id, m, centroid_id AS code FROM (
                SELECT vec_id, m, centroid_id,
                       ROW_NUMBER() OVER (PARTITION BY vec_id, m
                                          ORDER BY dist, centroid_id) AS rn
                FROM d
            ) WHERE rn = 1
        ), dtab AS (
            SELECT vec_id AS q_id, m, centroid_id, dist
            FROM d WHERE vec_id < {_NQ}
        ), approx AS (
            SELECT t.q_id, s.vec_id, {sql_dround("SUM(t.dist)")} AS approx_d2
            FROM codes s
            JOIN candpairs cp ON cp.vec_id = s.vec_id
            JOIN dtab t ON t.q_id = cp.q_id AND t.m = s.m AND t.centroid_id = s.code
            GROUP BY t.q_id, s.vec_id
        ), ranked AS (
            SELECT q_id, vec_id, approx_d2,
                   ROW_NUMBER() OVER (PARTITION BY q_id
                                      ORDER BY approx_d2, vec_id) AS rn,
                   CAST(COUNT(*) OVER (PARTITION BY q_id) AS BIGINT) AS n_probed
            FROM approx
        ), cand AS (
            SELECT q_id, vec_id, n_probed FROM ranked WHERE rn <= {_CAND}
        ), exact AS (
            SELECT cand.q_id, cand.vec_id, cand.n_probed,
                   {sql_dround(f"LIST_SUM(LIST_TRANSFORM(RANGE(1, {_M * _SUB + 1}),"
                               " i -> (q.e[i] - s.e[i]) * (q.e[i] - s.e[i])))")}
                       AS exact_d2
            FROM cand
            JOIN v q ON q.vec_id = cand.q_id
            JOIN v s ON s.vec_id = cand.vec_id
        )
        SELECT q_id, vec_id, exact_d2, n_probed, CAST(rnk AS BIGINT) AS rnk
        FROM (
            SELECT q_id, vec_id, exact_d2, n_probed,
                   ROW_NUMBER() OVER (PARTITION BY q_id
                                      ORDER BY exact_d2, vec_id) AS rnk
            FROM exact
        ) WHERE rnk <= {_TOPK}
    """,
)
def sim_ivf_pq_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3: the COMPLETE FAISS-shaped IVF-PQ query path in one verified
    key — the composite the three PQ keys and the IVF key each pin one
    stage of:

    1. IVF coarse quantizer: every stored vector lands in its nearest
       full-vector bucket (deterministic first-{_K} centroids); each
       query probes its {_NPROBE_F} nearest buckets — the ADC scan below
       touches ONLY probed-bucket candidates (n_probed per query is an
       output column, so the driver hash also pins that the restriction
       actually happened — at 8 buckets / 2 probes it is ~25% of the
       corpus, never all of it).
    2. ADC: approximate distance to each candidate = {_M} table lookups
       on its PQ codes (codes + one broadcast codebook row; original
       vectors untouched).
    3. Exact rerank: full vectors fetched by equi-join for the top-{_CAND}
       ADC candidates only; exact squared-L2 reranks to the final
       top-{_TOPK}.

    At 100 TB: stage-1 cost is one map-side argmin per stored vector
    (bucket id stored with the codes); per-query work is
    O(corpus/K_ivf·nprobe) ADC lookups + {_CAND} exact distances — the
    sub-linear read path that justifies the index.  Every rank rounds
    through dround with vec_id tie-breaks, so the funnel's TRAJECTORY
    (probe sets, candidate cut, final ranks) is hash-gated end-to-end."""
    v = _vectors(spark, sf_dir)
    codebook = (
        v.where(F.col("vec_id") < _K)
        .select(
            F.struct(F.col("vec_id").alias("centroid_id"), F.col("e").alias("ce")).alias("c")
        )
        .agg(F.sort_array(F.collect_list("c")).alias("cb"))
    )

    def full_dist(c: Column) -> Column:
        sq = F.zip_with(F.col("e"), c["ce"], lambda x, y: (x - y) * (x - y))
        return dround(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x))

    def bucket_struct(c: Column) -> Column:
        return F.struct(full_dist(c).alias("dist"), c["centroid_id"].alias("bucket_id"))

    def sub_dist(c: Column, m: int) -> Column:
        sq = F.zip_with(
            F.slice(F.col("e"), m * _SUB + 1, _SUB),
            F.slice(c["ce"], m * _SUB + 1, _SUB),
            lambda x, y: (x - y) * (x - y),
        )
        return dround(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x))

    def code_at(m: int):
        return lambda c: F.struct(
            sub_dist(c, m).alias("dist"), c["centroid_id"].alias("centroid_id")
        )

    def tab_at(m: int):
        return lambda c: sub_dist(c, m)

    with_cb = v.crossJoin(F.broadcast(codebook))
    # stored side, one projection: IVF bucket + PQ codes (what the index
    # persists per vector — the full vector never travels past this scan)
    stored = with_cb.select(
        "vec_id",
        F.array_min(F.transform(F.col("cb"), bucket_struct))["bucket_id"].alias(
            "bucket_id"
        ),
        *[
            F.array_min(F.transform(F.col("cb"), code_at(m)))["centroid_id"].alias(
                f"code_{m}"
            )
            for m in range(_M)
        ],
    )
    # query side: nprobe bucket ids + the M ADC distance tables
    probes = (
        with_cb.where(F.col("vec_id") < _NQ)
        .select(
            F.col("vec_id").alias("q_id"),
            F.explode(
                F.slice(
                    F.sort_array(F.transform(F.col("cb"), bucket_struct)),
                    1,
                    _NPROBE_F,
                )
            ).alias("p"),
        )
        .select("q_id", F.col("p.bucket_id").alias("bucket_id"))
    )
    qtabs = (
        with_cb.where(F.col("vec_id") < _NQ)
        .select(
            F.col("vec_id").alias("q_id"),
            *[F.transform(F.col("cb"), tab_at(m)).alias(f"t{m}") for m in range(_M)],
        )
    )
    cand = stored.join(F.broadcast(probes), "bucket_id").join(
        F.broadcast(qtabs), "q_id"
    )
    lk = [
        F.element_at(F.col(f"t{m}"), F.col(f"code_{m}").cast("int") + 1)
        for m in range(_M)
    ]
    approx = cand.select(
        "q_id", "vec_id", dround(((lk[0] + lk[1]) + lk[2]) + lk[3]).alias("approx_d2")
    )
    wq = Window.partitionBy("q_id")
    ranked = approx.select(
        "q_id",
        "vec_id",
        "approx_d2",
        F.row_number().over(wq.orderBy("approx_d2", "vec_id")).alias("rn"),
        F.count(F.lit(1)).over(wq).cast("long").alias("n_probed"),
    )
    shortlist = ranked.where(F.col("rn") <= _CAND).select("q_id", "vec_id", "n_probed")
    qv = v.where(F.col("vec_id") < _NQ).select(
        F.col("vec_id").alias("q_id"), F.col("e").alias("qe")
    )
    sv = v.select("vec_id", F.col("e").alias("se"))
    sqd = F.zip_with("qe", "se", lambda x, y: (x - y) * (x - y))
    exact = (
        shortlist.join(F.broadcast(qv), "q_id")
        .join(sv, "vec_id")
        .select(
            "q_id",
            "vec_id",
            "n_probed",
            dround(F.aggregate(sqd, F.lit(0.0), lambda acc, x: acc + x)).alias(
                "exact_d2"
            ),
        )
    )
    we = Window.partitionBy("q_id").orderBy("exact_d2", "vec_id")
    return (
        exact.withColumn("rnk", F.row_number().over(we))
        .where(F.col("rnk") <= _TOPK)
        .select(
            "q_id",
            "vec_id",
            "exact_d2",
            "n_probed",
            F.col("rnk").cast("long").alias("rnk"),
        )
    )
