"""Maximal Marginal Relevance (MMR) diversified re-ranking (X3+, r5f).

The last stage of a production retrieval funnel: after BM25/ANN recall
and exact re-scoring (`sim_rerank_adc_exact`), the TOP OF THE LIST is
diversified — each pick maximizes λ·relevance − (1−λ)·max-similarity to
what's already picked (Carbonell & Goldstein 1998).  Greedy selection is
inherently sequential in K, but K is tiny and FIXED, so the loop unrolls
into the PLAN: each step is a left-anti join against the picks so far, a
max-similarity aggregate over the pair table restricted to those picks,
and a 1-row TakeOrdered — no driver-side data access, no collect.  The
oracle unrolls the same K steps as chained CTEs with correlated MAX
subqueries, so the greedy trajectory itself is hash-gated.

Scale: the candidate set is bounded by construction (top-N from the
recall stages — rerankers everywhere run on ≤10³ candidates), so the
N² pair table is small regardless of corpus size; for MANY probes the
production shape shards this per probe (each probe's candidates are a
group), which composes with this exact kernel unchanged.

Determinism: relevance and pair cosines take the dround(6) exact path
BEFORE any comparison; λ-arithmetic is exact IEEE on rounded operands
with every literal CAST to DOUBLE in the oracle; every argmax carries a
(score desc, vec_id) tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.det import dround, sql_dround
from ..io import load
from ..registry import register

_PROBE = 0  # query vector: vec_id 0
_N = 20  # candidate pool (top-N by relevance)
_K = 5  # diversified picks
_LAM = 0.7
_DIM = 64

_COS = (
    "LIST_SUM(LIST_TRANSFORM(RANGE(1, " + str(_DIM + 1) + "), i -> {a}[i] * {b}[i]))"
    " / ({na} * {nb})"
)


def _mmr_oracle() -> str:
    cos_q = _COS.format(a="v.e", b="q.e", na="v.nrm", nb="q.nrm")
    cos_p = _COS.format(a="a.e", b="b.e", na="a.nrm", nb="b.nrm")
    sql = f"""
        WITH v AS (
            SELECT vec_id, LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS e,
                   SQRT(LIST_SUM(LIST_TRANSFORM(embedding,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
            FROM embeddings
        ), q AS (
            SELECT e, nrm FROM v WHERE vec_id = {_PROBE}
        ), rel AS (
            SELECT v.vec_id, {sql_dround(cos_q)} AS rel
            FROM v, q WHERE v.vec_id != {_PROBE}
            ORDER BY rel DESC, v.vec_id LIMIT {_N}
        ), p AS (
            SELECT a.vec_id AS ia, b.vec_id AS ib, {sql_dround(cos_p)} AS sim
            FROM (SELECT v.* FROM v JOIN rel USING (vec_id)) a
            JOIN (SELECT v.* FROM v JOIN rel USING (vec_id)) b
              ON a.vec_id != b.vec_id
        )"""
    prev: list[str] = []
    for k in range(1, _K + 1):
        notin = (
            f" WHERE r.vec_id NOT IN (SELECT vec_id FROM picks{k - 1})"
            if prev
            else ""
        )
        union_prev = (
            " UNION ALL ".join(f"SELECT * FROM s{i}" for i in range(1, k))
            or "SELECT NULL AS rank, NULL AS vec_id, NULL AS rel, NULL AS mmr_score WHERE 1=0"
        )
        sql += f""", picks{k - 1} AS (
            SELECT vec_id FROM ({union_prev})
        ), s{k} AS (
            SELECT CAST({k} AS INTEGER) AS rank, r.vec_id, r.rel,
                   CAST({_LAM!r} AS DOUBLE) * r.rel
                   - CAST({1 - _LAM!r} AS DOUBLE)
                     * COALESCE((SELECT MAX(p.sim) FROM p
                                 WHERE p.ib = r.vec_id
                                   AND p.ia IN (SELECT vec_id FROM picks{k - 1})),
                                CAST(0.0 AS DOUBLE)) AS mmr_score
            FROM rel r{notin}
            ORDER BY mmr_score DESC, r.vec_id LIMIT 1
        )"""
        prev.append(f"s{k}")
    sql += "\n        " + " UNION ALL ".join(f"SELECT * FROM s{i}" for i in range(1, _K + 1))
    return sql


@register("sim_mmr_rerank", oracle=_mmr_oracle())
def sim_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3+: MMR diversified top-K — greedy λ-tradeoff picks over the
    top-N relevance pool.  Relevance and pair cosines are computed and
    dround(6)-rounded in Spark; the bounded greedy selection itself (≤N
    rows, ≤N² sims) runs in one Arrow kernel (r12 — see the inline note
    for the bit-identity argument vs the r5f unrolled-plan form)."""
    v = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("e")
    )
    nrm = F.sqrt(F.aggregate(F.transform("e", lambda x: x * x), F.lit(0.0), lambda a, x: a + x))
    v = v.withColumn("nrm", nrm)
    q = v.where(F.col("vec_id") == _PROBE).select(
        F.col("e").alias("qe"), F.col("nrm").alias("qn")
    )

    def cos(ea, eb, na, nb):
        dot = F.aggregate(F.zip_with(ea, eb, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x)
        return dround(dot / (na * nb))

    # persist the candidate pool: both the pair table and the candidate
    # collect re-read it, and without materialization the plan re-computes
    # the scoring sort per consumer
    rel = (
        v.where(F.col("vec_id") != _PROBE)
        .crossJoin(F.broadcast(q))
        .select("vec_id", "e", "nrm", cos(F.col("e"), F.col("qe"), F.col("nrm"), F.col("qn")).alias("rel"))
        .orderBy(F.desc("rel"), "vec_id")
        .limit(_N)
    ).persist()
    a = rel.select(F.col("vec_id").alias("ia"), F.col("e").alias("ea"), F.col("nrm").alias("na"))
    b = rel.select(F.col("vec_id").alias("ib"), F.col("e").alias("eb"), F.col("nrm").alias("nb"))
    p = (
        a.join(b, F.col("ia") != F.col("ib"))
        .select("ia", "ib", cos(F.col("ea"), F.col("eb"), F.col("na"), F.col("nb")).alias("sim"))
    )  # single consumer since r12 (the pair collect) — no persist needed
    # r12 (guide §8 "decide with small rows"): the greedy selection runs
    # over a pool BOUNDED at N=20 rows and its N·(N−1) pair sims — both
    # dround(6)-rounded IN SPARK before any comparison, exactly as before.
    # The K unrolled plan stages (anti-join + max-sim agg + 1-row
    # TakeOrdered each, O(K²) re-planning, 401 Exchanges) are replaced by
    # ONE Arrow kernel over the two collected arrays: the scoring
    # arithmetic (λ·rel − (1−λ)·maxsim on the rounded doubles, same
    # Python float literals, max is exact) and the (score desc, vec_id)
    # tie-break are IDENTICAL IEEE ops on identical inputs, so the greedy
    # trajectory — and every output bit — is unchanged (parity + the
    # pytest replica re-verified).  The pair table never leaves Spark
    # unrounded; nothing here grows with the corpus.
    cand_arr = rel.select("vec_id", "rel").agg(
        F.collect_list(F.struct("vec_id", "rel")).alias("cand")
    )
    pair_arr = p.agg(F.collect_list(F.struct("ia", "ib", "sim")).alias("pairs"))
    one = cand_arr.crossJoin(F.broadcast(pair_arr))

    lam, one_minus_lam = _LAM, 1 - _LAM  # the exact doubles F.lit used
    kk = _K

    def mmr_greedy(batches):
        import pandas as pd

        for pdf in batches:
            out = {"rank": [], "vec_id": [], "rel": [], "mmr_score": []}
            for _, row in pdf.iterrows():
                # NULL tolerance (r13 advice): a null embedding yields a
                # null rel/sim; the pre-r12 unrolled plan's F.max/COALESCE
                # silently ignored those rows, so the kernel must too —
                # float(None) would raise.  No fixture carries nulls today
                # (parity re-verified), this only pins the legacy behavior.
                cands = sorted(
                    (
                        (int(c["vec_id"]), float(c["rel"]))
                        for c in row["cand"]
                        if c["rel"] is not None
                    ),
                    key=lambda t: t[0],
                )
                sims = {
                    (int(e["ia"]), int(e["ib"])): float(e["sim"])
                    for e in row["pairs"]
                    if e["sim"] is not None
                }
                picked: list[int] = []
                for k in range(1, kk + 1):
                    best = None  # (score, vec_id, rel)
                    for vid, rel_v in cands:
                        if vid in picked:
                            continue
                        ms = [sims[(ia, vid)] for ia in picked if (ia, vid) in sims]
                        maxsim = max(ms) if ms else 0.0
                        score = lam * rel_v - one_minus_lam * maxsim
                        if (
                            best is None
                            or score > best[0]
                            or (score == best[0] and vid < best[1])
                        ):
                            best = (score, vid, rel_v)
                    if best is None:
                        break
                    picked.append(best[1])
                    out["rank"].append(k)
                    out["vec_id"].append(best[1])
                    out["rel"].append(best[2])
                    out["mmr_score"].append(best[0])
            yield pd.DataFrame(out)

    return one.mapInPandas(
        mmr_greedy, schema="rank int, vec_id long, rel double, mmr_score double"
    )
