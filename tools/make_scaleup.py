"""Build the 10x scale-up fixture used by SCALING.md measurements.

Self-contained: fact tables are rebuilt as 10 primary-key-shifted replicas
(FK columns keep the 1x dim domain — see the in-line FK-semantics note),
dims are symlinked 1x, and the TEXT tables get honest 10x builds:

- documents: 10 copies, doc_id offset, and every token suffixed with a
  replica tag — within-replica shingle/near-dup structure is EXACTLY the
  original corpus's, while cross-replica Jaccard drops to 0 (otherwise
  every replica pair of the same doc is a near-dup and pair counts grow
  45x, not 10x).
- embeddings: 10 copies, vec_id offset, each replica's vectors
  elementwise-multiplied by a deterministic ±1 pattern — |s_i|=1 keeps
  every within-replica cosine bit-comparable, while cross-replica
  cosines collapse toward 0 (random-sign inner product).

Usage: python tools/make_scaleup.py  → .tmp/sf1x10/
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REPO = Path(__file__).resolve().parent.parent
SRC = "/root/testdata/sf0.1"
OUT = REPO / ".tmp" / "sf1x10"
COPIES = 10


def main() -> None:
    from pyspark.sql import functions as F

    from odc_product_docker_images_spark.io import load
    from odc_product_docker_images_spark.session import get_spark

    spark = get_spark("make-scaleup", shuffle_partitions=32)
    OUT.mkdir(parents=True, exist_ok=True)

    # Fact tables: 10x rows by replication.  FK SEMANTICS (pinned by the r2
    # advisor): shift only PRIMARY keys (l_orderkey, o_orderkey, event_id) so
    # row identity stays unique, and leave FK columns (l_partkey, l_suppkey,
    # o_custkey, user_id) in the 1x dimension domain — every replica joins to
    # the unreplicated dims, so a 10x join does 10x probe work and grouped
    # keys get 10x-size groups (the "more observations per pixel" profile).
    # The previous build shifted FKs too, leaving replicas k>=1 dangling and
    # understating scaled join work.
    _OFF = 10_000_000  # > any sf0.1 key; keeps per-replica PK spaces disjoint
    _FKVER = OUT / "_fk_v2"  # semantics marker: stale replicas are rebuilt

    if not _FKVER.exists():
        for t in ["lineitem", "orders", "events"]:
            p = OUT / f"{t}.parquet"
            if p.is_symlink():
                p.unlink()
            elif p.exists():
                import shutil

                shutil.rmtree(p)

    def _shift(df, cols, k):
        return df.select(
            *[
                (F.col(c) + F.lit(k * _OFF)).alias(c) if c in cols else c
                for c in df.columns
            ]
        )

    def _replicate(table: str, keycols: list[str]) -> None:
        dst = OUT / f"{table}.parquet"
        if dst.exists():
            return
        base = load(spark, SRC, table)
        out = None
        for k in range(COPIES):
            rep = _shift(base, set(keycols), k)
            out = rep if out is None else out.unionByName(rep)
        out.repartition(32).write.mode("overwrite").parquet(str(dst))

    _replicate("lineitem", ["l_orderkey"])
    _replicate("orders", ["o_orderkey"])
    # user_id is NOT an FK (no users dim) — shifting it keeps each replica's
    # session structure identical to the base corpus (10x users profile).
    _replicate("events", ["event_id", "user_id"])
    _FKVER.touch()
    for t in ["customer", "supplier", "part", "nation", "region"]:
        link = OUT / f"{t}.parquet"
        if not link.exists():
            os.symlink(f"{SRC}/{t}.parquet", link)

    dc = load(spark, SRC, "documents")
    n_docs = 5000  # sf0.1 corpus size; offsets keep doc_id unique
    docs = None
    for k in range(COPIES):
        rep = dc.select(
            (F.col("doc_id") + F.lit(k * n_docs)).alias("doc_id"),
            F.regexp_replace("text", r"(\S+)", f"$1x{k}").alias("text"),
            "lang",
            "source",
            F.length(F.regexp_replace("text", r"(\S+)", f"$1x{k}")).alias("n_chars"),
        )
        docs = rep if docs is None else docs.unionByName(rep)
    docs.repartition(8).write.mode("overwrite").parquet(str(OUT / "documents.parquet"))

    em = load(spark, SRC, "embeddings")
    n_vecs = 2000
    signs = lambda k: F.sequence(F.lit(0), F.lit(63)).alias("_i")  # noqa: E731
    ems = None
    for k in range(COPIES):
        flip = F.zip_with(
            "embedding",
            F.sequence(F.lit(0), F.lit(63)),
            lambda x, i: x * F.when(F.xxhash64(F.lit(k), i) % 2 == 0, 1.0).otherwise(-1.0),
        )
        rep = em.select(
            (F.col("vec_id") + F.lit(k * n_vecs)).alias("vec_id"),
            flip.alias("embedding"),
            "label",
        )
        ems = rep if ems is None else ems.unionByName(rep)
    ems.repartition(8).write.mode("overwrite").parquet(str(OUT / "embeddings.parquet"))

    for t in ["documents", "embeddings", "lineitem", "events"]:
        print(t, spark.read.parquet(str(OUT / f"{t}.parquet")).count())


if __name__ == "__main__":
    main()
