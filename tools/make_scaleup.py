"""Build the 10x scale-up fixture used by SCALING.md measurements.

Fact tables (lineitem/events/...) come from the round-1 replicas in
``.tmp/sf1ish`` (10x rows, shifted keys).  This script adds honest 10x
TEXT tables, which round 1 skipped (documents/embeddings stayed 1x, so
textvec "10x" numbers weren't):

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
FACTS = REPO / ".tmp" / "sf1ish"
OUT = REPO / ".tmp" / "sf1x10"
COPIES = 10


def main() -> None:
    from pyspark.sql import functions as F

    from odc_product_docker_images_spark.io import load
    from odc_product_docker_images_spark.session import get_spark

    spark = get_spark("make-scaleup", shuffle_partitions=32)
    OUT.mkdir(parents=True, exist_ok=True)

    # fact + dim tables: reuse the round-1 replicas if they survive, else
    # rebuild (10x facts with key-shifted replicas → 10x groups of the same
    # size, the "more pixels" scale profile; dims stay 1x).
    _OFF = 10_000_000  # > any sf0.1 key; keeps per-replica key spaces disjoint

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
        if (FACTS / f"{table}.parquet").exists():
            os.symlink(FACTS / f"{table}.parquet", dst)
            return
        base = load(spark, SRC, table)
        out = None
        for k in range(COPIES):
            rep = _shift(base, set(keycols), k)
            out = rep if out is None else out.unionByName(rep)
        out.repartition(32).write.mode("overwrite").parquet(str(dst))

    _replicate("lineitem", ["l_orderkey", "l_partkey", "l_suppkey"])
    _replicate("orders", ["o_orderkey", "o_custkey"])
    _replicate("events", ["event_id", "user_id"])
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
