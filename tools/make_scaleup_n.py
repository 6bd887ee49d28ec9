"""Build an N-fold scale-up fixture (the 100x evidence tier).

Same replication semantics as make_scaleup.py's 10x build — PK-shifted
fact replicas with FK columns kept in the 1x dim domain, dims symlinked,
documents token-suffixed per replica, embeddings sign-flipped per
replica — but expressed as ONE crossJoin against a replica-index range
instead of an N-way unionByName, so the build plan stays constant-size
at any N (a 100-way union parses and optimizes 100 copies of the scan).

Usage: python tools/make_scaleup_n.py [--copies 100] [--out sf1x100]
  → .tmp/<out>/
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REPO = Path(__file__).resolve().parent.parent
SRC = "/root/testdata/sf0.1"
_OFF = 10_000_000  # > any sf0.1 key; keeps per-replica PK spaces disjoint


def main() -> None:
    from pyspark.sql import functions as F

    from odc_product_docker_images_spark.io import load
    from odc_product_docker_images_spark.session import get_spark

    copies = int(sys.argv[sys.argv.index("--copies") + 1]) if "--copies" in sys.argv else 100
    name = sys.argv[sys.argv.index("--out") + 1] if "--out" in sys.argv else f"sf1x{copies}"
    # --tables lineitem,orders: replicate ONLY these; every other table is
    # symlinked at 1x so the parity harness still binds all ten views.
    # Use for TARGETED probes (e.g. the >9.2e12 wide-hop activation grain,
    # where only the revenue-bearing facts need the fan-out) — keys reading
    # a symlinked table would silently run at 1x, so a targeted fixture is
    # only valid for the keys it was built for.
    only: set[str] | None = None
    if "--tables" in sys.argv:
        only = set(sys.argv[sys.argv.index("--tables") + 1].split(","))
    out = REPO / ".tmp" / name
    out.mkdir(parents=True, exist_ok=True)

    spark = get_spark("make-scaleup-n", shuffle_partitions=64)
    reps = spark.range(copies).select(F.col("id").alias("_k"))

    def replicate(table: str, keycols: list[str], parts: int) -> None:
        dst = out / f"{table}.parquet"
        if only is not None and table not in only:
            if not dst.exists():
                os.symlink(f"{SRC}/{table}.parquet", dst)
            return
        if (dst / "_SUCCESS").exists():
            return
        # repartition the 1x BASE before the fan-out (the repo's own
        # single-file-input rule): shuffling 1x rows costs MBs and gives
        # `parts` parallel generate+write tasks; repartitioning AFTER the
        # crossJoin shuffled the full Nx output (17 GB at 1000x) through
        # 3 map tasks and serialized the build on 3 cores.
        base = load(spark, SRC, table).repartition(parts)
        rep = base.crossJoin(F.broadcast(reps)).select(
            *[
                (F.col(c) + F.col("_k") * _OFF).alias(c) if c in keycols else c
                for c in base.columns
            ]
        )
        rep.write.mode("overwrite").parquet(str(dst))

    replicate("lineitem", ["l_orderkey"], 64)
    replicate("orders", ["o_orderkey"], 32)
    # user_id is NOT an FK (no users dim) — shifting it keeps each replica's
    # session structure identical to the base corpus (N-x users profile).
    replicate("events", ["event_id", "user_id"], 32)
    for t in ["customer", "supplier", "part", "nation", "region"]:
        link = out / f"{t}.parquet"
        if not link.exists():
            os.symlink(f"{SRC}/{t}.parquet", link)

    # documents: token suffix per replica kills cross-replica Jaccard while
    # keeping within-replica near-dup structure exactly the base corpus's.
    ddst = out / "documents.parquet"
    if only is not None and "documents" not in only:
        if not ddst.exists():
            os.symlink(f"{SRC}/documents.parquet", ddst)
    elif not (ddst / "_SUCCESS").exists():
        dc = load(spark, SRC, "documents")
        n_docs = 5000  # sf0.1 corpus size; offsets keep doc_id unique
        suffixed = F.regexp_replace(
            "text", r"(\S+)", F.concat(F.lit("$1x"), F.col("_k").cast("string"))
        )
        (
            dc.repartition(32)  # pre-fan-out: 32 parallel generate tasks
            .crossJoin(F.broadcast(reps))
            .select(
                (F.col("doc_id") + F.col("_k") * n_docs).alias("doc_id"),
                suffixed.alias("text"),
                "lang",
                "source",
                F.length(suffixed).alias("n_chars"),
            )
            .write.mode("overwrite")
            .parquet(str(ddst))
        )

    # embeddings: deterministic per-replica ±1 sign pattern — |s_i| = 1
    # keeps within-replica cosines bit-comparable, cross-replica cosines
    # collapse toward 0.
    edst = out / "embeddings.parquet"
    if only is not None and "embeddings" not in only:
        if not edst.exists():
            os.symlink(f"{SRC}/embeddings.parquet", edst)
    elif not (edst / "_SUCCESS").exists():
        em = load(spark, SRC, "embeddings")
        n_vecs = 2000
        flip = F.zip_with(
            "embedding",
            F.sequence(F.lit(0), F.lit(63)),
            lambda x, i: x
            * F.when(F.xxhash64(F.col("_k"), i) % 2 == 0, 1.0).otherwise(-1.0),
        )
        (
            em.repartition(32)  # pre-fan-out: 32 parallel generate tasks
            .crossJoin(F.broadcast(reps))
            .select(
                (F.col("vec_id") + F.col("_k") * n_vecs).alias("vec_id"),
                flip.alias("embedding"),
                "label",
            )
            .write.mode("overwrite")
            .parquet(str(edst))
        )

    for t in ["documents", "embeddings", "lineitem", "events"]:
        if only is None or t in only:
            print(t, spark.read.parquet(str(out / f"{t}.parquet")).count())


if __name__ == "__main__":
    main()
