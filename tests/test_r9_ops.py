"""Round-9 operator tests — independent semantic checks beside the
DuckDB parity gate (the test_r6c/r6d/r8 convention): each key is
validated against a different algorithm (numpy/stdlib reference
implementations over the raw fixture) rather than the SQL oracle's
relational form."""

from __future__ import annotations

import pyarrow.parquet as pq

SF = "/root/testdata/sf0.01"


def _edges_und():
    li = pq.read_table(
        f"{SF}/lineitem.parquet", columns=["l_suppkey", "l_partkey"]
    ).to_pandas()
    edges = sorted({(s, p + 10_000_000) for s, p in zip(li.l_suppkey, li.l_partkey)})
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    return edges, adj


def test_fixture_tag_invalidates_on_regeneration(tmp_path):
    """Write-once .tmp artifacts key their cache on io.fixture_tag; a
    fixture regenerated in place (same path, new bytes/mtime) must
    produce a DIFFERENT tag or five graded graph keys silently read
    stale edges (r8 advice)."""
    import os

    from odc_product_docker_images_spark.io import fixture_tag

    f = tmp_path / "lineitem.parquet"
    f.write_bytes(b"v1-bytes")
    t1 = fixture_tag(str(tmp_path))
    assert t1.startswith(fixture_tag(str(tmp_path)).rsplit("_", 1)[0])
    assert t1 == fixture_tag(str(tmp_path))  # stable while unchanged
    # same size, newer mtime (in-place regeneration)
    f.write_bytes(b"v2-bytes")
    os.utime(f, ns=(os.stat(f).st_atime_ns, os.stat(f).st_mtime_ns + 10**9))
    t2 = fixture_tag(str(tmp_path))
    assert t2 != t1
    # different size
    f.write_bytes(b"v3-bytes-longer")
    assert fixture_tag(str(tmp_path)) not in (t1, t2)


def test_audit_slice_constants_match_pipeline_knuth():
    """The recall-gate oracles inline the Knuth multiplier as a literal
    (a top-level pipeline import would reorder tail registrations); pin
    the literals against the real constant so drift is impossible."""
    from odc_product_docker_images_spark.textvec import dedup, similarity
    from odc_product_docker_images_spark.textvec.pipeline import _KNUTH

    assert dedup._AUDIT_KNUTH == _KNUTH
    assert similarity._AUDIT_KNUTH == _KNUTH
    assert 0 < dedup._AUDIT_PCT < 100
    assert 0 < similarity._AUDIT_PCT < 100


def test_bfs_loop_matches_python_bfs(spark):
    """K frontier expansions recomputed imperatively must agree on the
    full (node -> depth) labeling, every tier must be non-empty (the
    traversal actually advances at each unrolled step), and the loop's
    depth-0/1/2 tiers must equal graph_bfs_step's verified output."""
    from odc_product_docker_images_spark.operators.graph import (
        _BFS_LOOP_DEPTH,
        _BFS_SEED_MOD,
        graph_bfs_loop,
        graph_bfs_step,
    )

    got = {r["node"]: r["depth"] for r in graph_bfs_loop(spark, SF).collect()}
    edges, adj = _edges_und()
    seeds = {u for u, _ in edges if u % _BFS_SEED_MOD == 0}
    depth = {u: 0 for u in seeds}
    frontier = set(seeds)
    for d in range(1, _BFS_LOOP_DEPTH + 1):
        nxt = set()
        for u in frontier:
            nxt |= adj.get(u, set())
        nxt -= set(depth)
        for v in nxt:
            depth[v] = d
        frontier = nxt
    assert got == depth and got
    # every unrolled tier advanced (non-vacuous at this fixture grain)
    tiers = {d for d in got.values()}
    assert tiers == set(range(_BFS_LOOP_DEPTH + 1))
    # induction base: the loop's first three tiers ARE the verified step
    step = {r["node"]: r["depth"] for r in graph_bfs_step(spark, SF).collect()}
    assert {n: d for n, d in got.items() if d <= 2} == step
