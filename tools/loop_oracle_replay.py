"""Iterative replay of chained-CTE loop oracles at scale grains.

The loop keys' oracles unroll K iterations as ONE chained-CTE query;
DuckDB plans the whole chain at once and spills >50 GB at the 10x grain
on this box (SCALING.md r10 "Loop tier" — environment-bound, the Spark
sides complete fine).  This tool replays the SAME oracle text
iteratively (VERDICT r10 task #4): it splits the top-level CTE list
with a balanced-paren parse — every CTE body is executed VERBATIM — and
materializes each CTE as a table in a DISK-BACKED DuckDB database in
dependency order, so peak memory is one step's working set instead of
the whole chain.  Then it runs the oracle's final SELECT and compares
against the Spark loop output with check_parity's canonicalization.

Nothing about the oracle's semantics changes: the statements executed
are the oracle's own CTE bodies, one CREATE TABLE per step.  The
repo-wide decimal-exact aggregate discipline (functions/det.py) is what
makes the materialization boundary value-neutral — every
order-sensitive sum in these oracles is already order-insensitive.

Usage: python tools/loop_oracle_replay.py [--sf-dir .tmp/sf1x10]
           [--keys graph_pagerank_loop,...] [--memory 24GB]
"""

from __future__ import annotations

import argparse
import re
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.check_parity import TABLES, compare  # noqa: E402

# the DuckDB-replay-bound keys (SCALING.md r10: verified only to 3x)
DEFAULT_KEYS = [
    "graph_pagerank_loop",
    "graph_hits_loop",
    "graph_kcore_loop",
    "graph_label_prop_loop",
    "ml_gmm_em_loop",
    "ml_platt_scaling_loop",
]

_IDENT = re.compile(r"[A-Za-z_][A-Za-z_0-9]*")


def split_ctes(sql: str) -> tuple[list[tuple[str, str]], str]:
    """Split ``WITH a AS (...), b AS (...) <final>`` into
    ``([(a, body), (b, body)], final)`` — bodies verbatim.  Handles
    nested parens and single-quoted strings; loop oracles are
    non-recursive by construction (grouped aggregation per step rules
    out the recursive-CTE form), so plain dependency order holds."""
    s = sql.strip()
    if not s[:4].upper() == "WITH":
        raise ValueError("oracle is not a WITH-chain")
    i = 4
    ctes: list[tuple[str, str]] = []
    while True:
        while s[i].isspace():
            i += 1
        m = _IDENT.match(s, i)
        if not m:
            raise ValueError(f"expected CTE name at …{s[i:i+40]!r}")
        name = m.group(0)
        i = m.end()
        while s[i].isspace():
            i += 1
        if s[i] == "(":  # column-list form: name(c1, c2) AS (...)
            raise ValueError(f"column-list CTE {name!r} not supported")
        if s[i : i + 2].upper() != "AS":
            raise ValueError(f"expected AS after CTE {name!r}")
        i += 2
        while s[i].isspace():
            i += 1
        if s[i] != "(":
            raise ValueError(f"expected ( after {name} AS")
        depth, start = 0, i
        while True:
            c = s[i]
            if c == "'":
                i += 1
                while True:
                    if s[i] == "'" and s[i : i + 2] != "''":
                        break
                    i += 2 if s[i : i + 2] == "''" else 1
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    break
            i += 1
        ctes.append((name, s[start + 1 : i]))
        i += 1
        while s[i].isspace():
            i += 1
        if s[i] == ",":
            i += 1
            continue
        break
    return ctes, s[i:]


def replay(
    con: duckdb.DuckDBPyConnection, oracle: str, verbose: bool = True
):
    ctes, final = split_ctes(oracle)
    for name, body in ctes:
        t0 = time.time()
        con.execute(f'CREATE OR REPLACE TABLE "{name}" AS {body}')
        if verbose:
            n = con.execute(f'SELECT COUNT(*) FROM "{name}"').fetchone()[0]
            print(f"  step {name}: {n} rows ({time.time()-t0:.1f}s)", flush=True)
    df = con.execute(final).df()
    for name, _ in ctes:
        con.execute(f'DROP TABLE IF EXISTS "{name}"')
    return df


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/repo/.tmp/sf1x10")
    ap.add_argument("--keys", default=None)
    ap.add_argument("--memory", default="24GB")
    args = ap.parse_args()
    keys = args.keys.split(",") if args.keys else DEFAULT_KEYS

    import __spark_entry__ as ent
    from odc_product_docker_images_spark.session import get_spark

    spark = get_spark("loop-oracle-replay")
    qs, oracles = ent.queries(), ent.oracle_sql()

    db = Path(__file__).resolve().parent.parent / ".tmp" / "loop_replay.duckdb"
    db.parent.mkdir(exist_ok=True)
    if db.exists():
        db.unlink()
    con = duckdb.connect(str(db))  # disk-backed: steps spill to the file
    con.execute(f"SET memory_limit='{args.memory}'")
    con.execute(f"SET temp_directory='{db.parent / 'duckdb_tmp'}'")
    for t in TABLES:
        path = f"{args.sf_dir}/{t}.parquet"
        if Path(path).is_dir():
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    failed = []
    for key in keys:
        print(f"== {key}", flush=True)
        t0 = time.time()
        try:
            sdf = qs[key](spark, args.sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failed.append(key)
            print(f"FAIL {key}: spark error: {type(e).__name__}: {e}")
            continue
        t_spark = time.time() - t0
        t0 = time.time()
        try:
            ddf = replay(con, oracles[key])
        except Exception as e:  # noqa: BLE001
            failed.append(key)
            print(f"FAIL {key}: replay error: {type(e).__name__}: {e}")
            continue
        problems = compare(key, sdf, ddf)
        if problems:
            failed.append(key)
            print(f"FAIL {key} ({len(sdf)} rows): " + "; ".join(problems))
        else:
            print(
                f"PASS {key}: {len(sdf)} rows"
                f" (spark {t_spark:.1f}s, replay {time.time()-t0:.1f}s)",
                flush=True,
            )
    print(f"{len(keys)-len(failed)} passed, {len(failed)} failed of {len(keys)}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
