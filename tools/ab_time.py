"""Same-session interleaved timing of named keys through the noop sink.

Usage: python tools/ab_time.py key1,key2 [passes] [sf_dir]

BASELINE.md methodology: pass 1 is warm-up (JIT tiering), min-of-N filters
the VM's noisy-neighbor stalls; only same-session interleaved comparisons
are decision-grade on this box.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    keys = sys.argv[1].split(",")
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

    from odc_product_docker_images_spark.registry import queries
    from odc_product_docker_images_spark.session import get_spark

    spark = get_spark("ab-time")
    qs = queries()
    out: dict[str, list[float]] = {}
    for p in range(passes):
        for k in keys:
            spark.sparkContext.setJobDescription(f"ab:{k}:pass{p}")
            t0 = time.time()
            qs[k](spark, sf_dir).write.mode("overwrite").format("noop").save()
            dt = round(time.time() - t0, 3)
            out.setdefault(k, []).append(dt)
            print(f"# pass{p} {k}: {dt:.3f}s", file=sys.stderr)
    for k, v in out.items():
        print(f"{k}: min={min(v):.3f} all={v}")


if __name__ == "__main__":
    main()
