"""Guard: no driver-side materialization on operator data paths
(SURVEY §7 hard-part 6 — 100 TB design discipline).

``collect()``/``toPandas()`` in an operator module means the 'distributed'
operator isn't.  Annotated exceptions (both in VersionedTable.merge, both
planning metadata the way every table format's MERGE plans driver-side):
the DISTINCT FILE NAMES containing matched keys (bounded by file count),
and the 1-ROW uniqueness/key-range aggregate over the updates (r12 — fused
from two count jobs; feeds footer-stats file skipping).  Never row data.
"""

from __future__ import annotations

import re
from pathlib import Path

PKG = Path(__file__).resolve().parent.parent / "odc_product_docker_images_spark"

# file -> allowed occurrences (none; add ONLY with a documented rationale)
ALLOWED: dict[str, int] = {"sources/versioned.py": 2}  # merge: file-name + 1-row-range metadata collects


def test_no_collect_on_data_paths():
    bad: list[str] = []
    for py in PKG.rglob("*.py"):
        rel = str(py.relative_to(PKG))
        hits = len(re.findall(r"\.(collect|toPandas|toLocalIterator)\(", py.read_text()))
        if hits > ALLOWED.get(rel, 0):
            bad.append(f"{rel}: {hits} driver-materialization calls")
    assert not bad, bad
