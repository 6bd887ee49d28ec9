"""Guard: no driver-side materialization on operator data paths
(SURVEY §7 hard-part 6 — 100 TB design discipline).

``collect()``/``toPandas()`` in an operator module means the 'distributed'
operator isn't.  One annotated exception: VersionedTable.merge collects the
DISTINCT FILE NAMES containing matched keys — snapshot metadata bounded by
file count (the same driver-side planning every table format's MERGE does),
never row data.
"""

from __future__ import annotations

import re
from pathlib import Path

PKG = Path(__file__).resolve().parent.parent / "odc_product_docker_images_spark"

# file -> allowed occurrences (none; add ONLY with a documented rationale)
ALLOWED: dict[str, int] = {"sources/versioned.py": 1}  # merge: file-name metadata collect


def test_no_collect_on_data_paths():
    bad: list[str] = []
    for py in PKG.rglob("*.py"):
        rel = str(py.relative_to(PKG))
        hits = len(re.findall(r"\.(collect|toPandas|toLocalIterator)\(", py.read_text()))
        if hits > ALLOWED.get(rel, 0):
            bad.append(f"{rel}: {hits} driver-materialization calls")
    assert not bad, bad
