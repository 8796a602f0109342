"""Regenerate CATALOG.md — the auto-built index of every catalog query.

Usage: python scripts/gen_catalog_md.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_data_virus_analysis_spark.plans.catalog import CATALOG  # noqa: E402

HEADER = """# CATALOG — every query in the engine (auto-generated)

One row per `queries()` entry.  `oracle` says whether the driver's
correctness gate checks it EXACTLY against DuckDB SQL, or rows-only
(sketches, seeded ML, real-corpus inputs).  Regenerate with
`python scripts/gen_catalog_md.py`; completeness is the point — the
hand-written narrative lives in COVERAGE.md.

| # | query | oracle | what it does |
|---|---|---|---|
"""


def main() -> None:
    out = HEADER
    for i, name in enumerate(sorted(CATALOG), 1):
        spec = CATALOG[name]
        kind = "exact" if spec.oracle is not None else "rows-only"
        doc = " ".join((spec.doc or "").split())
        out += f"| {i} | `{name}` | {kind} | {doc} |\n"
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "CATALOG.md")
    with open(path, "w") as f:
        f.write(out)
    print(f"wrote {path}: {len(CATALOG)} queries")


if __name__ == "__main__":
    main()
