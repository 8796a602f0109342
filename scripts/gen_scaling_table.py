"""Regenerate SCALING.md's measured-curve table from BENCH_FULL.json.

Keeps the surrounding narrative intact; replaces only the markdown
table between the '### Round-5 note' section's table and the next
'## ' heading.  Run after a full bench.py pass.

Usage: python scripts/gen_scaling_table.py
"""

from __future__ import annotations

import json
import os
import re

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    full = json.load(open(os.path.join(ROOT, "BENCH_FULL.json")))
    rows = []
    for q, per in full["scaling"].items():
        exp = full["scaling_exponent"].get(q)
        rows.append((q, per.get("0.001"), per.get("0.01"), per.get("0.1"), exp))
    rows.sort(key=lambda r: -(r[4] if r[4] is not None else -9))
    lines = [
        "| query | sf0.001 (s) | sf0.01 (s) | sf0.1 (s) | exponent |",
        "|---|---|---|---|---|",
    ]
    for q, a, b, c, e in rows:
        es = f"{e:+.2f}" if e is not None else "—"
        lines.append(f"| `{q}` | {a} | {b} | {c} | {es} |")
    table = "\n".join(lines)

    path = os.path.join(ROOT, "SCALING.md")
    s = open(path).read()
    # the measured-curve table sits between the first '| query |' header
    # after the round-5 note and the '## Out-of-grid decade' heading
    m = re.search(
        r"(\| query \| sf0\.001.*?)(\n\n## Out-of-grid decade)", s, re.S
    )
    if not m:
        raise SystemExit("SCALING.md table anchors not found")
    s = s[: m.start(1)] + table + m.group(2) + s[m.end(2) :]
    open(path, "w").write(s)
    worst = max(e for *_, e in rows if e is not None)
    print(f"table regenerated: {len(rows)} queries, worst exponent {worst:+.2f}")


if __name__ == "__main__":
    main()
