"""Render EVIDENCE/ab_r04.jsonl as a markdown table (EVIDENCE/ab_r04.md)."""
from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    src = os.path.join(ROOT, "EVIDENCE", "ab_r04.jsonl")
    rows = [json.loads(ln) for ln in open(src) if ln.strip()]
    out = ["# Round-4 A/B results", "",
           "Bench variants (e2e reads/s, median of runs):", "",
           "| variant | reads/s | vs_baseline | hit% | spread% | wall s |",
           "|---|---|---|---|---|---|"]
    for r in rows:
        if "bench" in r:
            b = r["bench"]
            out.append(f"| {r['variant']} | {b.get('value')} | "
                       f"{b.get('vs_baseline')} | {b.get('bwt_hit_pct')} | "
                       f"{b.get('spread_pct', '')} | {r['wall_s']} |")
    out += ["", "Seeding-only profiles (queue-N honest timing):", "",
            "| variant | chunk | profile | wall s |", "|---|---|---|---|"]
    for r in rows:
        if "profile" in r:
            out.append(f"| {r['variant']} | {r.get('chunk', '')} | "
                       f"`{r['profile']}` | {r['wall_s']} |")
    dst = os.path.join(ROOT, "EVIDENCE", "ab_r04.md")
    with open(dst, "w") as f:
        f.write("\n".join(out) + "\n")
    print(dst)
    return 0


if __name__ == "__main__":
    sys.exit(main())
