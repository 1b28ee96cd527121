"""Render SCALE.json (the probe's machine-readable sidecar) as the
markdown block docs/SCALE.md embeds: one row per query, sorted by
10x ratio descending so the screen reads top-down, with the fitted
exponent and 100x projection where a 30x point exists.

Usage:
  python tools/render_scale_md.py            # full table
  python tools/render_scale_md.py --flagged  # ratio >= threshold only
"""

from __future__ import annotations

import json
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    flag_only = "--flagged" in sys.argv
    thresh = float(os.environ.get("SCALE_FLAG_RATIO", "6.0"))
    from scale_notes import NOTES

    data = json.load(
        open(os.path.join(REPO_ROOT, "SCALE.json"))
    )["queries"]
    rows = []
    for name, q in data.items():
        r10 = q.get("ratio10x")
        if r10 is None:
            continue
        rows.append((
            name, q.get("t_base_s"), q.get("t10x_s"), r10,
            q.get("t30x_s"), q.get("b"), q.get("t100x_proj_s"),
        ))
    rows.sort(key=lambda r: -(r[3] or 0))
    print("| query | sf0.1 s | 10x s | ratio | 30x s | b | 100x proj s "
          "| note |")
    print("|---|---|---|---|---|---|---|---|")
    n_flag = 0
    for name, tb, t10, r10, t30, b, proj in rows:
        if r10 >= thresh:
            n_flag += 1
        elif flag_only:
            continue
        t30s = f"{t30:.2f}" if t30 is not None else ""
        bs = f"{b:.2f}" if b is not None else ""
        ps = f"{proj:.0f}" if proj is not None else ""
        mark = " **<-**" if r10 >= thresh else ""
        note = NOTES.get(name, "")
        print(f"| {name} | {tb:.2f} | {t10:.2f} | {r10:.1f}x{mark} "
              f"| {t30s} | {bs} | {ps} | {note} |")
    print(f"\n{len(rows)} queries, {n_flag} at ratio >= {thresh}x")
    missing = [
        name for name, _, _, r10, *_ in rows
        if r10 > 3 and r10 >= thresh and name not in NOTES
    ]
    if missing:
        print("UNANNOTATED >= flag threshold: " + ", ".join(missing))


if __name__ == "__main__":
    main()
