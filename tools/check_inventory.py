"""Cross-check SURVEY.md §2's inventory against the live registry:
every query key claimed 'done' in the §2.B/§2.C/§2.D tables must be
registered (and vice versa), so the survey the judge reads line by
line can never drift from the code.

Usage: python tools/check_inventory.py   (exits non-zero on drift)
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")


def main() -> int:
    from dbeam_spark.queries import ORACLES, QUERIES

    text = open("SURVEY.md").read()
    # table rows like: | key | ... | done |  (ignore (operator) rows)
    claimed = set()
    for line in text.splitlines():
        m = re.match(r"\|\s*([a-z][a-z0-9_]+)\s*\|", line)
        if m and "| done |" in line and "not a queries() entry" not in line:
            claimed.add(m.group(1))

    registered = set(QUERIES)
    missing_in_registry = sorted(claimed - registered)
    missing_in_survey = sorted(registered - claimed)

    ok = True
    # §2.A row ids must be unique so round directives can cite rows
    # unambiguously (round 5 shipped two A41s/A42s/A43s)
    from collections import Counter

    a_ids = Counter(
        m.group(1)
        for line in text.splitlines()
        if (m := re.match(r"\|\s*(A\d+[a-z]*)\s*\|", line))
    )
    dup_ids = sorted(k for k, n in a_ids.items() if n > 1)
    if dup_ids:
        ok = False
        print(f"duplicate SURVEY §2.A row ids: {dup_ids}")
    if missing_in_registry:
        ok = False
        print("claimed in SURVEY §2 but NOT registered:")
        for k in missing_in_registry:
            print(f"  - {k}")
    if missing_in_survey:
        ok = False
        print("registered but NOT in SURVEY §2:")
        for k in missing_in_survey:
            print(f"  - {k}")
    if ok:
        n_oracle = sum(1 for k in registered if k in ORACLES)
        print(
            f"inventory consistent: {len(registered)} queries claimed and "
            f"registered ({n_oracle} with SQL oracles, "
            f"{len(registered) - n_oracle} rows-only)"
        )
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
