"""Duplicate-key lint for tools/scale_notes.py (r9 ADVICE #1).

In a dict literal the LATER duplicate silently wins, so a stale note
left lower in the file shadows a fresh one written at the top — the
r9 multimodal_png_decode note was dead on arrival this way. Parse the
module AST and fail on any duplicated literal key.
"""

from __future__ import annotations

import ast
import os
from collections import Counter

_PATH = os.path.join(
    os.path.dirname(__file__), "..", "tools", "scale_notes.py"
)


def test_notes_dict_has_no_duplicate_keys():
    tree = ast.parse(open(_PATH).read())
    dup_reports = []
    for node in ast.walk(tree):
        if isinstance(node, ast.Dict):
            keys = [
                k.value
                for k in node.keys
                if isinstance(k, ast.Constant) and isinstance(k.value, str)
            ]
            dup_reports.extend(
                k for k, c in Counter(keys).items() if c > 1
            )
    assert not dup_reports, (
        f"duplicate NOTES keys (later entry silently shadows the "
        f"earlier one): {dup_reports}"
    )
