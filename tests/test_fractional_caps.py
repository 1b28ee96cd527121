"""Static guard: every FRACTIONAL scale knob needs an ABSOLUTE
companion bound.

The %-of-corpus trap has bitten twice (r5: the knn-graph ingest batch
sized as a corpus fraction made batch-vs-base scoring quadratic in
replica size; r6: doc_similarity_sparse's df <= 5%-only pruning let
posting lists grow WITH the corpus — 75 GB of shuffle spill at the
30x probe). CLAUDE.md records the generalization: any cap, batch
size, or prune threshold expressed as a FRACTION of the input turns
a bounded join quadratic at scale, so every fractional knob needs an
absolute companion (df <= 500, fixed batch rows, ...) mirrored in
the oracle.

This test makes the trap unlandable: it scans every non-test source
line in dbeam_spark/ for fractional-cap signatures (a comparison
against `fraction * x`, a column scaled up and compared to a
corpus-size name, a `size // N` style cut) and fails unless the hit
either (a) carries an absolute integer companion bound on the same
or the next two lines, or (b) is a listed exemption with a written
justification (semantic fractions — EWMA coefficients, share
predicates over per-key aggregates, decile grids — are not scale
knobs). Dead exemptions fail too, so the list can't rot.
"""

from __future__ import annotations

import re
from pathlib import Path

PKG = Path(__file__).resolve().parent.parent / "dbeam_spark"

# names that denote "how big the input is" — growing this list is the
# expected maintenance when a new corpus-size alias appears
SIZEY = (
    r"(n_docs|n_rows|n_total|total_docs|total_rows|corpus|n_corpus"
    r"|n_events|n_users|n_vecs|n_ids|num_docs|doc_count|row_count)"
)

PATTERNS = {
    # `x <= 0.05 * something` / `x < .1 * something`
    "cmp-frac-times": re.compile(r"(<=?|>=?)\s*0?\.\d+\s*\*"),
    # `0.05 * something <= x`
    "times-frac-cmp": re.compile(r"\*\s*0?\.\d+\s*(<=?|>=?)"),
    # integer-multiply form of a fraction: `col * 20 <= ... n_docs`
    "scaled-vs-sizey": re.compile(
        r"\*\s*\d+(\.\d+)?\s*<=?\s*[^,\n]*" + SIZEY, re.I
    ),
    # `x <= n_docs // 20` / `... n_docs DIV 20`
    "sizey-div": re.compile(
        r"(<=?|>=?)\s*[^,\n]{0,40}" + SIZEY
        + r"[^,\n]{0,20}(//|\bDIV\b|/)\s*\d+",
        re.I,
    ),
}

# an absolute companion: a comparison against a bare integer literal
# of >= 2 digits (df <= 500, cnt <= 1000, LEAST(x, 500), cap rows)
ABS_COMPANION = re.compile(
    r"(<=?\s*\d{2,9}\b|\bF\.least\(|\bLEAST\s*\(|\blimit\s*\(\s*\d)",
    re.I,
)

# (filename, distinctive substring) -> justification. A fraction here
# is SEMANTIC — it defines the answer, it does not bound a join or a
# batch — so no absolute companion is required.
EXEMPT: dict[tuple[str, str], str] = {
    ("events.py", "0.3 * x + 0.7 * acc"):
        "EWMA recurrence coefficients (alpha/1-alpha), not a cap",
    ("streaming.py", "0.3 * x + 0.7 * acc"):
        "EWMA recurrence coefficients (alpha/1-alpha), not a cap",
    ("llm.py", "(d.n_docs * d.decile) // 10"):
        "vocab_growth_curve's decile GRID: the x-axis of the curve, "
        "a linear scan cut, not a join/batch bound",
    ("tpch.py", "0.5 * tq"):
        "q20 semantics: share-of-total predicate over a per-partkey "
        "aggregate (tq is one part's total, not the corpus)",
    ("tpch.py", '0.5 * F.col("tq")'):
        "q20 semantics (Spark twin of the 0.5 * tq predicate)",
}


def _scan() -> tuple[list[str], set[tuple[str, str]]]:
    bad: list[str] = []
    used: set[tuple[str, str]] = set()
    for f in sorted(PKG.rglob("*.py")):
        lines = f.read_text().splitlines()
        for i, line in enumerate(lines):
            if not any(p.search(line) for p in PATTERNS.values()):
                continue
            exempt_hit = next(
                (
                    key
                    for key in EXEMPT
                    if key[0] == f.name and key[1] in line
                ),
                None,
            )
            if exempt_hit:
                used.add(exempt_hit)
                continue
            window = "\n".join(lines[i: i + 3])
            if ABS_COMPANION.search(window):
                continue
            bad.append(f"{f.relative_to(PKG.parent)}:{i + 1}: "
                       f"{line.strip()[:100]}")
    return bad, used


def test_fractional_caps_have_absolute_companions():
    bad, _ = _scan()
    assert not bad, (
        "fractional cap(s) without an absolute companion bound "
        "(the %-of-corpus trap, CLAUDE.md). Either add an absolute "
        "integer bound on the same/next lines (mirrored in the "
        "oracle!) or add a justified EXEMPT entry:\n" + "\n".join(bad)
    )


def test_exemption_list_is_live():
    _, used = _scan()
    dead = set(EXEMPT) - used
    assert not dead, f"dead exemptions (code moved/removed): {dead}"


def test_detector_catches_a_bare_fractional_cap(tmp_path):
    """The scanner itself is testable: a planted bare fractional cap
    must be flagged, and adding an absolute companion clears it."""
    bare = '    cand = df_.filter(F.col("df") * 20 <= F.col("n_docs"))'
    assert any(p.search(bare) for p in PATTERNS.values())
    assert not ABS_COMPANION.search(bare)
    fixed = bare[:-1] + ' & (F.col("df") <= 500))'
    assert ABS_COMPANION.search(fixed)
