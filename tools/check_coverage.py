#!/usr/bin/env python
"""COVERAGE.md lockstep check (VERDICT r6 #10).

COVERAGE.md ends with a GENERATED appendix (between the markers below)
enumerating every declared query name with its oracle/rows-only status.
``python tools/check_coverage.py`` verifies the appendix and the
summary-count line against the live ``queries()`` / ``oracle_sql()``;
``--write`` regenerates the appendix in place. Run as part of any
query-adding commit (also wired as a pytest in
tests/test_evidence_window.py::test_coverage_lockstep).

Exit 0 = in lockstep; exit 1 = drift, with the drift printed.
"""
from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

BEGIN = "<!-- BEGIN GENERATED QUERY APPENDIX (tools/check_coverage.py) -->"
END = "<!-- END GENERATED QUERY APPENDIX -->"
PATH = "/root/repo/COVERAGE.md"


def _appendix(names: list[str], oracle: set[str]) -> str:
    lines = [
        BEGIN,
        "",
        "### Appendix: declared query names (generated — do not hand-edit)",
        "",
        f"{len(names)} queries total; {len(oracle)} oracle-checked, "
        f"{len(names) - len(oracle)} rows-only.",
        "",
    ]
    for n in sorted(names):
        lines.append(f"- `{n}` — {'oracle' if n in oracle else 'rows-only'}")
    lines += ["", END]
    return "\n".join(lines)


def check(write: bool = False) -> list[str]:
    import __spark_entry__ as entry

    names = list(entry.queries().keys())
    oracle = set(entry.oracle_sql())
    text = open(PATH).read()
    want = _appendix(names, oracle)
    problems: list[str] = []
    m = re.search(re.escape(BEGIN) + r".*?" + re.escape(END), text, re.DOTALL)
    if write:
        new = (
            text.replace(m.group(0), want)
            if m
            else text.rstrip() + "\n\n" + want + "\n"
        )
        open(PATH, "w").write(new)
        return []
    if not m:
        return [f"generated appendix missing — run: python {__file__} --write"]
    if m.group(0) != want:
        problems.append(
            "appendix out of date with queries()/oracle_sql() — run: "
            f"python {__file__} --write"
        )
    # every prose summary-count line (not just the appendix's) must agree
    want_counts = (len(names), len(oracle), len(names) - len(oracle))
    for c in re.findall(
        r"(\d+) queries total; (\d+) oracle-checked, (\d+) rows-only", text
    ):
        if tuple(map(int, c)) != want_counts:
            problems.append(
                f"summary-count line says {c}, live is {want_counts}"
            )
    return problems


if __name__ == "__main__":
    write = "--write" in sys.argv
    problems = check(write=write)
    for p in problems:
        print(f"DRIFT: {p}")
    if not problems:
        print(
            "COVERAGE.md appendix "
            + ("regenerated" if write else "in lockstep with queries()/oracle_sql()")
        )
    sys.exit(1 if problems else 0)
