#!/usr/bin/env python
"""Doc-citation integrity checker (VERDICT r04 weak #5).

Scans the repo's markdown doc trail for backtick-quoted citations of
the forms `path/file.py`, `path/file.py::symbol`, `file.py:123`,
`file.py:10-20` and verifies each resolves somewhere legitimate:

  - against the repo working tree (repo-root or pointseg/-relative —
    PARITY.md cites package-relative paths);
  - against the read-only reference mount (spec citations like
    `common.py:37-71`; skipped when /root/reference is absent).

A citation passes if ANY candidate file satisfies every constraint it
carries (symbol present for ::symbol, line within file for :line —
several reference files share basenames, e.g. the two train_model.py).

Exit 0 iff no dangling citation:  python tools/check_citations.py
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = os.environ.get("POINTSEG_REFERENCE", "/root/reference")

DOCS = ["PARITY.md", "README.md", "BENCHMARKS.md", "SURVEY.md",
        "CLAUDE.md"] + [
    os.path.join("docs", f)
    for f in sorted(os.listdir(os.path.join(REPO, "docs")))
    if f.endswith(".md")
]

# `path/to/file.ext` optionally followed by ::symbol and/or :line(-line)
_CITE = re.compile(
    r"`([A-Za-z0-9_./-]+\.(?:py|md|cpp|json|log|npz|txt|sh|jsonl))"
    r"(?:::([A-Za-z_][A-Za-z0-9_.]*))?(?::(\d+))?(?:[-–](\d+))?`"
)


def _reference_candidates(rel: str) -> list[str]:
    """All same-basename files in the reference checkout."""
    if not os.path.isdir(REFERENCE):
        return []
    out = []
    direct = os.path.join(REFERENCE, rel)
    if os.path.isfile(direct):
        out.append(direct)
    base = os.path.basename(rel)
    for root, dirs, files in os.walk(REFERENCE):
        dirs[:] = [d for d in dirs if not d.startswith(".")]
        if base in files:
            p = os.path.join(root, base)
            if p not in out:
                out.append(p)
    return out


def _satisfies(path: str, symbol: str | None, line_s: str | None) -> bool:
    if symbol and path.endswith(".py"):
        src = open(path, encoding="utf-8", errors="replace").read()
        leaf = symbol.split(".")[-1]
        if not re.search(rf"^\s*(?:def|class)\s+{re.escape(leaf)}\b",
                         src, re.M) and leaf not in src:
            return False
    if line_s and path.endswith((".py", ".cpp")):
        n_lines = sum(1 for _ in open(path, errors="replace"))
        if int(line_s) > n_lines:
            return False
    return True


def check_doc(doc: str) -> list[str]:
    problems = []
    path = os.path.join(REPO, doc)
    if not os.path.exists(path):
        return [f"{doc}: doc itself missing"]
    text = open(path, encoding="utf-8").read()
    for m in _CITE.finditer(text):
        rel, symbol, line_s, _line_e = m.groups()
        where = f"{doc}: `{m.group(0).strip('`')}`"
        candidates = [
            p for p in (os.path.join(REPO, rel),
                        os.path.join(REPO, "pointseg", rel))
            if os.path.isfile(p)
        ]
        ref_cands = _reference_candidates(rel)
        if not candidates and not ref_cands:
            # bare filenames in prose (meta.json, ...) aren't repo-root
            # citations; only flag paths that look intentional
            if "/" in rel or rel.startswith(
                    ("test_", "tools", "docs", "pointseg", "native")):
                problems.append(f"{where} — file not found")
            continue
        if ref_cands and not candidates and not (symbol or line_s):
            continue  # plain reference-file mention, exists
        if any(_satisfies(p, symbol, line_s)
               for p in candidates + ref_cands):
            continue
        constraint = (f"symbol {symbol!r}" if symbol else
                      f"line {line_s}")
        problems.append(
            f"{where} — {constraint} not satisfied by any of "
            f"{len(candidates + ref_cands)} candidate file(s)")
    return problems


def main() -> int:
    all_problems = []
    for doc in DOCS:
        all_problems += check_doc(doc)
    for p in all_problems:
        print(f"DANGLING  {p}")
    print(f"{len(all_problems)} dangling citation(s) across {len(DOCS)} docs")
    return 1 if all_problems else 0


if __name__ == "__main__":
    sys.exit(main())
