#!/usr/bin/env python
"""Docs gate (reference parity: Documenter doctest build in CI,
/root/reference/.github/workflows/CI.yml:57-97).

Checks every ``docs/*.md``:
  - every ```python fenced block must COMPILE (syntax-valid, so API drift
    that renames a function shows up as soon as a snippet calls it with
    broken syntax; execution is covered by examples/bem_solve.py in CI)
  - every intra-repo markdown link target must exist

Exit code 0 = clean.  Run:  python tools/check_docs.py
"""

from __future__ import annotations

import pathlib
import re
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent
DOCS = ROOT / "docs"

FENCE = re.compile(r"^([ \t]*)```python\n(.*?)^\1```", re.S | re.M)
LINK = re.compile(r"\]\(([^)#]+?)(?:#[^)]*)?\)")


def main() -> int:
    problems = []
    for md in sorted(DOCS.glob("*.md")) + [ROOT / "README.md"]:
        text = md.read_text()
        rel = md.relative_to(ROOT)
        for m in FENCE.finditer(text):
            indent, src = m.group(1), m.group(2)
            if indent:
                src = "\n".join(
                    ln[len(indent):] if ln.startswith(indent) else ln
                    for ln in src.splitlines()
                )
            line = text[: m.start()].count("\n") + 2
            try:
                compile(src, f"{rel}:{line}", "exec")
            except SyntaxError as e:
                problems.append(
                    f"{rel}:{line}: python fence does not compile: {e.msg} "
                    f"(fence line {e.lineno})"
                )
        for m in LINK.finditer(text):
            target = m.group(1)
            if "://" in target or target.startswith("mailto:"):
                continue
            tpath = (md.parent / target).resolve()
            if not tpath.exists():
                problems.append(f"{rel}: broken link -> {target}")
    for p in problems:
        print(p)
    print(f"docs: {len(problems)} problem(s)" if problems else "docs: clean")
    return 1 if problems else 0


if __name__ == "__main__":
    sys.exit(main())
