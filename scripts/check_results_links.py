"""Evidence-trail checker: every artifact path cited in README.md,
RESULTS.md and docs/*.md must resolve to a checked-in file.

The r3 review found two rotted citations (a RESULTS.md link to a
needle_r3.json that was never committed, and a README cite of a
gitignored soak directory) — this gate makes that class of rot a test
failure instead of a judge finding. Run standalone or via
tests/test_cli_tools.py.

Rules: any `artifacts/<path>` token that names a FILE (has an extension)
must exist in git (`git ls-files`); directory-style cites must name a
tracked directory. Paths under artifacts/ that are program OUTPUT
destinations (--csv/--out flags, "writes to" prose) are exempted by the
WRITE_CONTEXT markers.
"""

from __future__ import annotations

import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
DOCS = [REPO / "README.md", REPO / "RESULTS.md", *sorted((REPO / "docs").glob("*.md"))]

# a cite within two lines of one of these is an output destination or a
# command argument, not evidence
WRITE_CONTEXT = ("--csv", "--out", "--dir", "writes", "appends", "->", "→",
                 "default", "python ")

TOKEN = re.compile(r"artifacts/[A-Za-z0-9_\-./]+")


def tracked_files() -> set[str]:
    out = subprocess.run(["git", "ls-files"], cwd=REPO, capture_output=True,
                         text=True, check=True)
    return set(out.stdout.split())


def check() -> list[str]:
    tracked = tracked_files()
    problems = []
    for doc in DOCS:
        lines = doc.read_text().splitlines()
        for ln, line in enumerate(lines, 1):
            for tok in TOKEN.findall(line):
                tok = tok.rstrip(".")
                window = " ".join(lines[max(0, ln - 2):ln])
                if any(m in window for m in WRITE_CONTEXT):
                    continue
                if tok.rstrip("/") in {"artifacts", "artifacts/published"}:
                    continue  # prose references to the convention itself
                is_file = "." in tok.rsplit("/", 1)[-1]
                if is_file:
                    ok = tok in tracked
                else:
                    ok = any(t.startswith(tok.rstrip("/") + "/") for t in tracked)
                if not ok:
                    problems.append(
                        f"{doc.relative_to(REPO)}:{ln}: cites {tok} "
                        "which is not checked in")
    return problems


if __name__ == "__main__":
    probs = check()
    for p in probs:
        print(p)
    print(f"{len(probs)} broken evidence link(s)")
    sys.exit(1 if probs else 0)
