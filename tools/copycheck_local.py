#!/usr/bin/env python
"""Local similarity sweep vs the reference repo (difflib ratio).

The per-round COPYCHECK artifact has produced `flagged: []` even though
the driver-side comparison layer intentionally ports the BSD-3 reference's
verdict semantics (attributed in NOTICE).  This tool is the verifiable
replacement: it diffs every repo python file against every reference
python file and prints the max ratio per repo file, so the NOTICE
attribution list can be checked mechanically:

    python tools/copycheck_local.py            # table of files >= 0.5
    python tools/copycheck_local.py --all      # every file's best match
    python tools/copycheck_local.py --check-notice   # exit 1 if a file
        # >= FLAG_THRESHOLD is missing from NOTICE's derived-file list

Method: difflib.SequenceMatcher.ratio() over whitespace-normalized,
comment-stripped source lines — the same metric class the round brief
describes (">60% similarity").  quick_ratio prefilters for speed.
"""

from __future__ import annotations

import argparse
import difflib
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
FLAG_THRESHOLD = 0.6

# Directories NOTICE names as derived from the reference (BSD-3,
# attribution in NOTICE/LICENSE). A flagged file under these is
# disclosed; a flagged file elsewhere is a finding.
NOTICE_DERIVED_PREFIXES = (
    "datajudge_spark/constraints/",
    "datajudge_spark/utils.py",
    "datajudge_spark/formatter.py",
    "datajudge_spark/condition.py",
    # API surface (signatures + docstrings) follows the reference so
    # specs port verbatim; bodies are Spark-native. Disclosed in NOTICE.
    "datajudge_spark/requirements.py",
)


def _source_lines(path: str) -> list[str]:
    try:
        with open(path, encoding="utf-8", errors="replace") as fh:
            raw = fh.read()
    except OSError:
        return []
    lines = []
    for line in raw.splitlines():
        stripped = line.strip()
        if not stripped or stripped.startswith("#"):
            continue
        lines.append(" ".join(stripped.split()))
    return lines


def _collect(root: str, exts: tuple[str, ...]) -> dict[str, list[str]]:
    out: dict[str, list[str]] = {}
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames[:] = [
            d
            for d in dirnames
            if d not in {".git", "__pycache__", ".pytest_cache", "node_modules"}
        ]
        for fn in filenames:
            if fn.endswith(exts):
                full = os.path.join(dirpath, fn)
                rel = os.path.relpath(full, root)
                lines = _source_lines(full)
                if len(lines) >= 10:  # skip trivial files
                    out[rel] = lines
    return out


def sweep() -> list[tuple[str, float, str]]:
    repo_files = {
        rel: lines
        for rel, lines in _collect(REPO, (".py",)).items()
        if not rel.startswith(("tests/", "tools/", "docs/"))
    }
    # reference is multi-language; compare against any source-like file
    ref_files = _collect(
        REFERENCE, (".py", ".rs", ".cpp", ".cc", ".go", ".java", ".sql")
    )
    results = []
    for rel, lines in sorted(repo_files.items()):
        best_ratio, best_ref = 0.0, ""
        for ref_rel, ref_lines in ref_files.items():
            # line-level matching: O(lines^2), not O(chars^2) — whole-file
            # char-level ratio() on multi-thousand-line files is minutes
            # per pair; line granularity is what "copied blocks" means
            sm = difflib.SequenceMatcher(None, lines, ref_lines, autojunk=False)
            if sm.real_quick_ratio() <= best_ratio or sm.quick_ratio() <= best_ratio:
                continue
            r = sm.ratio()
            if r > best_ratio:
                best_ratio, best_ref = r, ref_rel
        results.append((rel, best_ratio, best_ref))
    return results


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--all", action="store_true", help="print every file")
    ap.add_argument(
        "--check-notice",
        action="store_true",
        help="fail if a flagged file is not disclosed in NOTICE",
    )
    args = ap.parse_args()

    results = sweep()
    undisclosed = []
    print(f"{'repo file':55s} {'ratio':>6s}  best reference match")
    for rel, ratio, ref_rel in sorted(results, key=lambda t: -t[1]):
        flagged = ratio >= FLAG_THRESHOLD
        if flagged or args.all:
            mark = "FLAG" if flagged else "    "
            print(f"{rel:55s} {ratio:6.2f}  {mark} {ref_rel}")
        if flagged and not rel.startswith(NOTICE_DERIVED_PREFIXES):
            undisclosed.append((rel, ratio, ref_rel))

    n_flagged = sum(1 for _, r, _ in results if r >= FLAG_THRESHOLD)
    print(
        f"\n{len(results)} files swept, {n_flagged} >= {FLAG_THRESHOLD} "
        f"(all must be in NOTICE's derived-file list)"
    )
    if undisclosed:
        print("UNDISCLOSED similarity (add to NOTICE or rewrite):")
        for rel, ratio, ref_rel in undisclosed:
            print(f"  {rel} {ratio:.2f} vs {ref_rel}")
        if args.check_notice:
            return 1
    elif args.check_notice:
        print("NOTICE disclosure check: OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
