"""NOTICE/disclosure invariant: every repo file whose similarity to a
reference file is >= the flag threshold must be in NOTICE's derived-file
list (tools/copycheck_local.py's NOTICE_DERIVED_PREFIXES).

Runs the sweep as CI so the disclosure list cannot drift: a new file
that crosses the threshold either gets disclosed deliberately or
rewritten — never shipped silently (VERDICT r5 hygiene item).
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_flagged_similarity_is_disclosed_in_notice():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "copycheck_local.py"),
         "--check-notice"],
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, (
        "copycheck --check-notice failed — a file >= 0.6 similarity to "
        "the reference is not in NOTICE's derived list:\n"
        + proc.stdout + proc.stderr
    )
    assert "NOTICE disclosure check: OK" in proc.stdout
