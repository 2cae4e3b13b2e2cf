"""Failure-message formatters (plain and ANSI).

Parity with /root/reference/src/datajudge/formatter.py:10-37, minus the
colorama dependency: we emit raw ANSI escapes (cyan background) directly.
"""

from __future__ import annotations

import abc
import re

# example: match = [numDiff]...[/numDiff]
_STYLING_CODES = r"\[(numMatch|numDiff)\](.*?)\[/\1\]"

_ANSI_BACK_CYAN = "\x1b[46m"
_ANSI_BACK_RESET = "\x1b[49m"


class Formatter(abc.ABC):
    def __init__(self):
        self._known_bb_pattern = re.compile(_STYLING_CODES)

    def _apply_formatting(self, style: str, inner: str) -> str:
        # The default formatter strips styling codes.
        return inner

    def fmt_str(self, string: str) -> str:
        return self._known_bb_pattern.sub(
            lambda m: self._apply_formatting(m.group(1), m.group(2)), string
        )


class AnsiColorFormatter(Formatter):
    def _apply_formatting(self, style: str, inner: str) -> str:
        if style == "numDiff":
            return f"{_ANSI_BACK_CYAN}{inner}{_ANSI_BACK_RESET}"
        return inner
