"""Failure-message markup rendering.

Failure messages carry lightweight BB-style tags around the digits that
differ between factual and target values (``[numDiff]...[/numDiff]``,
``[numMatch]...[/numMatch]`` — written by ``utils.format_difference``).
A formatter decides how those tags render: the plain ``Formatter``
erases them (log files, CI output), ``AnsiColorFormatter`` highlights
the differing digits with a cyan background (interactive terminals).

Tag vocabulary is reference-compatible
(/root/reference/src/datajudge/formatter.py) so messages written by
either engine render identically; the implementation is a table-driven
regex substitution with raw ANSI escapes instead of a colorama
dependency.
"""

from __future__ import annotations

import re

_TAGGED = re.compile(r"\[(numMatch|numDiff)\](.*?)\[/\1\]")

# style tag -> (prefix, suffix) escape pair; missing tags render bare
_ANSI_STYLES = {
    "numDiff": ("\x1b[46m", "\x1b[49m"),  # cyan background on/off
}


class Formatter:
    """Renders messages for plain destinations: tags are erased, the
    inner text stays."""

    _styles: dict[str, tuple[str, str]] = {}

    def fmt_str(self, string: str) -> str:
        def render(match: re.Match) -> str:
            tag, inner = match.group(1), match.group(2)
            wrap = self._styles.get(tag)
            if wrap is None:
                return inner
            return f"{wrap[0]}{inner}{wrap[1]}"

        return _TAGGED.sub(render, string)


class AnsiColorFormatter(Formatter):
    """Renders for interactive terminals: differing digits get a cyan
    background, matching digits stay bare."""

    _styles = _ANSI_STYLES
