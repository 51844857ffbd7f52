"""Opt-in HTML pretty-printer.

Behavior-parity implementation of the reference's ``fast_format_html``
(``utils.py:2157-2201``): a string-level formatter (no parsing) that
puts every tag and every inter-tag text run on its own line with
two-space indentation — closing tags dedent, self-closing tags hold,
any other tag indents.  The reference's quirks are part of the
contract and preserved (differential-tested against the reference
function compiled from source in tests/test_format_html.py):
``>``/``<`` inside quoted attribute values still split lines, comments
and doctypes indent like opening tags, void elements indent.
"""

from __future__ import annotations

_INDENT = "  "


def fast_format_html(html_string: str) -> str:
    lines: list[str] = []
    depth = 0
    # tag/content boundaries exactly as the reference finds them:
    # newline before every '<' and after every '>'
    for piece in html_string.replace(">", ">\n").replace("<", "\n<").split("\n"):
        stripped = piece.strip()
        if not stripped:
            continue
        if piece.startswith("</"):
            depth -= 1
            lines.append(_INDENT * depth + piece)
        elif piece.startswith("<") and piece.endswith("/>"):
            lines.append(_INDENT * depth + piece)
        elif piece.startswith("<"):
            lines.append(_INDENT * depth + piece)
            depth += 1
        else:
            lines.append(_INDENT * depth + stripped)
    return "\n".join(lines)
