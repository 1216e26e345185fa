"""The reference HTML→text extractor spec (pure stdlib, deterministic).

This module is the SINGLE source of truth for the "byte-identical extracted
text per url" invariant (BASELINE.json input_hint; SURVEY.md §2.9 V1): the
golden fixtures are produced by calling :func:`extract_text` serially, and
the engine's distributed extraction (``operators.text.extract_text_col``,
a ``mapInPandas`` kernel) calls the same function per Arrow batch. Any two
paths through the engine must therefore produce byte-identical output.

Spec (frozen; do not change without regenerating goldens):

1. Input is raw HTML bytes; decode as UTF-8 with ``errors="replace"``.
2. Drop the content of ``script``, ``style``, ``noscript``, ``template``
   elements entirely. Nesting of a skip tag inside another skip tag is
   handled by a depth counter per tag name.
3. Drop comments, processing instructions, and declarations.
4. Character/entity references are decoded (``&amp;`` → ``&``,
   ``&#x2603;`` → ``☃``) via HTMLParser's ``convert_charrefs``.
5. Block-level boundaries (see ``_BLOCK_TAGS``) — both open and close —
   emit a newline separator; all other tags are invisible (their text
   flows inline).
6. Whitespace normalization: on each line, runs of whitespace (``\\s+``,
   Unicode-aware) collapse to a single ASCII space and the line is
   stripped; empty lines are dropped; lines join with a single ``\\n``.
   No trailing newline.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

_BLOCK_TAGS = frozenset(
    {
        "p", "div", "br", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul",
        "ol", "table", "tr", "td", "th", "blockquote", "pre", "section",
        "article", "header", "footer", "nav", "title", "hr", "body",
        "html", "head", "figure", "figcaption", "main", "aside", "dt", "dd",
    }
)

_SKIP_TAGS = frozenset({"script", "style", "noscript", "template"})

_WS_RUN = re.compile(r"\s+")


class _TextExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._chunks: list[str] = []
        self._skip_depth: dict[str, int] = {t: 0 for t in _SKIP_TAGS}

    def _skipping(self) -> bool:
        return any(d > 0 for d in self._skip_depth.values())

    def handle_starttag(self, tag: str, attrs) -> None:  # noqa: ANN001
        if tag in _SKIP_TAGS:
            self._skip_depth[tag] += 1
        elif tag in _BLOCK_TAGS:
            self._chunks.append("\n")

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS:
            if self._skip_depth[tag] > 0:
                self._skip_depth[tag] -= 1
        elif tag in _BLOCK_TAGS:
            self._chunks.append("\n")

    def handle_startendtag(self, tag: str, attrs) -> None:  # noqa: ANN001
        if tag in _BLOCK_TAGS:
            self._chunks.append("\n")

    def handle_data(self, data: str) -> None:
        if not self._skipping():
            self._chunks.append(data)

    def text(self) -> str:
        lines = []
        for raw_line in "".join(self._chunks).split("\n"):
            line = _WS_RUN.sub(" ", raw_line).strip()
            if line:
                lines.append(line)
        return "\n".join(lines)


def extract_text(html: bytes | str) -> str:
    """Extract visible text from raw HTML per the frozen spec above."""
    if isinstance(html, bytes):
        html = html.decode("utf-8", errors="replace")
    parser = _TextExtractor()
    parser.feed(html)
    parser.close()
    return parser.text()
