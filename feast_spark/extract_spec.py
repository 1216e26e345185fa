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
        return _finalize(self._chunks)


def _slow_extract(html: str) -> str:
    parser = _TextExtractor()
    parser.feed(html)
    parser.close()
    return parser.text()


# ---------------------------------------------------------------------
# Fast path: a hand-rolled mirror of HTMLParser.goahead(end=True) for the
# events _TextExtractor consumes (tag kind+name, data, charrefs). It
# REUSES the stdlib's own compiled regexes so tokenization is
# bit-identical, and skips the per-tag attribute parse/bookkeeping the
# extractor never looks at (~4× less CPU — this is >half the cost of the
# materialization hot path). Any construct whose EOF/tolerant handling is
# intricate (incomplete tags, marked sections, unterminated comments)
# returns None and the stdlib parser takes over, so equivalence holds by
# construction on the bail paths and is property-tested on the rest
# (tests/test_extract.py::test_fast_path_equals_htmlparser).
# ---------------------------------------------------------------------
from html import unescape as _unescape  # noqa: E402  (stdlib, same as parser)
from html.parser import (  # noqa: E402  — the parser's own tokenizer regexes
    commentclose as _commentclose,
    endtagfind as _endtagfind,
    locatestarttagend_tolerant as _locatestarttagend,
    starttagopen as _starttagopen,
    tagfind_tolerant as _tagfind,
)

_CDATA_ELEMS = ("script", "style")  # HTMLParser.CDATA_CONTENT_ELEMENTS
_CDATA_CLOSE = {
    t: re.compile(r"</\s*%s\s*>" % t, re.IGNORECASE) for t in _CDATA_ELEMS
}
_ATTR_CHARS = frozenset(
    "abcdefghijklmnopqrstuvwxyz=/ABCDEFGHIJKLMNOPQRSTUVWXYZ"
)


def _fast_extract(rawdata: str) -> str | None:
    """Mirror of feed(rawdata)+close() through _TextExtractor; None → the
    caller must use the stdlib parser."""
    n = len(rawdata)
    i = 0
    chunks: list[str] = []
    skip_depth = dict.fromkeys(_SKIP_TAGS, 0)
    skipping = 0  # sum of depths (cheaper than any())
    cdata_elem: str | None = None

    def on_start(tag: str) -> None:
        nonlocal skipping, cdata_elem
        if tag in _SKIP_TAGS:
            skip_depth[tag] += 1
            skipping += 1
            if tag in _CDATA_ELEMS:
                cdata_elem = tag
        elif tag in _BLOCK_TAGS:
            chunks.append("\n")

    def on_end(tag: str) -> None:
        nonlocal skipping
        if tag in _SKIP_TAGS:
            if skip_depth[tag] > 0:
                skip_depth[tag] -= 1
                skipping -= 1
        elif tag in _BLOCK_TAGS:
            chunks.append("\n")

    while i < n:
        if cdata_elem is not None:
            # goahead in cdata mode: interesting = </\s*elem\s*> (3.11);
            # content before the close is data (always skipped — a cdata
            # elem is by definition an open skip tag); EOF inside cdata
            # silently drops the tail (close() never flushes cdata)
            m = _CDATA_CLOSE[cdata_elem].search(rawdata, i)
            if m is None:
                return _finalize(chunks)
            i = m.start()
            # parse_endtag: endtagfind matches here by construction
            em = _endtagfind.match(rawdata, i)
            if em is None:  # pragma: no cover — cannot happen
                return None
            on_end(em.group(1).lower())
            cdata_elem = None
            i = em.end()
            continue
        j = rawdata.find("<", i)
        if j < 0:
            j = n
        if i < j:
            if not skipping:
                seg = rawdata[i:j]
                chunks.append(_unescape(seg) if "&" in seg else seg)
            i = j
        if i == n:
            break
        # dispatch on the construct at '<' (goahead order)
        if _starttagopen.match(rawdata, i):
            m = _locatestarttagend.match(rawdata, i)
            j = m.end()
            nxt = rawdata[j : j + 1]
            if nxt == ">":
                endpos = j + 1
            elif nxt == "/" and rawdata.startswith("/>", j):
                endpos = j + 2
            elif nxt == "" or nxt == "/" or nxt in _ATTR_CHARS:
                return None  # EOF/buffer-boundary tolerant paths: bail
            else:
                # bogus input: parse_starttag will emit the tag source as
                # data and continue — rare; bail to the reference parser
                return None
            tm = _tagfind.match(rawdata, i + 1)
            tag = tm.group(1).lower()
            k = tm.end()
            if k not in (endpos - 1, endpos - 2):
                # the tag has attributes: HTMLParser runs attrfind and
                # only treats the tag as a tag if the attr loop consumes
                # everything; replicate by checking the leftover is
                # attr-shaped via the stdlib's own locator (already
                # matched) — the only divergence risk is an attr loop
                # that stalls, which needs quote tricks; bail on quotes
                # immediately followed by non-separators is intricate, so
                # just verify no stray quote butts against '>':
                seg = rawdata[k : endpos - 1]
                if seg and seg.strip(" \t\n\r\f/") and (
                    '"' in seg or "'" in seg
                ) and not _ATTRS_OK.match(seg):
                    return None
            if rawdata.startswith("/>", endpos - 2):
                # handle_startendtag: newline for block tags only; no
                # skip-depth change, no cdata
                if tag in _BLOCK_TAGS:
                    chunks.append("\n")
            else:
                on_start(tag)
            i = endpos
        elif rawdata.startswith("</", i):
            em = _endtagfind.match(rawdata, i)
            if em:
                on_end(em.group(1).lower())
                i = em.end()
                continue
            if rawdata.startswith("</>", i):
                i += 3
                continue
            nm = _tagfind.match(rawdata, i + 2)
            if nm:
                gtpos = rawdata.find(">", nm.end())
                if gtpos < 0:
                    return None
                on_end(nm.group(1).lower())
                i = gtpos + 1
                continue
            # bogus comment </ + non-letter: content to '>' is dropped
            gtpos = rawdata.find(">", i + 2)
            if gtpos < 0:
                return None
            i = gtpos + 1
        elif rawdata.startswith("<!--", i):
            m = _commentclose.search(rawdata, i + 4)
            if m is None:
                return None
            i = m.end()
        elif rawdata.startswith("<?", i):
            gtpos = rawdata.find(">", i + 2)
            if gtpos < 0:
                return None
            i = gtpos + 1
        elif rawdata.startswith("<!", i):
            if rawdata.startswith("<![", i):
                return None  # marked section (rare): bail
            if rawdata[i : i + 9].lower() == "<!doctype":
                gtpos = rawdata.find(">", i + 9)
            else:
                gtpos = rawdata.find(">", i + 2)  # bogus comment
            if gtpos < 0:
                return None
            i = gtpos + 1
        elif i + 1 < n:
            if not skipping:
                chunks.append("<")
            i += 1
        else:  # lone '<' at EOF: close() flushes it as data
            if not skipping:
                chunks.append("<")
            i += 1
    return _finalize(chunks)


# conservative attr-shape check used only when a tag carries quotes:
# sequences of name[=value] with quoted or bare values (the exact subset
# attrfind_tolerant is guaranteed to consume without stalling)
_ATTRS_OK = re.compile(
    r"""^(?:\s*[^\s/=>"']+(?:\s*=\s*(?:"[^"]*"|'[^']*'|[^>\s"']*))?[\s/]*)*$"""
)


_NL_RUN = re.compile(r"\s*\n\s*")  # any ws run containing a newline
_SP_RUN = re.compile(r"[^\S\n]+")  # ws runs without newlines


def _finalize(chunks: list[str]) -> str:
    """Whitespace normalization (spec step 6) in two C-level passes:
    runs containing a newline → one "\\n" (collapses blank lines and
    strips line edges at once), remaining ws runs → one space, then strip
    the document edges. Line-for-line equivalent to splitting on "\\n",
    collapsing ``\\s+`` per line, stripping, and dropping empties
    (property-checked in tests/test_extract.py)."""
    s = "".join(chunks)
    return _SP_RUN.sub(" ", _NL_RUN.sub("\n", s)).strip()


# ---------------------------------------------------------------------
# Tier-0: one alternation that matches the COMMON constructs (plain
# start/end tags with well-formed attrs, comments, doctype) with
# sub-patterns CHOSEN STRICTLY NARROWER than the stdlib's tolerant
# regexes — any input where they could diverge simply fails to match and
# the document drops to the careful tier. The per-attr separator
# (?:\s|/(?!>))* is copied verbatim from tagfind/attrfind so the
# start-vs-startend ('/>') boundary is decided identically.
# ---------------------------------------------------------------------
_SEP = r"(?:\s|/(?!>))*"
_SIMPLE_TOKEN = re.compile(
    r"<(?P<close>/)?(?P<tag>[a-zA-Z][-.a-zA-Z0-9:_]*)" + _SEP
    + r"(?P<attrs>(?:[^\s/=>\"'][^\s/=>]*(?:\s*=\s*"
    + r"(?:\"[^\"]*\"|'[^']*'|[^>\s\"']*))?" + _SEP + r")*)"
    + r"\s*(?P<self>/?)>"
    + r"|(?P<comment><!--(?:[^-]|-(?!-\s*>))*--\s*>)"
    + r"|(?P<doctype><![Dd][Oo][Cc][Tt][Yy][Pp][Ee][^>]*>)"
)


def _fastest_extract(rawdata: str) -> str | None:
    n = len(rawdata)
    i = 0
    chunks: list[str] = []
    skip_depth = dict.fromkeys(_SKIP_TAGS, 0)
    skipping = 0
    append = chunks.append
    find = rawdata.find
    token = _SIMPLE_TOKEN.match
    while i < n:
        j = find("<", i)
        if j < 0:
            j = n
        if i < j:
            if not skipping:
                seg = rawdata[i:j]
                append(_unescape(seg) if "&" in seg else seg)
            i = j
        if i == n:
            break
        m = token(rawdata, i)
        if m is None:
            return None  # uncommon construct: whole doc → careful tier
        close, tag, attrs, selfc = m.group("close", "tag", "attrs", "self")
        if tag is not None:
            tag = tag.lower()
            if close:
                if attrs or selfc:
                    return None  # tolerant end-tag paths → careful tier
                if tag in _SKIP_TAGS:
                    if skip_depth[tag] > 0:
                        skip_depth[tag] -= 1
                        skipping -= 1
                elif tag in _BLOCK_TAGS:
                    append("\n")
                i = m.end()
            elif selfc:
                if tag in _BLOCK_TAGS:  # startendtag: no skip/cdata
                    append("\n")
                i = m.end()
            else:
                i = m.end()
                if tag in _SKIP_TAGS:
                    skip_depth[tag] += 1
                    skipping += 1
                    if tag in _CDATA_ELEMS:
                        c = _CDATA_CLOSE[tag].search(rawdata, i)
                        if c is None:  # EOF in cdata: tail never flushes
                            return _finalize(chunks)
                        em = _endtagfind.match(rawdata, c.start())
                        if em is None:  # pragma: no cover
                            return None
                        skip_depth[tag] -= 1
                        skipping -= 1
                        i = em.end()
                elif tag in _BLOCK_TAGS:
                    append("\n")
        else:
            i = m.end()  # comment / doctype: no event
    return _finalize(chunks)


def extract_text(html: bytes | str) -> str:
    """Extract visible text from raw HTML per the frozen spec above.

    Three byte-identical tiers: a single-regex tokenizer for common
    constructs, the careful goahead mirror for the rest, and the
    reference HTMLParser as the final authority — each tier declines
    anything it cannot reproduce exactly (property-tested)."""
    if isinstance(html, bytes):
        html = html.decode("utf-8", errors="replace")
    out = _fastest_extract(html)
    if out is None:
        out = _fast_extract(html)
    if out is None:
        return _slow_extract(html)
    return out
