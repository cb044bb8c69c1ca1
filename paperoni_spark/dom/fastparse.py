"""Single-shot HTML tokenizer driving the same tree builder as parser.py.

``html.parser.HTMLParser`` is built for incremental feeding: every token pays
for ``updatepos`` bookkeeping, ``rawdata`` re-slicing, and partial-buffer
checks.  Documents arrive here whole (reassembled from spans), so this module
re-implements the tokenizer loop single-shot — **reusing CPython's own
compiled regexes** (``tagfind_tolerant``, ``attrfind_tolerant``,
``locatestarttagend_tolerant``, ``endtagfind``) and mirroring
``HTMLParser.goahead``'s dispatch and error-recovery behavior token for
token, including the quirks (bogus comments, marked sections, malformed
start tags emitted as data, unterminated rawtext dropped).

Parity with the stdlib driver is enforced by ``tests/test_fastparse_diff.py``
(fixture + synthetic corpora + hypothesis fuzz must build identical DOMs).
"""

from __future__ import annotations

import re
from html import unescape
from html.parser import (
    attrfind_tolerant,
    endtagfind,
    locatestarttagend_tolerant,
    tagfind_tolerant,
)

_CDATA_CLOSE: dict[str, re.Pattern] = {}
_MARKED_CLOSE = re.compile(r"]\s*]\s*>")
_MS_MARKED_CLOSE = re.compile(r"]\s*>")
_DECLNAME = re.compile(r"[a-zA-Z][-_.a-zA-Z0-9]*\s*")
_ATTR_TAIL = frozenset("abcdefghijklmnopqrstuvwxyz=/ABCDEFGHIJKLMNOPQRSTUVWXYZ")


def _cdata_close_re(name: str) -> re.Pattern:
    pat = _CDATA_CLOSE.get(name)
    if pat is None:
        pat = re.compile(r"</\s*%s" % name, re.IGNORECASE)
        _CDATA_CLOSE[name] = pat
    return pat


def fast_feed(builder, rawdata: str) -> None:
    """Tokenize the whole document, dispatching to builder.handle_*.

    Equivalent to ``HTMLParser.feed(rawdata); close()`` tokenization with
    ``convert_charrefs=True`` (the builder's configuration)."""
    i = 0
    n = len(rawdata)
    find = rawdata.find
    startswith = rawdata.startswith
    while i < n:
        in_cdata = builder._raw_elem is not None
        if in_cdata:
            m = _cdata_close_re(builder._raw_elem.name).search(rawdata, i)
            if m is None:
                # stdlib drops unterminated rawtext (goahead breaks without
                # emitting); _TreeBuilder.close() flushes the buffered part
                break
            j = m.start()
            if i < j:
                builder.handle_data(rawdata[i:j])
            i = j
            k = _parse_endtag(builder, rawdata, i)
        else:
            j = find("<", i)
            if j < 0:
                j = n
            if i < j:
                chunk = rawdata[i:j]
                builder.handle_data(unescape(chunk) if "&" in chunk else chunk)
            i = j
            if i == n:
                break
            nxt = rawdata[i + 1 : i + 2]
            if nxt.isalpha() and nxt.isascii():
                k = _parse_starttag(builder, rawdata, i)
            elif nxt == "/":
                k = _parse_endtag(builder, rawdata, i)
            elif startswith("<!--", i):
                k = _parse_comment(builder, rawdata, i)
            elif nxt == "?":
                k = find(">", i + 2)
                k = -1 if k < 0 else k + 1  # handle_pi is a no-op
            elif nxt == "!":
                k = _parse_html_declaration(builder, rawdata, i)
            elif i + 1 < n:
                builder.handle_data("<")
                k = i + 1
            else:
                builder.handle_data("<")
                break
        if k < 0:
            # goahead(end=1) recovery for unterminated constructs
            k = find(">", i + 1)
            if k < 0:
                k = find("<", i + 1)
                if k < 0:
                    k = i + 1
            else:
                k += 1
            if builder._raw_elem is not None:
                builder.handle_data(rawdata[i:k])
            else:
                builder.handle_data(unescape(rawdata[i:k]))
        i = k


_COMMENT_CLOSE = re.compile(r"--\s*>")


def _parse_comment(builder, rawdata: str, i: int) -> int:
    match = _COMMENT_CLOSE.search(rawdata, i + 4)
    if match is None:
        return -1
    builder.handle_comment(rawdata[i + 4 : match.start()])
    return match.end()


def _parse_html_declaration(builder, rawdata: str, i: int) -> int:
    if rawdata[i : i + 3] == "<![":
        return _parse_marked_section(builder, rawdata, i)
    if rawdata[i : i + 9].lower() == "<!doctype":
        gtpos = rawdata.find(">", i + 9)
        if gtpos == -1:
            return -1
        builder.handle_decl(rawdata[i + 2 : gtpos])
        return gtpos + 1
    # bogus comment (html5 bogus-comment state)
    pos = rawdata.find(">", i + 2)
    if pos == -1:
        return -1
    builder.handle_comment(rawdata[i + 2 : pos])
    return pos + 1


def _parse_marked_section(builder, rawdata: str, i: int) -> int:
    if i + 3 == len(rawdata):
        return -1  # incomplete at EOF (_markupbase._scan_name returns -1)
    m = _DECLNAME.match(rawdata, i + 3)
    if m is None:
        # _markupbase._scan_name raises on a present-but-invalid name token
        raise AssertionError(
            "expected name token at %r" % rawdata[i : i + 20]
        )
    sect_name = m.group().strip().lower()
    if sect_name in ("temp", "cdata", "ignore", "include", "rcdata"):
        match = _MARKED_CLOSE.search(rawdata, i + 3)
    elif sect_name in ("if", "else", "endif"):
        match = _MS_MARKED_CLOSE.search(rawdata, i + 3)
    else:
        # _markupbase.ParserBase.error
        raise NotImplementedError(
            "subclasses of ParserBase must override error()"
        )
    if match is None:
        return -1
    builder.unknown_decl(rawdata[i + 3 : match.start(0)])
    return match.end(0)


def _check_for_whole_start_tag(rawdata: str, i: int) -> int:
    m = locatestarttagend_tolerant.match(rawdata, i)
    if m is None:  # pragma: no cover - starttagopen guaranteed a letter
        return -1
    j = m.end()
    nxt = rawdata[j : j + 1]
    if nxt == ">":
        return j + 1
    if nxt == "/":
        if rawdata.startswith("/>", j):
            return j + 2
        if rawdata.startswith("/", j):
            return -1
        if j > i:
            return j
        return i + 1
    if nxt == "":
        return -1
    if nxt in _ATTR_TAIL:
        return -1
    if j > i:
        return j
    return i + 1


def _parse_starttag(builder, rawdata: str, i: int) -> int:
    endpos = _check_for_whole_start_tag(rawdata, i)
    if endpos < 0:
        return endpos
    attrs = []
    match = tagfind_tolerant.match(rawdata, i + 1)
    tag = match.group(1).lower()
    k = match.end()
    # attribute-less tags (the common case) skip the attrfind loop entirely
    if k == endpos - 1 and rawdata[k] == ">":
        builder.handle_starttag(tag, attrs)
        return endpos
    while k < endpos:
        m = attrfind_tolerant.match(rawdata, k)
        if m is None:
            break
        attrname, rest, attrvalue = m.group(1, 2, 3)
        if not rest:
            attrvalue = None
        elif (
            attrvalue[:1] == "'" == attrvalue[-1:]
            or attrvalue[:1] == '"' == attrvalue[-1:]
        ):
            attrvalue = attrvalue[1:-1]
        if attrvalue:
            attrvalue = unescape(attrvalue)
        attrs.append((attrname.lower(), attrvalue))
        k = m.end()

    end = rawdata[k:endpos].strip()
    if end not in (">", "/>"):
        builder.handle_data(rawdata[i:endpos])
        return endpos
    if end.endswith("/>"):
        builder.handle_startendtag(tag, attrs)
    else:
        builder.handle_starttag(tag, attrs)
    return endpos


def _parse_endtag(builder, rawdata: str, i: int) -> int:
    gt = rawdata.find(">", i + 1)
    if gt < 0:
        return -1
    gtpos = gt + 1
    match = endtagfind.match(rawdata, i)
    if match is None:
        if builder._raw_elem is not None:
            builder.handle_data(rawdata[i:gtpos])
            return gtpos
        namematch = tagfind_tolerant.match(rawdata, i + 2)
        if namematch is None:
            if rawdata[i : i + 3] == "</>":
                return i + 3
            # bogus comment
            pos = rawdata.find(">", i + 2)
            if pos == -1:
                return -1
            builder.handle_comment(rawdata[i + 2 : pos])
            return pos + 1
        tagname = namematch.group(1).lower()
        gt2 = rawdata.find(">", namematch.end())
        builder.handle_endtag(tagname)
        return gt2 + 1

    elem = match.group(1).lower()
    if builder._raw_elem is not None and elem != builder._raw_elem.name:
        builder.handle_data(rawdata[i:gtpos])
        return gtpos
    builder.handle_endtag(elem)
    return gtpos
