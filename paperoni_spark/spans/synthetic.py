"""Deterministic synthetic corpus generator.

Produces ``documents``-table rows (interleaved text+media spans) purely as a
function of ``doc index`` — no RNG state, so any row can be regenerated
independently on any executor (the generator itself is embarrassingly
parallel and is used from ``mapInPandas`` for bench-scale corpora).

The documents are article-shaped: boilerplate chrome (header/nav/sidebar/
comments with unlikely-candidate class names, regexes.rs:34-39) around a main
body of paragraphs with inline image markers.  Document length follows a
deterministic heavy-tail so the corpus exercises the skew/salting path
(north rule: "skewed mega-documents").
"""

from __future__ import annotations

import hashlib
from typing import Any

from .codec import html_to_spans

_WORDS = (
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod "
    "tempor incididunt ut labore et dolore magna aliqua enim ad minim veniam "
    "quis nostrud exercitation ullamco laboris nisi aliquip ex ea commodo "
    "consequat duis aute irure in reprehenderit voluptate velit esse cillum "
    "fugiat nulla pariatur excepteur sint occaecat cupidatat non proident"
).split()


def _h(doc_index: int, salt: int) -> int:
    digest = hashlib.sha256(f"{doc_index}:{salt}".encode()).digest()
    return int.from_bytes(digest[:8], "big")


def _sentence(doc_index: int, para: int, sent: int) -> str:
    n_words = 8 + _h(doc_index, para * 131 + sent) % 10
    words = [
        _WORDS[_h(doc_index, para * 1031 + sent * 17 + w) % len(_WORDS)]
        for w in range(n_words)
    ]
    words[0] = words[0].capitalize()
    return " ".join(words) + "."


def _paragraph(doc_index: int, para: int) -> str:
    n_sents = 2 + _h(doc_index, para) % 4
    return "<p>" + " ".join(_sentence(doc_index, para, s) for s in range(n_sents)) + "</p>"


def n_paragraphs_for(doc_index: int) -> int:
    """Deterministic heavy-tail size: most docs are small, ~1% are 40× and
    ~0.1% are 400× the median (the mega-doc skew tier)."""
    r = _h(doc_index, 0xBEEF) % 1000
    if r < 1:
        return 4000  # mega
    if r < 10:
        return 400  # heavy
    return 6 + _h(doc_index, 0xF00D) % 10


def synth_html(doc_index: int) -> str:
    paras = n_paragraphs_for(doc_index)
    body_parts: list[str] = []
    for p in range(paras):
        body_parts.append(_paragraph(doc_index, p))
        if _h(doc_index, 0x1A6E + p) % 7 == 0:
            body_parts.append(
                f'<img src="https://img.example.com/{doc_index}/{p}.jpg">'
            )
    body = "".join(body_parts)
    title = " ".join(
        _WORDS[_h(doc_index, 0x7117 + w) % len(_WORDS)] for w in range(5)
    ).title()
    author = _WORDS[_h(doc_index, 0xA07) % len(_WORDS)].title()
    return (
        "<!DOCTYPE html><html><head>"
        f"<title>{title} | Synthetic Site</title>"
        f'<meta name="author" content="{author} Writer">'
        f'<meta name="description" content="{_sentence(doc_index, 9999, 0)}">'
        "</head><body>"
        '<header class="banner"><h1>Synthetic Site</h1>'
        '<div class="menu"><a href="/a">A</a><a href="/b">B</a></div></header>'
        '<div class="sidebar widget">Related links and other cruft</div>'
        f'<article id="main-content">{body}</article>'
        '<div class="comments"><p>First comment!</p><p>Nice post.</p></div>'
        '<footer class="footer">Copyright 2026 Synthetic Site</footer>'
        "</body></html>"
    )


def synth_document(doc_index: int) -> dict[str, Any]:
    return {"doc_id": f"doc-{doc_index:010d}", "spans": html_to_spans(synth_html(doc_index))}


def synth_corpus(n_docs: int, start: int = 0) -> list[dict[str, Any]]:
    return [synth_document(i) for i in range(start, start + n_docs)]
