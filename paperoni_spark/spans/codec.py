"""Span codec: interleaved ``spans`` rows ↔ HTML, and extracted-span emission.

Input shape (BASELINE.json ``input_hint``)::

    documents(doc_id: string,
              spans: array<struct<kind:string, text:string,
                                  media_ref:string, offset:int>>)

Reassembly contract (FIXTURES.md §1.1): sort spans by ``offset``; concatenate
``text`` fragments; render each ``media`` span as ``<img src="{media_ref}"/>``
at its interleave position.

Output span emission walks the extracted article DOM in the same inclusive
DFS order as the reference's serializer (/root/reference/src/epub.rs:451-491):
each Text node start-edge emits a ``text`` span, each ``<img>`` start-edge
emits an ``image`` span carrying the resolved ``src``; ``order`` is the
emission index.  Per-row invariant: sequence equality on
``(kind, text, media_ref, order)``.
"""

from __future__ import annotations

import html as html_mod
import re
from typing import Any

from ..dom import Node
from ..kernel import Article, ReadabilityError

TEXT_KIND = "text"
MEDIA_KIND = "media"
IMAGE_KIND = "image"

# an <img> carrying only a src attribute is a pure media marker and is
# encoded as a media span; imgs with richer markup stay inside text spans
_SIMPLE_IMG_RE = re.compile(r"""<img\s+src=(?:"([^"]*)"|'([^']*)')\s*/?>""", re.I)

# rawtext/comment regions where an <img ...> character sequence is DATA,
# not markup — encoding it as a media span would desynchronize the spans
# from the real document (decode round-trip stays correct, but the media
# inventory would lie)
_RAWTEXT_RE = re.compile(
    r"<(script|style)\b[^>]*>.*?</\1\s*>|<!--.*?-->", re.I | re.S
)


def html_to_spans(html_str: str) -> list[dict[str, Any]]:
    """Encode an HTML document into interleaved text+media spans.

    img matches inside script/style rawtext or comments are skipped — they
    are content bytes, not media markers (they stay inside text spans
    verbatim, so reassembly remains byte-faithful for them)."""
    rawtext_regions = [m.span() for m in _RAWTEXT_RE.finditer(html_str)]
    spans: list[dict[str, Any]] = []
    offset = 0
    pos = 0
    for m in _SIMPLE_IMG_RE.finditer(html_str):
        if any(a <= m.start() < b for a, b in rawtext_regions):
            continue
        if m.start() > pos:
            spans.append(
                {
                    "kind": TEXT_KIND,
                    "text": html_str[pos : m.start()],
                    "media_ref": None,
                    "offset": offset,
                }
            )
            offset += 1
        src = m.group(1) if m.group(1) is not None else m.group(2)
        spans.append(
            {
                "kind": MEDIA_KIND,
                "text": None,
                "media_ref": html_mod.unescape(src),
                "offset": offset,
            }
        )
        offset += 1
        pos = m.end()
    if pos < len(html_str):
        spans.append(
            {
                "kind": TEXT_KIND,
                "text": html_str[pos:],
                "media_ref": None,
                "offset": offset,
            }
        )
    return spans


def spans_to_html(spans: list[dict[str, Any]]) -> str:
    """Reassemble the HTML document from its span rows (sort by offset)."""
    parts: list[str] = []
    for span in sorted(spans, key=lambda s: s["offset"]):
        if span["kind"] == MEDIA_KIND:
            ref = span.get("media_ref") or ""
            parts.append(f'<img src="{html_mod.escape(ref, quote=True)}"/>')
        else:
            parts.append(span.get("text") or "")
    return "".join(parts)


def emit_spans(article_node: Node) -> list[dict[str, Any]]:
    """DFS span emission over the extracted article DOM (epub.rs:451-491
    traversal order: start-edges only, Text and <img> nodes)."""
    out: list[dict[str, Any]] = []
    order = 0
    for kind, node in article_node.traverse(inclusive=True):
        if kind != "start":
            continue
        if node.is_text:
            out.append(
                {"kind": TEXT_KIND, "text": node.text, "media_ref": None, "order": order}
            )
            order += 1
        elif node.is_element and node.name == "img":
            out.append(
                {
                    "kind": IMAGE_KIND,
                    "text": None,
                    "media_ref": node.attributes.get("src", ""),
                    "order": order,
                }
            )
            order += 1
    return out


def extract_document(
    doc_id: str,
    spans: list[dict[str, Any]],
    base_url: str = "http://example.com/",
) -> dict[str, Any]:
    """Full per-document extraction: reassemble → readability kernel → span
    emission.  Never raises; failures are encoded in ``status``."""
    try:
        html_str = spans_to_html(spans)
        article = Article.from_html(html_str, base_url)
        article.extract_content()
        article.extract_img_urls()
        extracted = (
            emit_spans(article.readability.article_node)
            if article.readability.article_node is not None
            else []
        )
        meta = article.metadata()
        return {
            "doc_id": doc_id,
            "extracted": extracted,
            "metadata": {
                "title": meta.title,
                "byline": meta.byline,
                "excerpt": meta.excerpt,
                "site_name": meta.site_name,
            },
            "img_urls": [u for u, _ in article.img_urls],
            # DOM-derived fields the reference keeps on Readability itself
            # (mod.rs:56-59): byline captured during the walk, dir attr
            "dom_byline": article.readability.byline,
            "article_dir": article.readability.article_dir,
            "status": "ok",
            "nodes_scored": article.readability.nodes_scored,
            "candidates": article.readability.candidate_count,
            "spans_emitted": len(extracted),
        }
    except ReadabilityError:
        return {
            "doc_id": doc_id,
            "extracted": [],
            "metadata": {"title": None, "byline": None, "excerpt": None, "site_name": None},
            "img_urls": [],
            "dom_byline": None,
            "article_dir": None,
            "status": "error:ReadabilityError",
            "nodes_scored": 0,
            "candidates": 0,
            "spans_emitted": 0,
        }
    except Exception as exc:  # defensive: a kernel panic must not kill the job
        return {
            "doc_id": doc_id,
            "extracted": [],
            "metadata": {"title": None, "byline": None, "excerpt": None, "site_name": None},
            "img_urls": [],
            "dom_byline": None,
            "article_dir": None,
            "status": f"error:KernelError:{type(exc).__name__}",
            "nodes_scored": 0,
            "candidates": 0,
            "spans_emitted": 0,
        }
