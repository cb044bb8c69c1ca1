"""Export-side helper operators from the reference's sink modules.

The EPUB/HTML file sinks themselves are replaced by table sinks (SURVEY §2
non-goals), but their content transformations are part of the reference's
operator surface and are kept here so downstream exporters can reproduce
identical output:

* :func:`replace_escaped_characters` — epub.rs:244-249 metadata escaping
* :func:`generate_header_ids` — epub.rs:307-328 md5-based header ids
* :func:`get_header_level_toc_vec` — epub.rs:331-428 TOC nesting
  (backtracking over an h1..h4 level stack)
* :func:`map_mime_subtype_to_ext` / :func:`hash_url` — http.rs:295-308
  image spooling helpers (md5-named local files)
"""

from __future__ import annotations

import hashlib
import re
from dataclasses import dataclass, field

from ..dom import Node

_VALID_ATTR_CHARS = re.compile(r"[a-z0-9\-_:]")
HEADER_LEVEL_MAX_DEPTH = 4
_HEADER_LEVELS = {"h1": 1, "h2": 2, "h3": 3, "h4": 4}


def replace_escaped_characters(value: str) -> str:
    """epub.rs:244-249 (order matters: & first)."""
    return value.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _md5_hex(text: str) -> str:
    return hashlib.md5(text.encode("utf-8")).hexdigest()


def generate_header_ids(root_node: Node) -> None:
    """epub.rs:307-328 — assign ``id="_<md5(text)>"`` to h1-h4 without a
    usable id.  Mirrors the reference's quirk: an existing id is kept only
    if it *contains* at least one ``[a-z0-9-_:]`` character."""
    for header in root_node.select_list("h1, h2, h3, h4"):
        existing = header.attributes.get("id")
        if existing is not None and _VALID_ATTR_CHARS.search(existing):
            continue
        header.attributes["id"] = "_" + _md5_hex(header.text_contents())


@dataclass
class TocElement:
    url: str
    title: str
    children: list["TocElement"] = field(default_factory=list)

    def child(self, elem: "TocElement") -> "TocElement":
        self.children.append(elem)
        return self

    def clone(self) -> "TocElement":
        return TocElement(
            self.url, self.title, [c.clone() for c in self.children]
        )


def get_header_level_toc_vec(content_url: str, article: Node) -> list[TocElement]:
    """epub.rs:331-428 — build the nested TOC via the reference's
    level-stack backtracking (verbatim semantics, incl. clone-on-embed)."""
    headers_vec: list[TocElement] = []
    generate_header_ids(article)
    stack: list[TocElement | None] = [None] * HEADER_LEVEL_MAX_DEPTH

    for heading in article.select_list("h1, h2, h3, h4"):
        level = _HEADER_LEVELS[heading.name]
        index = level - 1
        id_ = heading.attributes["id"]
        url = f"{content_url}#{id_}"

        existing_toc = stack[index].clone() if stack[index] is not None else None
        if existing_toc is not None:
            # consume all lower-hierarchy toc elements, folding right→left
            descendants_levels = HEADER_LEVEL_MAX_DEPTH - level
            taken = []
            for i in range(HEADER_LEVEL_MAX_DEPTH - 1, HEADER_LEVEL_MAX_DEPTH - 1 - descendants_levels, -1):
                if stack[i] is not None:
                    taken.append(stack[i])
                    stack[i] = None
            folded = None
            for toc_elem in taken:  # rev order: deepest first
                folded = toc_elem.child(folded) if folded is not None else toc_elem
            if folded is not None:
                existing_toc = existing_toc.child(folded)

            if index == 0:
                headers_vec.append(existing_toc)
            else:
                ancestor = None
                for i in range(level - 2, -1, -1):
                    if stack[i] is not None:
                        ancestor = i
                        break
                if ancestor is not None:
                    stack[ancestor] = stack[ancestor].clone().child(existing_toc)
                else:
                    headers_vec.append(existing_toc)

        stack[index] = TocElement(
            url, replace_escaped_characters(heading.text_contents())
        )

    folded = None
    for toc_elem in reversed(stack):
        if toc_elem is None:
            continue
        folded = toc_elem.child(folded) if folded is not None else toc_elem
    if folded is not None:
        headers_vec.append(folded)
    return headers_vec


def map_mime_subtype_to_ext(subtype: str) -> str:
    """http.rs:295-303"""
    if subtype == "svg+xml":
        return "svg"
    if subtype == "x-icon":
        return "ico"
    return subtype


def hash_url(url: str) -> str:
    """http.rs:306-308 — md5-named local files for spooled images."""
    return _md5_hex(url)
