"""XHTML-style serialization mirroring the reference's EPUB serializer
(/root/reference/src/epub.rs:432-493): DFS over start/end edges, only Element
and Text nodes emitted, ``&<>"'`` escaped, attribute names restricted to
``[a-z0-9-_:]`` ASCII, attributes in sorted (BTreeMap) order."""

from __future__ import annotations

import re

from .node import Node

_ESC = {"<": "&lt;", ">": "&gt;", "&": "&amp;", '"': "&quot;", "'": "&apos;"}
_ESC_RE = re.compile(r"([<>&'\"])")
_VALID_ATTR_RE = re.compile(r"^[a-z0-9\-_:]+$")


def _escape(text: str) -> str:
    return _ESC_RE.sub(lambda m: _ESC[m.group(1)], text)


def serialize(node: Node) -> str:
    out: list[str] = []
    for kind, n in node.traverse(inclusive=True):
        if kind == "start":
            if n.type == "text":
                out.append(_escape(n.text))
            elif n.type == "element":
                attrs = "".join(
                    f' {k}="{_escape(v)}"'
                    for k, v in n.sorted_attr_items()
                    if k.isascii() and _VALID_ATTR_RE.match(k)
                )
                out.append(f"<{n.name}{attrs}>")
        else:
            if n.type == "element":
                out.append(f"</{n.name}>")
    return "".join(out)
