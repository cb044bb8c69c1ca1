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
* :func:`resolve_export_filename` — html.rs:164-191 collision handling
* :func:`update_imgs_base64` / :func:`update_img_urls` — html.rs:262-307
  image src rewriting (base64 inlining / export-dir repointing)
* :func:`insert_meta_charset` / :func:`insert_title_elem` /
  :func:`insert_appendix` / :func:`inline_css` /
  :func:`remove_existing_stylesheet_link` — html.rs:212-382 HTML-sink
  document decorations
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


def resolve_export_filename(
    title: str, file_names: set[str], output_directory: str | None = None
) -> str:
    """html.rs:164-191 — collision handling for exported article files.

    Path separators in the title become spaces; on collision the name gets
    ``_{len(file_names)}`` appended.  Bug-faithful quirks kept: the renamed
    candidate is NOT re-checked (two renames in the same session can still
    collide), and the suffix is the set size, not a per-name counter.  The
    chosen name is inserted into ``file_names`` (the reference inserts
    before writing)."""
    out_dir = output_directory if output_directory is not None else "."
    safe_title = title.replace("/", " ").replace("\\", " ")
    file_name = f"{out_dir}/{safe_title}.html"
    if file_name in file_names:
        file_name = f"{out_dir}/{safe_title}_{len(file_names)}.html"
    file_names.add(file_name)
    return file_name


def update_imgs_base64(root_node: Node, img_urls, read_bytes) -> None:
    """html.rs:262-285 — rewrite each spooled image's ``src`` to a base64
    data URI.  ``img_urls`` is the article's ``[(img_url, mime_type)]``
    projection (P4); ``read_bytes`` maps an img_url to the spooled payload
    (the reference reads ``$TMP/<md5-name>``; tests pass a dict lookup).

    Bug-faithful quirk: the data URI scheme is ``data:image:{mime}`` — a
    COLON after ``image`` where standard data URIs use the bare mime type —
    and a missing mime falls back to ``image/*``."""
    import base64

    for img_url, mime_type in img_urls:
        payload = read_bytes(img_url)
        b64 = base64.b64encode(payload).decode("ascii")
        data_uri = f"data:image:{mime_type if mime_type is not None else 'image/*'};base64,{b64}"
        for img in root_node.select_list("img"):
            if img.attributes.get("src") == img_url:
                img.attributes["src"] = data_uri


def update_img_urls(root_node: Node, img_urls, imgs_dir_path: str, copy_file=None) -> None:
    """html.rs:288-307 — repoint each spooled image's ``src`` at the export
    images directory (and copy the payload there via ``copy_file``, a
    (img_url, dest_path) callable; None skips IO for table-sink use).

    ``os.path.join`` is bug-faithful to Rust ``Path::join``: an ABSOLUTE
    img_url replaces the base directory instead of being appended under it
    (a plain f-string concat would produce a doubled path)."""
    import os.path

    for img_url, _ in img_urls:
        dest = os.path.join(imgs_dir_path, img_url)
        if copy_file is not None:
            copy_file(img_url, dest)
        for img in root_node.select_list("img"):
            if img.attributes.get("src") == img_url:
                img.attributes["src"] = dest


def insert_meta_charset(root_node: Node) -> None:
    """html.rs:212-222 — append ``<meta charset="UTF-8">`` to <head>."""
    head = root_node.select_first("head")
    if head is not None:
        head.append(Node.new_element("meta", {"charset": "UTF-8"}))


def insert_title_elem(root_node: Node, title: str) -> None:
    """html.rs:309-326 — add a <title>; if <head> is missing, create one
    prepended to <html>."""
    title_elem = Node.new_element("title")
    title_elem.append(Node.new_text(title))
    head = root_node.select_first("head")
    if head is not None:
        head.append(title_elem)
    else:
        html_elem = root_node.select_first("html")
        head = Node.new_element("head")
        head.append(title_elem)
        html_elem.prepend(head)


def insert_appendix(root_node: Node, article_links) -> None:
    """html.rs:329-350 — footer appendix with one source link per article.

    ``article_links`` is ``[(title, url)]`` (the reference passes MetaData;
    an empty title falls back to the url).  Bug-faithful quirk: the
    reference emits ``<br></br>`` through an html5 fragment parser, and the
    stray ``</br>`` end tag materializes a SECOND <br> element — two <br>s
    per link in the exported DOM."""
    footer = Node.new_element("footer")
    h2 = Node.new_element("h2")
    h2.append(Node.new_text("Appendix"))
    footer.append(h2)
    h3 = Node.new_element("h3")
    h3.append(Node.new_text("Article sources"))
    footer.append(h3)
    for title, url in article_links:
        a = Node.new_element("a", {"href": url})
        a.append(Node.new_text(title if title else url))
        footer.append(a)
        footer.append(Node.new_element("br"))
        footer.append(Node.new_element("br"))
    root_node.append(footer)


# stand-in stylesheets: the reference bundles Writ v1.0.4 (third-party,
# ISC-licensed) as src/assets/{body,headers}.min.css — exporters drop the
# real files in via the parameters
BODY_STYLESHEET = "body{margin:auto;max-width:40em}"
HEADERS_STYLESHEET = "h1,h2,h3,h4,h5,h6{font-weight:400}"


def inline_css(
    root_node: Node,
    css_config: str,
    body_stylesheet: str = BODY_STYLESHEET,
    header_stylesheet: str = HEADERS_STYLESHEET,
) -> None:
    """html.rs:353-376 — prepend an inline <style> to <head>.

    ``css_config``: ``"none"`` (no-op), ``"no_headers"`` (body css only),
    ``"all"`` (body + headers, concatenated in that order)."""
    if css_config == "none":
        return
    css = body_stylesheet if css_config == "no_headers" else body_stylesheet + header_stylesheet
    style = Node.new_element("style")
    style.append(Node.new_text(css))
    head = root_node.select_first("head")
    if head is None:
        raise ValueError("Could not find the <head> element")
    head.prepend(style)


def remove_existing_stylesheet_link(root_node: Node) -> None:
    """html.rs:379-382 — drop the first <link href="stylesheet.css">."""
    for link in root_node.select_list("link"):
        if link.attributes.get("href") == "stylesheet.css":
            link.detach()
            return


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
