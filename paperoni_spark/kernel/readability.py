"""Readability-style main-content extraction kernel (pure Python, no Spark).

Semantics-level port of the reference extraction kernel
(/root/reference/src/moz_readability/mod.rs, a Rust port of Mozilla
Readability).  This is **not** a mechanical translation: it re-expresses the
same observable pipeline over our own DOM layer (:mod:`paperoni_spark.dom`),
preserving the behaviors the span-equality contract depends on:

* stage order: ``unwrap_no_script_tags → remove_scripts → prep_document →
  get_article_metadata → grab_article → post_process_content`` (mod.rs:82-91);
* every threshold uses **UTF-8 byte lengths** (Rust ``str::len``);
* all score arithmetic in **IEEE f32** (``numpy.float32``), scores stored as
  stringified floats in a ``readability-score`` attribute and re-parsed, as the
  reference does (mod.rs:1124, :1784);
* lazy-iterator-under-mutation timing (see dom/node.py docstring) — several
  loops observably terminate early when nodes are detached mid-iteration;
* the flag-degradation retry loop re-walks the **already-mutated** DOM
  (mod.rs:1618, :2081-2106) — retries must not start from a pristine copy.

This module runs inside Arrow-vectorized Spark UDFs (one call per document)
but has zero Spark/pandas imports so it is unit-testable standalone.
"""

from __future__ import annotations

import re
from itertools import islice
from typing import Callable, Optional
from urllib.parse import urljoin, urlsplit, urlunsplit

import numpy as np

from ..dom import Node, parse_fragment, parse_html
from . import regexes

f32 = np.float32

DEFAULT_CHAR_THRESHOLD = 500
FLAG_STRIP_UNLIKELYS = 0x1
FLAG_WEIGHT_CLASSES = 0x2
FLAG_CLEAN_CONDITIONALLY = 0x4
READABILITY_SCORE = "readability-score"

PHRASING_ELEMS = frozenset(
    (
        "abbr audio b bdo br button cite code data datalist dfn em embed i img "
        "input kbd label mark math meter noscript object output progress q ruby "
        "samp script select small span strong sub sup textarea time var wbr"
    ).split()
)
DEFAULT_TAGS_TO_SCORE = frozenset("section h2 h3 h4 h5 h6 p td pre".split())
ALTER_TO_DIV_EXCEPTIONS = frozenset(["div", "article", "section", "p"])
PRESENTATIONAL_ATTRIBUTES = (
    "align background bgcolor border cellpadding cellspacing frame hspace "
    "rules style valign vspace"
).split()
DATA_TABLE_DESCENDANTS = ["col", "colgroup", "tfoot", "thead", "th"]
DEPRECATED_SIZE_ATTRIBUTE_ELEMS = frozenset(["table", "th", "td", "hr", "pre"])
BLOCK_LEVEL_ELEMS = frozenset(
    (
        "address article aside blockquote details dialog dd div dl dt fieldset "
        "figcaption footer form h1 h2 h3 h4 h5 h6 header hgroup hr li main nav "
        "ol p pre section table ul"
    ).split()
)


class ReadabilityError(Exception):
    """Extraction failure (reference: ErrorKind::ReadabilityError)."""


_BR_HR = frozenset(["br", "hr"])
_CLEAN_COND_TAGS = frozenset(["p", "img", "li", "input", "object", "embed", "iframe"])
_MEDIA_TAGS = frozenset(["img", "embed", "object", "iframe"])


def blen(s: str) -> int:
    """Rust ``str::len`` — UTF-8 byte length.  ASCII fast path: isascii()
    is an O(n) C scan with no allocation, vs encode()'s bytes allocation —
    and for ASCII the byte length IS the char length."""
    if s.isascii():
        return len(s)
    return len(s.encode("utf-8"))


def _fmt_score(x: np.float32) -> str:
    # numpy >= 1.14 prints the shortest round-trip repr for float32; Rust f32
    # Display does the same but prints integral values without ".0"
    s = str(x)
    return s[:-2] if s.endswith(".0") else s


def _parse_score(s: str) -> np.float32:
    return f32(s)


class MetaData:
    __slots__ = ("byline", "excerpt", "site_name", "title")

    def __init__(self) -> None:
        self.byline: Optional[str] = None
        self.excerpt: Optional[str] = None
        self.site_name: Optional[str] = None
        self.title: str = ""

    def as_dict(self) -> dict:
        return {
            "title": self.title,
            "byline": self.byline,
            "excerpt": self.excerpt,
            "site_name": self.site_name,
        }


class Readability:
    def __init__(self, html_str: str) -> None:
        self.root_node: Node = parse_html(html_str)
        self.byline: Optional[str] = None
        self.article_title: str = ""
        self.article_node: Optional[Node] = None
        self.article_dir: Optional[str] = None
        self.flags: int = (
            FLAG_STRIP_UNLIKELYS | FLAG_WEIGHT_CLASSES | FLAG_CLEAN_CONDITIONALLY
        )
        self.metadata = MetaData()
        # extraction metrics for the lineage/metrics checkpoint table
        self.nodes_scored: int = 0
        self.candidate_count: int = 0
        self.grab_attempts: int = 0

    # ------------------------------------------------------------------ parse
    def parse(self, url: str) -> None:
        self.unwrap_no_script_tags()
        self.remove_scripts()
        self.prep_document()
        self.metadata = self.get_article_metadata()
        self.article_title = self.metadata.title
        self.grab_article()
        self.post_process_content(url)

    # -------------------------------------------------------- pre-processing
    @staticmethod
    def is_single_image(node: Node) -> bool:
        """mod.rs:95-115"""
        if node.is_element and node.name == "img":
            return True
        content_children = [c for c in node.children() if Readability.has_content(c)]
        if len(content_children) != 1 or node.text_contents().strip() != "":
            return False
        return Readability.is_single_image(content_children[0])

    @staticmethod
    def has_content(node: Node) -> bool:
        """mod.rs:117-122 — text nodes must be non-blank; others always count."""
        if node.is_text:
            return node.text.strip() != ""
        return True

    def unwrap_no_script_tags(self) -> None:
        """mod.rs:127-206"""
        # 1) drop <img> with no src/srcset/data-src/data-srcset and no
        #    image-extension attribute value
        def _img_has_no_source(i: Node) -> bool:
            return not any(
                name in ("src", "srcset", "data-src", "data-srcset")
                or regexes.is_match_img_ext(val)
                for name, val in i.sorted_attr_items()
            )

        filtered = (i for i in self.root_node.select("img") if _img_has_no_source(i))
        # reference prefetch pattern: fetch next before detaching current
        nxt = next(filtered, None)
        while nxt is not None:
            cur = nxt
            nxt = next(filtered, None)
            cur.detach()

        # 2) <noscript> holding a single image replaces the preceding image
        for noscript in self.root_node.select("noscript"):
            inner = parse_fragment(noscript.text_contents())
            if not self.is_single_image(inner):
                continue
            prev_elem = noscript.prev_sibling
            if prev_elem is None:
                continue
            while not prev_elem.is_element:
                if prev_elem.prev_sibling is not None:
                    prev_elem = prev_elem.prev_sibling
                else:
                    break
            if self.is_single_image(prev_elem) and prev_elem.is_element:
                if prev_elem.name != "img":
                    prev_img = prev_elem.select_first("img")
                else:
                    prev_img = prev_elem
                new_img = inner.select_first("img")
                prev_attrs = [
                    (k, v)
                    for k, v in prev_img.sorted_attr_items()
                    if v.strip() != ""
                    and (k in ("src", "srcset") or regexes.is_match_img_ext(v))
                ]
                for attr_name, prev_value in prev_attrs:
                    existing = new_img.attributes.get(attr_name)
                    if existing is not None and existing == prev_value:
                        continue
                    if attr_name in new_img.attributes:
                        attr_name = f"data-old-{attr_name}"
                    new_img.attributes[attr_name] = prev_value
                prev_elem.insert_after(new_img)
                prev_elem.detach()

    def remove_scripts(self) -> None:
        """mod.rs:209-230"""
        for sel in ("script", "noscript"):
            nodes = self.root_node.select(sel)
            nxt = next(nodes, None)
            while nxt is not None:
                cur = nxt
                nxt = next(nodes, None)
                cur.detach()

    def prep_document(self) -> None:
        """mod.rs:234-250"""
        nodes = self.root_node.select("style")
        nxt = next(nodes, None)
        while nxt is not None:
            cur = nxt
            nxt = next(nodes, None)
            cur.detach()
        self.replace_brs()
        for font in self.root_node.select("font"):
            self.set_node_tag(font, "span")

    def replace_brs(self) -> None:
        """mod.rs:257-332 — collapse runs of ≥2 <br> into a <p> that swallows
        following phrasing content."""
        for br_tag in self.root_node.select("br"):
            nxt = self.next_element(br_tag.next_sibling, False)
            replaced = False
            while nxt is not None:
                if nxt.is_element and nxt.name == "br":
                    replaced = True
                    br_sibling = nxt.next_sibling
                    detach_me = nxt
                    nxt = self.next_element(br_sibling, False)
                    detach_me.detach()
                else:
                    break
            if replaced:
                p = Node.new_element("p")
                br_tag.insert_before(p)
                p = br_tag.prev_sibling
                br_tag.detach()

                nxt = p.next_sibling
                while nxt is not None:
                    if nxt.is_element and nxt.name == "br":
                        second = nxt.next_sibling
                        if second is not None and second.is_element and second.name == "br":
                            break
                    if not self.is_phrasing_content(nxt):
                        break
                    sibling = nxt.next_sibling
                    p.append(nxt)
                    nxt = sibling

                while p.first_child is not None:
                    if self.is_whitespace(p.first_child):
                        p.first_child.detach()
                    else:
                        break
                while p.last_child is not None:
                    if self.is_whitespace(p.last_child):
                        p.last_child.detach()
                    else:
                        break

                if p.parent is not None and p.parent.is_element and p.parent.name == "p":
                    self.set_node_tag(p.parent, "div")

    @staticmethod
    def set_node_tag(node: Node, name: str) -> Node:
        """mod.rs:343-362 — rename an element by rebuilding it in place."""
        if node.is_element:
            replacement = Node.new_element(name, dict(node.attributes))
            for child in node.children():
                replacement.append(child)
            node.insert_before(replacement)
            new_node = node.prev_sibling
            node.detach()
            return new_node
        return node

    @staticmethod
    def is_whitespace(node: Node) -> bool:
        """mod.rs:364-370"""
        if node.is_element:
            return node.name == "br"
        if node.is_text:
            return node.text.strip() == ""
        return False

    @staticmethod
    def next_element(node: Optional[Node], must_be_element: bool) -> Optional[Node]:
        """mod.rs:377-397 — skip whitespace (and, with must_be_element, all
        non-element nodes) along the next-sibling chain."""
        while node is not None:
            if node.is_element:
                break
            if node.text_contents().strip() == "":
                node = node.next_sibling
            elif must_be_element:
                node = node.next_sibling
            else:
                break
        return node

    @staticmethod
    def is_phrasing_content(node: Node) -> bool:
        """mod.rs:401-414"""
        if node.is_text:
            return True
        if not node.is_element:
            return False
        name = node.name
        if name in PHRASING_ELEMS:
            return True
        return name in ("a", "del", "ins") and all(
            Readability.is_phrasing_content(c) for c in node.child_list()
        )

    # ------------------------------------------------------------- metadata
    def get_article_metadata(self) -> MetaData:
        """mod.rs:417-528"""
        values: dict[str, str] = {}
        meta = MetaData()
        for node in self.root_node.select("meta"):
            content = node.attributes.get("content")
            if content is None:
                continue
            name_attr = node.attributes.get("name")
            matched = None
            prop = node.attributes.get("property")
            if prop is not None:
                matched = regexes.PROPERTY_REGEX.search(prop)
                if matched is not None:
                    # reference inserts every capture group incl. the whole
                    # match (mod.rs:434-440)
                    for g in (matched.group(0), matched.group(1), matched.group(2)):
                        name = regexes.REPLACE_WHITESPACE_REGEX.sub("", g.lower())
                        values[name] = content.strip()
            if matched is None and name_attr is not None:
                if regexes.is_match_name_pattern(name_attr):
                    name = name_attr.lower()
                    name = regexes.REPLACE_WHITESPACE_REGEX.sub("", name)
                    name = regexes.REPLACE_DOT_REGEX.sub(":", name)
                    values[name] = content.strip()

        title_keys = (
            "dc:title",
            "dcterm:title",
            "og:title",
            "weibo:article:title",
            "weibo:webpage:title",
            "title",
            "twitter:title",
        )
        key = next((k for k in title_keys if k in values), None)
        if key is not None:
            meta.title = values[key] if values[key] != "" else self.get_article_title()
        else:
            meta.title = self.get_article_title()

        byline_keys = ("dc:creator", "dcterm:creator", "author")
        key = next((k for k in byline_keys if k in values), None)
        meta.byline = values[key] if key is not None else None

        excerpt_keys = (
            "dc:description",
            "dcterm:description",
            "og:description",
            "weibo:article:description",
            "weibo:webpage:description",
            "description",
            "twitter:description",
        )
        key = next((k for k in excerpt_keys if k in values), None)
        meta.excerpt = values[key] if key is not None else None

        meta.site_name = values.get("og:site_name")

        meta.title = self.unescape_html_entities(meta.title)
        if meta.byline is not None:
            meta.byline = self.unescape_html_entities(meta.byline)
        if meta.excerpt is not None:
            meta.excerpt = self.unescape_html_entities(meta.excerpt)
        if meta.site_name is not None:
            meta.site_name = self.unescape_html_entities(meta.site_name)
        return meta

    @staticmethod
    def unescape_html_entities(value: str) -> str:
        """mod.rs:531-559"""
        if value == "":
            return value
        escape_map = {"lt": "<", "gt": ">", "amp": "&", "quot": '"', "apos": "'"}
        value = regexes.REPLACE_HTML_ESCAPE_REGEX.sub(
            lambda m: escape_map[m.group(1)], value
        )

        def _num(m: re.Match) -> str:
            if m.group(1) is not None:
                num = int(m.group(1), 16)
            else:
                num = int(m.group(2))
            num &= 0xFFFF
            if 0xD800 <= num <= 0xDFFF:  # lone surrogate → U+FFFD (utf16_lossy)
                return "�"
            return chr(num)

        return regexes.REPLACE_HEX_REGEX.sub(_num, value)

    def get_article_title(self) -> str:
        """mod.rs:562-621 — <title> separator/heading/length heuristics.
        String indexing is byte-accurate (Rust slices are byte offsets)."""
        title_node = self.root_node.select_first("title")
        cur_title = title_node.text_contents().strip() if title_node is not None else ""
        orig_title = cur_title
        title_had_hierarchical_separators = False

        def word_count(s: str) -> int:
            return len(s.split())

        if regexes.is_match_title_separator(cur_title):
            title_had_hierarchical_separators = regexes.is_match_has_title_separator(
                cur_title
            )
            cur_title = regexes.REPLACE_START_SEPARATOR_REGEX.sub(
                r"\g<start>", orig_title
            )
            if word_count(cur_title) < 3:
                cur_title = regexes.REPLACE_END_SEPARATOR_REGEX.sub(
                    r"\g<end>", orig_title
                )
        elif ": " in cur_title:
            trimmed = cur_title.strip()
            if not any(
                h.text_contents().strip() == trimmed
                for h in self.root_node.select("h1, h2")
            ):
                raw = orig_title.encode("utf-8")
                idx = raw.rfind(b":") + 1
                new_title = raw[idx:]
                if word_count(new_title.decode("utf-8", "replace")) < 3:
                    idx = raw.find(b":") + 1
                    new_title = raw[idx:]
                elif word_count(raw[: raw.find(b":")].decode("utf-8", "replace")) > 5:
                    new_title = raw
                cur_title = new_title.decode("utf-8", "replace")
        elif blen(cur_title) > 150 or blen(cur_title) < 15:
            h1_nodes = self.root_node.select_list("h1")
            if len(h1_nodes) == 1:
                cur_title = self.get_inner_text(h1_nodes[0], None)

        cur_title = regexes.NORMALIZE_REGEX.sub(" ", cur_title.strip())
        cur_word_count = word_count(cur_title)
        if cur_word_count <= 4 and (
            not title_had_hierarchical_separators
            or cur_word_count
            != word_count(regexes.REPLACE_MULTI_SEPARATOR_REGEX.sub("", orig_title)) - 1
        ):
            cur_title = orig_title
        return cur_title

    # -------------------------------------------------------------- helpers
    @staticmethod
    def inline_css_str_to_map(css_str: str) -> dict[str, str]:
        """mod.rs:785-854 — hand-rolled inline-CSS declaration scanner."""
        READ_PROP, READ_VAL, READ_QUOT, READ_DQUOT = 0, 1, 2, 3
        state = READ_PROP
        prop: Optional[str] = None
        token: list[str] = []
        tokens: list[tuple[Optional[str], Optional[str]]] = []
        for c in css_str:
            if state == READ_PROP:
                if c != ":":
                    token.append(c)
                else:
                    state = READ_VAL
                    prop = "".join(token).strip()
                    token = []
            elif state == READ_VAL:
                if c == "'":
                    state = READ_QUOT
                    token.append(c)
                elif c == '"':
                    state = READ_DQUOT
                    token.append(c)
                elif c == ";":
                    state = READ_PROP
                    tokens.append((prop, "".join(token).strip()))
                    prop = None
                    token = []
                else:
                    token.append(c)
            elif state == READ_QUOT:
                token.append(c)
                if c == "'":
                    state = READ_VAL
            else:  # READ_DQUOT
                token.append(c)
                if c == '"':
                    state = READ_VAL
        if token and state == READ_VAL:
            tokens.append((prop, "".join(token).strip()))
        return {p: v for p, v in tokens if p is not None and v is not None}

    @staticmethod
    def is_probably_visible(node: Node) -> bool:
        """mod.rs:856-879"""
        if not node.is_element:
            return True
        attrs = node.attributes
        style_ok = True
        css = attrs.get("style")
        if css is not None:
            display = Readability.inline_css_str_to_map(css).get("display")
            if display is not None:
                style_ok = display != "none"
        if not style_ok or "hidden" in attrs:
            return False
        if "aria-hidden" not in attrs:
            return True
        if attrs.get("aria-hidden") != "true":
            return True
        class_list = attrs.get("class")
        return class_list is not None and "fallback-image" in class_list.split(" ")

    @staticmethod
    def is_valid_byline(text: str) -> bool:
        """mod.rs:882-885 — 1..99 bytes after trim."""
        t = text.strip()
        return 0 < blen(t) < 100

    def check_byline(self, node: Node, match_string: str) -> bool:
        """mod.rs:887-910"""
        if self.byline is not None:
            return False
        if not node.is_element:
            return False
        rel = node.attributes.get("rel")
        itemprop = node.attributes.get("itemprop")
        if rel is not None:
            is_byline = rel == "author"
        elif itemprop is not None:
            is_byline = "author" in itemprop
        else:
            is_byline = regexes.is_match_byline(match_string)
        is_byline = is_byline and self.is_valid_byline(node.text_contents())
        if is_byline:
            self.byline = node.text_contents().strip()
        return is_byline

    @staticmethod
    def get_next_node(node: Node, ignore_self_and_kids: bool) -> Optional[Node]:
        """mod.rs:917-936 — depth-first DOM cursor over element nodes."""
        has_elem_children = any(c.is_element for c in node.children())
        if not ignore_self_and_kids and has_elem_children:
            return Readability.next_element(node.first_child, True)
        nxt = Readability.next_element(node.next_sibling, True)
        if nxt is not None:
            return nxt
        parent = node.parent
        while parent is not None:
            nxt = Readability.next_element(parent.next_sibling, True)
            if nxt is not None:
                return nxt
            parent = parent.parent
        return None

    @staticmethod
    def remove_and_get_next(node: Node) -> Optional[Node]:
        """mod.rs:939-943"""
        nxt = Readability.get_next_node(node, True)
        node.detach()
        return nxt

    @staticmethod
    def has_ancestor_tag(
        node: Node,
        tag_name: str,
        max_depth: Optional[int] = None,
        filter_fn: Optional[Callable[[Node], bool]] = None,
    ) -> bool:
        """mod.rs:947-975 — max_depth None → 3; negative → unlimited."""
        depth = 0
        max_depth = 3 if max_depth is None else max_depth
        parent = node.parent
        while parent is not None:
            if not parent.is_element:
                return False
            if max_depth > 0 and depth > max_depth:
                return False
            if parent.name == tag_name and (filter_fn is None or filter_fn(parent)):
                return True
            parent = parent.parent
            depth += 1
        return False

    @staticmethod
    def is_element_without_content(node: Node) -> bool:
        """mod.rs:977-985"""
        child_count = len(node.child_list())
        if not node.is_element or node.text_contents().strip() != "":
            return False
        if child_count == 0:
            return True
        counts = node.count_tags(_BR_HR)
        return child_count == counts["br"] + counts["hr"]

    @staticmethod
    def has_single_tag_inside_element(node: Node, tag_name: str) -> bool:
        """mod.rs:990-1001"""
        elem_children = [c for c in node.children() if c.is_element]
        if len(elem_children) != 1 or elem_children[0].name != tag_name:
            return False
        return not any(
            c.is_text and regexes.is_match_has_content(c.text_contents().rstrip())
            for c in node.children()
        )

    @staticmethod
    def get_inner_text(node: Node, normalize_spaces: Optional[bool] = None) -> str:
        """mod.rs:1003-1011"""
        will_normalize = True if normalize_spaces is None else normalize_spaces
        text = node.text_contents().strip()
        if will_normalize:
            return regexes.NORMALIZE_REGEX.sub(" ", text)
        return text

    @staticmethod
    def get_link_density(node: Node) -> np.float32:
        """mod.rs:1015-1026 — f32 arithmetic."""
        text_length = f32(blen(Readability.get_inner_text(node, None)))
        if text_length == f32(0):
            return f32(0)
        total = f32(0)
        for a in node.select("a"):
            total = total + f32(blen(Readability.get_inner_text(a, None)))
        return total / text_length

    @staticmethod
    def has_child_block_element(node: Node) -> bool:
        """mod.rs:1029-1074"""
        return any(
            c.is_element
            and (c.name in BLOCK_LEVEL_ELEMS or Readability.has_child_block_element(c))
            for c in node.child_list()
        )

    @staticmethod
    def get_node_ancestors(node: Node, max_depth: Optional[int] = None) -> list[Node]:
        """mod.rs:1077-1079 — note: ``None`` means take **1** (unwrap_or(1))."""
        return list(islice(node.ancestors(), max_depth if max_depth is not None else 1))

    def flag_is_active(self, flag: int) -> bool:
        return (self.flags & flag) > 0

    def remove_flag(self, flag: int) -> None:
        self.flags &= ~flag

    def get_class_weight(self, node: Node) -> int:
        """mod.rs:1083-1113"""
        if not self.flag_is_active(FLAG_WEIGHT_CLASSES):
            return 0
        weight = 0
        attrs = node.attributes
        id_ = attrs.get("id")
        if id_ is not None and id_.strip() != "":
            if regexes.is_match_positive(id_):
                weight += 25
            elif regexes.is_match_negative(id_):
                weight -= 25
        class_ = attrs.get("class")
        if class_ is not None and class_.strip() != "":
            if regexes.is_match_positive(class_):
                weight += 25
            elif regexes.is_match_negative(class_):
                weight -= 25
        return weight

    def initialize_node(self, node: Node) -> None:
        """mod.rs:1117-1137 — class weight + tag prior, stored stringified."""
        if not node.is_element:
            return
        score = f32(0) + f32(self.get_class_weight(node))
        name = node.name
        if name == "div":
            score = score + f32(5)
        elif name in ("pre", "td", "blockquote"):
            score = score + f32(3)
        elif name in ("address", "ol", "ul", "dl", "dd", "dt", "li", "form"):
            score = score - f32(3)
        elif name in ("h1", "h2", "h3", "h4", "h5", "h6", "th"):
            score = score - f32(5)
        node.attributes[READABILITY_SCORE] = _fmt_score(score)

    # --------------------------------------------------------------- tables
    @staticmethod
    def get_row_and_column_count(node: Node) -> tuple[int, int]:
        """mod.rs:1139-1172 — note rowspan read from <tr> (reference quirk)."""
        rows = 0
        columns = 0
        for tr in node.select("tr"):
            rowspan = tr.attributes.get("rowspan")
            rows += int(rowspan) if rowspan is not None else 1
            columns_in_row = 0
            for cell in tr.select("td"):
                colspan = cell.attributes.get("colspan")
                columns_in_row += int(colspan) if colspan is not None else 1
            columns = max(columns, columns_in_row)
        return rows, columns

    def mark_data_tables(self) -> None:
        """mod.rs:1176-1229"""
        for table in self.root_node.select("table"):
            attrs = table.attributes
            if attrs.get("role") == "presentation":
                attrs["readability-data-table"] = "false"
                continue
            if attrs.get("datatable") == "0":
                attrs["readability-data-table"] = "false"
                continue
            if "summary" in attrs:
                attrs["readability-data-table"] = "true"
                continue
            caption = table.select_first("caption")
            if caption is not None and len(caption.child_list()) > 0:
                attrs["readability-data-table"] = "true"
                continue
            if any(table.select_first(t) is not None for t in DATA_TABLE_DESCENDANTS):
                attrs["readability-data-table"] = "true"
                continue
            # inclusive select: count > 1 ⇒ nested table ⇒ layout table
            if len(table.select_list("table")) > 1:
                attrs["readability-data-table"] = "false"
                continue
            rows, columns = self.get_row_and_column_count(table)
            if rows >= 10 or columns > 4:
                attrs["readability-data-table"] = "true"
                continue
            if rows * columns > 10:
                attrs["readability-data-table"] = "true"
            else:
                attrs["readability-data-table"] = "false"

    @staticmethod
    def fix_lazy_images(node_ref: Node) -> None:
        """mod.rs:1232-1310"""
        for node in node_ref.select("img, picture, figure"):
            attrs = node.attributes
            src = attrs.get("src")
            if src is not None:
                m = regexes.B64_DATA_URL_REGEX.search(src)
                if m is not None:
                    if m.group(1) == "image/svg+xml":
                        continue
                    src_could_be_removed = any(
                        regexes.is_match_img_ext(v)
                        for k, v in attrs.items()
                        if k != "src"
                    )
                    if src_could_be_removed:
                        b64_start = regexes.BASE64_REGEX.search(src).start()
                        b64_length = blen(src) - b64_start
                        if b64_length < 133:
                            del attrs["src"]
            src = attrs.get("src")
            srcset = attrs.get("srcset")
            class_ = attrs.get("class")
            if (src is not None or srcset is not None) and (
                class_ is None or "lazy" not in class_
            ):
                continue
            for key, val in list(sorted(attrs.items())):
                if key in ("src", "srcset"):
                    continue
                copy_to = ""
                if regexes.is_match_srcset(val):
                    copy_to = "srcset"
                elif regexes.is_match_src_regex(val):
                    copy_to = "src"
                if copy_to:
                    if node.name in ("img", "picture"):
                        attrs[copy_to] = val
                    elif node.name == "figure":
                        if len(node.select_list("img, picture")) > 0:
                            img = Node.new_element("img", {copy_to: val})
                            node.append(img)

    # -------------------------------------------------------------- cleanup
    def clean_conditionally(self, node_ref: Node, tag_name: str) -> None:
        """mod.rs:1314-1401 — the fishy-content boolean ladder."""
        if not self.flag_is_active(FLAG_CLEAN_CONDITIONALLY):
            return
        is_list = tag_name in ("ul", "ol")

        def is_data_table(n: Node) -> bool:
            return n.attributes.get("readability-data-table") == "true"

        nodes = (
            n
            for n in node_ref.select(tag_name, inclusive=False)
            if not (n.name == "table" and is_data_table(n))
            and not self.has_ancestor_tag(n, tag_name, -1, is_data_table)
        )
        nxt = next(nodes, None)
        while nxt is not None:
            node = nxt
            nxt = next(nodes, None)
            weight = self.get_class_weight(node)
            if weight < 0:
                node.detach()
                continue
            if node.text_contents().count(",") >= 10:
                continue
            can_skip_embed = any(
                e.name == "object"
                or any(
                    regexes.is_match_videos(v) for _, v in e.sorted_attr_items()
                )
                for e in node.select("object, embed, iframe")
            )
            if can_skip_embed:
                continue
            counts = node.count_tags(_CLEAN_COND_TAGS)
            p_nodes = counts["p"]
            img_nodes = counts["img"]
            li_nodes = counts["li"] - 100
            input_nodes = counts["input"]
            p = f32(p_nodes)
            img = f32(img_nodes)
            embed_count = counts["object"] + counts["embed"] + counts["iframe"]
            link_density = self.get_link_density(node)
            content_length = blen(self.get_inner_text(node, None))
            has_figure_ancestor = self.has_ancestor_tag(node, "figure")
            have_to_remove = (
                (img_nodes > 1 and p / img < f32(0.5) and not has_figure_ancestor)
                or (not is_list and li_nodes > p_nodes)
                or (input_nodes > p_nodes // 3)
                or (
                    not is_list
                    and content_length < 25
                    and (img_nodes == 0 or img_nodes > 2)
                    and not has_figure_ancestor
                )
                or (not is_list and weight < 25 and link_density > f32(0.2))
                or (weight >= 25 and link_density > f32(0.5))
                or ((embed_count == 1 and content_length < 75) or embed_count > 1)
            )
            if have_to_remove:
                node.detach()

    @staticmethod
    def clean(node_ref: Node, tag_name: str) -> None:
        """mod.rs:1404-1427 — unconditional removal, video-embed exemption."""
        is_embed = tag_name in ("object", "embed", "iframe")
        nodes = (
            n
            for n in node_ref.select(tag_name, inclusive=False)
            if not is_embed
            or not any(regexes.is_match_videos(v) for _, v in n.sorted_attr_items())
            or n.name == "object"
        )
        nxt = next(nodes, None)
        while nxt is not None:
            cur = nxt
            nxt = next(nodes, None)
            cur.detach()

    def clean_headers(self, node_ref: Node) -> None:
        """mod.rs:1430-1442"""
        nodes = (
            n
            for n in node_ref.select("h1, h2", inclusive=False)
            if self.get_class_weight(n) < 0
        )
        nxt = next(nodes, None)
        while nxt is not None:
            cur = nxt
            nxt = next(nodes, None)
            cur.detach()

    @staticmethod
    def clean_styles(node_ref: Node) -> None:
        """mod.rs:1445-1460"""
        for node in node_ref.descendant_elements(inclusive=True):
            if node.name == "svg":
                continue
            for attr in PRESENTATIONAL_ATTRIBUTES:
                node.attributes.pop(attr, None)
            if node.name in DEPRECATED_SIZE_ATTRIBUTE_ELEMS:
                node.attributes.pop("width", None)
                node.attributes.pop("height", None)

    @staticmethod
    def clean_matched_nodes(
        node_ref: Node, filter_fn: Callable[[Node, str], bool]
    ) -> None:
        """mod.rs:1463-1477"""
        end_marker = Readability.get_next_node(node_ref, True)
        nxt = Readability.get_next_node(node_ref, False)
        while nxt is not None and nxt is not end_marker:
            node = nxt
            class_ = node.attributes.get("class", "")
            id_ = node.attributes.get("id", "")
            if filter_fn(node, class_ + " " + id_):
                nxt = Readability.remove_and_get_next(node)
            else:
                nxt = Readability.get_next_node(node, False)

    def prep_article(self, node_ref: Node) -> None:
        """mod.rs:1481-1591 — fixed cleanup order (observable)."""
        self.clean_styles(node_ref)
        self.mark_data_tables()
        self.fix_lazy_images(node_ref)
        self.clean_conditionally(node_ref, "form")
        self.clean_conditionally(node_ref, "fieldset")
        self.clean(node_ref, "object")
        self.clean(node_ref, "embed")
        self.clean(node_ref, "h1")
        self.clean(node_ref, "footer")
        self.clean(node_ref, "link")
        self.clean(node_ref, "aside")

        for child in node_ref.children():
            self.clean_matched_nodes(
                child,
                lambda n, match_string: regexes.is_match_share_elems(match_string)
                and blen(n.text_contents()) < DEFAULT_CHAR_THRESHOLD,
            )

        h2_nodes = list(islice(node_ref.select("h2"), 2))
        if len(h2_nodes) == 1:
            title_byte_len = blen(self.article_title)
            if title_byte_len > 0:
                h2_text = h2_nodes[0].text_contents()
                rate = f32(blen(h2_text) - title_byte_len) / f32(title_byte_len)
                if abs(rate) < f32(0.5):
                    if rate > f32(0):
                        titles_match = self.article_title in h2_text
                    else:
                        titles_match = h2_text in self.article_title
                    if titles_match:
                        self.clean(node_ref, "h2")

        self.clean(node_ref, "iframe")
        self.clean(node_ref, "input")
        self.clean(node_ref, "textarea")
        self.clean(node_ref, "select")
        self.clean(node_ref, "button")
        self.clean_headers(node_ref)

        self.clean_conditionally(node_ref, "table")
        self.clean_conditionally(node_ref, "ul")
        self.clean_conditionally(node_ref, "div")

        # remove empty <p> (no media children, empty text)
        p_nodes = (
            n
            for n in node_ref.select("p")
            if sum(n.count_tags(_MEDIA_TAGS).values()) == 0
            and self.get_inner_text(n, False) == ""
        )
        nxt = next(p_nodes, None)
        while nxt is not None:
            cur = nxt
            nxt = next(p_nodes, None)
            cur.detach()

        # remove <br> directly preceding a <p>
        br_nodes = (
            n
            for n in node_ref.select("br")
            if (
                lambda nx: nx is not None and nx.is_element and nx.name == "p"
            )(self.next_element(n.next_sibling, True))
        )
        nxt = next(br_nodes, None)
        while nxt is not None:
            cur = nxt
            nxt = next(br_nodes, None)
            cur.detach()

        # single-cell table unwrap
        table_nodes = node_ref.select("table")
        nxt = next(table_nodes, None)
        while nxt is not None:
            table_node = nxt
            nxt = next(table_nodes, None)
            table_child = self.next_element(table_node.first_child, True)
            if self.has_single_tag_inside_element(table_node, "tbody"):
                tbody = table_child
            else:
                tbody = table_node
            if self.has_single_tag_inside_element(tbody, "tr"):
                row = self.next_element(tbody.first_child, True)
                if self.has_single_tag_inside_element(row, "td"):
                    cell = self.next_element(row.first_child, True)
                    tag = (
                        "p"
                        if all(
                            self.is_phrasing_content(c) for c in cell.child_list()
                        )
                        else "div"
                    )
                    cell = self.set_node_tag(cell, tag)
                    if table_node.parent is not None:
                        table_node.parent.append(cell)
                        table_node.detach()

    # --------------------------------------------------------- grab_article
    def grab_article(self) -> None:
        """mod.rs:1603-2131 — candidate scoring, selection, sibling merge and
        the flag-degradation retry loop (re-walks the mutated DOM)."""
        page = self.root_node.select_first("body")
        if page is None:
            raise ReadabilityError("Document has no <body>")
        attempts: list[tuple[Node, int]] = []

        while True:
            self.grab_attempts += 1
            strip_unlikely_candidates = self.flag_is_active(FLAG_STRIP_UNLIKELYS)
            elements_to_score: list[Node] = []
            html_elem = self.root_node.select_first("html")
            node: Optional[Node] = html_elem

            while node is not None:
                node_ref = node
                node_name = node_ref.name
                match_string = (
                    node_ref.attributes.get("class", "")
                    + " "
                    + node_ref.attributes.get("id", "")
                )
                if not self.is_probably_visible(node_ref):
                    node = self.remove_and_get_next(node_ref)
                    continue
                if self.check_byline(node_ref, match_string):
                    node = self.remove_and_get_next(node_ref)
                    continue
                if strip_unlikely_candidates:
                    if (
                        regexes.is_match_unlikely(match_string)
                        and not regexes.is_match_ok_maybe(match_string)
                        and not self.has_ancestor_tag(node_ref, "table")
                        and node_name != "body"
                        and node_name != "a"
                    ):
                        node = self.remove_and_get_next(node_ref)
                        continue
                    if node_ref.attributes.get("role") == "complementary":
                        node = self.remove_and_get_next(node_ref)
                        continue
                if node_name in (
                    "div",
                    "section",
                    "header",
                    "h1",
                    "h2",
                    "h3",
                    "h4",
                    "h5",
                    "h6",
                ):
                    if self.is_element_without_content(node_ref):
                        node = self.remove_and_get_next(node_ref)
                        continue
                if node_name in DEFAULT_TAGS_TO_SCORE:
                    elements_to_score.append(node_ref)
                if node_name == "div":
                    p: Optional[Node] = None
                    child_node = node_ref.first_child
                    while child_node is not None:
                        next_sibling = child_node.next_sibling
                        if self.is_phrasing_content(child_node):
                            if p is not None:
                                p.append(child_node)
                            elif not self.is_whitespace(child_node):
                                new_p = Node.new_element("p")
                                child_node.insert_before(new_p)
                                p = child_node.prev_sibling
                                p.append(child_node)
                        elif p is not None:
                            while p.last_child is not None:
                                if self.is_whitespace(p.last_child):
                                    p.last_child.detach()
                                else:
                                    break
                            p = None
                        child_node = next_sibling
                    if (
                        self.has_single_tag_inside_element(node_ref, "p")
                        and self.get_link_density(node_ref) < f32(0.25)
                    ):
                        new_node = self.next_element(node_ref.first_child, True)
                        elements_to_score.append(new_node)
                        node_ref.insert_before(new_node)
                        new_node = node_ref.prev_sibling
                        node_ref.detach()
                        node = new_node
                        # reference pushes the unwrapped node twice
                        elements_to_score.append(node)
                    elif not self.has_child_block_element(node_ref):
                        node = self.set_node_tag(node_ref, "p")
                        elements_to_score.append(node)
                # NOTE: the reference always advances from `node_ref` here —
                # after a div→p rewrite node_ref is detached and the walk ends
                # (mod.rs:1734).  Bug-faithful.
                node = self.get_next_node(node_ref, False)

            candidates: list[Node] = []
            for elem in elements_to_score:
                parent = elem.parent
                if parent is None or not parent.is_element:
                    continue
                inner_text = self.get_inner_text(elem, None)
                if blen(inner_text) < 25:
                    continue
                ancestors = self.get_node_ancestors(elem, 3)
                if len(ancestors) == 0:
                    continue
                self.nodes_scored += 1
                content_score = 0
                content_score += 1
                content_score += len(inner_text.split(","))
                content_score += min(3, blen(inner_text) // 100)
                for level, ancestor in enumerate(ancestors):
                    if ancestor.parent is None or not ancestor.parent.is_element:
                        continue
                    if READABILITY_SCORE not in ancestor.attributes:
                        self.initialize_node(ancestor)
                        candidates.append(ancestor)
                    if level == 0:
                        score_divider = f32(1)
                    elif level == 1:
                        score_divider = f32(2)
                    else:
                        score_divider = f32(level) * f32(3)
                    old = _parse_score(ancestor.attributes[READABILITY_SCORE])
                    ancestor.attributes[READABILITY_SCORE] = _fmt_score(
                        old + (f32(content_score) / score_divider)
                    )

            self.candidate_count += len(candidates)
            top_candidates: list[Node] = []
            for candidate in candidates:
                candidate_score = f32(0)
                if READABILITY_SCORE in candidate.attributes:
                    candidate_score = _parse_score(
                        candidate.attributes[READABILITY_SCORE]
                    ) * (f32(1) - self.get_link_density(candidate))
                    candidate.attributes[READABILITY_SCORE] = _fmt_score(
                        candidate_score
                    )
                nb_top_candidates = 5
                for i in range(nb_top_candidates):
                    top_candidate = (
                        top_candidates[i] if i < len(top_candidates) else None
                    )
                    if top_candidate is None or candidate_score > _parse_score(
                        top_candidate.attributes.get(READABILITY_SCORE, "0")
                    ):
                        top_candidates.insert(i, candidate)
                        if len(top_candidates) > nb_top_candidates:
                            top_candidates.pop()
                        break

            possible_top = top_candidates[0] if top_candidates else None
            needed_to_create_top_candidate = False

            if possible_top is None or possible_top.name == "body":
                top_candidate = Node.new_element("div")
                needed_to_create_top_candidate = True
                page_children = page.children()
                page_child = next(page_children, None)
                while page_child is not None:
                    child_node = page_child
                    page_child = next(page_children, None)
                    top_candidate.append(child_node)
                page.append(top_candidate)
                self.initialize_node(top_candidate)
            else:
                top_candidate = top_candidates[0]
                top_candidate_score = _parse_score(
                    top_candidate.attributes[READABILITY_SCORE]
                )
                alternative_candidate_ancestors = [
                    self.get_node_ancestors(n, None)
                    for n in top_candidates[1:]
                    if _parse_score(n.attributes[READABILITY_SCORE])
                    / top_candidate_score
                    >= f32(0.75)
                ]
                minimum_top_candidates = 3
                if len(alternative_candidate_ancestors) >= minimum_top_candidates:
                    parent_of_top_candidate = top_candidate.parent
                    while parent_of_top_candidate.name != "body":
                        count = min(
                            sum(
                                1
                                for vec in alternative_candidate_ancestors
                                if any(
                                    a is parent_of_top_candidate for a in vec
                                )
                            ),
                            minimum_top_candidates,
                        )
                        if count >= minimum_top_candidates:
                            top_candidate = parent_of_top_candidate
                            break
                        parent_of_top_candidate = parent_of_top_candidate.parent

                if READABILITY_SCORE not in top_candidate.attributes:
                    self.initialize_node(top_candidate)
                parent_of_top_candidate = top_candidate.parent
                last_score = _parse_score(top_candidate.attributes[READABILITY_SCORE])
                score_threshold = last_score / f32(3)
                while (
                    parent_of_top_candidate.is_element
                    and parent_of_top_candidate.name != "body"
                ):
                    if READABILITY_SCORE not in parent_of_top_candidate.attributes:
                        parent_of_top_candidate = parent_of_top_candidate.parent
                        continue
                    parent_readability = _parse_score(
                        parent_of_top_candidate.attributes[READABILITY_SCORE]
                    )
                    if parent_readability < score_threshold:
                        break
                    if parent_readability > last_score:
                        top_candidate = parent_of_top_candidate
                        break
                    last_score = parent_readability
                    parent_of_top_candidate = parent_of_top_candidate.parent

                parent_of_top_candidate = top_candidate.parent
                while (
                    parent_of_top_candidate.name != "body"
                    and len(parent_of_top_candidate.child_list()) == 1
                ):
                    top_candidate = parent_of_top_candidate
                    parent_of_top_candidate = top_candidate.parent
                if READABILITY_SCORE not in top_candidate.attributes:
                    self.initialize_node(top_candidate)

            article_content = Node.new_element("div")
            top_candidate_score = _parse_score(
                top_candidate.attributes[READABILITY_SCORE]
            )
            sibling_score_threshold = max(f32(10.0), top_candidate_score * f32(0.2))
            parent_of_top_candidate = top_candidate.parent

            siblings = (
                c for c in parent_of_top_candidate.children() if c.is_element
            )
            top_candidate_class = top_candidate.attributes.get("class", "")

            next_sibling = next(siblings, None)
            while next_sibling is not None:
                sibling = next_sibling
                next_sibling = next(siblings, None)
                append = False
                if sibling is top_candidate:
                    append = True
                else:
                    content_bonus = f32(0)
                    sibling_class = sibling.attributes.get("class", "")
                    sibling_score_attr = sibling.attributes.get(READABILITY_SCORE)
                    if sibling_class == top_candidate_class and top_candidate_class != "":
                        content_bonus = content_bonus + top_candidate_score * f32(0.2)
                    if (
                        sibling_score_attr is not None
                        and _parse_score(sibling_score_attr) + content_bonus
                        >= sibling_score_threshold
                    ):
                        append = True
                    elif sibling.name == "p":
                        link_density = self.get_link_density(sibling)
                        node_content = self.get_inner_text(sibling, None)
                        node_length = blen(node_content)
                        if node_length > 80 and link_density < f32(0.25):
                            append = True
                        elif (
                            node_length < 80
                            and node_length > 0
                            and link_density == f32(0)
                            and not regexes.is_match_node_content(node_content)
                        ):
                            append = True
                if append:
                    if sibling.name not in ALTER_TO_DIV_EXCEPTIONS:
                        new_article_child = self.set_node_tag(sibling, "div")
                    else:
                        new_article_child = sibling
                    article_content.append(new_article_child)

            self.prep_article(article_content)
            if needed_to_create_top_candidate:
                top_candidate.attributes["id"] = "readability-page-1"
                top_candidate.attributes["class"] = "page"
            else:
                div = Node.new_element(
                    "div", {"id": "readability-page-1", "class": "page"}
                )
                for child in article_content.children():
                    div.append(child)
                article_content.append(div)

            text_length = blen(self.get_inner_text(article_content, True))
            parse_successful = True
            if text_length < DEFAULT_CHAR_THRESHOLD:
                parse_successful = False
                if self.flag_is_active(FLAG_STRIP_UNLIKELYS):
                    self.remove_flag(FLAG_STRIP_UNLIKELYS)
                    attempts.append((article_content, text_length))
                elif self.flag_is_active(FLAG_WEIGHT_CLASSES):
                    self.remove_flag(FLAG_WEIGHT_CLASSES)
                    attempts.append((article_content, text_length))
                elif self.flag_is_active(FLAG_CLEAN_CONDITIONALLY):
                    self.remove_flag(FLAG_CLEAN_CONDITIONALLY)
                    attempts.append((article_content, text_length))
                else:
                    attempts.append((article_content, text_length))
                    attempts.sort(key=lambda a: -a[1])
                    if attempts[0][1] == 0:
                        raise ReadabilityError("Unable to extract content")
                    article_content = attempts[0][0]
                    parse_successful = True

            if parse_successful:
                parent_ancestors = self.get_node_ancestors(
                    parent_of_top_candidate, None
                )
                ancestors = [parent_of_top_candidate, top_candidate] + parent_ancestors
                for anc in ancestors:
                    if not anc.is_element:
                        continue
                    dir_attr = anc.attributes.get("dir")
                    if dir_attr is not None:
                        self.article_dir = dir_attr
                        break
                self.article_node = article_content
                return

    # -------------------------------------------------------- post-process
    def post_process_content(self, url: str) -> None:
        """mod.rs:777-782"""
        self.fix_relative_uris(url)
        self.clean_classes()
        self.clean_readability_attrs()

    def clean_classes(self) -> None:
        """mod.rs:625-644 — classes-to-preserve list is empty."""
        classes_to_preserve: frozenset[str] = frozenset()
        if self.article_node is None:
            return
        for elem in self.article_node.descendant_elements(inclusive=True):
            class_list = elem.attributes.get("class")
            if class_list is not None:
                filtered = "".join(
                    " " + c
                    for c in class_list.split()
                    if c in classes_to_preserve
                )
                if filtered == "":
                    del elem.attributes["class"]
                else:
                    elem.attributes["class"] = filtered

    def clean_readability_attrs(self) -> None:
        """mod.rs:766-774"""
        if self.article_node is None:
            return
        for node in self.article_node.descendant_elements(inclusive=True):
            node.attributes.pop(READABILITY_SCORE, None)
            node.attributes.pop("readability-data-table", None)

    # URL handling mirrors the rust `url` crate closely enough for the
    # fixture corpus: absolute URLs with a host are normalized, scheme-only
    # URLs pass through, relative URLs join against <base> or the document.
    @staticmethod
    def _is_absolute_url(uri: str) -> bool:
        return re.match(r"^[a-zA-Z][a-zA-Z0-9+.\-]*:", uri) is not None

    @staticmethod
    def _normalize_abs(uri: str) -> str:
        parts = urlsplit(uri)
        path = parts.path
        if parts.netloc and path == "":
            path = "/"
        return urlunsplit(
            (parts.scheme.lower(), parts.netloc.lower(), path, parts.query, parts.fragment)
        )

    def fix_relative_uris(self, document_uri: str) -> None:
        """mod.rs:647-763"""
        if self.article_node is None:
            return
        doc_uri = self._normalize_abs(document_uri)
        base_uri = doc_uri
        for base_node in self.root_node.select("base"):
            href = base_node.attributes.get("href")
            if href is None:
                continue
            if self._is_absolute_url(href):
                base_uri = self._normalize_abs(href)
            else:
                base_uri = self._normalize_abs(urljoin(doc_uri, href))
            break

        def to_absolute_uri(uri_str: str) -> str:
            if base_uri == doc_uri and uri_str.startswith("#"):
                return uri_str
            if self._is_absolute_url(uri_str):
                if urlsplit(uri_str).netloc != "":
                    return self._normalize_abs(uri_str)
                return uri_str
            try:
                return self._normalize_abs(urljoin(base_uri, uri_str))
            except ValueError:
                return uri_str

        links = (
            a
            for a in self.article_node.select("a")
            if "href" in a.attributes
        )
        link = next(links, None)
        while link is not None:
            link_ref = link
            link = next(links, None)
            href = link_ref.attributes["href"]
            if href.startswith("javascript:"):
                children = link_ref.child_list()
                if len(children) == 1 and children[0].is_text:
                    text_node = Node.new_text(link_ref.text_contents())
                    link_ref.insert_before(text_node)
                    link_ref.detach()
                else:
                    container = Node.new_element("span")
                    child_iter = link_ref.children()
                    child = next(child_iter, None)
                    while child is not None:
                        cur = child
                        child = next(child_iter, None)
                        container.append(cur)
                    link_ref.insert_before(container)
                    link_ref.detach()
            else:
                link_ref.attributes["href"] = to_absolute_uri(href)

        for media_node in self.article_node.select(
            "img, picture, figure, video, audio, source"
        ):
            attrs = media_node.attributes
            if "src" in attrs:
                attrs["src"] = to_absolute_uri(attrs["src"])
            if "poster" in attrs:
                attrs["poster"] = to_absolute_uri(attrs["poster"])
            if "srcset" in attrs:
                attrs["srcset"] = regexes.SRCSET_CAPTURE_REGEX.sub(
                    lambda m: to_absolute_uri(m.group(1))
                    + (m.group(2) or "")
                    + m.group(3),
                    attrs["srcset"],
                )
