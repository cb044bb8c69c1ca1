"""Fixture document corpus (FIXTURES.md §2): each archetype derives from a
concrete test input in /root/reference/ (cited per entry) and is encoded into
the interleaved ``documents`` span shape via :func:`codec.html_to_spans`.
Deterministic — no randomness; `fx-mega` uses fixed repetition counts."""

from __future__ import annotations

from typing import Any

from .codec import html_to_spans

BASE_URL = "http://example.com/"

# test_html/simple.html (used via mod.rs:2185), inlined verbatim
FX_SIMPLE = """<!DOCTYPE html>
<html lang="en">
<head>
    <title>Sample Document</title>
</head>
<body>
    <h1>Some text in h1</h1>
    <img src="inexistent.png">
    <div class="invalid-elems">
        <!-- This div contains invalid elements -->
        <h1>Imagine some lorem ipsum</h1>
        <img>
    </div>
    <!-- Test that the no-script content is copied over -->
    <img src="lazy-load.png">
    <noscript>
        <div class="parent">
            <img src="eager-load.png" id="lazy-load">
        </div>
    </noscript>
</body>
</html>
"""

# extractor.rs:85-112
FX_EXTRACTOR = """
        <!doctype html>
        <html lang="en">
            <head>
                <meta charset="utf-8">
                <meta name="description" content="A sample document">
                <meta name="keywords" content="test,Rust">
                <meta name="author" content="Paperoni">
                <title>Testing Paperoni</title>
            </head>
            <body>
                <header>
                <!-- Unimportant information -->
                    <h1>Testing Paperoni</h1>
                </header>
                <article>
                    <h1>Starting out</h1>
                    <p>Some Lorem Ipsum text here</p>
                    <p>Observe this picture</p>
                    <img src="./img.jpg" alt="Random image">
                    <img src="data:image/png;base64,lJGWEIUQOIQWIDYVIVEDYFOUYQFWD">
                </article>
                <footer>
                    <p>Made in HTML</p>
                </footer>
            </body>
        </html>
        """

# mod.rs:2406-2419 (op: replace_brs mod.rs:257-332)
FX_BRS = "<div>foo<br>bar<br> <br><br>abc</div>"

_PARA = (
    "<p>Lorem ipsum dolor sit amet, consectetur adipiscing elit, sed do "
    "eiusmod tempor incididunt ut labore et dolore magna aliqua. Ut enim ad "
    "minim veniam, quis nostrud exercitation ullamco laboris nisi ut aliquip "
    "ex ea commodo consequat.</p>"
)


def _article(body: str, title: str = "Fixture article") -> str:
    return (
        "<!DOCTYPE html><html><head><title>"
        + title
        + '</title></head><body><article id="main-content">'
        + body
        + "</article></body></html>"
    )


# composed per FIXTURES.md fx-grab-smoke (thresholds mod.rs:15, :2083)
FX_GRAB_SMOKE = _article(_PARA * 8 + '<img src="https://example.com/images/pic.png">' + _PARA * 4)
FX_GRAB_RETRY = _article(_PARA)  # < 500 bytes total → flag-degradation retries
FX_GRAB_EMPTY = "<!DOCTYPE html><html><body></body></html>"

# mod.rs:3415-3529 kitchen-sink (abridged to the structural core, same ops)
FX_PREP_ARTICLE = """
<!DOCTYPE html>
<html>
  <head><title>A test HTML file</title></head>
  <body>
    <div class="search">Search for other posts
      <input type="search" placeholder="Type here...">
      <button id="search-btn">Search</button>
    </div>
    <aside>Some content aside</aside>
    <article id="content">
""" + _PARA * 6 + """
      <table id="tbl-data">
        <caption>Monthly savings</caption>
        <tr><th>Month</th><th>Savings</th></tr>
        <tr><td>January</td><td>$100</td></tr>
        <tr><td>February</td><td>$50</td></tr>
      </table>
      <table width="100%" border="0" id="tbl-layout">
        <tr valign="top"><td width="20%">Left</td><td>Main</td><td>Right</td></tr>
      </table>
      <p class="share">Share this as a <a href="https://example.com/tweet">Tweet</a></p>
      <img src="https://example.com/images/inline.jpg">
""" + _PARA * 4 + """
    </article>
    <footer>Copyright 2020</footer>
  </body>
</html>
"""

FX_TITLES = [
    "<!DOCTYPE html><html><head><title>Porting Readability to Rust</title></head><body>" + _PARA * 8 + "</body></html>",
    "<!DOCTYPE html><html><head><title>Crates.io: The Rust package repository</title></head><body>" + _PARA * 8 + "</body></html>",
    "<!DOCTYPE html><html><head><title>Foo developer » Blog Post on Foo bar stuff</title></head><body>" + _PARA * 8 + "</body></html>",
    "<!DOCTYPE html><html><head><title>Blog</title></head><body><h1>Getting started with Rust</h1>" + _PARA * 8 + "</body></html>",
]

FX_META = [
    """<!DOCTYPE html><html><head>
        <meta name="description" content="A post on how hard it is to work with text."/>
        <title>Foo Coder / Blog on the difficulty of using utf-8</title>
        <meta name="author" content="Foo Coder"/>
        </head><body>""" + _PARA * 8 + "</body></html>",
    """<!DOCTYPE html><html><head>
        <meta name="title" content="A Long Title" />
        <meta name="description" content="Foo bar baz bo&#223;" />
        <meta property="og:site_name" content="Blog Place" />
        <meta property="og:title" content="A Longer Title" />
        <meta name="dc:creator" content="F&#x00f6;o Coder" />
        <title>The Longest Title</title>
        </head><body>""" + _PARA * 8 + "</body></html>",
]

# mod.rs:3774-3850 URL-resolution cases inside a real article body
FX_REL_URI = _article(
    _PARA * 6
    + '<img src="https://example.image.com/images/1.jpg">'
    + '<img src="../images/2.jpg">'
    + '<img src="./images/3.jpg">'
    + '<img src="/images/4.jpg">'
    + '<p><a href="#frag">First image</a> and <a href="../home.html">home</a></p>'
    + _PARA * 4
)

# mod.rs:2560-2599 byline capture inside an article
FX_BYLINE = _article(
    '<p class="author">A Paperoni maintainer</p>' + _PARA * 10
)

# mod.rs:2507-2560 visibility pruning
FX_VISIBILITY = _article(
    '<div style="display: none"><p>hidden cruft</p></div>'
    + '<div aria-hidden="true"><p>aria hidden</p></div>'
    + _PARA * 10
)

# unlikely-candidate stripping (regexes.rs:34-39) + negative class weights
FX_UNLIKELY = _article(
    '<div class="sidebar">Navigation links everywhere</div>'
    + '<div class="comment">A comment that should vanish</div>'
    + _PARA * 10
)

FX_LAZY_IMG = _article(
    _PARA * 8
    + '<img class="lazy" src="placeholder.jpg" data-src="./720x640.jpg">'
    + _PARA * 3
)

# mod.rs:3058-3156 data-vs-layout tables inside an extractable article
FX_DATA_TABLES = _article(
    _PARA * 6
    + """<table id="tbl-data"><caption>Monthly savings</caption>
        <tr><th>Month</th><th>Savings</th></tr>
        <tr><td>January</td><td>$100</td></tr>
        <tr><td>February</td><td>$50</td></tr></table>
        <table width="100%" border="0" id="tbl-layout">
        <tr valign="top"><td width="20%">Left</td><td>Mid</td><td>Right</td></tr></table>"""
    + _PARA * 5
)

# mod.rs:3214-3283 conditional-clean ladder targets
FX_CLEAN_COND = _article(
    _PARA * 6
    + '<div class="comment"><p>negative-weight div to be removed</p></div>'
    + '<div id="embeds"><iframe width="420" height="345" src="https://www.youtube.com/embed/dQw4w9WgXcQ"></iframe></div>'
    + '<div id="linkfarm"><a href="https://example.com/1">one</a> <a href="https://example.com/2">two</a> <a href="https://example.com/3">three</a></div>'
    + _PARA * 5
)

# mod.rs:2930-3015 class/id weights steering candidate choice
FX_CLASSWEIGHT = (
    "<!DOCTYPE html><html><head><title>Weighted fixture</title></head><body>"
    + '<div id="sidebar" class="widget">' + _PARA + "</div>"
    + '<div id="blog" class="main article">' + _PARA * 10 + "</div>"
    + '<div id="comments">' + _PARA + "</div>"
    + "</body></html>"
)

# mod.rs:2282-2316 phrasing-content wrapping inside a div
FX_PHRASING = _article(
    "<div>Loose text with <b>bold</b> and <a href='https://example.com/x'><i>nested phrasing</i></a> runs"
    + _PARA * 8
    + "</div>"
)

FX_MEGA_REPEATS = 150  # fixed, not sampled (FIXTURES.md §3)
FX_MEGA = _article((_PARA + '<img src="https://example.com/images/m.png">') * FX_MEGA_REPEATS)

# ---- round-2 additions: kernel paths the e2e corpus did not yet reach
# (found by line-tracing readability.py under fixture+synthetic extraction;
# each cites the operator it pins)

# replace_brs double-<br> collapse + trailing-whitespace swallow (mod.rs:257-332)
FX_DOUBLE_BR = _article(
    _PARA * 6
    + "line one<br><br>line two continues with enough words to matter<br> <br>line three"
    + _PARA * 4
)

# <font> → <span> rename during prep_document (mod.rs:234-250)
FX_FONT = _article(
    _PARA * 6
    + '<p>Styled <font color="red">legacy font content</font> inline.</p>'
    + _PARA * 4
)

# <base href> participates in relative-URI resolution (mod.rs:647-700)
FX_BASE_HREF = (
    "<!DOCTYPE html><html><head><title>Base href fixture</title>"
    '<base href="https://cdn.example.net/sub/dir/">'
    '</head><body><article id="main-content">'
    + _PARA * 6
    + '<img src="./images/base-rel.jpg"><img src="../up.png">'
    + '<p><a href="doc.html">relative link</a></p>'
    + _PARA * 4
    + "</article></body></html>"
)

# article dir attribute capture (mod.rs:2122-2128)
FX_RTL = (
    "<!DOCTYPE html><html><head><title>RTL fixture</title></head>"
    '<body><article id="main-content" dir="rtl">'
    + _PARA * 10
    + "</article></body></html>"
)

# byline via rel="author" (mod.rs:887-910)
FX_BYLINE_REL = _article(
    '<p><a rel="author" href="/about/jane">Jane Doe</a></p>' + _PARA * 10
)

# lone-h2-matches-title removal (mod.rs:1517-1537)
FX_LONE_H2 = _article(
    "<h2>Lone Heading Fixture</h2>" + _PARA * 10, title="Lone Heading Fixture"
)

# clean_matched_nodes: share/social children under the char threshold
FX_SHARE = _article(
    _PARA * 6
    + '<div class="share-tools">Share on <a href="https://social.example/x">X</a></div>'
    + '<div class="social buttons">Like</div>'
    + _PARA * 4
)

# sibling merge: scored div siblings + a long link-free <p> sibling of the
# top candidate (append paths mod.rs:2036-2072)
_P_LONG_TEXT = (
    "This loose paragraph sits beside the main content and carries more than "
    "eighty characters of plain prose with no links at all, so the sibling "
    "merge adopts it."
)
FX_SIBLINGS = (
    "<!DOCTYPE html><html><head><title>Sibling merge fixture</title></head><body>"
    + '<div class="post body">' + _PARA * 10 + "</div>"
    + '<div class="post body">' + _PARA * 3 + "</div>"
    + "<p>" + _P_LONG_TEXT + "</p>"
    + "</body></html>"
)

# javascript: link unwrap — single text child vs multi-child span wrap
# (mod.rs:712-745)
FX_JS_LINKS = _article(
    _PARA * 6
    + '<p>Go <a href="javascript:void(0)">plain text link</a> now.</p>'
    + '<p>Or <a href="javascript:run()">click <b>this</b> rich link</a>.</p>'
    + _PARA * 4
)

# <video poster> made absolute (mod.rs:747-757)
FX_VIDEO_POSTER = _article(
    _PARA * 6
    + '<video poster="./poster.jpg" src="./clip.mp4"></video>'
    + _PARA * 4
)

# quoted inline-CSS declarations through the hand-rolled scanner
# (mod.rs:785-854) feeding is_probably_visible
FX_CSS_QUOTES = _article(
    '<p style="font-family: \'serif;x\'; visibility: visible">Quoted style content survives.</p>'
    + '<div style="content: &quot;a;b&quot;; display: none"><p>hidden by quoted-decl style</p></div>'
    + _PARA * 10
)

# title separator heuristics: dash-separated title longer than the h1
# (mod.rs:562-621)
FX_TITLE_SEP = (
    "<!DOCTYPE html><html><head><title>Deep Dive into Distributed Extraction - Foo Developer Blog</title></head>"
    "<body><h1>A different heading entirely</h1>"
    + _PARA * 8
    + "</body></html>"
)

# hierarchical separator (»): keeps the leading parts (mod.rs:569-584)
FX_TITLE_HIER = (
    "<!DOCTYPE html><html><head><title>The Publication Network » Long Reads » A Story About Parsers</title></head>"
    "<body><h1>Totally unrelated heading</h1>" + _PARA * 8 + "</body></html>"
)

# colon-separated title with no matching heading (mod.rs:585-599)
FX_TITLE_COLON = (
    "<!DOCTYPE html><html><head><title>Engine Weekly: Building Extraction Pipelines That Scale</title></head>"
    "<body><h1>Another heading</h1>" + _PARA * 8 + "</body></html>"
)

# initialize_node tag priors: blockquote/pre ancestors of scored <p>s
# (mod.rs:1120-1131)
FX_BLOCKQUOTE = _article(
    _PARA * 5
    + "<blockquote>" + _PARA * 2 + "</blockquote>"
    + "<pre>" + _PARA + "</pre>"
    + _PARA * 4
)

# fix_lazy_images: tiny base64-gif placeholder replaced from data-src, and
# the <figure> descendant branch (mod.rs:1250-1305)
FX_LAZY_B64 = _article(
    _PARA * 6
    + '<img src="data:image/gif;base64,R0lGODlhAQABAAD/ACwAAAAAAQABAAACADs=" data-src="./real-image.jpg">'
    + '<figure class="lazy" data-src="./figure-image.jpg"><img alt="inner"></figure>'
    + _PARA * 4
)

# single-cell table unwrapped to <p> at the end of prep_article
# (mod.rs:1559-1589) — cell text is comma-rich so clean_conditionally keeps
# the table alive until the unwrap step
FX_SINGLE_CELL = _article(
    _PARA * 6
    + "<table><tbody><tr><td>A single cell, quite full of commas, clauses, "
    "and phrases, keeps this table, despite the ladder, alive, intact, and "
    "unwrappable, into a paragraph, at the very end.</td></tr></tbody></table>"
    + _PARA * 4
)

# double-escaped numeric entities in metadata: the tokenizer unescapes one
# level, the kernel's unescape_html_entities (mod.rs:531-559) handles the
# surviving &#...; references, incl. the named-escape map
FX_META_DOUBLE_ESC = (
    "<!DOCTYPE html><html><head>"
    '<meta name="description" content="Caf&amp;#233; piece about &amp;#x00e9;clairs &amp;amp; butter"/>'
    '<meta name="author" content="R&amp;#233;my l&amp;quot;Auteur"/>'
    "<title>Entity Fixture Long Title Here</title></head><body>"
    + _PARA * 8
    + "</body></html>"
)

# colon-title fallbacks (mod.rs:585-599): (a) last-colon tail under 3 words
# falls back to the FIRST colon; (b) a >5-word prefix keeps the whole title
FX_TITLE_COLON_TAIL = (
    "<!DOCTYPE html><html><head><title>Site News: Read This Part: Now</title></head>"
    "<body><h1>Other</h1>" + _PARA * 8 + "</body></html>"
)
FX_TITLE_COLON_LONGPRE = (
    "<!DOCTYPE html><html><head><title>One Two Three Four Five Six: The Post Title Here</title></head>"
    "<body><h1>Other</h1>" + _PARA * 8 + "</body></html>"
)

# negative tag priors: scored <p> under <ul>/<li> ancestors (mod.rs:1125-1131)
FX_LIST_CONTENT = _article(
    _PARA * 5
    + "<ul><li>" + _PARA + "</li><li>" + _PARA + "</li></ul>"
    + _PARA * 4
)

# alternative-ancestor promotion: >=3 runner-up candidates sharing a parent
# with >=75% of the top score promote that parent (mod.rs:1900-1933)
FX_PROMOTION = (
    "<!DOCTYPE html><html><head><title>Promotion fixture</title></head><body>"
    + "<div id='wrapper'>"
    + ("<div class='entry'>" + _PARA * 3 + "</div>") * 4
    + "</div>"
    + "<div id='unrelated'><p>tiny</p></div>"
    + "</body></html>"
)


def fixture_corpus() -> list[dict[str, Any]]:
    """All fixture documents as ``documents``-table rows."""
    docs: list[tuple[str, str]] = [
        ("fx-simple", FX_SIMPLE),
        ("fx-extractor", FX_EXTRACTOR),
        ("fx-brs", FX_BRS),
        ("fx-prep-article", FX_PREP_ARTICLE),
        ("fx-grab-smoke", FX_GRAB_SMOKE),
        ("fx-grab-retry", FX_GRAB_RETRY),
        ("fx-grab-empty", FX_GRAB_EMPTY),
        ("fx-rel-uri", FX_REL_URI),
        ("fx-byline", FX_BYLINE),
        ("fx-visibility", FX_VISIBILITY),
        ("fx-unlikely", FX_UNLIKELY),
        ("fx-lazy-img", FX_LAZY_IMG),
        ("fx-data-tables", FX_DATA_TABLES),
        ("fx-clean-cond", FX_CLEAN_COND),
        ("fx-classweight", FX_CLASSWEIGHT),
        ("fx-phrasing", FX_PHRASING),
        ("fx-mega", FX_MEGA),
        ("fx-double-br", FX_DOUBLE_BR),
        ("fx-font", FX_FONT),
        ("fx-base-href", FX_BASE_HREF),
        ("fx-rtl", FX_RTL),
        ("fx-byline-rel", FX_BYLINE_REL),
        ("fx-lone-h2", FX_LONE_H2),
        ("fx-share", FX_SHARE),
        ("fx-siblings", FX_SIBLINGS),
        ("fx-js-links", FX_JS_LINKS),
        ("fx-video-poster", FX_VIDEO_POSTER),
        ("fx-css-quotes", FX_CSS_QUOTES),
        ("fx-title-sep", FX_TITLE_SEP),
        ("fx-title-hier", FX_TITLE_HIER),
        ("fx-title-colon", FX_TITLE_COLON),
        ("fx-blockquote", FX_BLOCKQUOTE),
        ("fx-lazy-b64", FX_LAZY_B64),
        ("fx-single-cell", FX_SINGLE_CELL),
        ("fx-promotion", FX_PROMOTION),
        ("fx-meta-double-esc", FX_META_DOUBLE_ESC),
        ("fx-title-colon-tail", FX_TITLE_COLON_TAIL),
        ("fx-title-colon-longpre", FX_TITLE_COLON_LONGPRE),
        ("fx-list-content", FX_LIST_CONTENT),
    ]
    docs += [(f"fx-title-{i}", h) for i, h in enumerate(FX_TITLES)]
    docs += [(f"fx-meta-{i}", h) for i, h in enumerate(FX_META)]
    return [
        {"doc_id": doc_id, "spans": html_to_spans(html)} for doc_id, html in docs
    ]
