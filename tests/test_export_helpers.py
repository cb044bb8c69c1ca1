"""Port of the reference's export-helper tests (epub.rs:495-649 test module,
http.rs:328-345)."""

from __future__ import annotations

import hashlib

from paperoni_spark.dom import parse_html
from paperoni_spark.kernel.export_helpers import (
    generate_header_ids,
    get_header_level_toc_vec,
    hash_url,
    map_mime_subtype_to_ext,
    replace_escaped_characters,
)


def md5hex(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


# epub.rs:502-517
def test_replace_escaped_characters():
    assert replace_escaped_characters("Lorem ipsum") == "Lorem ipsum"
    assert (
        replace_escaped_characters("Memory safe > memory unsafe")
        == "Memory safe &gt; memory unsafe"
    )
    assert (
        replace_escaped_characters("Author Name <author@mail.example>")
        == "Author Name &lt;author@mail.example&gt;"
    )


# epub.rs:519-554
def test_generate_header_ids():
    html_str = """
<!DOCTYPE html>
<html>
    <body>
        <h1>Heading 1</h1>
        <h2 id="heading-2">Heading 2</h2>
        <h2 id="heading-2-again">Heading 2 again</h2>
        <h4>Heading 4</h4>
        <h1>Heading 1 again</h1>
        <h3 class="heading">Heading 3</h3>
    </body>
</html>
        """
    doc = parse_html(html_str)
    generate_header_ids(doc)

    headers = doc.select_list("h1, h2, h3, h4")
    assert all(h.attributes.get("id", "").strip() != "" for h in headers)

    assert doc.select_first(f"h1#_{md5hex('Heading 1')}") is not None
    assert doc.select_first(f"h1#_{md5hex('Heading 1 again')}") is not None
    assert doc.select_first("h2#heading-2-again") is not None


# epub.rs:557-648
def test_get_header_level_toc_vec():
    doc = parse_html(
        "<!DOCTYPE html><html><body><p>Lorem ipsum</p></body></html>"
    )
    assert get_header_level_toc_vec("index.xhtml", doc) == []

    html_str = """
        <!DOCTYPE html>
        <html>
            <body>
                <h1 id="heading-1">Heading 1</h1>
                <p>Lorem ipsum</p>
                <div>
                    <h2 id="heading-2">Heading 2</h2>
                    <p>Lorem ipsum</p>
                    <p>Lorem ipsum</p>
                </div>
                <h3 id="subheading-3">Subheading 3</h2>
                <p>Lorem ipsum</p>
                <h1 id="heading-2">Second Heading 1</h2>
                <p>Lorem ipsum</p>
            </body>
        </html>
        """
    toc_vec = get_header_level_toc_vec("index.xhtml", parse_html(html_str))
    assert len(toc_vec) == 2

    first_h1 = toc_vec[0]
    assert first_h1.title == "Heading 1"
    assert len(first_h1.children) == 1
    h2 = first_h1.children[0]
    assert h2.title == "Heading 2"
    assert len(h2.children) == 1
    h3 = h2.children[0]
    assert h3.title == "Subheading 3"
    assert h3.children == []

    last_h1 = toc_vec[-1]
    assert last_h1.title == "Second Heading 1"
    assert last_h1.children == []

    html_str = """
        <!DOCTYPE html>
        <html>
            <body>
                <h1 id="heading-1">Heading 1</h1>
                <p>Lorem ipsum</p>
                <div>
                    <h2 id="heading-2">Heading 2</h2>
                    <p>Lorem ipsum</p>
                    <p>Lorem ipsum</p>
                    <h3 id="subheading-3">Subheading 3</h2>
                    <p>Lorem ipsum</p>
                </div>
                <h2 id="heading-2">Heading 2</h2>
                <p>Lorem ipsum</p>
                <h4 id="subheading-4">Subheading 4</h4>
                <h2 id="conclusion">Conclusion</h2>
            </body>
        </html>
        """
    toc_vec = get_header_level_toc_vec("index.xhtml", parse_html(html_str))
    assert len(toc_vec) == 1
    h1 = toc_vec[0]
    assert h1.title == "Heading 1"
    assert len(h1.children) == 3
    first_h2 = h1.children[0]
    assert first_h2.title == "Heading 2"
    assert len(first_h2.children) == 1
    h3 = first_h2.children[0]
    assert h3.title == "Subheading 3"
    assert h3.children == []


# http.rs:328-345
def test_map_mime_subtype_to_ext():
    subtypes = ["apng", "bmp", "gif", "x-icon", "jpeg", "png", "svg+xml", "tiff", "webp"]
    assert [map_mime_subtype_to_ext(s) for s in subtypes] == [
        "apng", "bmp", "gif", "ico", "jpeg", "png", "svg", "tiff", "webp",
    ]


def test_hash_url():
    assert hash_url("http://example.com/a.png") == md5hex("http://example.com/a.png")


# ---------------------------------------------------------------- html.rs


# html.rs:386-397
def test_insert_title_elem():
    from paperoni_spark.kernel.export_helpers import insert_title_elem

    doc = parse_html('<html><head><meta charset="UTF-8"/></head><body></body></html>')
    assert len(doc.select_list("title")) == 0
    insert_title_elem(doc, "Sample title")
    assert len(doc.select_list("title")) == 1
    assert doc.select_first("title").text_contents() == "Sample title"
    # missing <head>: one is created and prepended to <html>
    doc2 = parse_html("<html><body><p>x</p></body></html>")
    for head in doc2.select_list("head"):
        head.detach()
    insert_title_elem(doc2, "T2")
    html_elem = doc2.select_first("html")
    first = html_elem.first_child
    assert first.name == "head"
    assert first.select_first("title").text_contents() == "T2"


# html.rs:411-441
def test_inline_css():
    from paperoni_spark.kernel.export_helpers import (
        BODY_STYLESHEET,
        HEADERS_STYLESHEET,
        inline_css,
    )

    src = '<html><head><meta charset="UTF-8"/></head><body><p>Lorem ipsum.</p></body></html>'
    doc = parse_html(src)
    assert len(doc.select_list("style")) == 0
    inline_css(doc, "none")
    assert len(doc.select_list("style")) == 0
    inline_css(doc, "no_headers")
    assert len(doc.select_list("style")) == 1
    assert doc.select_first("style").text_contents() == BODY_STYLESHEET

    doc = parse_html(src)
    inline_css(doc, "all")
    assert len(doc.select_list("style")) == 1
    assert (
        doc.select_first("style").text_contents()
        == BODY_STYLESHEET + HEADERS_STYLESHEET
    )
    # prepended: the style is head's first child
    assert doc.select_first("head").first_child.name == "style"


# html.rs:442-452
def test_remove_existing_stylesheet_link():
    from paperoni_spark.kernel.export_helpers import remove_existing_stylesheet_link

    doc = parse_html(
        '<html><head><link href="stylesheet.css"></link></head>'
        "<body><p>Lorem ipsum.</p></body></html>"
    )
    assert len(doc.select_list("link")) == 1
    remove_existing_stylesheet_link(doc)
    assert len(doc.select_list("link")) == 0
    # only the stylesheet link is touched
    doc2 = parse_html('<html><head><link href="other.css"/></head><body></body></html>')
    remove_existing_stylesheet_link(doc2)
    assert len(doc2.select_list("link")) == 1


# html.rs:453-484
def test_insert_appendix():
    from paperoni_spark.kernel.export_helpers import insert_appendix

    doc = parse_html(
        '<html><head><meta charset="UTF-8"/></head>'
        "<body><p>Lorem ipsum.</p></body></html>"
    )
    assert len(doc.select_list("footer")) == 0
    # empty title falls back to the url (MetaData::new() has no title)
    insert_appendix(doc, [("", "http://example.org")])
    footer = doc.select_first("footer")
    assert footer is not None
    h2, h3 = footer.select_first("h2"), footer.select_first("h3")
    assert h2.text_contents() == "Appendix"
    assert h3.text_contents() == "Article sources"
    anchors = doc.select_list("a")
    assert len(anchors) == 1
    assert anchors[0].text_contents() == "http://example.org"
    assert anchors[0].attributes.get("href") == "http://example.org"
    # reference's "<br></br>" materializes two <br> elements per link
    assert len(footer.select_list("br")) == 2


# html.rs:164-191
def test_resolve_export_filename_collisions():
    from paperoni_spark.kernel.export_helpers import resolve_export_filename

    names: set[str] = set()
    a = resolve_export_filename("My/Article\\Title", names)
    assert a == "./My Article Title.html"
    # same title again: suffixed with the set size at rename time
    b = resolve_export_filename("My/Article\\Title", names)
    assert b == "./My Article Title_1.html"
    assert names == {a, b}
    c = resolve_export_filename("Other", names, output_directory="/tmp/out")
    assert c == "/tmp/out/Other.html"


# html.rs:262-285
def test_update_imgs_base64():
    import base64

    from paperoni_spark.kernel.export_helpers import update_imgs_base64

    doc = parse_html(
        '<html><body><img src="aaa.png"/><img src="bbb.jpg"/>'
        '<img src="aaa.png"/></body></html>'
    )
    spool = {"aaa.png": b"PNGDATA", "bbb.jpg": b"JPGDATA"}
    update_imgs_base64(doc, [("aaa.png", "image/png"), ("bbb.jpg", None)], spool.__getitem__)
    srcs = [img.attributes["src"] for img in doc.select_list("img")]
    png64 = base64.b64encode(b"PNGDATA").decode()
    jpg64 = base64.b64encode(b"JPGDATA").decode()
    # bug-faithful scheme: data:image:{mime} (colon), image/* fallback
    assert srcs[0] == f"data:image:image/png;base64,{png64}"
    assert srcs[2] == srcs[0]  # every matching img is rewritten
    assert srcs[1] == f"data:image:image/*;base64,{jpg64}"


# html.rs:288-307
def test_update_img_urls():
    from paperoni_spark.kernel.export_helpers import update_img_urls

    doc = parse_html('<html><body><img src="abc123"/></body></html>')
    copied = []
    update_img_urls(doc, [("abc123", None)], "Article Title", lambda u, d: copied.append((u, d)))
    assert copied == [("abc123", "Article Title/abc123")]
    assert doc.select_first("img").attributes["src"] == "Article Title/abc123"
    # Path::join semantics (html.rs:292): an absolute img_url REPLACES the
    # base directory — not a doubled "base//abs" path
    doc2 = parse_html('<html><body><img src="/abs/pic"/></body></html>')
    copied2 = []
    update_img_urls(doc2, [("/abs/pic", None)], "Article Title", lambda u, d: copied2.append((u, d)))
    assert copied2 == [("/abs/pic", "/abs/pic")]
    assert doc2.select_first("img").attributes["src"] == "/abs/pic"


def test_insert_meta_charset():
    from paperoni_spark.kernel.export_helpers import insert_meta_charset

    doc = parse_html("<html><head></head><body></body></html>")
    insert_meta_charset(doc)
    metas = [
        m for m in doc.select_list("meta") if m.attributes.get("charset") == "UTF-8"
    ]
    assert len(metas) == 1
