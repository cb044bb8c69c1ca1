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
