"""Port of /root/reference/src/extractor.rs tests plus grab_article
end-to-end smoke coverage (thresholds from mod.rs:15, :2081-2106)."""

from __future__ import annotations

import pytest

from paperoni_spark.kernel import Article, Readability, ReadabilityError

# extractor.rs:85-112
TEST_HTML = """
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


# extractor.rs:114-127
def test_extract_img_urls():
    article = Article.from_html(TEST_HTML, "http://example.com/")
    article.extract_content()
    article.extract_img_urls()
    assert len(article.img_urls) > 0
    assert article.img_urls == [("http://example.com/img.jpg", None)]


def _long_article_html(n_paragraphs: int = 12) -> str:
    paragraph = (
        "<p>Lorem ipsum dolor sit amet, consectetur adipiscing elit, sed do "
        "eiusmod tempor incididunt ut labore et dolore magna aliqua.</p>"
    )
    return f"""
        <!DOCTYPE html>
        <html>
            <head><title>A long article</title></head>
            <body>
                <article id="main-content">
                    {paragraph * n_paragraphs}
                </article>
            </body>
        </html>
        """


def test_grab_article_success_over_threshold():
    doc = Readability(_long_article_html())
    doc.parse("http://example.com/")
    assert doc.article_node is not None
    text = doc.article_node.text_contents()
    assert len(text.encode("utf-8")) >= 500
    assert "Lorem ipsum" in text
    # only one flag pass needed
    assert doc.grab_attempts == 1


def test_grab_article_retry_path_under_threshold():
    # under 500 bytes of content → flag-degradation retries, best attempt kept
    doc = Readability(_long_article_html(n_paragraphs=2))
    doc.parse("http://example.com/")
    assert doc.article_node is not None
    assert doc.grab_attempts == 4  # all three flags dropped + final attempt
    assert "Lorem ipsum" in doc.article_node.text_contents()


def test_grab_article_empty_doc_errors():
    doc = Readability("<!DOCTYPE html><html><body></body></html>")
    with pytest.raises(ReadabilityError):
        doc.parse("http://example.com/")


def test_grab_article_no_body_errors():
    # parser always synthesizes a body, so drive grab_article directly on a
    # detached-body document to pin the error path (mod.rs:1609-1611)
    doc = Readability("<!DOCTYPE html><html><body><p>x</p></body></html>")
    doc.root_node.select_first("body").detach()
    with pytest.raises(ReadabilityError):
        doc.grab_article()


def test_article_dir_captured():
    # R29 (mod.rs:2107-2125): first dir attr among candidate ancestors
    html = (
        '<!DOCTYPE html><html><body><div dir="rtl"><article>'
        + "<p>"
        + "Lorem ipsum dolor sit amet, consectetur adipiscing elit. " * 20
        + "</p>" * 1
        + "</article></div></body></html>"
    )
    doc = Readability(html)
    doc.parse("http://example.com/")
    assert doc.article_dir == "rtl"


def test_article_dir_flows_to_output():
    from paperoni_spark.spans.codec import extract_document, html_to_spans

    html = (
        '<!DOCTYPE html><html><body><div dir="rtl"><article>'
        + "<p>" + "Lorem ipsum dolor sit amet, consectetur adipiscing elit. " * 20 + "</p>"
        + "</article></div></body></html>"
    )
    result = extract_document("d1", html_to_spans(html))
    assert result["status"] == "ok"
    assert result["article_dir"] == "rtl"
