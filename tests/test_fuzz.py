"""Property-based robustness: the kernel and codec must never raise on
arbitrary (including malformed) input — failures surface only through the
``status`` column.  The reference can panic on weird documents; our UDF
wrapper must not take down a 1000-executor stage for one bad row."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from paperoni_spark.spans.codec import extract_document, html_to_spans, spans_to_html

tag_soup = st.text(
    alphabet=st.sampled_from(
        list("abcdefghij <>/=\"'&;#!-\n\tpdivsrcmgnoscript0123456789.")
    ),
    max_size=400,
)

html_ish = st.one_of(
    tag_soup,
    st.builds(
        lambda pre, mid, post: f"<html><body><div>{pre}<img src=\"{mid}\">{post}</div></body></html>",
        tag_soup,
        st.text(max_size=40),
        tag_soup,
    ),
    st.text(max_size=300),  # arbitrary unicode
)


@settings(max_examples=150, deadline=None)
@given(html_ish)
def test_extract_never_raises(html):
    spans = html_to_spans(html)
    result = extract_document("fuzz", spans)
    assert result["status"].startswith(("ok", "error:"))
    assert isinstance(result["extracted"], list)
    for i, s in enumerate(result["extracted"]):
        assert s["order"] == i
        assert s["kind"] in ("text", "image")


@settings(max_examples=150, deadline=None)
@given(html_ish)
def test_codec_roundtrip_preserves_non_marker_content(html):
    spans = html_to_spans(html)
    # offsets must be dense and ordered
    assert [s["offset"] for s in spans] == list(range(len(spans)))
    rebuilt = spans_to_html(spans)
    # text content outside the normalized img markers is preserved verbatim
    import re

    strip = lambda s: re.sub(r"<img\s+src=(\"[^\"]*\"|'[^']*')\s*/?>", " ", s)
    assert strip(rebuilt) == strip(html)
