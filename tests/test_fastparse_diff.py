"""Differential gate: the fast single-shot tokenizer must build the exact
same DOM as the stdlib HTMLParser driver on every corpus we have — fixtures,
synthetic docs, and fuzzed tag soup."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from paperoni_spark.dom import Node
from paperoni_spark.dom.parser import parse_fragment, parse_html
from paperoni_spark.spans import fixture_corpus, spans_to_html
from paperoni_spark.spans.synthetic import synth_html


def dom_repr(node: Node) -> list:
    out = []
    for kind, n in node.traverse(inclusive=True):
        if kind != "start":
            continue
        if n.type == "element":
            out.append(("elem", n.name, tuple(n.sorted_attr_items())))
        elif n.type == "text":
            out.append(("text", n.text))
        elif n.type == "comment":
            out.append(("comment", n.text))
        else:
            out.append((n.type,))
    return out


def both(html: str):
    try:
        slow = parse_html(html, fast=False)
    except Exception as e:
        with pytest.raises(type(e)):
            parse_html(html, fast=True)
        return None, None
    fast = parse_html(html, fast=True)
    return slow, fast


def assert_same(html: str):
    slow, fast = both(html)
    if slow is None:
        return
    assert dom_repr(fast) == dom_repr(slow), html[:200]


def test_fixture_corpus_identical():
    for doc in fixture_corpus():
        assert_same(spans_to_html(doc["spans"]))


def test_synthetic_corpus_identical():
    for i in range(120):
        assert_same(synth_html(i))


def test_fragment_parser_identical():
    for frag in (
        '<div class="parent"><img src="x.png" id="a"></div>',
        "plain text & entities &amp; &#65;",
        "<p>a<p>b<script>var x = '<div>';</script>",
    ):
        slow = parse_fragment(frag, fast=False)
        fast = parse_fragment(frag, fast=True)
        assert dom_repr(fast) == dom_repr(slow)


_soup = st.text(
    alphabet=st.sampled_from(
        list("abcdefgh <>/=\"'&;#!?-[]\n\tpdivsrcmgnoscriptyle0123456789.")
    ),
    max_size=300,
)


@settings(max_examples=300, deadline=None)
@given(
    st.one_of(
        _soup,
        st.builds(
            lambda a, b: f"<html><head><title>{a}</title></head><body>{b}</body></html>",
            _soup,
            _soup,
        ),
        st.text(max_size=200),
    )
)
def test_fuzz_identical(html):
    assert_same(html)
