from .codec import emit_spans, extract_document, html_to_spans, spans_to_html
from .fixtures import fixture_corpus
from .synthetic import synth_corpus, synth_document, synth_html

__all__ = [
    "emit_spans",
    "extract_document",
    "html_to_spans",
    "spans_to_html",
    "fixture_corpus",
    "synth_corpus",
    "synth_document",
    "synth_html",
]
