"""Markdown strip rules + span provenance."""

from frogocr_spark.core import markdown
from frogocr_spark.core.assemble import assemble, prune_empty


def _extract(raw):
    blocks, _ = prune_empty(markdown.extract_markdown(raw))
    return assemble(blocks)


def test_heading_and_emphasis():
    text, spans = _extract("## Title Here\nplain **bold** word")
    assert text == "Title Here\nplain bold word"


def test_link_keeps_anchor_text():
    raw = "see [the docs](https://example.org/d) for more"
    text, spans = _extract(raw)
    assert text == "see the docs for more"
    # anchor-text span points at raw
    assert any(raw[a:b] == "the docs" for a, b in spans)


def test_code_fence_markers_dropped_content_kept():
    raw = "```\nx = f(1)\n```\nafter"
    text, _ = _extract(raw)
    assert text == "x = f(1)\nafter"


def test_blockquote_and_list_markers():
    text, _ = _extract("> quoted words\n- item one\n1. item two")
    assert text == "quoted words\nitem one\nitem two"


def test_inline_code():
    text, _ = _extract("run `make all` now")
    assert text == "run make all now"


def test_adjacent_inline_whitespace_glue():
    text, _ = _extract("**a** **b**")
    assert text == "a b"


def test_empty_lines_dropped():
    text, _ = _extract("one\n\n\ntwo")
    assert text == "one\ntwo"


def test_spans_slice_raw():
    raw = "word **bold** [x](u)"
    blocks, _ = prune_empty(markdown.extract_markdown(raw))
    for b in blocks:
        for s in b.segments:
            assert raw[s.start:s.end] == s.text
