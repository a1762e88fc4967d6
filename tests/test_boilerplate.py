"""HTML boilerplate classifier: blacklist, link density, min words, spans."""

from frogocr_spark.core import boilerplate


def _texts(blocks):
    return [" ".join(s.text for s in b.segments) for b in blocks]


def test_main_content_kept_boilerplate_dropped():
    raw = (
        "<html><nav><a href='/a'>home</a> <a href='/b'>about</a></nav>"
        "<p>this is the real article body with many words inside</p>"
        "<footer>copyright legal footer words here</footer></html>"
    )
    out = _texts(boilerplate.extract_html(raw))
    assert out == ["this is the real article body with many words inside"]


def test_link_density_gate():
    # a block that is mostly links is dropped even outside blacklist tags
    linky = ("<p><a href='/x'>one two three four five</a> and</p>"
             "<p>clean content paragraph with enough words</p>")
    out = _texts(boilerplate.extract_html(linky))
    assert out == ["clean content paragraph with enough words"]


def test_min_words_gate():
    raw = "<p>too short</p><p>this one has plenty of words to keep</p>"
    out = _texts(boilerplate.extract_html(raw))
    assert out == ["this one has plenty of words to keep"]


def test_nested_blacklist_subtree_dropped():
    raw = ("<aside><div><p>hidden sidebar junk with many words here</p></div></aside>"
           "<p>actual body content with several words kept</p>")
    out = _texts(boilerplate.extract_html(raw))
    assert out == ["actual body content with several words kept"]


def test_spans_point_into_raw():
    raw = "<p>  keep these words exactly here  </p>"
    blocks = boilerplate.extract_html(raw)
    seg = blocks[0].segments[0]
    assert raw[seg.start:seg.end] == "keep these words exactly here"
    assert seg.text == raw[seg.start:seg.end]


def test_multi_segment_block_glue():
    raw = "<p>first part <b>bolded words</b> second part okay</p>"
    blocks = boilerplate.extract_html(raw)
    assert len(blocks) == 1
    texts = [s.text for s in blocks[0].segments]
    assert texts == ["first part", "bolded words", "second part okay"]
