"""Adversarial fuzz parity for the *_arrays fast paths.

The corpus test (tests/test_extract.py) proves parity on GENERATOR
payloads; these hypothesis fuzzers prove it on hostile ones — unclosed
tags, stray ``<``/``>``, nested/unbalanced links and blacklist tags,
whitespace runs, malformed ``@x,y,w,h|`` tokens, markdown markers glued
mid-line — where a fused rewrite would drift first.  Oracle = the exact
Block-path composition each fast path's docstring claims:
``assemble.finalize_pruned(extract_<cls>(raw))``.
"""

from hypothesis import given, settings, strategies as st

from frogocr_spark.core import assemble, boilerplate, markdown, segment

_HTML_ATOMS = st.sampled_from([
    "<p>", "</p>", "<div>", "</div>", "<nav>", "</nav>", "<a>", "</a>",
    "<a href='x'>", "<li>", "</li>", "<aside>", "</aside>", "<br/>",
    "<P >", "</DIV>", "<span>", "</span>", "<", ">", "</", "/>",
    "word", "two words here", "  ", "\n", "\t", "x", "link text",
    "a b c d e f", "<h1>", "</h1>", "<footer>", "</footer>",
])

_MD_ATOMS = st.sampled_from([
    "# ", "## ", "> ", "- ", "* ", "1. ", "```", "`code`", "**bold**",
    "*em*", "_u_", "__s__", "[t](u)", "[unclosed](", "](x)", "plain",
    "words go here", "  ", "\n", "*", "_", "`", "#", "[", "]", "(", ")",
])

_PDF_ATOMS = st.sampled_from([
    "@10,100,20,8|word", "@5,60,3,9|tiny", "@900,700,30,12|tail",
    "@1,2,3,4|x", "@40,40,10,10|header", "@12,760,9,9|footer",
    "@7,300,12,12|mid", "@x,y,w,h|bad", "@1,2|short", "plain",
    " ", "\n", "@99999,300,50,50|big", "@0,050,08,08|pad",
])


def _compose(extract_fn, raw):
    text, spans, n_blocks, n, n_var, conf = \
        assemble.finalize_pruned(extract_fn(raw))
    return text, spans, n_blocks, n


@settings(max_examples=300, deadline=None)
@given(st.lists(_HTML_ATOMS, min_size=0, max_size=40))
def test_html_arrays_fuzz(atoms):
    raw = "".join(atoms)
    assert boilerplate.html_arrays(raw) == \
        _compose(boilerplate.extract_html, raw)


@settings(max_examples=300, deadline=None)
@given(st.lists(_MD_ATOMS, min_size=0, max_size=40))
def test_markdown_arrays_fuzz(atoms):
    raw = "".join(atoms)
    assert markdown.markdown_arrays(raw) == \
        _compose(markdown.extract_markdown, raw)


@settings(max_examples=300, deadline=None)
@given(st.lists(_PDF_ATOMS, min_size=0, max_size=60))
def test_pdf_arrays_fuzz(atoms):
    raw = " ".join(atoms)
    assert segment.pdf_arrays(raw) == \
        _compose(segment.extract_pdf_layout, raw)


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet="<>/ab \n#*`[]()@,|0123456789", max_size=200))
def test_all_arrays_survive_arbitrary_text(raw):
    """No crash + parity on raw soup for all three twins."""
    assert boilerplate.html_arrays(raw) == \
        _compose(boilerplate.extract_html, raw)
    assert markdown.markdown_arrays(raw) == \
        _compose(markdown.extract_markdown, raw)
    assert segment.pdf_arrays(raw) == \
        _compose(segment.extract_pdf_layout, raw)
