"""Sniffer: scalar/vectorized parity + precedence rules."""

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from frogocr_spark.core import sniff


def test_precedence_examples():
    assert sniff.sniff(None) == "plain"
    assert sniff.sniff("") == "plain"
    assert sniff.sniff("   \n ") == "plain"
    assert sniff.sniff("hello world") == "plain"
    assert sniff.sniff('{"a": 1}') == "tool_json"
    assert sniff.sniff('  {"a": 1') == "tool_json"  # truncated still json
    assert sniff.sniff("@1,2,3,4|tok @5,6,7,8|tok2") == "pdf_layout"
    assert sniff.sniff("<p>hi there</p>") == "html"
    assert sniff.sniff("# heading\ntext") == "markdown"
    assert sniff.sniff("see [link](http://x) now") == "markdown"
    assert sniff.sniff("a **b** c") == "markdown"
    assert sniff.sniff("x [[LOWCONF]]y[[/LOWCONF]] z") == "two_pass"
    # precedence: two_pass beats everything
    assert sniff.sniff("<p>[[LOWCONF]]x[[/LOWCONF]]</p>") == "two_pass"
    # html beats markdown
    assert sniff.sniff("<p>**bold** stuff</p>") == "html"


def test_scalar_vector_parity_examples():
    texts = [
        None, "", "  ", "plain words", '{"k": "v"}', "{broken",
        "@1,2,3,4|x", "<div>a b c</div>", "# h", "> quote",
        "- item", "1. nope not md (needs marker)", "a [x](y) b",
        "[[LOWCONF]]q[[/LOWCONF]]", "@not,a,token", "{ }",
    ]
    s = pd.Series(texts)
    vec = sniff.sniff_series(s)
    for t, v in zip(texts, vec):
        assert sniff.sniff(t) == v, repr(t)


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet=st.characters(codec="ascii"), max_size=120))
def test_scalar_vector_parity_fuzz(t):
    assert sniff.sniff(t) == sniff.sniff_series(pd.Series([t])).iloc[0]


@settings(max_examples=200, deadline=None)
@given(st.lists(st.sampled_from([
    "# ", "#x", "```", "``", "> q", ">q", "- i", "-i", "* i", "1. x",
    "[a](b)", "[a]b", "**s**", "*e*", "plain", "\n", " ", "<p>", "@",
    "{", "[[LOWCONF]]",
]), max_size=12))
def test_scalar_vector_parity_marker_edges(atoms):
    """Marker-char-dense payloads around the sniffer's necessary-char
    guards: every string here contains guard characters, so the guarded
    regexes must still run (and agree with the scalar oracle) whenever
    the guard fires, including near-miss markers (#x, >q, -i, ``)."""
    t = "".join(atoms)
    assert sniff.sniff(t) == sniff.sniff_series(pd.Series([t])).iloc[0]


def test_vector_batch_order_and_index():
    """A mixed batch keeps per-row classification and the input index."""
    texts = ["plain here", "# h", "<p>a</p>", '{"k":1}',
             "@1,2,30,30|x", "[[LOWCONF]]a[[/LOWCONF]]", ""]
    s = pd.Series(texts, index=[9, 3, 7, 1, 5, 0, 2])
    vec = sniff.sniff_series(s)
    assert list(vec.index) == [9, 3, 7, 1, 5, 0, 2]
    assert vec.tolist() == [sniff.sniff(t) for t in texts]
