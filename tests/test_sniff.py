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
