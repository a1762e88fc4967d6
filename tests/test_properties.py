"""Property-based invariants over arbitrary payloads (SURVEY §5).

The extractor must be total (never raise), span-sound (every span inside
the raw payload, start ≤ end), and batch/scalar consistent — for ANY
input, not just generated fixtures.
"""

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from frogocr_spark.core.extract import extract_batch, extract_turn

payloads = st.text(alphabet=st.characters(codec="ascii"), max_size=300)
markers = st.sampled_from([
    "", "[[LOWCONF]]", "[[/LOWCONF]]", "<p>", "</p>", "{\"content\": \"",
    "@1,100,50,14|tok ", "## ", "```", "**x**", "[a](b)",
])
spiked = st.tuples(markers, payloads, markers, payloads).map(
    lambda t: t[0] + t[1] + t[2] + t[3])


@settings(max_examples=400, deadline=None)
@given(spiked)
def test_total_and_span_sound(raw):
    rec = extract_turn(raw)
    assert rec["payload_class"] in {"plain", "markdown", "html",
                                    "pdf_layout", "tool_json", "two_pass"}
    for sp in rec["spans"]:
        assert 0 <= sp["start"] <= sp["end"] <= len(raw), (sp, raw)
    assert rec["n_spans"] == len(rec["spans"])
    assert 0.0 <= rec["confidence"] <= 1.0
    if rec["extracted_text"] == "":
        assert rec["spans"] == []


@settings(max_examples=150, deadline=None)
@given(st.lists(spiked, min_size=1, max_size=8))
def test_batch_equals_scalar(texts):
    batch = extract_batch(pd.Series(texts))
    for i, t in enumerate(texts):
        rec = extract_turn(t)
        row = batch.iloc[i]
        assert rec["extracted_text"] == row["extracted_text"], t
        assert rec["spans"] == row["spans"], t
        assert rec["payload_class"] == row["payload_class"], t


@settings(max_examples=200, deadline=None)
@given(payloads)
def test_raw_slice_invariant_on_plain_and_structured(raw):
    rec = extract_turn(raw)
    if rec["payload_class"] in ("two_pass", "tool_json"):
        return
    for sp in rec["spans"]:
        piece = raw[sp["start"]:sp["end"]]
        assert piece.strip() != "" or piece == ""
        assert piece in rec["extracted_text"] or piece.strip() in rec["extracted_text"]
