"""Dispatch + batch/scalar parity over the full generated corpus."""

import pandas as pd
import pytest

from frogocr_spark.core import extract
from frogocr_spark.sources import payloadgen as pg


@pytest.fixture(scope="module")
def corpus():
    return pg.gen_transcripts(n_convs=150)


def test_batch_matches_scalar_oracle(corpus):
    texts = pd.Series([r["text"] for r in corpus])
    batch = extract.extract_batch(texts)
    assert len(batch) == len(corpus)
    for i, r in enumerate(corpus):
        rec = extract.extract_turn(r["text"])
        row = batch.iloc[i]
        assert rec["payload_class"] == row["payload_class"]
        assert rec["extracted_text"] == row["extracted_text"]
        assert rec["spans"] == row["spans"]
        assert rec["confidence"] == row["confidence"]
        assert rec["parse_failed"] == row["parse_failed"]
        assert rec["empty_after_strip"] == row["empty_after_strip"]
        assert rec["n_blocks"] == row["n_blocks"]
        assert rec["n_spans"] == row["n_spans"]
        assert rec["n_variants"] == row["n_variants"]


def test_span_raw_slice_invariant(corpus):
    """For html/pdf/markdown/plain every span slices the raw payload to the
    exact segment text (assemble.py contract)."""
    checked = 0
    for r in corpus:
        rec = extract.extract_turn(r["text"])
        if rec["payload_class"] in ("two_pass", "tool_json"):
            continue
        raw = r["text"]
        for spn in rec["spans"]:
            piece = raw[spn["start"]:spn["end"]]
            assert piece.strip(), (rec["payload_class"], spn)
            assert piece in rec["extracted_text"]
            checked += 1
    assert checked > 500


def test_empty_and_whitespace_inputs():
    for raw in ("", "   ", None, "\n\t"):
        rec = extract.extract_turn(raw)
        assert rec["extracted_text"] == ""
        assert rec["spans"] == []
        assert not rec["empty_after_strip"]  # nothing was there to strip


def test_empty_after_strip_counter():
    rec = extract.extract_turn('{"status": "ok", "exit_code": 0}')
    assert rec["extracted_text"] == "" and rec["empty_after_strip"]


def test_plain_identity_with_padding():
    rec = extract.extract_turn("  some words  ")
    assert rec["extracted_text"] == "some words"
    assert rec["spans"] == [{"start": 2, "end": 12}]


def test_deterministic_generator():
    a = pg.gen_transcripts(20)
    b = pg.gen_transcripts(20)
    assert a == b
    assert pg.gen_turn(3, 1) == pg.gen_turn(3, 1)


def test_generator_skew_knob():
    rows = pg.gen_transcripts(5, skew_conv_turns=100)
    counts = {}
    for r in rows:
        counts[r["conv_id"]] = counts.get(r["conv_id"], 0) + 1
    assert counts["conv_00000000"] == 100
    assert all(v <= 16 for k, v in counts.items() if k != "conv_00000000")


TOOL_JSON_EDGE_CASES = [
    '{"content": "plain value"}',
    '{"content": "esc \\"quoted\\" and \\\\back"}',   # JSON escapes in value
    '{"content": "tab\\tnl\\nuni\\u00e5"}',           # escapes: span != len
    '{"text": "second priority"}',
    '{"output": "third"}', '{"stdout": "fourth"}',
    '{"result": "fifth"}', '{"data": "sixth"}',
    '{"data": "low", "content": "wins"}',             # priority order
    '{"content": "   "}',                             # prunes to empty
    '{"content": ""}',                                # empty string value
    '{"content": "  x", "text": "never reached"}',    # first key wins
    '{"content": 42, "text": "fallback hit"}',        # non-string skipped
    '{"content": null, "output": "nn"}',
    '{"status": "ok"}',                               # no content field
    '{"nested": {"content": "inner"}, "text": "outer"}',
    '{"text": "dup", "extra": {"text": "first in raw?"}}',
    '{broken json',                                   # parse failure
    '{"content": "trunc',                             # truncated string
    '{"a": [1, 2, {"content": "deep"}]}',
    '[1, 2, 3]',                                      # non-dict (array)... sniffed tool_json? no — starts with [
    '{"content": "with } brace in value"}',
    '{ "content" :  "spaced colon" }',
    '{"CONTENT": "case sensitive miss"}',
    '{"content": "a", "content2": "b"}',
    '{"content": "\\u0041\\u00e6\\ud83d\\ude00"}',    # unicode escapes incl. surrogate pair
]


def test_tool_json_batch_scalar_parity_edges():
    """The fused batch tool_json path must byte-match the scalar oracle
    on adversarial payloads (escapes, priority, prune, parse failure)."""
    texts = pd.Series(TOOL_JSON_EDGE_CASES)
    batch = extract.extract_batch(texts)
    for i, raw in enumerate(TOOL_JSON_EDGE_CASES):
        rec = extract.extract_turn(raw)
        row = batch.iloc[i]
        assert rec["payload_class"] == row["payload_class"], raw
        assert rec["extracted_text"] == row["extracted_text"], raw
        assert rec["spans"] == row["spans"], raw
        assert rec["parse_failed"] == row["parse_failed"], raw
        assert rec["empty_after_strip"] == row["empty_after_strip"], raw
        assert rec["n_blocks"] == row["n_blocks"], raw
        assert rec["confidence"] == row["confidence"], raw


def test_tool_json_unescape_span_invariant():
    """tooljson contract: json-unescape(raw[start:end]) == extracted."""
    import json as _json
    raw = '{"content": "esc \\"q\\" \\u00e5\\n"}'
    rec = extract.extract_turn(raw)
    (spn,) = rec["spans"]
    token = raw[spn["start"]:spn["end"]]
    assert _json.loads('"' + token + '"') == rec["extracted_text"]


def test_all_payload_classes_represented(corpus):
    seen = {extract.extract_turn(r["text"])["payload_class"] for r in corpus}
    assert seen == {"plain", "markdown", "html", "pdf_layout",
                    "tool_json", "two_pass"}


def test_spans_pairs_mode_matches_dicts_mode(corpus):
    """spans_as="pairs" (the Arrow operator's allocation-light format)
    must carry exactly the same values as the default dict format, on
    every row of the full generated corpus, with and without per-row
    settings routing a row through the scalar path."""
    texts = pd.Series([r["text"] for r in corpus])
    dicts = extract.extract_batch(texts)
    prs = extract.extract_batch(texts, spans_as="pairs")
    for col in dicts.columns:
        if col == "spans":
            continue
        assert dicts[col].tolist() == prs[col].tolist(), col
    for d_row, p_row in zip(dicts["spans"], prs["spans"]):
        assert [(d["start"], d["end"]) for d in d_row] \
            == [tuple(p) for p in p_row]
    # tuned-settings rows (scalar path) convert too
    stngs = pd.Series(["MinWordConfidence=0.9"] + [""] * (len(texts) - 1))
    tuned = extract.extract_batch(texts, stngs, spans_as="pairs")
    assert [tuple(p) for p in tuned["spans"].iloc[0]] \
        == [(d["start"], d["end"])
            for d in extract.extract_turn(
                texts.iloc[0], "MinWordConfidence=0.9")["spans"]]


def test_arrays_twins_equal_finalize_pruned_composition(corpus):
    """Each structured class's *_arrays fast path must equal the exact
    composition its docstring claims: ``assemble.finalize_pruned(
    extract_<cls>(raw))`` — same text, same spans, same counts, and the
    constant confidence/variant values the Block path would compute.
    Run over every structured row of the full generated corpus."""
    from frogocr_spark.core import assemble, boilerplate, markdown, segment

    twins = {
        "html": (boilerplate.html_arrays, boilerplate.extract_html),
        "markdown": (markdown.markdown_arrays, markdown.extract_markdown),
        "pdf_layout": (segment.pdf_arrays, segment.extract_pdf_layout),
    }
    checked = {k: 0 for k in twins}
    for r in corpus:
        raw = r["text"]
        cls = extract.extract_turn(raw)["payload_class"]
        if cls not in twins:
            continue
        arrays_fn, block_fn = twins[cls]
        text, spans, n_blocks, n_spans = arrays_fn(raw)
        f_text, f_spans, f_blocks, f_n, f_var, f_conf = \
            assemble.finalize_pruned(block_fn(raw))
        assert text == f_text
        assert spans == f_spans
        assert (n_blocks, n_spans) == (f_blocks, f_n)
        assert (f_var, f_conf) == (0, 1.0)   # the constants the fast
        checked[cls] += 1                    # path hard-codes
    assert all(v > 50 for v in checked.values()), checked
