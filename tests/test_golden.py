"""Golden fixtures: 58 frozen rows pin the extraction oracle.

If an intentional semantics change breaks these, regenerate via the script
in the fixture header only after verifying the new outputs by hand
(FIXTURES.md §3 contract).
"""

import json
import pathlib

import pytest

from frogocr_spark.core import extract

GOLDEN = json.loads(
    (pathlib.Path(__file__).parent / "fixtures" / "golden.json").read_text()
)


@pytest.mark.parametrize("case", GOLDEN,
                         ids=[f'{g["conv_id"]}:{g["turn_idx"]}' for g in GOLDEN])
def test_golden_row(case):
    rec = extract.extract_turn(case["text"])
    exp = case["expected"]
    assert rec["payload_class"] == exp["payload_class"]
    assert rec["extracted_text"] == exp["extracted_text"]
    assert rec["spans"] == exp["spans"]
    assert rec["n_blocks"] == exp["n_blocks"]
    assert rec["n_spans"] == exp["n_spans"]
    assert rec["confidence"] == pytest.approx(exp["confidence"], abs=1e-9)
    assert rec["parse_failed"] == exp["parse_failed"]
    assert rec["empty_after_strip"] == exp["empty_after_strip"]


def test_golden_covers_all_classes():
    classes = {g["expected"]["payload_class"] for g in GOLDEN}
    assert classes == {"plain", "markdown", "html", "pdf_layout",
                       "tool_json", "two_pass"}
    assert any(g["expected"]["parse_failed"] for g in GOLDEN)
    assert any(g["expected"]["empty_after_strip"] for g in GOLDEN)
