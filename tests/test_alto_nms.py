"""ALTO-analog XML rendering + NMS suppression."""

import re

from frogocr_spark.core import alto, nms
from frogocr_spark.core.extract import extract_turn


def test_xml_attr_escape_order():
    assert alto.xml_attr('&"<>') == "&amp;&quot;&lt;&gt;"
    # pre-existing entity gets re-escaped (& first ⇒ no double-unescape)
    assert alto.xml_attr("&amp;") == "&amp;amp;"


def test_render_positional_ids_deterministic():
    rec = extract_turn("@60,100,50,14|hello @120,102,50,14|world @60,300,50,14|below")
    xml = alto.render_turn_xml("conv_x", 3, rec["payload_class"],
                               [(s["start"], s["end"]) for s in rec["spans"]],
                               rec["extracted_text"], rec["confidence"])
    ids = re.findall(r'ID="([^"]+)"', xml)
    assert ids == ["p_3", "p_3_b_0", "p_3_b_0_s_0", "p_3_b_0_s_1",
                   "p_3_b_1", "p_3_b_1_s_0"]
    assert 'CONTENT="hello" START=' in xml
    # rendering is a pure function → byte-identical on re-render
    xml2 = alto.render_turn_xml("conv_x", 3, rec["payload_class"],
                                [(s["start"], s["end"]) for s in rec["spans"]],
                                rec["extracted_text"], rec["confidence"])
    assert xml == xml2


def test_render_empty_lines_dropped():
    xml = alto.render_turn_xml("c", 0, "plain", [], "", 1.0)
    assert "<block" not in xml


def test_nms_greedy_suppression():
    # highest score kept; overlapping lower-score suppressed; disjoint kept
    cands = [(0, 10, 0.9), (2, 12, 0.8), (50, 60, 0.7), (0, 9, 0.95)]
    kept = nms.nms(cands, iou_threshold=0.5)
    assert kept == [(0, 9, 0.95), (50, 60, 0.7)]


def test_nms_threshold_boundary():
    # IoU exactly at threshold is NOT suppressed (<= keeps)
    a, b = (0, 10), (5, 15)  # inter 5, union 15 → 1/3
    assert nms.interval_iou(a, b) == 1 / 3
    kept = nms.nms([(0, 10, 0.9), (5, 15, 0.8)], iou_threshold=1 / 3)
    assert len(kept) == 2


def test_nms_operator(spark):
    rows = [("t1", 0, 10, 0.9), ("t1", 2, 12, 0.8), ("t1", 50, 60, 0.7),
            ("t2", 0, 5, 0.5)]
    df = spark.createDataFrame(rows, "turn string, start int, end int, score double")
    from frogocr_spark.operators.suppress import nms_per_group
    got = nms_per_group(df, ["turn"]).collect()
    by_turn = {}
    for r in got:
        by_turn.setdefault(r.turn, []).append((r.start, r.end, r.score))
    assert sorted(by_turn["t1"]) == [(0, 10, 0.9), (50, 60, 0.7)]
    assert by_turn["t2"] == [(0, 5, 0.5)]
