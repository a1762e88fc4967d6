"""pdf_layout segmentation: W1 band sort, F5/W6 filters, line grouping.

The W1 cases mirror the reference's sorted_boxes semantics
(/root/reference/Source/Paddle/PaddleTextDetector.cpp:337-352): primary
(y, x) sort, then ONE adjacent-swap pass inside the <10px tie-band.
"""

from frogocr_spark.core import segment
from frogocr_spark.core.segment import Box


def _box(x, y, text="t", w=20, h=14):
    return Box(x=x, y=y, w=w, h=h, text=text, start=0, end=len(text))


def test_reading_order_band_tiebreak():
    # same band (|dy| < 10): x decides even when y is larger for smaller x
    a, b = _box(100, 105, "right"), _box(10, 100, "left")
    out = segment.reading_order([a, b])
    assert [t.text for t in out] == ["left", "right"]
    # (y,x) sort puts (100,…) first already; swap must not reorder
    out2 = segment.reading_order([b, a])
    assert [t.text for t in out2] == ["left", "right"]


def test_reading_order_band_boundary_exactly_10_no_swap():
    # |dy| == 10 is OUTSIDE the band (strict <) → y order wins
    lo, hi = _box(500, 100, "first"), _box(10, 110, "second")
    out = segment.reading_order([hi, lo])
    assert [t.text for t in out] == ["first", "second"]


def test_reading_order_single_bubble_pass_only():
    # The reference does ONE pass: a box needing two swaps stays displaced.
    # y: 100,101,102 band; x: 30,20,10 → after one pass: 20,10→ swap(0,1)
    # then swap(1,2): result 20,10,30 → matches the C++ behavior.
    boxes = [_box(30, 100, "a"), _box(20, 101, "b"), _box(10, 102, "c")]
    out = segment.reading_order(boxes)
    assert [t.text for t in out] == ["b", "c", "a"]


def test_filter_min_side_and_bands_and_cap():
    keep = _box(50, 100, "ok")
    tiny = _box(50, 100, "tiny", w=3)
    flat = _box(50, 100, "flat", h=2)
    header = _box(50, 20, "hdr")
    footer = _box(50, 790, "ftr")
    out = segment.filter_boxes([keep, tiny, flat, header, footer])
    assert [b.text for b in out] == ["ok"]
    many = [_box(1, 100 + i % 600, f"t{i}") for i in range(1500)]
    assert len(segment.filter_boxes(many)) == segment.MAX_BOXES


def test_parse_and_extract_end_to_end():
    raw = "@60,100,100,14|hello @200,102,100,14|world @60,300,100,14|below"
    blocks = segment.extract_pdf_layout(raw)
    lines = [" ".join(s.text for s in b.segments) for b in blocks]
    assert lines == ["hello world", "below"]
    # spans point at raw text
    seg0 = blocks[0].segments[0]
    assert raw[seg0.start:seg0.end] == "hello"


def test_two_column_reading_order():
    # left column read before right column within each band pair
    raw = ("@400,100,80,14|R1 @60,100,80,14|L1 "
           "@400,200,80,14|R2 @60,200,80,14|L2")
    blocks = segment.extract_pdf_layout(raw)
    lines = [" ".join(s.text for s in b.segments) for b in blocks]
    assert lines == ["L1 R1", "L2 R2"]
