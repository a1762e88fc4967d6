"""Table reconstruction vs the reference's rebuild_table semantics
(Source/Paddle/Structure.cpp:245-335) — exact splice, <b> merge rules,
assignment tie-break, and the Spark column operator."""

from __future__ import annotations

from frogocr_spark.core.tables import (corner_dis, iou, match_cells,
                                       quad_to_box, rebuild_table)

# a 2x2 table: four cells, 10px apart
CELLS = [(0, 0, 10, 10), (20, 0, 30, 10), (0, 20, 10, 30), (20, 20, 30, 30)]
TAGS = ["<html>", "<body>", "<table>", "<tr>", "<td></td>", "<td></td>",
        "</tr>", "<tr>", "<td></td>", "<td></td>", "</tr>", "</table>",
        "</body>", "</html>"]


def test_simple_assignment_and_splice():
    ocr = [((1, 1, 9, 9), "a"), ((21, 1, 29, 9), "b"),
           ((1, 21, 9, 29), "c"), ((21, 21, 29, 29), "d")]
    html = rebuild_table(TAGS, CELLS, ocr)
    assert html == ("<html><body><table><tr><td>a</td><td>b</td></tr>"
                    "<tr><td>c</td><td>d</td></tr></table></body></html>")


def test_multi_text_cell_space_glue_and_empty_cells():
    # two texts land in cell 0 (sorted into it by IoU); cells 1-3 empty
    ocr = [((1, 1, 5, 9), "hello"), ((6, 1, 9, 9), "world")]
    html = rebuild_table(TAGS, CELLS, ocr)
    assert "<td>hello world</td>" in html
    assert html.count("<td></td>") == 3


def test_bold_wrap_rules():
    # first text carries <b> and the cell has >1 texts -> whole cell
    # wrapped, inner <b>/</b> stripped (Structure.cpp:291-318)
    ocr = [((1, 1, 5, 9), "<b>x</b>"), ((6, 1, 9, 9), "y")]
    html = rebuild_table(TAGS, CELLS, ocr)
    assert "<td><b>x y</b></td>" in html
    # single bold text: kept verbatim (no wrap path, no stripping)
    ocr2 = [((1, 1, 9, 9), "<b>solo</b>")]
    assert "<td><b>solo</b></td>" in rebuild_table(TAGS, CELLS, ocr2)


def test_bold_strip_length_guard():
    # a multi-text cell where one text is EXACTLY '</b>': the reference
    # strips the trailing '</b>' only when length > 4 (Structure.cpp:305)
    # so the bare '</b>' survives verbatim in the splice
    ocr = [((1, 1, 5, 9), "</b>"), ((6, 1, 9, 9), "tail")]
    html = rebuild_table(TAGS, CELLS, ocr)
    assert "<td></b> tail</td>" in html
    # while 'x</b>' (length 5) IS stripped to 'x'
    ocr2 = [((1, 1, 5, 9), "x</b>"), ((6, 1, 9, 9), "tail")]
    assert "<td>x tail</td>" in rebuild_table(TAGS, CELLS, ocr2)


def test_non_combined_td_tokens_pass_through():
    # a tag stream with split <td ...> ... </td> tokens (colspan path):
    # content is spliced BEFORE the closing token (Structure.cpp:324-328)
    tags = ["<table>", "<tr>", '<td colspan="2">', "</td>", "</tr>",
            "</table>"]
    ocr = [((1, 1, 9, 9), "wide")]
    html = rebuild_table(tags, [(0, 0, 10, 10)], ocr)
    assert html == '<table><tr><td colspan="2">wide</td></tr></table>'


def test_assignment_prefers_iou_then_distance():
    # box overlapping cell 0 strongly beats a nearer-but-less-overlapping
    # cell; with zero IoU everywhere the corner distance decides
    matched = match_cells([((1, 1, 9, 9), "t")], list(CELLS))
    assert matched[0] == ["t"]
    far = match_cells([((40, 40, 45, 45), "f")], list(CELLS))
    assert far[3] == ["f"]          # cell 3 minimizes corner distance
    # exact tie on (iou, dis) -> lowest cell index (pinned determinism)
    twin_cells = [(0, 0, 10, 10), (0, 0, 10, 10)]
    tie = match_cells([((2, 2, 8, 8), "t")], twin_cells)
    assert tie[0] == ["t"] and tie[1] == []


def test_quad_and_geometry_helpers():
    assert quad_to_box([0, 0, 10, 0, 10, 10, 0, 10]) == (0, 0, 10, 10)
    assert iou((0, 0, 10, 10), (0, 0, 10, 10)) == 1.0
    assert iou((0, 0, 1, 1), (5, 5, 6, 6)) == 0.0
    # dis = all-corners L1 + min(TL, BR) — Structure.cpp:337-352
    assert corner_dis((0, 0, 10, 10), (1, 1, 11, 11)) == 4 + 2


def test_spark_column_operator(spark):
    from frogocr_spark.operators.tables import rebuild_tables
    rows = [
        (0, TAGS, [[float(x) for x in c] for c in CELLS],
         [([1.0, 1.0, 9.0, 9.0], "a"), ([21.0, 1.0, 29.0, 9.0], "b"),
          ([1.0, 21.0, 9.0, 29.0], "c"), ([21.0, 21.0, 29.0, 29.0], "d")]),
        (1, None, None, None),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, tags array<string>, cells array<array<double>>,"
              " ocr array<struct<box: array<double>, text: string>>")
    got = {r.doc_id: r.table_html
           for r in rebuild_tables(df).collect()}
    assert got[0] == rebuild_table(
        TAGS, CELLS, [((1, 1, 9, 9), "a"), ((21, 1, 29, 9), "b"),
                      ((1, 21, 9, 29), "c"), ((21, 21, 29, 29), "d")])
    assert got[1] == ""
