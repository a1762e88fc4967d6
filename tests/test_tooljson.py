"""tool_json projection: key priority, parse failure, span location."""

import json

from frogocr_spark.core import tooljson


def test_key_priority_content_first():
    raw = '{"text": "second", "content": "first"}'
    blocks, failed = tooljson.extract_tool_json(raw)
    assert not failed
    assert blocks[0].segments[0].text == "first"


def test_each_content_key():
    for key in tooljson.CONTENT_KEYS:
        raw = json.dumps({"status": "ok", key: "the payload"})
        blocks, failed = tooljson.extract_tool_json(raw)
        assert not failed and blocks[0].segments[0].text == "the payload", key


def test_parse_failure():
    blocks, failed = tooljson.extract_tool_json('{"status": "err", "content": "x')
    assert failed and blocks == []


def test_no_content_field():
    blocks, failed = tooljson.extract_tool_json('{"status": "ok", "exit_code": 0}')
    assert not failed and blocks == []


def test_non_dict_json():
    blocks, failed = tooljson.extract_tool_json("[1, 2, 3]")
    assert not failed and blocks == []


def test_span_points_at_value_token():
    raw = '{"status": "ok", "content": "find me here", "n": 1}'
    blocks, _ = tooljson.extract_tool_json(raw)
    seg = blocks[0].segments[0]
    assert raw[seg.start:seg.end] == "find me here"


def test_escaped_value_unescapes():
    raw = '{"content": "line one\\nline two"}'
    blocks, _ = tooljson.extract_tool_json(raw)
    seg = blocks[0].segments[0]
    assert seg.text == "line one\nline two"
    # invariant: unescaping the raw slice yields the text
    assert json.loads('"' + raw[seg.start:seg.end] + '"') == seg.text
