"""Structured tool-output extraction (FIXTURES.md §2.4).

The analog of FrogOCR's dynamic ``settings_csv`` → typed projection with
key fallbacks (reference ``Source/Settings.hpp:56-209``: a key=value map is
probed with a fixed fallback order and defaults).  Here the payload is a
JSON object from a ``tool`` turn; the extractor projects the first present
content field out of a fixed priority list and drops the envelope.

Spans: the span points at the raw JSON string token of the extracted value
(between the quotes).  When the value contains JSON escapes the invariant
is ``json-unescape(raw[start:end]) == extracted_text`` (documented
exception to the raw-slice rule — assemble.py module doc).
"""

from __future__ import annotations

import json
import re

from .assemble import Block, Segment

CONTENT_KEYS = ("content", "text", "output", "stdout", "result", "data")

# "key" : "value-with-escapes"   (group 2 = raw value token)
_FIELD_RES = {
    k: re.compile(r'"' + k + r'"\s*:\s*"((?:[^"\\]|\\.)*)"')
    for k in CONTENT_KEYS
}


def extract_tool_json(raw: str) -> tuple[list[Block], bool]:
    """Returns ``(blocks, parse_failed)``.

    A payload that is not a JSON object, or has no string content field,
    yields no blocks; ``parse_failed`` is True only for undecodable JSON
    (the input-missing F2 analog — ``Source/TaskProcessor.cpp:196-209``).
    """
    try:
        obj = json.loads(raw)
    except (json.JSONDecodeError, TypeError):
        return [], True
    if not isinstance(obj, dict):
        return [], False
    for key in CONTENT_KEYS:
        val = obj.get(key)
        if isinstance(val, str):
            m = _FIELD_RES[key].search(raw)
            if m:
                start, end = m.start(1), m.end(1)
            else:  # value present but not as a simple string token
                start, end = 0, 0
            seg = Segment(text=val, start=start, end=end, glue="")
            return [Block(segments=[seg], kind="tool",
                          detector="json", recognizer="projection")], False
    return [], False


def extract_tool_json_batch(
        raws: list[str],
) -> tuple[list[str], list[int], list[int], list[bool], list[bool]]:
    """Batch twin of :func:`extract_tool_json` with the downstream
    prune/assemble steps FUSED (a tool_json turn yields at most one
    segment, so prune_empty + assemble collapse to: keep the value iff
    ``val.strip()``).  Returns parallel lists
    ``(texts, starts, ends, kept, parse_failed)`` — ``kept[i]`` False
    means the pruned-empty outcome (no blocks, no spans).

    This is the hot path for ~33% of the corpus mix: the loop body is
    one C-level ``json.loads`` + a dict probe + one compiled-regex
    search, with none of the scalar path's dataclass/dict/Series
    overhead (measured ~4× per-row vs routing through
    :func:`extract_turn`).  Byte-parity with the scalar oracle is
    asserted over the full generated corpus plus adversarial edge cases
    in tests/test_extract.py."""
    loads = json.loads
    texts: list[str] = []
    starts: list[int] = []
    ends: list[int] = []
    kept: list[bool] = []
    failed: list[bool] = []
    for raw in raws:
        t, s, e, k, f = "", 0, 0, False, False
        try:
            obj = loads(raw)
        except (json.JSONDecodeError, TypeError):
            f = True
        else:
            if isinstance(obj, dict):
                for key in CONTENT_KEYS:
                    val = obj.get(key)
                    if isinstance(val, str):
                        # scalar path stops at the FIRST string-valued
                        # key even when the value prunes to empty
                        if val.strip():
                            m = _FIELD_RES[key].search(raw)
                            if m:
                                s, e = m.start(1), m.end(1)
                            t, k = val, True
                        break
        texts.append(t)
        starts.append(s)
        ends.append(e)
        kept.append(k)
        failed.append(f)
    return texts, starts, ends, kept, failed
