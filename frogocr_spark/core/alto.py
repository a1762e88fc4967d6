"""ALTO-analog XML rendering of extraction results.

Re-expresses the reference's ALTO serialization semantics over the
transcript output schema (one <page> per turn):

- deterministic positional IDs assigned by enumeration order
  (``p_0``, ``p_0_b_{i}``, ``p_0_b_{i}_s_{j}``) — the exact ID scheme shape
  of ``Source/Alto/WriteXml.cpp:130-137,164-181,193-215``;
- XML attribute escaping with ``&`` first —
  ``Source/Core/String.hpp:82-88``;
- empty/whitespace-only segments dropped at write time —
  ``Source/Alto/WriteXml.cpp:90-92``;
- a <processing> provenance header with stage settings snapshot —
  ``Source/Alto/Processing.hpp:9-26``, ``Source/TaskProcessor.cpp:338-355``
  (timestamps deliberately EXCLUDED from the matched output —
  nondeterminism stays in the metrics sidecar, SURVEY §2.7 C9).

Pure string building — usable inside the batch extractor or as a
DataFrame column via the Spark wrapper in operators (no XML lib needed).
"""

from __future__ import annotations


def parse_turn_xml(xml: str) -> dict:
    """Inverse parse (the reference's LoadFromXmlNode —
    ``Source/Alto/LoadFromXmlNode.cpp:5-179``): XML → structured dict.
    Used by :func:`validate_turn_xml` for the S8 roundtrip check."""
    import xml.etree.ElementTree as ET

    root = ET.fromstring(xml)
    blocks = []
    for blk in root.findall("block"):
        words = [{"id": s.get("ID"), "content": s.get("CONTENT"),
                  "start": int(s.get("START")) if s.get("START") else None,
                  "end": int(s.get("END")) if s.get("END") else None}
                 for s in blk.findall("string")]
        blocks.append({"id": blk.get("ID"), "words": words})
    return {
        "page_id": root.get("ID"),
        "conv_id": root.get("CONV"),
        "payload_class": root.get("CLASS"),
        "confidence": float(root.get("CONF")),
        "blocks": blocks,
    }


def validate_turn_xml(xml: str) -> list[str]:
    """S8 structural validation (the XSD-validate analog —
    ``Source/Application.cpp:339-408``): parse + invariant checks.
    Returns a list of violations (empty = OK)."""
    errors: list[str] = []
    try:
        doc = parse_turn_xml(xml)
    except Exception as e:  # malformed XML
        return [f"parse: {e}"]
    if not (doc["page_id"] or "").startswith("p_"):
        errors.append("page id scheme")
    if not 0.0 <= doc["confidence"] <= 1.0:
        errors.append("confidence range")
    for bi, blk in enumerate(doc["blocks"]):
        if blk["id"] != f'{doc["page_id"]}_b_{blk["id"].rsplit("_", 1)[-1]}':
            errors.append(f"block id scheme: {blk['id']}")
        if not blk["words"]:
            errors.append(f"empty block {blk['id']}")  # WriteXml.cpp:73-75
        for si, w in enumerate(blk["words"]):
            if w["id"] != f'{blk["id"]}_s_{si}':
                errors.append(f"word id order: {w['id']}")
            if not (w["content"] or "").strip():
                errors.append("whitespace word leaked")  # WriteXml.cpp:90-92
    return errors


def xml_attr(value: str) -> str:
    """& first, then quote/lt/gt — order matters (String.hpp:82-88)."""
    return (value.replace("&", "&amp;").replace('"', "&quot;")
            .replace("<", "&lt;").replace(">", "&gt;"))


def render_turn_xml(conv_id: str, turn_idx: int, payload_class: str,
                    spans: list[tuple[int, int]], extracted_text: str,
                    confidence: float, detector: str = "frogocr_spark") -> str:
    """One turn → ALTO-like XML with positional IDs."""
    page_id = f"p_{turn_idx}"
    lines = extracted_text.split("\n") if extracted_text else []
    out: list[str] = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        f'<page ID="{page_id}" CONV="{xml_attr(conv_id)}" '
        f'CLASS="{xml_attr(payload_class)}" CONF="{confidence:.4f}">',
        f'  <processing SOFTWARE="{xml_attr(detector)}" '
        f'CATEGORY="contentGeneration"/>',
    ]
    # spans align 1:1 with words only for word-granular classes
    # (pdf_layout/two_pass); otherwise positions are omitted rather than
    # mis-attached
    n_words = sum(1 for ln in lines for w in ln.split(" ") if w)
    span_iter = iter(spans if len(spans) == n_words else [])
    for bi, line in enumerate(lines):
        if not line.strip():          # WriteXml.cpp:90-92 analog
            continue
        block_id = f"{page_id}_b_{bi}"
        out.append(f'  <block ID="{block_id}">')
        si = 0
        for word in line.split(" "):
            if not word:      # double-space inside a kept segment
                continue
            sp = next(span_iter, None)
            pos = (f' START="{sp[0]}" END="{sp[1]}"' if sp else "")
            out.append(f'    <string ID="{block_id}_s_{si}"'
                       f' CONTENT="{xml_attr(word)}"{pos}/>')
            si += 1
        out.append("  </block>")
    out.append("</page>")
    return "\n".join(out)
