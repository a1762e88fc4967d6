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
        for si, word in enumerate(line.split(" ")):
            if not word:
                continue
            sp = next(span_iter, None)
            pos = (f' START="{sp[0]}" END="{sp[1]}"' if sp else "")
            out.append(f'    <string ID="{block_id}_s_{si}"'
                       f' CONTENT="{xml_attr(word)}"{pos}/>')
        out.append("  </block>")
    out.append("</page>")
    return "\n".join(out)
