"""Table reconstruction: OCR boxes → structure cells → spliced HTML.

Re-expresses ``PaddleStructure::rebuild_table`` — reference
``Source/Paddle/Structure.cpp:245-335`` — exactly:

- each OCR box (expanded by 1px per side, ``:252-255``) is assigned to
  the cell minimizing ``(1 - IoU, then L1 corner distance)``
  (``:268-276``; the distance is ``dis`` at ``:337-352`` = sum of all
  four corner deltas + min(top-left delta, bottom-right delta));
  ties broken by lowest cell index (the reference's unstable
  ``std::ranges::sort`` leaves ties unspecified — we pin the
  deterministic choice);
- the structure tag stream is walked in order; every tag containing
  ``</td>`` receives the next cell's texts (``:283-331``): a combined
  ``<td></td>`` token is split around the content, any other closing
  token is appended after it;
- multi-text cells (``:296-322``): if the FIRST text contains ``<b>``
  and the cell has >1 texts the whole cell is wrapped in ``<b>…</b>``;
  each text is stripped of a leading ``<b>`` and trailing ``</b>``,
  empty remainders are skipped, and a single space is glued between
  consecutive texts.  NOTE the reference's "remove blank" step is
  ``content.substr(0)`` — a no-op (``:300-302``); we mirror the
  BEHAVIOR, not the apparent intent, so outputs match byte-for-byte.
"""

from __future__ import annotations

Box = tuple[float, float, float, float]  # x1, y1, x2, y2


def quad_to_box(q: list[float]) -> Box:
    """xyxyxyxy → xyxy bbox (Utility::xyxyxyxy2xyxy analog)."""
    xs, ys = q[0::2], q[1::2]
    return (min(xs), min(ys), max(xs), max(ys))


def iou(a: Box, b: Box) -> float:
    ix = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
    iy = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
    inter = ix * iy
    union = ((a[2] - a[0]) * (a[3] - a[1])
             + (b[2] - b[0]) * (b[3] - b[1]) - inter)
    return inter / union if union > 0 else 0.0


def corner_dis(a: Box, b: Box) -> float:
    """Structure.cpp:337-352: all-corner L1 + min(TL-only, BR-only)."""
    d_all = (abs(b[0] - a[0]) + abs(b[1] - a[1])
             + abs(b[2] - a[2]) + abs(b[3] - a[3]))
    d_tl = abs(b[0] - a[0]) + abs(b[1] - a[1])
    d_br = abs(b[2] - a[2]) + abs(b[3] - a[3])
    return d_all + min(d_tl, d_br)


def match_cells(ocr: list[tuple[Box, str]],
                cells: list[Box]) -> list[list[str]]:
    """J7 assignment: per OCR box, argmin (1-IoU, dis, cell_idx)."""
    matched: list[list[str]] = [[] for _ in cells]
    for box, text in ocr:
        expanded = (box[0] - 1, box[1] - 1, box[2] + 1, box[3] + 1)
        best = min(
            range(len(cells)),
            key=lambda j: (1.0 - iou(expanded, cells[j]),
                           corner_dis(expanded, cells[j]), j),
        ) if cells else None
        if best is not None:
            matched[best].append(text)
    return matched


def _cell_html(texts: list[str]) -> str:
    if not texts:
        return ""
    out = ""
    b_with = "<b>" in texts[0] and len(texts) > 1
    if b_with:
        out += "<b>"
    for j, content in enumerate(texts):
        if len(texts) > 1:
            # reference "remove blank" is substr(0) — a deliberate no-op
            if content.startswith("<b>"):
                # reference guard is length>2, i.e. >=3 — coincides with
                # startswith (Structure.cpp:302)
                content = content[3:]
            if len(content) > 4 and content.endswith("</b>"):
                # reference strips ONLY when length>4: a cell that is
                # exactly '</b>' is kept verbatim (Structure.cpp:305-306)
                content = content[:-4]
            if not content:
                continue
            if j != len(texts) - 1 and not content.endswith(" "):
                content += " "
        out += content
    if b_with:
        out += "</b>"
    return out


def rebuild_table(tags: list[str], cells: list[Box],
                  ocr: list[tuple[Box, str]]) -> str:
    """Splice matched cell texts into the structure tag stream."""
    matched = match_cells(ocr, cells)
    html = ""
    td_idx = 0
    for tag in tags:
        if "</td>" not in tag:
            html += tag
            continue
        combined = "<td></td>" in tag
        if combined:
            html += "<td>"
        if td_idx < len(matched):
            html += _cell_html(matched[td_idx])
        html += "</td>" if combined else tag
        td_idx += 1
    return html
