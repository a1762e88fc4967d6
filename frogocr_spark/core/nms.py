"""Non-maximum suppression over 1-D intervals (W5).

The reference sorts candidate boxes by confidence descending and greedily
suppresses any box whose IoU with an already-kept box exceeds a threshold
— ``Source/Paddle/Postprocessing.cpp:161-187``.  Re-expressed for char
intervals; inherently sequential per group, so the Spark operator runs it
per-turn inside ``applyInPandas`` (the per-group size is bounded by the
candidate cap W6, never by table size).
"""

from __future__ import annotations

IOU_THRESHOLD = 0.5


def interval_iou(a: tuple[int, int], b: tuple[int, int]) -> float:
    inter = min(a[1], b[1]) - max(a[0], b[0])
    if inter <= 0:
        return 0.0
    union = (a[1] - a[0]) + (b[1] - b[0]) - inter
    return inter / union if union > 0 else 0.0


def nms(candidates: list[tuple[int, int, float]],
        iou_threshold: float = IOU_THRESHOLD) -> list[tuple[int, int, float]]:
    """``candidates`` = (start, end, score); returns kept, in score-desc
    order with (start, end) tiebreak (deterministic)."""
    ordered = sorted(candidates, key=lambda c: (-c[2], c[0], c[1]))
    kept: list[tuple[int, int, float]] = []
    for c in ordered:
        if all(interval_iou((c[0], c[1]), (k[0], k[1])) <= iou_threshold
               for k in kept):
            kept.append(c)
    return kept
