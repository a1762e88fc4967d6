"""Span-level text assembly + empty-cascade pruning.

Re-expresses FrogOCR's document assembly semantics over 1-D character
intervals instead of 2-D pixel boxes:

- ``merge_strings(vec, glue)`` — reference ``Source/Core/String.cpp:110-132``
  → :func:`assemble` joins line texts with ``"\\n"`` and word segments
  within a line with ``" "`` or ``""`` (per-segment ``glue`` flag).
- Empty-node pruning cascade (words→lines→blocks deleted when emptied) —
  reference ``Source/TaskProcessor.cpp:311-331``, ``Source/Alto/Alto.cpp:32-40``,
  ``Source/Alto/WriteXml.cpp:73-75,90-92`` → :func:`prune_empty`.
- Whitespace-only words dropped at write time —
  reference ``Source/Alto/WriteXml.cpp:90-92`` → segments whose raw slice is
  whitespace-only are dropped and counted.

Span convention (the per-turn output contract):

``spans`` is a flat ordered list of ``(start, end)`` character intervals
into the RAW payload.  Invariant: for every span ``raw[start:end]`` equals
the corresponding kept segment's text (before any unescaping the class
extractor documents).  ``extracted_text`` is the segment texts joined with
each segment's glue (``""``, ``" "`` or ``"\\n"``) — so the spans fully
locate the provenance of every extracted character.
"""

from __future__ import annotations

from dataclasses import dataclass, field

GLUE_NONE = ""
GLUE_SPACE = " "
GLUE_LINE = "\n"


@dataclass(slots=True)
class Segment:
    """One kept run of characters.

    ``text`` is what enters ``extracted_text``; ``start``/``end`` locate it
    in the raw payload; ``glue`` is the separator inserted BEFORE this
    segment (ignored for the first segment).
    """

    text: str
    start: int
    end: int
    glue: str = GLUE_LINE
    confidence: float = 1.0
    # alternative readings (text, confidence) — the Variant depth of the
    # reference's output model (Source/Document.hpp:22-30: Symbol/Word
    # carry std::vector<Variant>); populated by the two-pass merge when
    # a reading loses the J2 replacement (core/secondpass.py)
    variants: list[tuple[str, float]] = field(default_factory=list)


@dataclass(slots=True)
class Block:
    """A content block (FrogOCR Block analog — ``Source/Document.hpp:68-77``)."""

    segments: list[Segment] = field(default_factory=list)
    kind: str = "text"
    detector: str = "integrated"
    recognizer: str = "rules"
    confidence: float = 1.0


def trim_span(raw: str, start: int, end: int) -> tuple[int, int]:
    """Shrink ``[start,end)`` past leading/trailing whitespace in ``raw``.

    The span-trimming analog of ``trim_string_view`` — reference
    ``Source/Core/String.cpp:40-58``.
    """
    while start < end and raw[start].isspace():
        start += 1
    while end > start and raw[end - 1].isspace():
        end -= 1
    return start, end


def prune_empty(blocks: list[Block]) -> tuple[list[Block], int]:
    """Empty-cascade pruning: drop whitespace-only segments, then empty blocks.

    Returns ``(kept_blocks, n_dropped_segments)``.  Mirrors the reference's
    delete-parent-when-children-emptied loop (``TaskProcessor.cpp:311-331``).
    """
    kept: list[Block] = []
    dropped = 0
    for b in blocks:
        segs = [s for s in b.segments if s.text.strip()]
        dropped += len(b.segments) - len(segs)
        if segs:
            kept.append(Block(segments=segs, kind=b.kind, detector=b.detector,
                              recognizer=b.recognizer, confidence=b.confidence))
    return kept, dropped


def assemble(blocks: list[Block]) -> tuple[str, list[tuple[int, int]]]:
    """Join kept segments into ``(extracted_text, spans)``.

    Blocks are separated by ``"\\n"`` regardless of the first segment's own
    glue; within a block each segment contributes ``glue + text``.
    Deterministic positional enumeration = the ALTO positional-ID ordering
    (reference ``Source/Alto/WriteXml.cpp:130-137``).
    """
    parts: list[str] = []
    spans: list[tuple[int, int]] = []
    for bi, b in enumerate(blocks):
        for si, seg in enumerate(b.segments):
            if bi == 0 and si == 0:
                glue = ""
            elif si == 0:
                glue = GLUE_LINE
            else:
                glue = seg.glue
            parts.append(glue + seg.text)
            spans.append((seg.start, seg.end))
    return "".join(parts), spans


def finalize(blocks: list[Block]) -> tuple[str, list[tuple[int, int]],
                                           int, int, float]:
    """One-pass batch twin of :func:`assemble` + :func:`mean_confidence`
    + the variant count, over already-pruned blocks.

    Returns ``(extracted_text, spans, n_spans, n_variants, confidence)``.
    Bit-identical to calling the three separately: same segment iteration
    order, same glue rules, and the confidence sum accumulates
    left-to-right exactly like ``sum(confs)`` does (parity asserted
    row-by-row against the scalar oracle in tests/test_extract.py)."""
    parts: list[str] = []
    spans: list[tuple[int, int]] = []
    conf_total = 0.0
    n = 0
    n_var = 0
    for bi, b in enumerate(blocks):
        for si, seg in enumerate(b.segments):
            if bi == 0 and si == 0:
                parts.append(seg.text)
            elif si == 0:
                parts.append(GLUE_LINE + seg.text)
            else:
                parts.append(seg.glue + seg.text)
            spans.append((seg.start, seg.end))
            conf_total += seg.confidence
            n += 1
            n_var += len(seg.variants)
    conf = float(conf_total / n) if n else 1.0
    return "".join(parts), spans, n, n_var, conf


def finalize_pruned(blocks: list[Block]) -> tuple[str, list[tuple[int, int]],
                                                  int, int, int, float]:
    """:func:`prune_empty` + :func:`finalize` fused into ONE walk (the
    batch hot path): whitespace-only segments are skipped inline instead
    of rebuilding pruned Block/Segment lists, so no intermediate objects
    are allocated.  Returns ``(extracted_text, spans, n_blocks, n_spans,
    n_variants, confidence)`` where ``n_blocks`` counts blocks with at
    least one kept segment.

    Bit-identical to the two-call sequence: same kept-segment iteration
    order, the first KEPT segment of each block takes the block glue
    (exactly what pruning-then-finalizing produces), and the confidence
    sum accumulates left-to-right like the scalar path (parity asserted
    row-by-row in tests/test_extract.py)."""
    parts: list[str] = []
    spans: list[tuple[int, int]] = []
    conf_total = 0.0
    n = 0
    n_var = 0
    n_blocks = 0
    first_overall = True
    for b in blocks:
        first_in_block = True
        for seg in b.segments:
            if not seg.text.strip():
                continue
            if first_in_block:
                n_blocks += 1
                parts.append(seg.text if first_overall
                             else GLUE_LINE + seg.text)
                first_in_block = False
                first_overall = False
            else:
                parts.append(seg.glue + seg.text)
            spans.append((seg.start, seg.end))
            conf_total += seg.confidence
            n += 1
            n_var += len(seg.variants)
    conf = float(conf_total / n) if n else 1.0
    return "".join(parts), spans, n_blocks, n, n_var, conf


def mean_confidence(blocks: list[Block]) -> float:
    """Mean segment confidence over the document (A1 analog — reference
    ``Source/Tesseract/TesseractTextRecognizer.cpp:348-363``).  1.0 when empty
    (the reference's Confidence default — ``Source/Confidence.hpp:5-32``)."""
    confs = [s.confidence for b in blocks for s in b.segments]
    if not confs:
        return 1.0
    return float(sum(confs) / len(confs))
