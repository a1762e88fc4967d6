"""Per-turn extraction dispatch + the Arrow-batch (pandas) entry point.

:func:`extract_turn` is the scalar oracle: one raw payload in, one
extraction record out.  :func:`extract_batch` is the batch twin that the
Spark ``mapInArrow`` operator calls — sniffing is fully vectorized, the
``plain`` class (the bulk of real transcripts) is handled with vectorized
pandas ``.str`` ops, and the structured classes run their (regex-driven,
allocation-light) extractors over just their class subset.  No per-row
Python ever crosses the JVM boundary: the whole batch is one Arrow
record batch (north-rule requirement).

Pipeline stages fused here (reference ``Source/TaskProcessor.cpp:178-373``
``doTask`` chain): sniff (S6 codec choice) → class extractor (X1 detect +
X2 recognize) → empty-cascade prune (F8) → span assembly (C5/W1/W3).
"""

from __future__ import annotations

from typing import Any

import pandas as pd

from . import assemble, boilerplate, markdown, segment, sniff, tooljson
from .assemble import Block, Segment
from .secondpass import extract_two_pass
from .settings import Settings

OUTPUT_COLUMNS = [
    "payload_class", "extracted_text", "spans", "n_blocks", "n_spans",
    "n_variants", "confidence", "parse_failed", "empty_after_strip",
]


def extract_plain(raw: str) -> list[Block]:
    """Identity extraction: the trimmed payload as one full-range span."""
    s, e = assemble.trim_span(raw, 0, len(raw))
    if s >= e:
        return []
    return [Block(segments=[Segment(text=raw[s:e], start=s, end=e, glue="")],
                  kind="text", detector="integrated", recognizer="identity")]


def extract_turn(text: str | None,
                 settings_csv: str | None = None,
                 cls: str | None = None) -> dict[str, Any]:
    """Scalar oracle: classify + extract one turn payload.

    ``settings_csv`` = per-turn typed settings (F9/F7/X1 —
    core.settings.Settings): MinWordConfidence gates words post-extraction,
    SecondPass=off disables the two-pass merge.  ``cls`` = the payload
    class when the caller already sniffed it (the batch path passes the
    vectorized ``sniff_series`` result — agreement with scalar sniff is
    tested in tests/test_sniff.py); None → sniff here."""
    raw = text if isinstance(text, str) else ""
    settings = Settings.parse_csv(settings_csv)
    cls = cls or sniff.sniff(raw)
    parse_failed = False
    confidence = 1.0
    if cls == "plain":
        blocks = extract_plain(raw)
    elif cls == "html":
        blocks = boilerplate.extract_html(raw)
    elif cls == "pdf_layout":
        blocks = segment.extract_pdf_layout(raw)
    elif cls == "markdown":
        blocks = markdown.extract_markdown(raw)
    elif cls == "tool_json":
        blocks, parse_failed = tooljson.extract_tool_json(raw)
    else:  # two_pass
        blocks, confidence = extract_two_pass(raw, settings.second_pass)

    if settings.min_word_confidence > 0:  # F7 word-confidence gate
        blocks = [
            Block(segments=[s for s in b.segments
                            if s.confidence >= settings.min_word_confidence],
                  kind=b.kind, detector=b.detector,
                  recognizer=b.recognizer, confidence=b.confidence)
            for b in blocks
        ]
    blocks, _dropped = assemble.prune_empty(blocks)
    extracted, spans = assemble.assemble(blocks)
    if cls != "two_pass":
        confidence = assemble.mean_confidence(blocks)
    # per-word alternative readings (Variant depth, Document.hpp:22-30):
    # aligned 1:1 with spans; only the two-pass merge produces them
    word_variants = [list(s.variants) for b in blocks for s in b.segments]
    return {
        "payload_class": cls,
        "extracted_text": extracted,
        "spans": [{"start": a, "end": b} for a, b in spans],
        "n_blocks": len(blocks),
        "n_spans": len(spans),
        "n_variants": sum(len(v) for v in word_variants),
        "confidence": confidence,
        "parse_failed": parse_failed,
        "empty_after_strip": (not extracted) and bool(raw.strip()),
        "word_variants": word_variants,   # sink-level detail, not a DF column
    }


def _empty_record(cls: str = "plain") -> dict[str, Any]:
    return {"payload_class": cls, "extracted_text": "", "spans": [],
            "n_blocks": 0, "n_spans": 0, "n_variants": 0,
            "confidence": 1.0, "parse_failed": False,
            "empty_after_strip": False, "word_variants": []}


def extract_batch(texts: pd.Series,
                  settings: pd.Series | None = None) -> pd.DataFrame:
    """Batch twin of :func:`extract_turn` (same index as ``texts``).

    Vectorized sniff; vectorized ``plain`` path; per-class dispatch for the
    structured payloads.  Rows with non-default ``settings`` (rare in
    practice) take the scalar path.  Agreement with the scalar oracle is
    tested row-by-row in tests/test_extract.py.
    """
    s = texts.fillna("").astype(str)
    if settings is not None:
        tuned = settings.fillna("").astype(str) != ""
        if tuned.any():
            base = extract_batch(s[~tuned], None)
            recs = [extract_turn(s.at[i], settings.at[i])
                    for i in s.index[tuned]]
            tuned_df = pd.DataFrame(recs, index=s.index[tuned],
                                    columns=OUTPUT_COLUMNS)
            return _coerce(pd.concat([base, tuned_df]).loc[s.index])
    classes = sniff.sniff_series(s)
    out = pd.DataFrame(index=s.index, columns=OUTPUT_COLUMNS, dtype=object)
    out["payload_class"] = classes

    plain_mask = classes == "plain"
    if plain_mask.any():
        p = s[plain_mask]
        stripped = p.str.strip()
        lead = p.str.len() - p.str.lstrip().str.len()
        n = stripped.str.len()
        nonempty = n > 0
        out.loc[plain_mask, "extracted_text"] = stripped
        out.loc[plain_mask, "spans"] = pd.Series(
            [[{"start": int(a), "end": int(a + ln)}] if ne else []
             for a, ln, ne in zip(lead, n, nonempty)],
            index=p.index, dtype=object,
        )
        out.loc[plain_mask, "n_blocks"] = nonempty.astype(int)
        out.loc[plain_mask, "n_spans"] = nonempty.astype(int)
        out.loc[plain_mask, "n_variants"] = 0
        out.loc[plain_mask, "confidence"] = 1.0
        out.loc[plain_mask, "parse_failed"] = False
        out.loc[plain_mask, "empty_after_strip"] = False

    tj_mask = classes == "tool_json"
    if tj_mask.any():
        # fused batch path (~33% of the corpus mix): one json.loads +
        # regex search per row, columns built in bulk — no dataclasses,
        # no per-row dicts, no scalar-dispatch overhead
        tj_idx = s.index[tj_mask]
        t, st, en, kp, fl = tooljson.extract_tool_json_batch(
            s[tj_mask].tolist())
        out.loc[tj_mask, "extracted_text"] = pd.Series(
            t, index=tj_idx, dtype=object)
        out.loc[tj_mask, "spans"] = pd.Series(
            [[{"start": a, "end": b}] if k else []
             for a, b, k in zip(st, en, kp)], index=tj_idx, dtype=object)
        kept = pd.Series(kp, index=tj_idx)
        out.loc[tj_mask, "n_blocks"] = kept.astype(int)
        out.loc[tj_mask, "n_spans"] = kept.astype(int)
        out.loc[tj_mask, "n_variants"] = 0
        out.loc[tj_mask, "confidence"] = 1.0
        out.loc[tj_mask, "parse_failed"] = pd.Series(fl, index=tj_idx)
        # sniff guarantees tool_json raw is non-whitespace (stripped
        # starts with "{"), so empty_after_strip reduces to "not kept"
        out.loc[tj_mask, "empty_after_strip"] = ~kept

    # structured classes: per-row extractors (regex state machines — not
    # cross-row vectorizable), but everything AROUND them is batched:
    # direct extractor call (no extract_turn dispatch / Settings parse),
    # fused prune+assemble+confidence (assemble.finalize), list append +
    # one bulk column assignment per class instead of a DataFrame of
    # per-row dicts (measured ~1.2-1.9× per class; parity row-by-row in
    # tests/test_extract.py)
    _EXTRACTORS = {"html": boilerplate.extract_html,
                   "pdf_layout": segment.extract_pdf_layout,
                   "markdown": markdown.extract_markdown}
    for cls in ("html", "pdf_layout", "markdown", "two_pass"):
        mask = classes == cls
        if not mask.any():
            continue
        idx = s.index[mask]
        fn = _EXTRACTORS.get(cls)
        texts_l: list[str] = []
        spans_l: list[list] = []
        nsp: list[int] = []
        nbl: list[int] = []
        nvar: list[int] = []
        confs: list[float] = []
        eas: list[bool] = []
        for raw in s[mask].tolist():
            if fn is None:
                blocks, conf = extract_two_pass(raw, True)
            else:
                blocks = fn(raw)
            blocks, _dropped = assemble.prune_empty(blocks)
            extracted, spans, n_segs, n_var, mean_conf = \
                assemble.finalize(blocks)
            if fn is not None:
                conf = mean_conf
            texts_l.append(extracted)
            spans_l.append([{"start": a, "end": b} for a, b in spans])
            nbl.append(len(blocks))
            nsp.append(n_segs)
            nvar.append(n_var)
            confs.append(conf)
            eas.append((not extracted) and bool(raw.strip()))
        out.loc[mask, "extracted_text"] = pd.Series(
            texts_l, index=idx, dtype=object)
        out.loc[mask, "spans"] = pd.Series(spans_l, index=idx, dtype=object)
        out.loc[mask, "n_blocks"] = pd.Series(nbl, index=idx)
        out.loc[mask, "n_spans"] = pd.Series(nsp, index=idx)
        out.loc[mask, "n_variants"] = pd.Series(nvar, index=idx)
        out.loc[mask, "confidence"] = pd.Series(confs, index=idx)
        out.loc[mask, "parse_failed"] = False
        out.loc[mask, "empty_after_strip"] = pd.Series(eas, index=idx)
    return _coerce(out)


def _coerce(out: pd.DataFrame) -> pd.DataFrame:
    out["n_blocks"] = out["n_blocks"].astype("int32")
    out["n_spans"] = out["n_spans"].astype("int32")
    out["n_variants"] = out["n_variants"].astype("int32")
    out["confidence"] = out["confidence"].astype("float64")
    out["parse_failed"] = out["parse_failed"].astype(bool)
    out["empty_after_strip"] = out["empty_after_strip"].astype(bool)
    out["extracted_text"] = out["extracted_text"].astype(str)
    return out
