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
from .secondpass import extract_two_pass, two_pass_arrays as \
    extract_two_pass_arrays
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
                  settings: pd.Series | None = None,
                  spans_as: str = "dicts") -> pd.DataFrame:
    """Batch twin of :func:`extract_turn` (same index as ``texts``).

    Vectorized sniff; vectorized ``plain`` path; per-class dispatch for the
    structured payloads.  Rows with non-default ``settings`` (rare in
    practice) take the scalar path.  Agreement with the scalar oracle is
    tested row-by-row in tests/test_extract.py.

    ``spans_as="pairs"`` returns the spans column as ``[(start, end)]``
    tuples instead of ``[{"start": ..., "end": ...}]`` dicts — the Arrow
    operator's format (it flattens spans into offset/child arrays, so
    per-span dicts are pure allocation overhead on the hot path); values
    are identical (tests/test_extract.py asserts both modes agree)."""
    pairs = spans_as == "pairs"
    s = texts.fillna("").astype(str)
    if settings is not None:
        tuned = settings.fillna("").astype(str) != ""
        if tuned.any():
            base = extract_batch(s[~tuned], None, spans_as=spans_as)
            recs = [extract_turn(s.at[i], settings.at[i])
                    for i in s.index[tuned]]
            tuned_df = pd.DataFrame(recs, index=s.index[tuned],
                                    columns=OUTPUT_COLUMNS)
            if pairs:
                tuned_df["spans"] = pd.Series(
                    [[(d["start"], d["end"]) for d in v]
                     for v in tuned_df["spans"]],
                    index=tuned_df.index, dtype=object)
            return _coerce(pd.concat([base, tuned_df]).loc[s.index])
    classes = sniff.sniff_series(s)

    # positional assembly: every column is a flat numpy array (or plain
    # python list for the ragged spans) filled by integer positions per
    # class, and the DataFrame is constructed ONCE at the end (replaces
    # ~40 masked .loc assignments + a full _coerce astype pass; batch
    # cost is dominated by the per-row extractors, so this is hygiene
    # more than speed — parity row-by-row in tests/test_extract.py)
    import numpy as np
    n = len(s)
    cls_np = classes.to_numpy()
    a_text = np.empty(n, dtype=object)
    spans_col: list = [None] * n
    a_nbl = np.zeros(n, dtype=np.int32)
    a_nsp = np.zeros(n, dtype=np.int32)
    a_nvar = np.zeros(n, dtype=np.int32)
    a_conf = np.ones(n, dtype=np.float64)
    a_pf = np.zeros(n, dtype=bool)
    a_eas = np.zeros(n, dtype=bool)

    plain_pos = np.flatnonzero(cls_np == "plain")
    if len(plain_pos):
        p = s.iloc[plain_pos]
        stripped = p.str.strip()
        lead = (p.str.len() - p.str.lstrip().str.len()).to_numpy()
        ln = stripped.str.len().to_numpy()
        nonempty = ln > 0
        a_text[plain_pos] = stripped.to_numpy(dtype=object)
        for pos_i, a, b, ne in zip(plain_pos.tolist(), lead.tolist(),
                                   (lead + ln).tolist(), nonempty.tolist()):
            spans_col[pos_i] = (
                ([(a, b)] if pairs else [{"start": a, "end": b}])
                if ne else [])
        a_nbl[plain_pos] = nonempty
        a_nsp[plain_pos] = nonempty

    tj_pos = np.flatnonzero(cls_np == "tool_json")
    if len(tj_pos):
        # fused batch path (~33% of the corpus mix): one json.loads +
        # regex search per row, columns built in bulk — no dataclasses,
        # no per-row dicts, no scalar-dispatch overhead
        t, st, en, kp, fl = tooljson.extract_tool_json_batch(
            s.iloc[tj_pos].tolist())
        a_text[tj_pos] = np.array(t, dtype=object)
        for pos_i, a, b, k in zip(tj_pos.tolist(), st, en, kp):
            spans_col[pos_i] = (
                ([(a, b)] if pairs else [{"start": a, "end": b}])
                if k else [])
        kept = np.array(kp, dtype=bool)
        a_nbl[tj_pos] = kept
        a_nsp[tj_pos] = kept
        a_pf[tj_pos] = np.array(fl, dtype=bool)
        # sniff guarantees tool_json raw is non-whitespace (stripped
        # starts with "{"), so empty_after_strip reduces to "not kept"
        a_eas[tj_pos] = ~kept

    # structured classes: per-row extractors (regex state machines — not
    # cross-row vectorizable), but everything AROUND them is batched and
    # allocation-light: ALL FOUR classes go straight from their internal
    # scan state to the output arrays (no Segment/Block objects at all —
    # secondpass.two_pass_arrays / segment.pdf_arrays /
    # boilerplate.html_arrays / markdown.markdown_arrays);
    # per-class bulk column fill by position
    for cls in ("html", "pdf_layout", "markdown", "two_pass"):
        pos = np.flatnonzero(cls_np == cls)
        if not len(pos):
            continue
        texts_l: list[str] = []
        nsp: list[int] = []
        nbl: list[int] = []
        nvar: list[int] = []
        confs: list[float] = []
        eas: list[bool] = []
        for pos_i, raw in zip(pos.tolist(), s.iloc[pos].tolist()):
            if cls == "two_pass":
                extracted, spans, n_segs, n_var, conf = \
                    extract_two_pass_arrays(raw, True)
                n_blocks = 1 if n_segs else 0
            elif cls == "pdf_layout":
                extracted, spans, n_blocks, n_segs = segment.pdf_arrays(raw)
                n_var, conf = 0, 1.0
            elif cls == "html":
                extracted, spans, n_blocks, n_segs = \
                    boilerplate.html_arrays(raw)
                n_var, conf = 0, 1.0
            else:
                extracted, spans, n_blocks, n_segs = \
                    markdown.markdown_arrays(raw)
                n_var, conf = 0, 1.0
            texts_l.append(extracted)
            spans_col[pos_i] = (spans if pairs else
                                [{"start": a, "end": b} for a, b in spans])
            nbl.append(n_blocks)
            nsp.append(n_segs)
            nvar.append(n_var)
            confs.append(conf)
            eas.append((not extracted) and bool(raw.strip()))
        a_text[pos] = np.array(texts_l, dtype=object)
        a_nbl[pos] = np.array(nbl, dtype=np.int32)
        a_nsp[pos] = np.array(nsp, dtype=np.int32)
        a_nvar[pos] = np.array(nvar, dtype=np.int32)
        a_conf[pos] = np.array(confs, dtype=np.float64)
        a_eas[pos] = np.array(eas, dtype=bool)

    return pd.DataFrame(
        {"payload_class": cls_np, "extracted_text": a_text,
         "spans": pd.Series(spans_col, index=s.index, dtype=object),
         "n_blocks": a_nbl, "n_spans": a_nsp, "n_variants": a_nvar,
         "confidence": a_conf, "parse_failed": a_pf,
         "empty_after_strip": a_eas},
        index=s.index, columns=OUTPUT_COLUMNS)


def _coerce(out: pd.DataFrame) -> pd.DataFrame:
    out["n_blocks"] = out["n_blocks"].astype("int32")
    out["n_spans"] = out["n_spans"].astype("int32")
    out["n_variants"] = out["n_variants"].astype("int32")
    out["confidence"] = out["confidence"].astype("float64")
    out["parse_failed"] = out["parse_failed"].astype(bool)
    out["empty_after_strip"] = out["empty_after_strip"].astype(bool)
    out["extracted_text"] = out["extracted_text"].astype(str)
    return out
