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
        words = []
        for s in blk.findall("string"):
            words.append({
                "id": s.get("ID"), "content": s.get("CONTENT"),
                "start": int(s.get("START")) if s.get("START") else None,
                "end": int(s.get("END")) if s.get("END") else None,
                # Variant/Glyph depth (LoadFromXmlNode.cpp parses the
                # same nesting for real ALTO)
                "variants": [(v.get("CONTENT"), float(v.get("VC")))
                             for v in s.findall("variant")],
                "glyphs": [{
                    "id": g.get("ID"), "content": g.get("CONTENT"),
                    "conf": float(g.get("GC")),
                    "variants": [(v.get("CONTENT"), float(v.get("VC")))
                                 for v in g.findall("variant")],
                } for g in s.findall("glyph")],
            })
        blocks.append({"id": blk.get("ID"), "words": words})
    return {
        "page_id": root.get("ID"),
        "conv_id": root.get("CONV"),
        "payload_class": root.get("CLASS"),
        "confidence": float(root.get("CONF")),
        "blocks": blocks,
    }


# ---------------------------------------------------------------------------
# XSD-grade schema validation (S8).  The reference validates documents
# against Resources/Schemas/alto-4-4.xsd with libxml's compiled schema
# validator (Source/Core/XML/Validator.cpp:30-50).  This is the same
# CLASS of check for the turn-XML dialect: a declarative schema table
# (required/optional attributes with value types, enumerations, element
# content models with cardinality) enforced by a generic walker — not
# ad-hoc if-statements — so a malformed document fails on the same
# constraint (and with a location) the reference validator would report.

import re as _re

# alto-4-4.xsd:936-945 processingCategoryType enumeration, verbatim
PROCESSING_CATEGORIES = frozenset({
    "contentGeneration", "contentModification", "preOperation",
    "postOperation", "other"})
PAYLOAD_CLASSES = frozenset({
    "plain", "html", "markdown", "pdf_layout", "tool_json", "two_pass"})


def _t_string(v: str) -> str | None:
    return None


def _t_nonblank(v: str) -> str | None:
    return None if v.strip() else "must not be empty/whitespace"


def _t_float01(v: str) -> str | None:
    try:
        f = float(v)
    except ValueError:
        return f"not a decimal: {v!r}"
    return None if 0.0 <= f <= 1.0 else f"out of range [0,1]: {v}"


def _t_int_nonneg(v: str) -> str | None:
    if not v.isdigit():
        return f"not a non-negative integer: {v!r}"
    return None


def _t_enum(values: frozenset):
    def check(v: str) -> str | None:
        return (None if v in values
                else f"not in enumeration {sorted(values)}: {v!r}")
    return check


def _t_pattern(rx: str):
    pat = _re.compile(rx)
    def check(v: str) -> str | None:
        return (None if pat.fullmatch(v)
                else f"does not match pattern {rx!r}: {v!r}")
    return check


# element → (attrs: name → (required, type check),
#            children: tag → (min_occurs, max_occurs))
_TURN_XML_SCHEMA: dict = {
    "page": (
        {"ID": (True, _t_pattern(r"p_\d+")),
         "CONV": (True, _t_string),
         "CLASS": (True, _t_enum(PAYLOAD_CLASSES)),
         "CONF": (True, _t_float01)},
        {"processing": (1, 1), "block": (0, None)},
    ),
    "processing": (
        {"SOFTWARE": (True, _t_nonblank),
         "CATEGORY": (True, _t_enum(PROCESSING_CATEGORIES))},
        {},
    ),
    "block": (
        {"ID": (True, _t_pattern(r"p_\d+_b_\d+"))},
        # minOccurs=1: an empty <block> is schema-invalid (the F8 prune
        # cascade must have removed it before serialization)
        {"string": (1, None)},
    ),
    "string": (
        {"ID": (True, _t_pattern(r"p_\d+_b_\d+_s_\d+")),
         "CONTENT": (True, _t_nonblank),
         "START": (False, _t_int_nonneg),
         "END": (False, _t_int_nonneg)},
        {"glyph": (0, None), "variant": (0, None)},
    ),
    # Variant/Glyph depth: the reference's String→Glyph→Variant nesting
    # (WriteXml.cpp:113-129; alto-4-4.xsd GlyphType/VariantType analog)
    "glyph": (
        {"ID": (True, _t_pattern(r"p_\d+_b_\d+_s_\d+_g_\d+")),
         "CONTENT": (True, _t_nonblank),
         "GC": (True, _t_float01)},
        {"variant": (0, None)},
    ),
    "variant": (
        {"CONTENT": (True, _t_nonblank),
         "VC": (True, _t_float01)},
        {},
    ),
}


_ACTIVE_SCHEMA: dict | None = None


def _schema_table() -> dict:
    """The EXECUTED grammar: ``resources/turn_schema.xsd`` compiled at
    first use by :mod:`core.xsdschema` (the reference compiles its
    literal ``alto-4-4.xsd`` the same way —
    ``Source/Core/XML/Validator.cpp:30-50``).  Falls back to the
    hand-written ``_TURN_XML_SCHEMA`` if the resource cannot be read
    (e.g. a stripped deployment); a pytest asserts the compiled and
    hand tables are structurally equivalent so the fallback can never
    silently diverge."""
    global _ACTIVE_SCHEMA
    if _ACTIVE_SCHEMA is None:
        try:
            from importlib import resources

            from . import xsdschema
            text = (resources.files("frogocr_spark") / "resources"
                    / "turn_schema.xsd").read_text(encoding="utf-8")
            _ACTIVE_SCHEMA = xsdschema.compile_xsd(text)
        except Exception:
            _ACTIVE_SCHEMA = _TURN_XML_SCHEMA
    return _ACTIVE_SCHEMA


def _validate_element(el, path: str, errors: list[str],
                      schema: dict | None = None) -> None:
    schema = schema if schema is not None else _schema_table()
    spec = schema.get(el.tag)
    if spec is None:
        errors.append(f"{path}: unexpected element <{el.tag}>")
        return
    attrs, children = spec
    for name, value in el.attrib.items():
        if name not in attrs:
            errors.append(f"{path}/@{name}: attribute not allowed")
            continue
        err = attrs[name][1](value)
        if err:
            errors.append(f"{path}/@{name}: {err}")
    for name, (required, _) in attrs.items():
        if required and name not in el.attrib:
            errors.append(f"{path}/@{name}: required attribute missing")
    # co-constraint (xsd:assert analog): span ends after it starts, and
    # START/END come as a pair
    if el.tag == "string":
        has_s, has_e = "START" in el.attrib, "END" in el.attrib
        if has_s != has_e:
            errors.append(f"{path}: START/END must be paired")
        elif has_s and el.get("START").isdigit() and el.get("END").isdigit():
            if int(el.get("START")) >= int(el.get("END")):
                errors.append(f"{path}: START must be < END")
    counts: dict[str, int] = {}
    for i, child in enumerate(el):
        # closed content model: a child tag not declared for THIS parent
        # is rejected even when it is a known element elsewhere in the
        # schema (e.g. <processing> inside <string>, <variant> inside
        # <variant>) — exactly what the XSD content model enforces
        if child.tag not in children:
            if child.tag in schema:
                errors.append(
                    f"{path}/{child.tag}[{i}]: element <{child.tag}> not "
                    f"allowed inside <{el.tag}>")
            else:
                errors.append(
                    f"{path}/{child.tag}[{i}]: unexpected element "
                    f"<{child.tag}>")
            continue
        counts[child.tag] = counts.get(child.tag, 0) + 1
        _validate_element(child, f"{path}/{child.tag}[{i}]", errors,
                          schema)
    for tag, (mn, mx) in children.items():
        n = counts.get(tag, 0)
        if n < mn:
            errors.append(f"{path}: <{tag}> occurs {n} < minOccurs {mn}")
        if mx is not None and n > mx:
            errors.append(f"{path}: <{tag}> occurs {n} > maxOccurs {mx}")


def validate_turn_schema(xml: str) -> list[str]:
    """Schema-level validation alone (the xmlSchemaValidate analog):
    returns violations with XPath-ish locations, empty = valid."""
    import xml.etree.ElementTree as ET

    try:
        root = ET.fromstring(xml)
    except Exception as e:
        return [f"parse: {e}"]
    errors: list[str] = []
    # the schema's document element is <page> (xs:element declaration —
    # a valid fragment rooted anywhere else is not a valid document)
    if root.tag != "page":
        errors.append(f"{root.tag}: document root must be <page>")
    _validate_element(root, root.tag, errors)
    return errors


def validate_turn_xml(xml: str) -> list[str]:
    """S8 validation (the XSD-validate analog —
    ``Source/Application.cpp:339-408``): schema-table validation
    (:func:`validate_turn_schema`) plus the cross-element ID-scheme
    invariants a grammar can't express.  Returns violations (empty = OK).
    """
    errors: list[str] = list(validate_turn_schema(xml))
    try:
        doc = parse_turn_xml(xml)
    except Exception as e:  # malformed XML
        return errors or [f"parse: {e}"]
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


def _render_variant(v: tuple[str, float], indent: str) -> str:
    # VC uses the reference's 2-significant-digit format
    # (WriteXml.cpp:114 "{:.2}")
    return f'{indent}<variant CONTENT="{xml_attr(v[0])}" VC="{v[1]:.2}"/>'


def render_turn_xml(conv_id: str, turn_idx: int, payload_class: str,
                    spans: list[tuple[int, int]], extracted_text: str,
                    confidence: float, detector: str = "frogocr_spark",
                    word_details: list[dict] | None = None) -> str:
    """One turn → ALTO-like XML with positional IDs.

    ``word_details`` (optional) carries the reference's full output
    depth (Document.hpp:22-30, WriteXml.cpp:89-129): one dict per word,
    aligned exactly like ``spans``, with optional ``"variants"``
    ([(text, conf), ...] — losing alternative readings, e.g. from the
    two-pass J2 replacement via ``extract_turn()["word_variants"]``) and
    optional ``"glyphs"`` ([{"content", "conf", "variants"}, ...] —
    per-symbol depth when the upstream recognizer provides it).  Words
    with neither stay self-closing, exactly like the reference's
    ``string.glyphs.empty()`` branch (WriteXml.cpp:100-110)."""
    page_id = f"p_{turn_idx}"
    lines = extracted_text.split("\n") if extracted_text else []
    out: list[str] = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        f'<page ID="{page_id}" CONV="{xml_attr(conv_id)}" '
        f'CLASS="{xml_attr(payload_class)}" CONF="{confidence:.4f}">',
        f'  <processing SOFTWARE="{xml_attr(detector)}" '
        f'CATEGORY="contentGeneration"/>',
    ]
    # spans (and word_details) align 1:1 with words only for
    # word-granular classes (pdf_layout/two_pass); otherwise positions
    # are omitted rather than mis-attached
    n_words = sum(1 for ln in lines for w in ln.split(" ") if w)
    span_iter = iter(spans if len(spans) == n_words else [])
    det_iter = iter(word_details
                    if word_details and len(word_details) == n_words
                    else [])
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
            det = next(det_iter, None) or {}
            pos = (f' START="{sp[0]}" END="{sp[1]}"' if sp else "")
            sid = f"{block_id}_s_{si}"
            head = f'    <string ID="{sid}" CONTENT="{xml_attr(word)}"{pos}'
            variants = det.get("variants") or []
            glyphs = det.get("glyphs") or []
            if not variants and not glyphs:
                out.append(head + "/>")
            else:
                out.append(head + ">")
                for gi, g in enumerate(glyphs):
                    ghead = (f'      <glyph ID="{sid}_g_{gi}" '
                             f'CONTENT="{xml_attr(g["content"])}" '
                             f'GC="{g["conf"]:.2}"')
                    gvars = g.get("variants") or []
                    if not gvars:
                        out.append(ghead + "/>")
                    else:
                        out.append(ghead + ">")
                        out.extend(_render_variant(v, "        ")
                                   for v in gvars)
                        out.append("      </glyph>")
                out.extend(_render_variant(v, "      ") for v in variants)
                out.append("    </string>")
            si += 1
        out.append("  </block>")
    out.append("</page>")
    return "\n".join(out)
