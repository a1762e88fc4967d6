"""Compile an XSD grammar (subset) into the declarative schema table
that :mod:`core.alto`'s validator walker executes — the analog of the
reference compiling its literal grammar file with libxml
(``xmlSchemaParse`` + ``xmlSchemaNewValidCtxt``,
``Source/Core/XML/Validator.cpp:30-50``): the constraints live in a real
``.xsd`` document (``resources/turn_schema.xsd``) and are EXECUTED, not
hand-transcribed into code.

Supported subset — exactly what the turn-XML dialect needs:

- top-level ``xs:element`` declarations with an inline
  ``xs:complexType``;
- ``xs:sequence`` child declarations via ``xs:element ref=...`` with
  ``minOccurs`` / ``maxOccurs`` (``unbounded`` → no upper bound).
  Dialect note: the walker enforces the content model CLOSED with
  occurrence bounds but order-insensitively (xs:all-style) — see
  ``alto._validate_element``;
- ``xs:attribute`` with ``use="required"`` and a simple type;
- named ``xs:simpleType`` restrictions of ``xs:string`` (pattern or
  enumeration), ``xs:double`` (min/maxInclusive bounds) — plus the
  builtins ``xs:string`` and ``xs:nonNegativeInteger``.

Value checkers are the SAME functions the hand-written table uses
(``alto._t_enum`` / ``_t_pattern`` / ...) so diagnostics are identical
whichever table is active; ``tests/test_settings_files.py`` asserts the
compiled table and the hand table are structurally equivalent and
reject the same malformed documents.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

_XS = "{http://www.w3.org/2001/XMLSchema}"

# the documented non-blank idiom: compiled to the dedicated checker so
# its diagnostic stays "must not be empty/whitespace" rather than a raw
# pattern dump (same constraint either way)
_NONBLANK_PATTERN = r"\s*\S[\s\S]*"


def _simple_type_checker(st: ET.Element):
    """xs:simpleType → value-checker callable (see module docstring)."""
    from . import alto

    res = st.find(f"{_XS}restriction")
    if res is None:
        raise ValueError(f"simpleType without restriction: {st.attrib}")
    base = res.get("base", "")
    enums = [e.get("value") for e in res.findall(f"{_XS}enumeration")]
    if enums:
        return alto._t_enum(frozenset(enums))
    pat = res.find(f"{_XS}pattern")
    if pat is not None:
        value = pat.get("value")
        if value == _NONBLANK_PATTERN:
            return alto._t_nonblank
        return alto._t_pattern(value)
    if base == "xs:double":
        lo = res.find(f"{_XS}minInclusive")
        hi = res.find(f"{_XS}maxInclusive")
        lo_v = float(lo.get("value")) if lo is not None else None
        hi_v = float(hi.get("value")) if hi is not None else None
        if (lo_v, hi_v) == (0.0, 1.0):
            return alto._t_float01
        raise ValueError(f"unsupported double bounds: [{lo_v}, {hi_v}]")
    raise ValueError(f"unsupported restriction base: {base}")


def _builtin_checker(name: str):
    from . import alto

    if name == "xs:string":
        return alto._t_string
    if name == "xs:nonNegativeInteger":
        return alto._t_int_nonneg
    raise ValueError(f"unsupported builtin type: {name}")


def compile_xsd(text: str) -> dict:
    """XSD document → ``{tag: (attrs, children)}`` in the exact shape of
    ``alto._TURN_XML_SCHEMA``: ``attrs`` maps attribute name →
    ``(required, checker)``; ``children`` maps child tag →
    ``(min_occurs, max_occurs_or_None)``."""
    root = ET.fromstring(text)
    types: dict = {}
    for st in root.findall(f"{_XS}simpleType"):
        types[st.get("name")] = _simple_type_checker(st)

    def checker_for(type_name: str):
        if type_name in types:
            return types[type_name]
        return _builtin_checker(type_name)

    schema: dict = {}
    for el in root.findall(f"{_XS}element"):
        ct = el.find(f"{_XS}complexType")
        if ct is None:
            raise ValueError(f"element without complexType: {el.attrib}")
        attrs: dict = {}
        for at in ct.findall(f"{_XS}attribute"):
            attrs[at.get("name")] = (at.get("use") == "required",
                                     checker_for(at.get("type")))
        children: dict = {}
        seq = ct.find(f"{_XS}sequence")
        if seq is not None:
            for ref in seq.findall(f"{_XS}element"):
                mn = int(ref.get("minOccurs", "1"))
                mx_raw = ref.get("maxOccurs", "1")
                mx = None if mx_raw == "unbounded" else int(mx_raw)
                children[ref.get("ref")] = (mn, mx)
        schema[el.get("name")] = (attrs, children)
    # every child ref must resolve to a declared element (a dangling ref
    # is a grammar bug, not a document bug)
    for tag, (_a, children) in schema.items():
        for ref in children:
            if ref not in schema:
                raise ValueError(f"<{tag}> refs undeclared element {ref}")
    return schema
