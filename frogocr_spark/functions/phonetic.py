"""Phonetic encoding for record-linkage blocking: a SIMPLIFIED
American Soundex as GENERATED SQL, shared text for every step except
the non-letter strip (dialect-split — see :func:`soundex_sql`; the
zvalue_sql / geohash single-source discipline everywhere the engines'
semantics actually agree, a pinned-by-test equality where they
don't).

Simplification vs archival Soundex (Russell 1918, NARA variant): the
H/W-transparency rule (consonants separated only by H or W collapse)
is NOT applied — H/W act like vowels, as in several mainstream SQL
implementations.  Deterministic and self-consistent, which is all a
BLOCKING key needs (it groups candidate name variants; the verifier
behind it decides matches).

Pipeline (all ANSI string functions, RE2-safe regex — no
backreferences): strip non-letters from the uppercased input, map
letters to digit codes via ``translate``, collapse adjacent duplicate
codes with a bounded replace chain (``ceil(log2 max_run)`` passes per
digit — replace() is a single pass, so each pass halves remaining run
lengths), drop the first code, drop zeros, pad to ``LETTER + 3
digits``.

Reference parity: the reference's font-interning lookup
(SURVEY.md §2 J8) is the same "canonicalize a noisy string universe
into a compact key" move; Soundex is its phonetic form, and the
blocking join built on it is the classic record-linkage counterpart
of the repo's length-blocked fuzzy join
(operators/joins.fuzzy_self_join_blocked).
"""

from __future__ import annotations

_CODES = "01230120022455012623010202"
_ALPHA = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
# 6 collapse passes handle duplicate runs up to 2^6 = 64 codes — far
# beyond any real token after the 64-char guard below.
_PASSES = 6


def soundex_sql(expr: str, max_len: int = 64,
                dialect: str = "spark") -> str:
    """SQL computing the simplified Soundex of ``expr`` (NULL when no
    letters survive).  Keep ``expr`` a simple column name — it is
    referenced twice.  Inputs longer than ``max_len`` letters are
    truncated first (bounds the collapse-pass count).

    ONE step is dialect-split (everything else is shared text): the
    non-letter strip.  Spark's ``regexp_replace`` is global; DuckDB's
    replaces only the FIRST match (found live — '123' kept '23' and
    coded as '2300' under shared text), so the DuckDB strip is
    restated as ``array_to_string(regexp_extract_all(…'[A-Z]'), '')``.
    The NARA-vector pytest runs BOTH dialects and asserts equality —
    the drift a shared text would normally preclude is pinned by
    test instead."""
    if dialect == "spark":
        strip = f"regexp_replace(upper({expr}), '[^A-Z]', '')"
    elif dialect == "duckdb":
        strip = (f"array_to_string("
                 f"regexp_extract_all(upper({expr}), '[A-Z]'), '')")
    else:
        raise ValueError(f"unknown dialect: {dialect!r}")
    letters = f"substr({strip}, 1, {max_len})"
    collapsed = f"translate({letters}, '{_ALPHA}', '{_CODES}')"
    for _ in range(_PASSES):
        for d in "0123456":
            collapsed = f"replace({collapsed}, '{d}{d}', '{d}')"
    return (f"CASE WHEN {letters} <> '' THEN "
            f"substr(substr({letters}, 1, 1) || "
            f"replace(substr({collapsed}, 2), '0', '') || '000', 1, 4) "
            f"END")
