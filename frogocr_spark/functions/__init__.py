"""Scalar column-expression helpers (SURVEY §2.7) — all JVM-side."""
