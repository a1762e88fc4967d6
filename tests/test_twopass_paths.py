"""Hybrid scalar/vectorized two-pass paths agree on large turns."""

import numpy as np

from frogocr_spark.core import secondpass as sp


def _big_payload(n_words: int = 300, n_regions: int = 20) -> str:
    parts = []
    for i in range(n_regions):
        parts.append(" ".join(f"w{i}_{j}" for j in range(n_words // n_regions)))
        parts.append("[[LOWCONF]]" + f"fix{i} ok{i}"[::-1] + "[[/LOWCONF]]")
    return " ".join(parts)


def test_vectorized_path_triggers_and_matches_scalar_semantics():
    raw = _big_payload()
    fp_words, regions = sp.first_pass(raw)
    assert len(fp_words) * len(regions) > 4096  # vectorized branch active
    blocks, conf = sp.extract_two_pass(raw)
    text = " ".join(s.text for b in blocks for s in b.segments)
    # every region replaced (all second-pass confs 0.96 → majority relaxed)
    for i in range(20):
        assert f"fix{i} ok{i}" in text
        assert f"fix{i} ok{i}"[::-1].split()[0] not in text


def test_overlap_matrix_agrees_with_scalar():
    rng = np.random.default_rng(7)
    starts = rng.integers(0, 500, 80)
    a = np.stack([starts, starts + rng.integers(1, 40, 80)], axis=1).astype(float)
    starts_b = rng.integers(0, 500, 60)
    b = np.stack([starts_b, starts_b + rng.integers(1, 40, 60)], axis=1).astype(float)
    mat = sp._overlap_matrix(a, b)
    for i in range(len(a)):
        for j in range(len(b)):
            expect = sp.overlaps_either(tuple(a[i]), tuple(b[j]))
            assert mat[i, j] == expect, (a[i], b[j])
