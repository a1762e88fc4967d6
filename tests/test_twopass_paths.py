"""Two-pass extraction on large turns (the long-document tail): the
bisect-window J1/J2 pruning must handle hundreds of words × dozens of
regions with exact semantics (the windows' equivalence to an exhaustive
scan is separately fuzzed in test_secondpass.py)."""

from frogocr_spark.core import secondpass as sp


def _big_payload(n_words: int = 300, n_regions: int = 20) -> str:
    parts = []
    for i in range(n_regions):
        parts.append(" ".join(f"w{i}_{j}" for j in range(n_words // n_regions)))
        parts.append("[[LOWCONF]]" + f"fix{i} ok{i}"[::-1] + "[[/LOWCONF]]")
    return " ".join(parts)


def test_large_turn_regions_all_replaced():
    raw = _big_payload()
    fp_words, regions = sp.first_pass(raw)
    assert len(fp_words) * len(regions) > 4096  # genuinely large case
    blocks, conf = sp.extract_two_pass(raw)
    text = " ".join(s.text for b in blocks for s in b.segments)
    # every region replaced (all second-pass confs 0.96 → majority relaxed)
    for i in range(20):
        assert f"fix{i} ok{i}" in text
        assert f"fix{i} ok{i}"[::-1].split()[0] not in text
