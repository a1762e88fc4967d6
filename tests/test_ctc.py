"""CTC collapse (A7) — exact reference semantics
(/root/reference/Source/Paddle/Recognition.cpp:102-128)."""

import numpy as np
import pytest

from frogocr_spark.core.ctc import ctc_collapse, ctc_decode

VOCAB = ["", "a", "b", "c"]


def _scores(ids, conf=0.9):
    m = np.full((len(ids), len(VOCAB)), (1 - conf) / (len(VOCAB) - 1))
    for t, i in enumerate(ids):
        m[t, i] = conf
    return m


def test_blanks_and_repeats_dropped():
    # argmax sequence: a a _ a b b → "aab" (repeat collapsed, blank splits)
    ids, conf = ctc_collapse(_scores([1, 1, 0, 1, 2, 2]))
    assert ids == [1, 1, 2]
    assert ctc_decode(_scores([1, 1, 0, 1, 2, 2]), VOCAB)[0] == "aab"


def test_all_blank():
    ids, conf = ctc_collapse(_scores([0, 0, 0]))
    assert ids == [] and conf == 1.0


def test_empty_input():
    assert ctc_collapse(np.zeros((0, 4))) == ([], 1.0)


def test_confidence_is_mean_of_kept():
    m = _scores([1, 0, 2])
    m[0, 1], m[2, 2] = 0.8, 0.6
    ids, conf = ctc_collapse(m)
    assert ids == [1, 2]
    assert conf == pytest.approx((0.8 + 0.6) / 2)


def test_leading_class_kept():
    # first step compares against sentinel -1 → always eligible
    ids, _ = ctc_collapse(_scores([2]))
    assert ids == [2]


def test_ctc_decode_column(spark):
    """Column-level decode matches the scalar core on every row,
    truncates ragged arrays to whole timesteps, guards 0-step inputs."""
    import numpy as np

    from frogocr_spark.core.ctc import ctc_collapse
    from frogocr_spark.operators.ctcdecode import ctc_decode_column

    rng = np.random.default_rng(7)
    rows = []
    for i in range(20):
        n = [16, 17, 3, 0][i % 4]   # whole, ragged, sub-step, empty
        rows.append((i, [float(x) for x in rng.normal(size=n)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r.vec_id: (r.ids, r.conf)
           for r in ctc_decode_column(df, "embedding", n_classes=4).collect()}
    for i, arr in rows:
        v = np.asarray(
            spark.createDataFrame([(arr,)], "a array<float>")
            .first()[0], dtype=np.float64)   # float32 round-trip like Spark
        t = len(v) // 4
        exp_ids, exp_conf = ctc_collapse(v[: t * 4].reshape(t, 4))
        assert got[i][0] == exp_ids, i
        assert abs(got[i][1] - exp_conf) < 1e-12, i
