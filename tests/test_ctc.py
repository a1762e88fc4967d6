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
