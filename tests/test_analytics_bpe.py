"""Count-min sketch (operators/sketches), BPE merge training
(operators/bpe), and funnel / cohort / histogram / exact moment stats
(operators/analytics) — differential-tested against pure-Python twins
and hand-computed values."""

from __future__ import annotations

import datetime as dt
import hashlib
import math
import random
import statistics

import pytest

from frogocr_spark.operators.analytics import (cohort_retention,
                                               funnel_counts,
                                               histogram_fixed,
                                               moment_stats_exact)
from frogocr_spark.operators.bpe import bpe_train, word_vocab
from frogocr_spark.operators.sketches import (cms_build, cms_estimate,
                                              cms_heavy_hitters)


# ------------------------------------------------------------- CMS

def _py_cms_cell(key: str, row: int, w: int) -> int:
    h = int(hashlib.md5(f"{row}:{key}".encode()).hexdigest()[:15], 16)
    return h % w


def _py_cms(keys, d, w):
    cells = {}
    for k in keys:
        for i in range(d):
            c = (i, _py_cms_cell(k, i, w))
            cells[c] = cells.get(c, 0) + 1
    return cells


def test_cms_build_matches_python_twin(spark):
    rng = random.Random(7)
    keys = [f"tok{rng.randrange(40)}" for _ in range(500)]
    df = spark.createDataFrame([(k,) for k in keys], ["token"])
    got = {(r["row"], r["col"]): r["cnt"]
           for r in cms_build(df, "token", d=3, w=64).collect()}
    assert got == _py_cms(keys, 3, 64)


def test_cms_estimate_never_underestimates_and_is_exact_sans_collision(
        spark):
    rng = random.Random(11)
    keys = [f"tok{rng.randrange(40)}" for _ in range(500)]
    true = {}
    for k in keys:
        true[k] = true.get(k, 0) + 1
    df = spark.createDataFrame([(k,) for k in keys], ["token"])
    sketch = cms_build(df, "token", d=4, w=512)
    est = {r["token"]: r["cms_est"]
           for r in cms_estimate(sketch, df.distinct(), "token",
                                 d=4, w=512).collect()}
    assert set(est) == set(true)
    for k, t in true.items():
        assert est[k] >= t          # CMS one-sided error guarantee
    # with 40 keys in 4x512 cells, at least one row is collision-free
    # per key with overwhelming probability -> min equals truth
    assert est == true


def test_cms_heavy_hitters_threshold_and_exact_column(spark):
    keys = ["hot"] * 90 + ["warm"] * 12 + [f"cold{i}" for i in range(30)]
    df = spark.createDataFrame([(k,) for k in keys], ["token"])
    hh = {r["token"]: (r["cms_est"], r["n_true"])
          for r in cms_heavy_hitters(df, "token", threshold=12,
                                     d=4, w=512).collect()}
    assert hh["hot"] == (90, 90)
    assert hh["warm"] == (12, 12)
    assert all(not t.startswith("cold") for t in hh)


def test_cms_build_validates_shape(spark):
    df = spark.createDataFrame([("x",)], ["token"])
    with pytest.raises(ValueError):
        cms_build(df, "token", d=0, w=512)
    with pytest.raises(ValueError):
        cms_build(df, "token", d=4, w=1)


# ------------------------------------------------------------- BPE

def _py_bpe(words: dict[str, int], n_merges: int):
    """Pure-Python reference BPE (Sennrich et al. algorithm 1)."""
    vocab = {w: [*w, "</w>"] for w in words}
    merges = []
    for rank in range(1, n_merges + 1):
        pairs = {}
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + words[w]
        if not pairs:
            break
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merged = a + b
        merges.append((rank, a, b, merged, cnt))
        for w, syms in vocab.items():
            out = [syms[0]]
            for s in syms[1:]:
                if out[-1] == a and s == b:
                    out[-1] = merged
                else:
                    out.append(s)
            vocab[w] = out
    return merges, vocab


def test_bpe_classic_corpus_matches_reference_algorithm(spark):
    words = {"low": 6, "lower": 2, "newest": 7, "widest": 3, "wide": 1}
    text = " ".join(" ".join([w] * c) for w, c in words.items())
    docs = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    merges, vocab = bpe_train(docs, n_merges=6)
    exp_merges, exp_vocab = _py_bpe(words, 6)
    assert [tuple(r) for r in merges.collect()] == exp_merges
    got_vocab = {r["word"]: list(r["syms"]) for r in vocab.collect()}
    assert got_vocab == exp_vocab


def test_bpe_greedy_fold_nonoverlapping(spark):
    # "aaaa" + pair (a,a): greedy left-to-right -> aa, aa (never aaa)
    docs = spark.createDataFrame([(1, "aaaa aaaa aaaa")],
                                 ["doc_id", "text"])
    merges, vocab = bpe_train(docs, n_merges=1)
    m = merges.collect()
    assert [tuple(r) for r in m] == [(1, "a", "a", "aa", 9)]
    syms = vocab.collect()[0]["syms"]
    assert list(syms) == ["aa", "aa", "</w>"]


def test_bpe_word_vocab_filters_nonalpha(spark):
    docs = spark.createDataFrame([(1, "abc 123 a-b abc")],
                                 ["doc_id", "text"])
    v = {r["word"]: (r["cnt"], list(r["syms"]))
         for r in word_vocab(docs).collect()}
    assert v == {"abc": (2, ["a", "b", "c", "</w>"])}


def test_bpe_validates_n_merges(spark):
    docs = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        bpe_train(docs, n_merges=0)


def test_bpe_distributed_and_driver_paths_are_bit_identical(spark):
    """driver_finish_words=0 forces the fully-distributed rounds; the
    default takes the hybrid driver finish — same merges, same final
    vocab, and both equal the reference algorithm."""
    words = {"low": 6, "lower": 2, "newest": 7, "widest": 3, "wide": 1,
             "west": 4, "best": 4, "lowest": 2}
    text = " ".join(" ".join([w] * c) for w, c in words.items())
    docs = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    m_dist, v_dist = bpe_train(docs, n_merges=8, driver_finish_words=0)
    m_loc, v_loc = bpe_train(docs, n_merges=8)
    exp_merges, exp_vocab = _py_bpe(words, 8)
    assert ([tuple(r) for r in m_dist.collect()]
            == [tuple(r) for r in m_loc.collect()] == exp_merges)
    vd = {r["word"]: list(r["syms"]) for r in v_dist.collect()}
    vl = {r["word"]: list(r["syms"]) for r in v_loc.collect()}
    assert vd == vl == exp_vocab


# ------------------------------------------------------------- funnel

def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s), u, t, 0.0,
          "") for i, (u, t, s) in enumerate(rows)],
        ["event_id", "ts", "user_id", "event_type", "value", "props"])


def test_funnel_strict_ordering(spark):
    rows = [
        # user 1 completes all four in order
        (1, "signup", 0), (1, "view", 10), (1, "click", 20),
        (1, "purchase", 30),
        # user 2: view BEFORE signup doesn't count; no view after
        (2, "view", 0), (2, "signup", 5), (2, "click", 10),
        # user 3: signup only
        (3, "signup", 0),
        # user 4: same-timestamp view is NOT strictly after signup
        (4, "signup", 0), (4, "view", 0),
        # user 5: never signed up
        (5, "view", 1), (5, "click", 2), (5, "purchase", 3),
    ]
    got = {r["step_name"]: r["n_users"]
           for r in funnel_counts(_ev(spark, rows),
                                  ["signup", "view", "click",
                                   "purchase"]).collect()}
    assert got == {"signup": 4, "view": 1, "click": 1, "purchase": 1}


def test_funnel_first_qualifying_event_is_min(spark):
    # two views after signup: funnel records the earlier one, so the
    # click between them still counts (click > first view)
    rows = [(1, "signup", 0), (1, "view", 10), (1, "click", 15),
            (1, "view", 20)]
    got = {r["step_name"]: r["n_users"]
           for r in funnel_counts(_ev(spark, rows),
                                  ["signup", "view", "click"]).collect()}
    assert got == {"signup": 1, "view": 1, "click": 1}


def test_funnel_validates_steps(spark):
    with pytest.raises(ValueError):
        funnel_counts(_ev(spark, []), [])
    with pytest.raises(ValueError):
        funnel_counts(_ev(spark, []), ["view", "view"])


# ------------------------------------------------------- cohort

def test_cohort_retention_hand_computed(spark):
    day = 86400
    rows = [
        (1, "view", 0),            # cohort week 2817 (2024-01-01 epoch wk)
        (1, "view", 8 * day),      # offset 1
        (2, "view", 1 * day),      # same cohort week, offset 0 only
        (3, "view", 7 * day),      # next week cohort
        (3, "view", 21 * day),     # offset 2
    ]
    got = {(r["cohort_week"], r["week_offset"]): r["n_users"]
           for r in cohort_retention(_ev(spark, rows)).collect()}
    base = dt.datetime(2024, 1, 1).timestamp() * 1_000_000
    w0 = int(base // (7 * day * 1_000_000))
    assert got == {(w0, 0): 2, (w0, 1): 1, (w0 + 1, 0): 1, (w0 + 1, 2): 1}


# ------------------------------------------------------- histogram

def test_histogram_fixed_buckets_and_clamp(spark):
    df = spark.createDataFrame(
        [("a", -5.0), ("a", 0.0), ("a", 49.9), ("a", 50.0), ("a", 777.0)],
        ["event_type", "value"])
    got = {(r["event_type"], r["bucket"]): (r["n"], r["v_min"], r["v_max"])
           for r in histogram_fixed(df, "value", "event_type",
                                    width=50.0, n_buckets=10).collect()}
    assert got == {("a", 0): (3, -5.0, 49.9),   # negatives clamp to 0
                   ("a", 1): (1, 50.0, 50.0),
                   ("a", 9): (1, 777.0, 777.0)}  # overflow clamps to 9


def test_histogram_validates_shape(spark):
    df = spark.createDataFrame([("a", 1.0)], ["event_type", "value"])
    with pytest.raises(ValueError):
        histogram_fixed(df, "value", "event_type", width=0, n_buckets=10)


# ------------------------------------------------ exact moment stats

def test_moment_stats_exact_vs_statistics_module(spark):
    import pyspark.sql.functions as F
    rng = random.Random(3)
    rows = [("g", rng.randrange(1, 50), rng.randrange(100, 10000))
            for _ in range(400)]
    df = spark.createDataFrame(rows, ["grp", "x", "y"])
    r = moment_stats_exact(df, F.col("x"), F.col("y"), "grp").collect()[0]
    xs = [x for _, x, _ in rows]
    ys = [y for _, _, y in rows]
    assert r["n"] == 400
    assert r["mean_x"] == pytest.approx(statistics.fmean(xs), abs=1e-6)
    assert r["var_x"] == pytest.approx(statistics.pvariance(xs), abs=1e-4)
    assert r["var_y"] == pytest.approx(statistics.pvariance(ys), abs=1e-2)
    num = statistics.covariance(xs, ys) * (len(xs) - 1) / len(xs)
    corr = num / (math.sqrt(statistics.pvariance(xs))
                  * math.sqrt(statistics.pvariance(ys)))
    assert r["corr_xy"] == pytest.approx(corr, abs=1e-6)


def test_moment_stats_groups_are_independent(spark):
    import pyspark.sql.functions as F
    df = spark.createDataFrame(
        [("a", 1, 2), ("a", 3, 6), ("b", 10, 1), ("b", 10, 1)],
        ["grp", "x", "y"])
    rows = {r["grp"]: r for r in
            moment_stats_exact(df, F.col("x"), F.col("y"), "grp").collect()}
    assert rows["a"]["mean_x"] == 2.0 and rows["a"]["var_x"] == 1.0
    assert rows["a"]["corr_xy"] == 1.0          # perfectly correlated
    assert rows["b"]["var_x"] == 0.0            # degenerate group
    assert rows["b"]["corr_xy"] is None         # corr undefined, not 0/0
