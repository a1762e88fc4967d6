"""Session-18 operators: char-trigram language ID (profiles +
CJK script rule), exact Gini, Kendall tau-a, Cohen's kappa, and
per-batch gram novelty — hand-computed cases and adversarial edges
(the contract queries carry the DuckDB hash checks)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from frogocr_spark.operators.analytics import (cohen_kappa, gini_exact,
                                               kendall_tau_a)
from frogocr_spark.operators.textstats import (LANG_TRIGRAM_PROFILES,
                                               langid_ngram,
                                               novelty_rate)


def test_langid_profiles_disjoint():
    all_grams = [g for gs in LANG_TRIGRAM_PROFILES.values() for g in gs]
    assert len(all_grams) == len(set(all_grams))
    assert all(len(g) == 3 for g in all_grams)


def test_langid_multilingual_fixtures(spark):
    rows = [
        (1, "The quick brown fox jumps over the lazy dog and runs "
            "into the forest"),
        (2, "Der schnelle braune Fuchs springt über den faulen Hund "
            "und läuft in den Wald"),
        (3, "Le renard brun rapide saute par dessus le chien "
            "paresseux et court dans la forêt"),
        (4, "El rápido zorro marrón salta sobre el perro perezoso "
            "y corre hacia el bosque"),
        (5, "敏捷的棕色狐狸跳过了懒狗"),
        (6, "zzz qqq xxx"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.pred_lang, r.score)
           for r in langid_ngram(df).collect()}
    assert got[1][0] == "en" and got[1][1] > 0
    assert got[2][0] == "de"
    assert got[3][0] == "fr"
    assert got[4][0] == "es"
    assert got[5] == ("zh", 12)      # all 12 chars are CJK
    assert got[6] == ("und", 0)


def test_langid_tiebreak_and_padding(spark):
    # "the" gives en exactly the grams " th","the","he " (padding makes
    # the word-initial/final shapes real); "der" gives de exactly "der".
    # A text with equal scores resolves lang ASC — 'de' < 'en'.
    df = spark.createDataFrame(
        [(1, "the"), (2, "der der der")], "doc_id long, text string")
    got = {r.doc_id: (r.pred_lang, r.score)
           for r in langid_ngram(df).collect()}
    assert got[1] == ("en", 3)       # " th","the","he " all hit
    assert got[2] == ("de", 3)
    tie = spark.createDataFrame(
        # en: " th","the","he " = 3; de: "der" x3 = 3 -> tie -> de
        [(1, "the der der der")], "doc_id long, text string")
    [r] = langid_ngram(tie).collect()
    assert (r.pred_lang, r.score) == ("de", 3)


def test_langid_cjk_threshold(spark):
    # 1 CJK char in 20 chars = 5% < 10% threshold -> not zh
    df = spark.createDataFrame(
        [(1, "a" * 19 + "一"), (2, "一二" + "a" * 8)],
        "doc_id long, text string")
    got = {r.doc_id: r.pred_lang for r in langid_ngram(df).collect()}
    assert got[1] == "und"
    assert got[2] == "zh"            # 2 of 10 chars = 20%


def test_gini_exact_hand_cases(spark):
    eq = spark.createDataFrame([("a", 5), ("b", 5), ("c", 5), ("d", 5)],
                               "k string, v long")
    [r] = gini_exact(eq, "k", "v").collect()
    assert (r.n_items, r.total, r.gini_e6) == (4, 20, 0)
    conc = spark.createDataFrame([("a", 0), ("b", 0), ("c", 0),
                                  ("d", 10)], "k string, v long")
    [r] = gini_exact(conc, "k", "v").collect()
    # G = (2*40 - 5*10) / (4*10) = 0.75
    assert r.gini_e6 == 750_000
    zero = spark.createDataFrame([("a", 0), ("b", 0)], "k string, v long")
    [r] = gini_exact(zero, "k", "v").collect()
    assert r.gini_e6 is None and r.n_items == 2


def test_kendall_tau_hand_cases(spark):
    up = spark.createDataFrame([(1, 10), (2, 20), (3, 30)],
                               "x long, y long")
    [r] = kendall_tau_a(up).collect()
    assert (r.n_points, r.n_pairs, r.concordant, r.discordant,
            r.tau_e6) == (3, 3, 3, 0, 1_000_000)
    down = spark.createDataFrame([(1, 30), (2, 20), (3, 10)],
                                 "x long, y long")
    [r] = kendall_tau_a(down).collect()
    assert r.tau_e6 == -1_000_000
    # one concordant, one tie, one discordant over x=1..3:
    # pairs (1,2): 20>10 conc; (1,3): 10=10 tie; (2,3): 10<20 disc
    mix = spark.createDataFrame([(1, 10), (2, 20), (3, 10)],
                                "x long, y long")
    [r] = kendall_tau_a(mix).collect()
    assert (r.concordant, r.discordant, r.tau_e6) == (1, 1, 0)
    single = spark.createDataFrame([(1, 10)], "x long, y long")
    [r] = kendall_tau_a(single).collect()
    assert r.tau_e6 is None and r.n_pairs == 0


def test_cohen_kappa_textbook_case(spark):
    # 2x2: 20 yes/yes, 5 yes/no, 10 no/yes, 15 no/no
    rows = ([("yes", "yes")] * 20 + [("yes", "no")] * 5
            + [("no", "yes")] * 10 + [("no", "no")] * 15)
    df = spark.createDataFrame(rows, "a string, b string")
    [r] = cohen_kappa(df, "a", "b").collect()
    assert (r.n, r.agree) == (50, 35)
    assert r.po_e6 == 700_000        # 35/50
    assert r.pe_e6 == 500_000        # (25*30 + 25*20)/2500
    assert r.kappa_e6 == 400_000     # (0.7-0.5)/(1-0.5)


def test_cohen_kappa_degenerate_constant_raters(spark):
    # both raters constant and equal: pe = 1 -> kappa NULL, po = 1
    df = spark.createDataFrame([("x", "x")] * 4, "a string, b string")
    [r] = cohen_kappa(df, "a", "b").collect()
    assert r.po_e6 == 1_000_000 and r.kappa_e6 is None


def test_cohen_kappa_disjoint_label_sets(spark):
    # raters never use the same label: pe = 0, kappa == po == 0
    df = spark.createDataFrame([("x", "y")] * 3, "a string, b string")
    [r] = cohen_kappa(df, "a", "b").collect()
    assert (r.agree, r.pe_e6, r.kappa_e6) == (0, 0, 0)


def test_novelty_rate_hand_case(spark):
    base = "a b c d e f g h"            # exactly one 8-gram
    rows = [(0, base),                    # batch 0: 1 gram, new
            (1, base),                    # batch 1: same gram, old
            (2, "x b c d e f g h i")]     # batch 1: two new grams
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df = df.withColumn("batch", F.expr("(doc_id + 1) DIV 2"))
    got = {r.batch: (r.n_grams, r.n_new, r.novelty_e6)
           for r in novelty_rate(df, "batch").collect()}
    assert got[0] == (1, 1, 1_000_000)
    assert got[1] == (3, 2, 666_666)


def test_novelty_rate_short_docs_absent(spark):
    # documents shorter than the gram window contribute nothing; a
    # batch with only short docs is absent from the output
    df = spark.createDataFrame(
        [(0, "a b c d e f g h"), (1, "too short")],
        "doc_id long, text string").withColumn(
        "batch", F.col("doc_id"))
    got = novelty_rate(df, "batch").collect()
    assert [r.batch for r in got] == [0]
