"""Session-35 operators: per-source repeated-line stripping."""

import random

import pytest

from frogocr_spark.operators.textstats import source_line_dedup


def _rows(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, source string, text string")


def test_src_line_dedup_hand_case(spark):
    foot = "(c) siteA"
    rows = [
        # source A: footer recurs in 4 distinct docs -> template;
        # "rare A" appears in only 2 docs -> kept; doc 3 repeats the
        # footer twice WITHIN the doc (both occurrences stripped)
        (1, "A", "body one\n" + foot + "\nrare A"),
        (2, "A", "body two\n\n" + foot),
        (3, "A", foot + "\nbody three\n" + foot + "\nrare A"),
        (4, "A", "body four\n" + foot),
        # source B: same literal footer but only 2 docs -> NOT a
        # template in B (per-source counting)
        (5, "B", "body five\n" + foot),
        (6, "B", "body six\n" + foot),
    ]
    got = {r.doc_id: r for r in
           source_line_dedup(_rows(spark, rows), min_docs=3).collect()}
    assert got[1].kept_text == "body one\nrare A"
    assert (got[1].n_lines, got[1].n_stripped) == (3, 1)
    # empty line survives (only recurring NON-EMPTY lines template)
    assert got[2].kept_text == "body two\n"
    assert got[3].kept_text == "body three\nrare A"
    assert got[3].n_stripped == 2           # both in-doc occurrences
    assert got[5].kept_text == rows[4][2]   # B untouched
    assert got[6].n_stripped == 0


def test_src_line_dedup_trim_matching(spark):
    # template matching is on the TRIMMED line, but kept lines keep
    # their original bytes
    rows = [(i, "A", f"body {i}\n  footer line  " if i % 2
             else f"body {i}\nfooter line") for i in range(1, 7)]
    got = {r.doc_id: r for r in
           source_line_dedup(_rows(spark, rows), min_docs=3).collect()}
    for i in range(1, 7):
        assert got[i].kept_text == f"body {i}"
        assert got[i].n_stripped == 1


def test_src_line_dedup_python_twin(spark):
    rng = random.Random(35)
    pool = [f"line {j}" for j in range(8)]
    rows = []
    for i in range(60):
        src = f"s{i % 3}"
        lines = [f"own {i}"] + rng.sample(pool, rng.randint(0, 4))
        rng.shuffle(lines)
        rows.append((i, src, "\n".join(lines)))
    min_docs = 3
    # twin: per (source, trimmed line) distinct-doc counts
    from collections import defaultdict
    dfd = defaultdict(set)
    for i, src, text in rows:
        for ln in text.split("\n"):
            if ln.strip():
                dfd[(src, ln.strip())].add(i)
    tmpl = {k for k, v in dfd.items() if len(v) >= min_docs}
    expect = {}
    for i, src, text in rows:
        ls = text.split("\n")
        kept = [x for x in ls if (src, x.strip()) not in tmpl]
        expect[i] = (len(ls), len(ls) - len(kept), "\n".join(kept))
    got = {r.doc_id: (r.n_lines, r.n_stripped, r.kept_text)
           for r in source_line_dedup(_rows(spark, rows),
                                      min_docs=min_docs).collect()}
    assert got == expect


def test_src_line_dedup_guard(spark):
    with pytest.raises(ValueError):
        source_line_dedup(_rows(spark, [(1, "A", "x")]), min_docs=1)


def test_src_line_dedup_null_text_kept(spark):
    rows = [(1, "A", None), (2, "A", "x\ny"), (3, "A", "x")]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {r.doc_id: r for r in
           source_line_dedup(df, min_docs=3).collect()}
    assert set(got) == {1, 2, 3}            # null-text doc not dropped
    assert (got[1].n_lines, got[1].n_stripped, got[1].kept_text) \
        == (1, 0, "")
