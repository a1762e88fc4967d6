"""Session-9 operators: exact-decimal OLS regression and the
point-in-time (SCD2 validity) lookup join.

Hand-computed small cases + boundary semantics; the DuckDB contract
twins (ols_regression / pit_join, plus the six adapted TPC-H shapes
q8/q14/q15/q16/q20/q21) carry the at-scale value verification.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from frogocr_spark.operators.analytics import (ols_fit, pit_lookup,
                                               scd2_history)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _xy(spark, rows):
    """rows: (group, x, y) integer points."""
    return spark.createDataFrame(rows, "g string, x long, y long")


# ----------------------------------------------------------------- ols

def test_ols_exact_line_slope_intercept_r2(spark):
    # y = 3x + 2 exactly -> slope 3, intercept 2, r2 = 1
    pts = [("a", x, 3 * x + 2) for x in (0, 1, 2, 5, 10)]
    out = ols_fit(_xy(spark, pts), F.col("x"), F.col("y"), "g").collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n, r.slope, r.intercept, r.r2) == (5, 3.0, 2.0, 1.0)


def test_ols_hand_computed_noisy(spark):
    # points (0,0),(1,2),(2,2): n=3 sx=3 sy=4 sxx=5 sxy=6
    # num = 3*6-3*4 = 6; den_x = 3*5-9 = 6 -> slope 1
    # intercept = 4/3 - 1*1 = 1/3; den_y = 3*8-16 = 8
    # r2 = (6/6)*(6/8) = 0.75
    pts = [("a", 0, 0), ("a", 1, 2), ("a", 2, 2)]
    r = ols_fit(_xy(spark, pts), F.col("x"), F.col("y"), "g").collect()[0]
    assert (r.slope, r.r2) == (1.0, 0.75)
    assert r.intercept == pytest.approx(1 / 3, abs=5e-7)


def test_ols_degenerate_groups_null(spark):
    # constant x -> slope/intercept/r2 NULL; constant y -> r2 NULL
    # (num = n*sxy - sx*sy = 0 when y const, so slope = 0)
    pts = [("cx", 4, 1), ("cx", 4, 9),
           ("cy", 1, 7), ("cy", 2, 7), ("cy", 3, 7)]
    got = {r.g: r for r in
           ols_fit(_xy(spark, pts), F.col("x"), F.col("y"), "g")
           .collect()}
    assert got["cx"].slope is None and got["cx"].intercept is None \
        and got["cx"].r2 is None
    assert got["cy"].slope == 0.0 and got["cy"].intercept == 7.0 \
        and got["cy"].r2 is None


# ----------------------------------------------------------------- pit

def _events(spark, rows):
    """rows: (event_id, user_id, event_type, seconds_offset)."""
    return spark.createDataFrame(
        [(eid, T0 + dt.timedelta(seconds=s), uid, et)
         for (eid, uid, et, s) in rows],
        "event_id long, ts timestamp, user_id long, event_type string")


def test_pit_lookup_matches_exactly_one_version(spark):
    # user 1 history: browse@0 (v1), purchase@100 (v2), browse@200 (v3)
    ev = _events(spark, [(1, 1, "browse", 0), (2, 1, "purchase", 100),
                         (3, 1, "browse", 200)])
    dim = scd2_history(ev, "user_id", "event_type")
    us0 = int(T0.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
    probes = spark.createDataFrame(
        [(10, 1, us0 + 50_000_000),       # mid v1
         (11, 1, us0 + 100_000_000),      # AT v2's valid_from -> v2
         (12, 1, us0 + 10**12),           # far future -> open v3
         (13, 1, us0 - 1),                # before first version -> drop
         (14, 2, us0 + 50_000_000)],      # unknown key -> drop
        "event_id long, user_id long, us long")
    got = {r.event_id: (r.version, r.attr)
           for r in pit_lookup(probes, dim, "user_id", F.col("us"),
                               "event_id").collect()}
    assert got == {10: (1, "browse"), 11: (2, "purchase"),
                   12: (3, "browse")}


def test_pit_lookup_no_fanout_on_real_history(spark):
    # SCD2 intervals tile the timeline: every probe at/after the key's
    # first event matches exactly once
    ev = _events(spark, [(i, i % 3, t, 10 * i)
                         for i, t in enumerate(
                             ["a", "b", "a", "a", "c", "b", "c", "a",
                              "b", "c", "a", "b"])])
    dim = scd2_history(ev, "user_id", "event_type")
    probe = ev.select("event_id", "user_id",
                      F.unix_micros(F.col("ts")).alias("us"))
    out = pit_lookup(probe, dim, "user_id", F.col("us"), "event_id")
    assert out.count() == ev.count()
    assert out.select("event_id").distinct().count() == ev.count()


# --------------------------------------------------- surface semantics

def test_hopping_window_slots_match_integer_arithmetic(spark):
    # F.window(2h, 1h) must place each event in exactly the two
    # epoch-aligned hour slots the oracle computes by integer DIV
    HOUR = 3_600_000_000
    uss = [0, 1, HOUR - 1, HOUR, 5 * HOUR + 123_456]
    df = spark.createDataFrame([(u,) for u in uss], "us long")
    out = (df.select(F.timestamp_micros(F.col("us")).alias("ts"), "us")
           .select(F.window("ts", "2 hours", "1 hour").alias("w"), "us")
           .select("us", F.unix_micros(F.col("w.start")).alias("s"),
                   F.unix_micros(F.col("w.end")).alias("e"))
           .collect())
    got = {}
    for r in out:
        got.setdefault(r.us, set()).add((r.s, r.e))
        assert r.e - r.s == 2 * HOUR
    for u in uss:
        s1 = (u // HOUR) * HOUR
        assert got[u] == {(s1 - HOUR, s1 + HOUR), (s1, s1 + 2 * HOUR)}


def test_regexp_count_nonoverlapping_matches_python_re(spark):
    # the pattern class used by pattern_match: plain chars + greedy
    # star — Java regexp_count and Python re.findall agree
    import re
    seqs = ["vp", "vpvp", "vcvcp", "vvpp", "pv", "", "vcvcvpvp",
            "vpvcp", "ppp", "vvv"]
    df = spark.createDataFrame([(s,) for s in seqs], "seq string")
    for pat in ("vp", "v[vc]*p"):
        got = {r.seq: r.n for r in df.select(
            "seq", F.regexp_count("seq", F.lit(pat)).alias("n"))
            .collect()}
        for s in seqs:
            assert got[s] == len(re.findall(pat, s)), (pat, s)
