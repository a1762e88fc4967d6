"""Dedup operators: exact groups, relational Jaccard vs Python, MinHash-LSH
and SimHash recall against exact ground truth."""

import itertools

import pytest

from frogocr_spark.operators import dedup


def _corpus(spark):
    base = "the quick brown fox jumps over the lazy dog near the old barn"
    rows = [
        (0, base),
        (1, base),                                    # exact dup of 0
        (2, base.replace("lazy", "sleepy")),          # near dup
        (3, base + " tonight"),                       # near dup
        (4, "completely different words about spark shuffles and parquet"),
        (5, "another unrelated sentence mentioning catalysts and codegen"),
        (6, base.replace("quick", "swift").replace("dog", "hound")),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string"), rows


def _exact_jaccard(a: str, b: str) -> float:
    sa, sb = set(a.split()), set(b.split())
    return len(sa & sb) / len(sa | sb)


def test_exact_dedup(spark):
    df, _ = _corpus(spark)
    got = dedup.exact_dedup(df, "doc_id", "text").collect()
    assert len(got) == 1 and got[0].keep_id == 0 and got[0].n_dupes == 2


def test_ngram_jaccard_matches_python(spark):
    df, rows = _corpus(spark)
    got = {(r.id_a, r.id_b): r.jaccard
           for r in dedup.ngram_jaccard_pairs(df, "doc_id", "text", 0.5).collect()}
    expect = {}
    for (ia, ta), (ib, tb) in itertools.combinations(rows, 2):
        j = _exact_jaccard(ta, tb)
        if j >= 0.5:
            expect[(ia, ib)] = j
    assert set(got) == set(expect)
    for k, v in expect.items():
        assert got[k] == pytest.approx(v, abs=1e-12)


def test_ngram_jaccard_prefix_filter_differential(spark):
    """The PPJoin prefix-filtered implementation must equal the exhaustive
    all-pairs python answer on a skewed corpus (hot shared stopwords +
    rare tokens) across thresholds — the prefix/length filters may prune
    candidates but never true pairs."""
    import random
    rng = random.Random(42)
    stop = ["the", "of", "and", "a", "to"]          # hot: in nearly every doc
    vocab = [f"w{i}" for i in range(40)]
    rows = []
    for i in range(60):
        n = rng.randint(3, 12)
        toks = rng.sample(vocab, n) + rng.sample(stop, rng.randint(1, 5))
        rng.shuffle(toks)
        rows.append((i, " ".join(toks)))
    # clones + near-clones to guarantee pairs at high thresholds
    rows.append((60, rows[0][1]))
    rows.append((61, rows[1][1] + " extraword"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for t in (0.3, 0.6, 0.8, 0.95):
        got = {(r.id_a, r.id_b): r.jaccard
               for r in dedup.ngram_jaccard_pairs(
                   df, "doc_id", "text", t).collect()}
        expect = {}
        for (ia, ta), (ib, tb) in itertools.combinations(rows, 2):
            j = _exact_jaccard(ta, tb)
            if j >= t:
                expect[(ia, ib)] = j
        assert set(got) == set(expect), f"threshold {t}"
        for k, v in expect.items():
            assert got[k] == pytest.approx(v, abs=1e-12)


def test_minhash_lsh_finds_near_dups(spark):
    df, rows = _corpus(spark)
    got = {(r.id_a, r.id_b)
           for r in dedup.minhash_lsh_pairs(df, "doc_id", "text",
                                            num_hashes=32, bands=8,
                                            threshold=0.5).collect()}
    # the exact duplicate pair must always be found (identical signatures)
    assert (0, 1) in got
    # every reported pair must be genuinely similar (estimator sanity):
    texts = dict(rows)
    for ia, ib in got:
        assert _exact_jaccard(texts[ia], texts[ib]) >= 0.3


def test_minhash_signature_deterministic(spark):
    df, _ = _corpus(spark)
    s1 = dedup.minhash_signatures(df, "doc_id", "text", 8).collect()
    s2 = dedup.minhash_signatures(df, "doc_id", "text", 8).collect()
    assert sorted(map(str, s1)) == sorted(map(str, s2))


def test_simhash_near_pairs(spark):
    df, rows = _corpus(spark)
    sh = {r.doc_id: r.simhash
          for r in dedup.simhash(df, "doc_id", "text").collect()}
    assert sh[0] == sh[1]  # identical text → identical fingerprint
    got = {(r.id_a, r.id_b): r.hamming
           for r in dedup.simhash_near_pairs(df, "doc_id", "text",
                                             max_hamming=3).collect()}
    assert got.get((0, 1)) == 0
    # verify reported hamming against python popcount
    for (ia, ib), h in got.items():
        assert bin(sh[ia] ^ sh[ib]).count("1") == h <= 3


# ---------------------------------------------------------------------------
# word n-grams / char shingles (JVM shingle expr vs its python twin)
# ---------------------------------------------------------------------------

SHINGLE_TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "non\u00a0breaking\u00a0space and\u2003em-space text",
    "  leading  and   trailing spaces  ",
    "\tweird\nwhitespace  mix\t",
    "one",
    "ab",
    "",
    "exact exact exact repeat repeat",
]


@pytest.mark.parametrize("ngram,char_k", [(2, None), (3, None), (None, 4),
                                          (None, 9)])
def test_shingle_expr_matches_python_twin(spark, ngram, char_k):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(list(enumerate(SHINGLE_TEXTS)),
                               "doc_id long, text string")
    got = {r.doc_id: set(r.sh) for r in df.select(
        "doc_id", dedup._shingle_expr("text", ngram or 1, char_k)
        .alias("sh")).collect()}
    for i, t in enumerate(SHINGLE_TEXTS):
        assert got[i] == dedup._shingles_py(t, ngram or 1, char_k), (
            f"doc {i}: {t!r}")


def test_ngram_jaccard_bigrams_matches_python(spark):
    rows = [(i, t) for i, t in enumerate(SHINGLE_TEXTS * 2)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.id_a, r.id_b): r.jaccard
           for r in dedup.ngram_jaccard_pairs(df, "doc_id", "text", 0.4,
                                              ngram=2).collect()}
    expect = {}
    sh = {i: dedup._shingles_py(t, 2) for i, t in rows}
    for ia in sh:
        for ib in sh:
            if ia >= ib or not sh[ia] or not sh[ib]:
                continue
            j = len(sh[ia] & sh[ib]) / len(sh[ia] | sh[ib])
            if j >= 0.4:
                expect[(ia, ib)] = j
    assert set(got) == set(expect)
    for k, v in expect.items():
        assert got[k] == pytest.approx(v, abs=1e-12)


def test_char_shingle_minhash_and_simhash_consistent(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(SHINGLE_TEXTS)],
        "doc_id long, text string")
    s1 = dedup.minhash_signatures(df, "doc_id", "text", 8,
                                  char_shingles=4).collect()
    s2 = dedup.minhash_signatures(df, "doc_id", "text", 8,
                                  char_shingles=4).collect()
    assert sorted(map(str, s1)) == sorted(map(str, s2))
    # char-shingled simhash of identical texts agrees; the pair machinery
    # accepts the shingle params end to end
    pairs = dedup.simhash_near_pairs(df, "doc_id", "text", max_hamming=3,
                                     char_shingles=4).collect()
    sh = {r.doc_id: r.simhash
          for r in dedup.simhash(df, "doc_id", "text",
                                 char_shingles=4).collect()}
    for r in pairs:
        assert bin(sh[r.id_a] ^ sh[r.id_b]).count("1") == r.hamming <= 3


def test_shingle_twins_randomized_differential(spark):
    """Seeded randomized differential over unicode-heavy strings: the
    JVM shingle expression and its python twin must agree on every
    generated document for every mode (one Spark job per mode, not per
    example)."""
    import random

    rng = random.Random(20260817)
    alphabet = list("abcdefg ABC123 .,!?") + [" ", " ", "\t", "\n",
                                              "\u00a0", "\u2003", "\u00e9", "\u00f8", "\u4e2d"]
    docs = ["".join(rng.choice(alphabet)
                    for _ in range(rng.randrange(0, 60)))
            for _ in range(200)]
    df = spark.createDataFrame(list(enumerate(docs)),
                               "doc_id long, text string")
    from pyspark.sql import functions as F
    for ngram, char_k in ((1, None), (2, None), (4, None), (None, 3),
                          (None, 7)):
        got = {r.doc_id: set(r.sh) for r in df.select(
            "doc_id", dedup._shingle_expr("text", ngram or 1, char_k)
            .alias("sh")).collect()}
        for i, t in enumerate(docs):
            want = dedup._shingles_py(t, ngram or 1, char_k)
            assert got[i] == want, (
                f"mode=({ngram},{char_k}) doc {i}: {t!r}\n"
                f"spark={sorted(got[i])!r}\npython={sorted(want)!r}")


def test_xx_and_md5_modes_agree_on_separated_corpus(spark):
    """Pins the production hash mode (xxhash64, no SQL oracle twin) to
    the md5 oracle-verified mode (VERDICT r2 item 5): on a corpus whose
    true Jaccard values are well separated from the 0.5 threshold
    (near-dups ~0.9, cross-pairs ~0.0), BOTH modes must report exactly
    the ground-truth near-dup pair set — the only behavior difference
    between the modes is estimator noise near the cut, which a
    separated corpus excludes.  Both families are deterministic, so
    this is a stable equality, not a flaky probabilistic bound."""
    import random

    rng = random.Random(42)
    rows = []
    truth = set()
    # 20 clusters of 2 docs: variant replaces ONE of 30 tokens
    # (J = 29/31 ≈ 0.94), each cluster on a disjoint vocabulary →
    # cross-cluster J == 0.0.  bands=8 (4 rows/band): per-pair miss
    # probability (1 - J^4)^8 ≈ 8e-6 — and since both hash families
    # are seed-fixed deterministic functions, the outcome is the same
    # on every run (an equality, not a flaky bound).
    for c in range(20):
        vocab = [f"w{c}_{i}" for i in range(31)]
        base = vocab[:30]
        variant = base[:29] + vocab[30:31]
        rng.shuffle(variant)
        rows.append((2 * c, " ".join(base)))
        rows.append((2 * c + 1, " ".join(variant)))
        truth.add((2 * c, 2 * c + 1))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {}
    for mode in ("xxhash64", "md5"):
        got[mode] = {(r.id_a, r.id_b)
                     for r in dedup.minhash_lsh_pairs(
                         df, "doc_id", "text", num_hashes=32, bands=8,
                         threshold=0.5, hash_fn=mode).collect()}
    assert got["xxhash64"] == truth, got["xxhash64"] ^ truth
    assert got["md5"] == truth, got["md5"] ^ truth


def test_xx_and_md5_modes_same_quality_on_generated_corpus(spark):
    """On the sf0.001 documents corpus (dense in borderline pairs, so
    the two hash families legitimately disagree near the est_jaccard
    cut — measured ~12% count difference), both modes must satisfy the
    SAME deterministic quality bounds at the contract-query config
    (num_hashes=32, bands=4, threshold=0.5): every reported pair is
    genuinely similar (true word-set J >= 0.25; measured floor ~0.39
    for both modes), and the candidate volumes stay within 25% of each
    other (estimator noise, not a systematic family difference).  Both
    families are deterministic, so these are stable assertions."""
    df = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
          .limit(240))
    texts = {r.doc_id: r.text for r in df.select("doc_id", "text").collect()}
    counts = {}
    for mode in ("xxhash64", "md5"):
        got = {(min(r.id_a, r.id_b), max(r.id_a, r.id_b))
               for r in dedup.minhash_lsh_pairs(
                   df, "doc_id", "text", num_hashes=32, bands=4,
                   threshold=0.5, hash_fn=mode).collect()}
        assert got, mode
        counts[mode] = len(got)
        floor = min(_exact_jaccard(texts[a], texts[b]) for a, b in got)
        assert floor >= 0.25, (mode, floor)
    ratio = counts["xxhash64"] / counts["md5"]
    assert 0.75 <= ratio <= 1.25, counts


def test_embedding_lsh_hot_bucket_cap(spark):
    """Same hot-bucket mitigation as minhash (see
    test_plans.test_lsh_hot_bucket_cap_linearizes_candidates): 500
    identical vectors land in identical hyperplane buckets in every
    table; with max_bucket the candidate set is linear and every clone
    stays connected to the hub; the sparse background is unaffected."""
    import random

    rng = random.Random(7)
    hot_vec = [1.0, 0.5] * 8
    rows = [(i, hot_vec) for i in range(500)]
    rows += [(10_000 + i, [rng.uniform(-1, 1) for _ in range(16)])
             for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    capped = dedup.embedding_near_dup_pairs(
        df, threshold=0.99, dim=16, use_lsh=True, max_bucket=64).collect()
    assert len(capped) <= 3 * 700, len(capped)
    hub_partners = {r.id_b for r in capped if r.id_a == 0 and r.id_b < 10_000}
    assert len(hub_partners) == 499, len(hub_partners)
    # cosine verification still ran on star pairs
    assert all(abs(r.cosine - 1.0) < 1e-9 for r in capped
               if r.id_a == 0 and r.id_b < 10_000)


def _pairset(rows):
    return {frozenset((r.id_a, r.id_b)) for r in rows}


def test_incremental_lsh_matches_batch_restricted_to_new(spark):
    """incremental(new, base) must equal the full batch pair set
    restricted to pairs touching at least one new doc (orientation
    aside), at identical parameters."""
    from frogocr_spark.operators.dedup import (minhash_lsh_pairs,
                                               minhash_lsh_pairs_incremental)
    texts = {}
    for i in range(40):
        fam = i % 8
        texts[i] = (f"family {fam} shared shingle text body "
                    + " ".join(f"w{fam}_{j}" for j in range(10))
                    + (f" tail{i}" if i % 3 == 0 else ""))
    rows = [(i, t) for i, t in texts.items()]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    new = df.where("doc_id % 5 = 0")
    base = df.where("doc_id % 5 != 0")
    kw = dict(num_hashes=32, bands=4, threshold=0.5, hash_fn="md5")
    batch = minhash_lsh_pairs(df, "doc_id", "text", **kw).collect()
    new_ids = {r.doc_id for r in new.collect()}
    expected = {p for p in _pairset(batch) if p & new_ids}
    inc = minhash_lsh_pairs_incremental(new, base, "doc_id", "text",
                                        **kw).collect()
    assert _pairset(inc) == expected
    # orientation contract: id_a is always a new doc
    assert all(r.id_a in new_ids for r in inc)
    # est values agree pairwise
    batch_est = {frozenset((r.id_a, r.id_b)): r.est_jaccard for r in batch}
    for r in inc:
        assert batch_est[frozenset((r.id_a, r.id_b))] == r.est_jaccard


def test_incremental_lsh_never_pairs_base_with_base(spark):
    """A giant duplicate cluster entirely inside the BASE must produce
    zero candidate work: the batch operator would enumerate B(B-1)/2
    pairs; the incremental one none."""
    from frogocr_spark.operators.dedup import (minhash_lsh_pairs,
                                               minhash_lsh_pairs_incremental)
    base_rows = [(i, "the same duplicated corpus text repeated often")
                 for i in range(50)]
    new_rows = [(1000, "a completely unrelated new document body")]
    base = spark.createDataFrame(base_rows, "doc_id long, text string")
    new = spark.createDataFrame(new_rows, "doc_id long, text string")
    kw = dict(num_hashes=32, bands=4, threshold=0.5, hash_fn="md5")
    batch_n = minhash_lsh_pairs(base.union(new), "doc_id", "text",
                                **kw).count()
    assert batch_n == 50 * 49 // 2
    assert minhash_lsh_pairs_incremental(new, base, "doc_id", "text",
                                         **kw).count() == 0


def test_incremental_lsh_accepts_precomputed_base_signatures(spark):
    """The stored-signature path (base text never read) must produce
    the identical pair set."""
    from frogocr_spark.operators.dedup import (minhash_lsh_pairs_incremental,
                                               minhash_signatures)
    rows = [(i, "shared near dup body text " + ("x" if i % 2 else "y"))
            for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    new = df.where("doc_id >= 10")
    base = df.where("doc_id < 10")
    kw = dict(num_hashes=32, bands=4, threshold=0.5, hash_fn="md5")
    via_text = minhash_lsh_pairs_incremental(new, base, "doc_id", "text",
                                             **kw).collect()
    sigs = minhash_signatures(base, "doc_id", "text", 32, hash_fn="md5")
    via_sigs = minhash_lsh_pairs_incremental(
        new, None, "doc_id", "text", base_signatures=sigs, **kw).collect()
    assert _pairset(via_text) == _pairset(via_sigs)
    assert len(via_text) == len(via_sigs)


def test_lsh_bands_must_divide_num_hashes(spark):
    import pytest
    from frogocr_spark.operators.dedup import (minhash_lsh_pairs,
                                               minhash_lsh_pairs_incremental)
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        minhash_lsh_pairs(df, "doc_id", "text", num_hashes=32, bands=5)
    with pytest.raises(ValueError):
        minhash_lsh_pairs_incremental(df, df, "doc_id", "text",
                                      num_hashes=32, bands=5)


# ------------------------------------------------- weighted jaccard (r4)

def test_weighted_jaccard_sees_multiplicity_sets_cannot(spark):
    """'spam spam spam spam ham' vs 'spam ham': identical token SETS
    (set-Jaccard 1.0) but WJ = (1+1)/(4+1) = 2/5 — the divergence the
    multiset measure exists for."""
    from frogocr_spark.operators.dedup import (ngram_jaccard_pairs,
                                               weighted_jaccard_pairs)
    rows = [(1, "spam spam spam spam ham"), (2, "spam ham")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    setp = ngram_jaccard_pairs(df, "doc_id", "text",
                               threshold=0.99).collect()
    assert [(r.id_a, r.id_b, r.jaccard) for r in setp] == [(1, 2, 1.0)]
    wj = weighted_jaccard_pairs(df, "doc_id", "text",
                                threshold_millis=300).collect()
    assert [(r.id_a, r.id_b, r.inter, r.n_union, r.wjaccard_e6)
            for r in wj] == [(1, 2, 2, 5, 400000)]
    # at 0.8 the pair is correctly rejected
    assert weighted_jaccard_pairs(df, "doc_id", "text",
                                  threshold_millis=800).count() == 0


def test_weighted_jaccard_python_twin_and_df_cap(spark):
    from collections import Counter

    from frogocr_spark.operators.dedup import weighted_jaccard_pairs
    rows = [(1, "a a b b c shared shared"),
            (2, "a b b c c shared shared"),
            (3, "x y z shared"),
            (4, "x y z shared")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.id_a, r.id_b): (r.inter, r.n_union, r.wjaccard_e6)
           for r in weighted_jaccard_pairs(
               df, "doc_id", "text", threshold_millis=500).collect()}
    # python twin (no cap fires: every token df <= 4 <= 64)
    cs = {i: Counter(t.split()) for i, t in rows}
    want = {}
    for a in (1, 2, 3):
        for b in range(a + 1, 5):
            inter = sum((cs[a] & cs[b]).values())
            union = sum((cs[a] | cs[b]).values())
            if inter * 1000 >= 500 * union:
                want[(a, b)] = (inter, union,
                                inter * 1000000 // union)
    assert got == want and (3, 4) in got
    # df-cap: cap 3 drops 'shared' (df 4) — pair (3,4) loses it from
    # BOTH numerator and denominator: x,y,z remain -> WJ still 1.0;
    # pair (1,2) loses its 2+2 shared mass
    capped = {(r.id_a, r.id_b): (r.inter, r.n_union)
              for r in weighted_jaccard_pairs(
                  df, "doc_id", "text", threshold_millis=500,
                  max_df=3).collect()}
    assert capped[(3, 4)] == (3, 3)
    assert capped[(1, 2)][0] == got[(1, 2)][0] - 2


def test_weighted_jaccard_guards(spark):
    from frogocr_spark.operators.dedup import weighted_jaccard_pairs
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        weighted_jaccard_pairs(df, "doc_id", "text", max_df=1)
    with pytest.raises(ValueError):
        weighted_jaccard_pairs(df, "doc_id", "text",
                               threshold_millis=0)

def test_weighted_jaccard_mass_ratio_prefilter(spark):
    """VERDICT r4 #3: on a skewed-length corpus the mass-ratio
    prefilter (t·max ≤ min, integer cross-multiplication) must cut the
    token-level candidate volume BEFORE the pair aggregation while
    leaving the final pair set bit-identical."""
    from frogocr_spark.operators import dedup as D
    # 8 short docs sharing rare-ish tokens with 4 very long docs: every
    # short×long pair dies on the length filter (mass ratio ≪ 0.8) but
    # still meets in the token join without it
    rows = []
    for i in range(8):
        rows.append((i, f"alpha beta gamma delta tok{i % 2}"))
    for i in range(4):
        body = " ".join(f"w{i}x{j}" for j in range(120))
        rows.append((100 + i, f"alpha beta gamma delta {body}"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    t = 800

    def build(prefilter):
        counts = (D._tokens(df, "doc_id", "text", dedup_tokens=False)
                  .groupBy("doc_id", "token")
                  .agg(D.F.count(D.F.lit(1)).alias("cnt")))
        fdf = counts.groupBy("token").agg(
            D.F.count(D.F.lit(1)).alias("_df"))
        kept = counts.join(fdf.where(D.F.col("_df") <= 64), "token")
        mass = kept.groupBy("doc_id").agg(
            D.F.sum("cnt").alias("mass"))
        return D._wj_token_pairs(kept, mass, "doc_id", t, prefilter)

    n_with, n_without = build(True).count(), build(False).count()
    assert n_with < n_without, (n_with, n_without)
    # every surviving candidate row satisfies the ratio; the short×long
    # wedge (4 shared tokens × 8×4 pairs = 128 rows) is gone
    assert n_without - n_with >= 128
    got = {(r.id_a, r.id_b, r.inter, r.n_union, r.wjaccard_e6)
           for r in D.weighted_jaccard_pairs(
               df, "doc_id", "text", threshold_millis=t).collect()}
    want = {(r.id_a, r.id_b, r.inter, r.n_union, r.wjaccard_e6)
            for r in D.weighted_jaccard_pairs(
                df, "doc_id", "text", threshold_millis=t,
                length_prefilter=False).collect()}
    assert got == want and len(got) > 0
