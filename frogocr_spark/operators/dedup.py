"""Deduplication operators for training-data pipelines.

Four strategies, all shuffle-disciplined for 100 TB operation:

- exact         hash-groupBy on a content digest (one shuffle on the digest)
- ngram_jaccard exact n-gram/word-set Jaccard on candidate pairs
                (fully relational: explode → equi-join → count — no UDF)
- minhash_lsh   MinHash signatures + banded LSH: near-dup candidates meet
                only inside tiny hash buckets (shuffle keyed on band hash,
                never all-pairs)
- simhash       64-bit SimHash fingerprint + Hamming-band grouping

MinHash uses ``F.xxhash64(token, seed_i)`` per permutation — JVM-side,
codegen'd, no Python.  The blessing/curse of approximation is tested
against exact Jaccard in tests/test_dedup.py.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..core.cachectl import register_cache

TOKEN_SPLIT = r"\s+"


def _shingle_expr(text_col: str, ngram: int = 1,
                  char_shingles: int | None = None):
    """Column of this row's shingles (JVM-side, codegen'd):

    - ``char_shingles=k`` → all ``k``-char substrings of the
      space-trimmed text (classic character shingling);
    - ``ngram=n`` → word ``n``-grams over the whitespace split, joined
      with single spaces (``ngram=1`` = the word-set base case).

    Documents shorter than the window yield an empty array.  The exact
    python twin these definitions are differential-tested against lives
    in tests/test_dedup.py."""
    if char_shingles is not None:
        k = int(char_shingles)
        t = F.trim(F.col(text_col))
        n = F.length(t)
        return F.when(n >= k,
                      F.transform(F.sequence(F.lit(1), n - k + 1),
                                  lambda i: F.substring(t, i, F.lit(k)))
                      ).otherwise(F.array().cast("array<string>"))
    words = F.filter(F.split(F.trim(F.col(text_col)), TOKEN_SPLIT),
                     lambda w: w != "")
    if ngram == 1:
        return words
    n = F.size(words)
    return F.when(n >= ngram,
                  F.transform(F.sequence(F.lit(1), n - ngram + 1),
                              lambda i: F.concat_ws(
                                  " ", F.slice(words, i, ngram)))
                  ).otherwise(F.array().cast("array<string>"))


def _tokens(df: DataFrame, id_col: str, text_col: str,
            dedup_tokens: bool = True, ngram: int = 1,
            char_shingles: int | None = None) -> DataFrame:
    """(id, token) pairs — the shared shingle relation (see
    :func:`_shingle_expr` for the token definitions).

    ``dedup_tokens=False`` skips the (id, token) dropDuplicates — a full
    corpus-sized shuffle — for consumers whose downstream aggregate is
    idempotent over repeated tokens (minhash: ``min`` of a multiset ==
    ``min`` of its set).  Jaccard needs the distinct set (intersection
    COUNTS tokens) and keeps the default."""
    toks = (df.select(id_col,
                      F.explode(_shingle_expr(text_col, ngram,
                                              char_shingles)).alias("token"))
            .where("token <> ''"))
    return toks.dropDuplicates([id_col, "token"]) if dedup_tokens else toks


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact duplicate groups: md5 digest → groupBy → keep min id.
    Output: (digest, keep_id, n_dupes) for groups with more than one row."""
    return (df.withColumn("digest", F.md5(F.col(text_col)))
            .groupBy("digest")
            .agg(F.min(id_col).alias("keep_id"),
                 F.count(F.lit(1)).alias("n_dupes"))
            .where("n_dupes > 1"))


def ngram_jaccard_pairs(df: DataFrame, id_col: str, text_col: str,
                        threshold: float = 0.6, ngram: int = 1,
                        char_shingles: int | None = None,
                        lazy: bool = False) -> DataFrame:
    """EXACT word-set Jaccard ≥ threshold with PPJoin-style prefix
    filtering so candidate generation is bounded by rare-token document
    frequency, not quadratic in hot-token DF.

    Under a global token order (document frequency ascending, token as
    tiebreak — rarest first), each doc keeps only its first
    ``p = |A| - ceil(t*|A|) + 1`` tokens as its *prefix*.  Theorem
    (prefix filter, Chaudhuri et al. SSJoin / Xiao et al. PPJoin): if
    J(A,B) ≥ t then the globally-smallest common token lies in BOTH
    prefixes — proof: if it sat outside prefix(A), every common token
    would be in A's suffix of size ceil(t|A|)-1 < t|A| ≤ |A∩B|,
    a contradiction.  So a prefix-on-prefix equi-join loses no true
    pair, and the join fanout per token is the DF *within prefixes*: a
    stopword shared by 10^6 docs sorts LAST in the global order and
    almost never lands in a prefix, killing the hot-token blowup the
    naive token self-join suffers.  A symmetric length filter
    (t·|A| ≤ |B| ∧ t·|B| ≤ |A|, necessary for J ≥ t) prunes inside the
    join.  Candidates are then verified EXACTLY: one ``array_intersect``
    against the per-doc sorted token arrays (JVM-side) — so the output
    is identical to the naive formulation (differential-tested in
    tests/test_dedup.py) while the plan survives skewed corpora.

    The token dictionary is INTERNED into dense integer ids — the id IS
    the rank under the (t_df asc, token) PPJoin order, assigned by
    :func:`frogocr_spark.operators.ranking.global_rank` (range-partition
    + per-partition row_number + broadcast offsets; no single-partition
    window).  One mapping serves both needs: sorted int array == global
    prefix order, and the exact ``array_intersect`` verification runs on
    longs instead of strings (measured 2.3× end-to-end at sf0.1 where
    ~3M true pairs × ~300-token arrays dominate).

    Shuffles: token-DF groupBy (map-side combined), the dictionary rank
    exchange (dictionary-sized, not corpus-sized), the tok↔dictionary
    join (token-keyed), ONE id-keyed groupBy building the
    globally-ordered per-doc id array (prefix = an ``F.slice`` of it),
    the prefix self-join (keyed on the int token id), and two id-keyed
    joins attaching id arrays to the (small) candidate set.

    NOTE: eager at plan-construction by default — the ``global_rank``
    interning step runs Spark jobs when THIS function is called (see
    its docstring), not at the downstream action.  ``lazy=True``
    (VERDICT r3 #6) swaps in :func:`~frogocr_spark.operators.ranking.
    global_rank_lazy` for the interning and cache() for the per-doc
    array relation: NO Spark job runs until the caller's action, so
    the operator composes into larger lazy plans — at the price that
    the shared subtrees are pinned only advisorily (under memory
    pressure the tokenize+rank subtree can recompute; results are
    identical on deterministic input).  Lifecycle (VERDICT r4 #2):
    wrap construction + the consuming action in
    :func:`frogocr_spark.core.cachectl.cache_scope` and the pinned
    subtrees (the rank relation and ``per_doc``) are unpersisted at
    scope exit; without a scope they stay pinned until session end."""
    from .ranking import global_rank, global_rank_lazy

    eps = 1e-9
    toks = _tokens(df, id_col, text_col, ngram=ngram,
                   char_shingles=char_shingles)
    dfreq = toks.groupBy("token").agg(F.count(F.lit(1)).alias("t_df"))
    rank_fn = global_rank_lazy if lazy else global_rank
    ranked = rank_fn(dfreq, ["t_df", "token"], rank_col="tid")
    # localCheckpoint: per_doc feeds three consumers (prefix explode +
    # both verify-join sides); left lazy, the tokenize+rank-join+groupBy
    # subtree would run 3× (measured 2× end-to-end cost at sf0.1).
    # Checkpoint blocks self-release when the result frame is dropped.
    # (lazy mode: cache() — same sharing, advisory, no job.)
    per_doc = (toks.join(ranked.select("token", "tid"), "token")
               .groupBy(id_col)
               .agg(F.count(F.lit(1)).alias("sz"),
                    F.sort_array(F.collect_list("tid")).alias("tok_arr")))
    per_doc = (register_cache(per_doc) if lazy
               else per_doc.localCheckpoint())
    plen = (F.col("sz")
            - F.ceil(F.lit(threshold) * F.col("sz") - eps) + 1).cast("int")
    prefix = (per_doc
              .select(id_col, "sz",
                      F.explode(F.slice("tok_arr", F.lit(1), plen))
                      .alias("token")))
    a = prefix.select(F.col(id_col).alias("id_a"), "token",
                      F.col("sz").alias("sz_a"))
    b = prefix.select(F.col(id_col).alias("id_b"), "token",
                      F.col("sz").alias("sz_b"))
    # NOTE: PPJoin's positional overlap-bound filter (carry posexplode
    # positions, prune pairs with 1 + min(|A|-i-1, |B|-j-1) below the
    # I >= t(|A|+|B|)/(1+t) requirement) was implemented and MEASURED
    # OUT: on the synthetic corpus it prunes only 5.8% of candidates
    # (6.47M -> 6.10M at sf0.1, t=0.8 — most candidates are true
    # near-dups) while replacing this dropDuplicates with a wider
    # groupBy/max aggregation, a net slowdown.  Re-add it for corpora
    # where candidate precision is low.
    cand = (a.join(b, "token")
            .where((F.col("id_a") < F.col("id_b"))
                   & (F.col("sz_b") >= F.lit(threshold) * F.col("sz_a") - eps)
                   & (F.col("sz_a") >= F.lit(threshold) * F.col("sz_b") - eps))
            .select("id_a", "id_b")
            .dropDuplicates(["id_a", "id_b"]))
    ta = per_doc.select(F.col(id_col).alias("id_a"),
                        F.col("tok_arr").alias("arr_a"),
                        F.col("sz").alias("sz_a"))
    tb = per_doc.select(F.col(id_col).alias("id_b"),
                        F.col("tok_arr").alias("arr_b"),
                        F.col("sz").alias("sz_b"))
    return (cand.join(ta, "id_a").join(tb, "id_b")
            .withColumn("n_inter",
                        F.size(F.array_intersect("arr_a", "arr_b")))
            .withColumn("jaccard",
                        F.col("n_inter")
                        / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")))
            .where(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard"))


def _wj_token_pairs(kept: DataFrame, mass: DataFrame, id_col: str,
                    threshold_millis: int,
                    length_prefilter: bool) -> DataFrame:
    """Token-level candidate relation of :func:`weighted_jaccard_pairs`
    — one row per (common token, ordered doc pair), pre-aggregation.
    Split out so the mass-ratio prefilter's candidate reduction is
    directly testable (tests/test_dedup.py)."""
    ma = mass.select(F.col(id_col).alias("id_a"),
                     F.col("mass").alias("mass_a"))
    mb = mass.select(F.col(id_col).alias("id_b"),
                     F.col("mass").alias("mass_b"))
    a = (kept.select(F.col(id_col).alias("id_a"), "token",
                     F.col("cnt").alias("cnt_a"))
         .join(ma, "id_a"))
    b = (kept.select(F.col(id_col).alias("id_b"), "token",
                     F.col("cnt").alias("cnt_b"))
         .join(mb, "id_b"))
    cand = a.join(b, "token").where(F.col("id_a") < F.col("id_b"))
    if length_prefilter:
        # WJ ≥ t ⟹ inter ≤ min(S_A,S_B) and union ≥ max(S_A,S_B)
        # ⟹ t·max ≤ min — the PPJoin length-filter analog for
        # multisets, applied BEFORE the per-token min-sum aggregation
        # so wildly length-mismatched pairs never reach the shuffle.
        # Integer cross-multiplication: no float touches the cut.
        cand = cand.where(
            F.least("mass_a", "mass_b") * 1000
            >= F.lit(int(threshold_millis))
            * F.greatest("mass_a", "mass_b"))
    return cand


def weighted_jaccard_pairs(df: DataFrame, id_col: str, text_col: str,
                           threshold_millis: int = 800, ngram: int = 1,
                           max_df: int = 64,
                           length_prefilter: bool = True) -> DataFrame:
    """MULTISET (weighted) Jaccard near-dup pairs:
    ``WJ(A,B) = Σ_t min(cnt_A(t), cnt_B(t)) / Σ_t max(cnt_A(t),
    cnt_B(t))`` — the multiplicity-aware companion of the set-based
    :func:`ngram_jaccard_pairs`, which by construction cannot see that
    "spam spam spam spam ham" and "spam ham" differ (identical token
    SETS).  Boilerplate-heavy and template-expanded training text is
    exactly where multiplicity matters, so every serious dedup stack
    carries both measures.

    Exactness and the cut: per-token counts are exact int64; the
    identity ``Σ max = S_A + S_B − Σ min`` (max+min = a+b per token,
    including zero sides) turns the denominator into masses already
    aggregated per doc, and the threshold test is one integer
    cross-multiplication — ``inter·1000 ≥ threshold_millis·(S_A + S_B
    − inter)`` — no float touches the cut; the reported
    ``wjaccard_e6`` is the exact integer ``inter·10^6 DIV union``.

    Scale shape (the containment_pairs df-cap pattern): tokens seen in
    more than ``max_df`` documents are dropped BEFORE the candidate
    join (non-discriminative boilerplate fans out quadratically — the
    set-similarity-join df-cap; the measure is then DEFINED over the
    capped token space, with per-doc masses taken AFTER the cap so
    numerator and denominator shrink consistently).  Stages: one
    (doc, token)-keyed count (map-side combined) → token-DF filter →
    per-doc mass join → token-keyed self-join with the MASS-RATIO
    prefilter (VERDICT r4 #3: ``WJ ≥ t ⟹ t·max(S_A,S_B) ≤
    min(S_A,S_B)``, the PPJoin length filter's multiset analog —
    length-mismatched candidate pairs die BEFORE the per-token min-sum
    shuffle; ``length_prefilter=False`` disables it for measurement) →
    ONE pair-keyed sum carrying the masses through (no post-agg mass
    joins).  Nothing is all-pairs; per-token fanout ≤ max_df².
    Output: ordered pairs (id_a < id_b) with
    ``(id_a, id_b, inter, n_union, wjaccard_e6)``."""
    if max_df < 2:
        raise ValueError(f"max_df must be >= 2, got {max_df}")
    if not 0 < threshold_millis <= 1000:
        raise ValueError(f"threshold_millis must be in (0, 1000], "
                         f"got {threshold_millis}")
    counts = (_tokens(df, id_col, text_col, dedup_tokens=False,
                      ngram=ngram)
              .groupBy(id_col, "token")
              .agg(F.count(F.lit(1)).alias("cnt")))
    fdf = counts.groupBy("token").agg(F.count(F.lit(1)).alias("_df"))
    kept = counts.join(fdf.where(F.col("_df") <= max_df), "token")
    mass = kept.groupBy(id_col).agg(F.sum("cnt").alias("mass"))
    cand = _wj_token_pairs(kept, mass, id_col, threshold_millis,
                           length_prefilter)
    # masses ride through the pair-keyed agg (functionally dependent on
    # the group key; min() for engine-portable determinism) — replaces
    # the former two post-aggregation mass joins
    inter = (cand.groupBy("id_a", "id_b")
             .agg(F.sum(F.least("cnt_a", "cnt_b")).alias("inter"),
                  F.min("mass_a").alias("mass_a"),
                  F.min("mass_b").alias("mass_b")))
    return (inter
            .withColumn("n_union",
                        (F.col("mass_a") + F.col("mass_b")
                         - F.col("inter")).cast("long"))
            .where(F.col("inter") * 1000
                   >= F.lit(int(threshold_millis)) * F.col("n_union"))
            .select("id_a", "id_b",
                    F.col("inter").cast("long").alias("inter"),
                    "n_union",
                    F.expr("(inter * 1000000) DIV n_union")
                    .cast("long").alias("wjaccard_e6")))


MERSENNE31 = 2147483647  # modulus for the universal-hash minhash family


def _minhash_coef(kind: str, i: int) -> int:
    """Deterministic 28-bit universal-hash coefficient from md5 —
    recomputable in SQL as ``('0x'||substr(md5('a:'||i),1,7))::BIGINT``
    (multipliers forced odd with ``| 1``)."""
    v = int(hashlib.md5(f"{kind}:{i}".encode()).hexdigest()[:7], 16)
    return (v | 1) if kind == "a" else v


def minhash_signatures(df: DataFrame, id_col: str, text_col: str,
                       num_hashes: int = 32,
                       hash_fn: str = "xxhash64", ngram: int = 1,
                       char_shingles: int | None = None) -> DataFrame:
    """(id, sig array<long>): per-permutation min of h_i(token).

    ``hash_fn="xxhash64"`` (default) uses ``xxhash64(token, seed_i)`` —
    the fast production path.  ``hash_fn="md5"`` is the cross-engine-
    verifiable mode: ONE md5 per token → 61-bit int → ``num_hashes``
    linear mixes ``(a_i·x + b_i) mod (2^31-1)`` — the standard
    universal-hashing minhash family (one hash + cheap per-permutation
    mixes, not ``num_hashes`` full hashes), with every step exact
    integer arithmetic below 2^59 so ANY SQL engine reproduces the
    signatures bit-for-bit (DuckDB:
    ``('0x'||substr(md5(token),1,15))::BIGINT`` plus the same literal
    coefficients recomputed from md5).  This is what lets the driver's
    oracle verify the LSH path end to end."""
    toks = _tokens(_spread_small_input(df), id_col, text_col,
                   dedup_tokens=False, ngram=ngram,
                   char_shingles=char_shingles)
    if hash_fn == "md5":
        base = (F.conv(F.substring(F.md5(F.col("token")), 1, 15), 16, 10)
                .cast("long") % MERSENNE31)
        toks = toks.withColumn("tkh", base)

        def h(i):
            a, b = _minhash_coef("a", i), _minhash_coef("b", i)
            return (F.col("tkh") * a + b) % MERSENNE31
    else:
        def h(i):
            return F.xxhash64(F.col("token"), F.lit(i))
    mins = [F.min(h(i)).alias(f"h{i}") for i in range(num_hashes)]
    sig = toks.groupBy(id_col).agg(*mins)
    return sig.select(id_col, F.array(*[f"h{i}" for i in range(num_hashes)])
                      .alias("signature"))


def _band_explode(sig: DataFrame, id_col: str, bands: int,
                  rows_per_band: int, hash_fn: str) -> DataFrame:
    """(id, band, band_hash) rows: one bucket key per signature band —
    md5 of the ':'-joined component strings in md5 mode (SQL-replicable)
    or xxhash64 of the components in production mode."""
    if hash_fn == "md5":
        band_exprs = [
            F.md5(F.concat_ws(":", *[
                F.col("signature")[i].cast("string")
                for i in range(b * rows_per_band, (b + 1) * rows_per_band)]))
            for b in range(bands)]
    else:
        band_exprs = [
            F.xxhash64(*[F.col("signature")[i]
                         for i in range(b * rows_per_band,
                                        (b + 1) * rows_per_band)])
            for b in range(bands)]
    return sig.select(
        id_col,
        F.posexplode(F.array(*band_exprs)).alias("band", "band_hash"))


def minhash_lsh_pairs(df: DataFrame, id_col: str, text_col: str,
                      num_hashes: int = 32, bands: int = 8,
                      threshold: float = 0.6,
                      hash_fn: str = "xxhash64", ngram: int = 1,
                      char_shingles: int | None = None,
                      max_bucket: int | None = None) -> DataFrame:
    """Banded LSH: docs sharing any band bucket become candidates; estimated
    Jaccard = fraction of matching minhash components; keep ≥ threshold.
    Shuffles: tokenize-agg (on id), band explode join (on band hash) —
    never an all-pairs product.  ``hash_fn`` as in
    :func:`minhash_signatures`; the md5 mode also uses md5 band hashes
    so the whole candidate pipeline is SQL-replicable.

    ``max_bucket`` is the hot-bucket mitigation for degenerate corpora
    (the scale path).  The band join exchanges BARE ids (~24 B/row), so
    a bucket of B near-identical docs is only ~24·B shuffle bytes —
    measured on this engine, even a bucket holding 50% of the corpus
    stays under AQE's byte-based skew thresholds (identical rows also
    lz4-compress away), so `OptimizeSkewedJoin` never sees it — yet the
    self-join emits B(B-1)/2 pairs INSIDE the task: a 10^6-doc bucket
    is ~24 MB of shuffle (below the 256 MB default threshold) but
    5·10^11 output pairs on one straggler.  Byte-skew detection cannot
    catch row-skew whose blowup is quadratic in the join, so the cap
    handles it structurally: buckets larger than ``max_bucket`` switch
    from all-pairs to a STAR expansion (every member paired with the
    bucket's min id) — O(B) pairs that preserve exactly what dedup
    consumes, duplicate-cluster CONNECTIVITY (``dup_clusters`` closes
    the component transitively).  Candidate recall for borderline
    near-dups inside a giant bucket is traded away — at that bucket
    size the members are near-certain duplicates of each other anyway
    (the est_jaccard ≥ threshold verification still runs on every
    emitted pair).  One extra window over the band key (same shuffle
    key as the join; the hot bucket's window task is linear in B).
    ``None`` (default) keeps exact all-pairs semantics — what the
    SQL oracle replicates."""
    if num_hashes % bands != 0:
        # est_jaccard divides the zip_with match count by
        # rows_per_band*bands; un-banded trailing components would bias
        # the estimate (identical docs would score num_hashes/(r*b) > 1)
        raise ValueError(f"bands ({bands}) must divide num_hashes "
                         f"({num_hashes})")
    rows_per_band = num_hashes // bands
    # localCheckpoint, not cache(): sig is consumed three times (band
    # explode + two re-attach joins); a CacheManager entry would pin
    # executor storage until an explicit unpersist nobody can call on a
    # lazily-returned frame, while checkpoint blocks are released by the
    # ContextCleaner as soon as the result DataFrame is dropped
    sig = minhash_signatures(df, id_col, text_col, num_hashes,
                             hash_fn=hash_fn, ngram=ngram,
                             char_shingles=char_shingles).localCheckpoint()
    # band join on BARE ids: carrying the 32-long signatures through the
    # bucket-join fanout multiplies shuffle volume ~30× (candidate counts
    # are quadratic in bucket size); signatures are re-attached per-id
    # afterwards — two narrow joins against the signature table (AQE
    # broadcasts it when small; sort-merge on the id key at corpus scale)
    banded = _band_explode(sig, id_col, bands, rows_per_band, hash_fn)
    if max_bucket is not None:
        from pyspark.sql import Window
        w = Window.partitionBy("band", "band_hash")
        banded = (banded
                  .withColumn("_bsz", F.count(F.lit(1)).over(w))
                  .withColumn("_hub", F.min(id_col).over(w)))
        big = banded.where(F.col("_bsz") > max_bucket)
        star = (big.where(F.col(id_col) != F.col("_hub"))
                .select(F.col("_hub").alias("id_a"),
                        F.col(id_col).alias("id_b")))
        banded = (banded.where(F.col("_bsz") <= max_bucket)
                  .drop("_bsz", "_hub"))
    a = banded.select(F.col(id_col).alias("id_a"), "band", "band_hash")
    b = banded.select(F.col(id_col).alias("id_b"), "band", "band_hash")
    cand_ids = (a.join(b, ["band", "band_hash"])
                .where(F.col("id_a") < F.col("id_b"))
                .select("id_a", "id_b"))
    if max_bucket is not None:
        cand_ids = cand_ids.unionByName(star)
    cand_ids = cand_ids.dropDuplicates(["id_a", "id_b"])
    cand = (cand_ids
            .join(sig.select(F.col(id_col).alias("id_a"),
                             F.col("signature").alias("sig_a")), "id_a")
            .join(sig.select(F.col(id_col).alias("id_b"),
                             F.col("signature").alias("sig_b")), "id_b"))
    est = F.aggregate(
        F.zip_with("sig_a", "sig_b",
                   lambda x, y: F.when(x == y, 1).otherwise(0)),
        F.lit(0), lambda acc, x: acc + x) / F.lit(float(rows_per_band * bands))
    return (cand.withColumn("est_jaccard", est)
            .where(F.col("est_jaccard") >= threshold)
            .select("id_a", "id_b", "est_jaccard"))


def minhash_lsh_pairs_incremental(
        new_df: DataFrame, base_df: DataFrame | None,
        id_col: str, text_col: str,
        num_hashes: int = 32, bands: int = 8, threshold: float = 0.6,
        hash_fn: str = "xxhash64", ngram: int = 1,
        char_shingles: int | None = None,
        base_signatures: DataFrame | None = None,
        new_signatures: DataFrame | None = None) -> DataFrame:
    """Incremental banded LSH: near-dup candidates touching at least one
    NEW document — new×new pairs (``id_a < id_b``) and new×base pairs
    (``id_a`` = the new doc) — while base×base pairs are NEVER
    generated.  This is the daily-increment shape at 100 TB: the base
    corpus is huge and already deduped; re-running the batch operator
    would re-enumerate every base bucket's B(B-1)/2 pairs just to throw
    them away.  Here the base side only ever band-joins against the
    increment, so candidate work is proportional to the increment, not
    the corpus.

    ``base_signatures`` skips re-tokenizing the base entirely: pass the
    stored (id, signature) table (:func:`minhash_signatures` output is
    the artifact a production pipeline persists per snapshot) and the
    base TEXT is never read.  ``new_signatures`` does the same for the
    increment — a caller that also persists the batch's signatures
    (streaming ingestion) computes them ONCE and shares them.  ids must
    be disjoint across the two inputs (same contract as the union the
    batch operator would see).
    Estimated Jaccard is verified on every emitted pair exactly as in
    :func:`minhash_lsh_pairs`; hot-bucket capping composes the same way
    if needed (apply it to the unioned banded relation)."""
    if num_hashes % bands != 0:
        # est_jaccard divides the zip_with match count by
        # rows_per_band*bands; un-banded trailing components would bias
        # the estimate (identical docs would score num_hashes/(r*b) > 1)
        raise ValueError(f"bands ({bands}) must divide num_hashes "
                         f"({num_hashes})")
    rows_per_band = num_hashes // bands
    if new_signatures is not None:
        sig_new = new_signatures.localCheckpoint()
    else:
        sig_new = minhash_signatures(new_df, id_col, text_col, num_hashes,
                                     hash_fn=hash_fn, ngram=ngram,
                                     char_shingles=char_shingles
                                     ).localCheckpoint()
    if base_signatures is not None:
        sig_base = base_signatures
    else:
        if base_df is None:
            raise ValueError("need base_df or base_signatures")
        sig_base = minhash_signatures(base_df, id_col, text_col, num_hashes,
                                      hash_fn=hash_fn, ngram=ngram,
                                      char_shingles=char_shingles)
    sig_base = sig_base.localCheckpoint()
    banded_new = _band_explode(sig_new, id_col, bands, rows_per_band,
                               hash_fn)
    banded_base = _band_explode(sig_base, id_col, bands, rows_per_band,
                                hash_fn)
    a_new = banded_new.select(F.col(id_col).alias("id_a"),
                              "band", "band_hash")
    # new×base: every bucket co-occurrence, oriented (new, base)
    nb = (a_new.join(banded_base.select(F.col(id_col).alias("id_b"),
                                        "band", "band_hash"),
                     ["band", "band_hash"])
          .select("id_a", "id_b"))
    # new×new: ordered to emit each pair once
    nn = (a_new.join(banded_new.select(F.col(id_col).alias("id_b"),
                                       "band", "band_hash"),
                     ["band", "band_hash"])
          .where(F.col("id_a") < F.col("id_b"))
          .select("id_a", "id_b"))
    cand_ids = nb.unionByName(nn).dropDuplicates(["id_a", "id_b"])
    sig_all = sig_new.unionByName(sig_base)
    cand = (cand_ids
            .join(sig_all.select(F.col(id_col).alias("id_a"),
                                 F.col("signature").alias("sig_a")), "id_a")
            .join(sig_all.select(F.col(id_col).alias("id_b"),
                                 F.col("signature").alias("sig_b")), "id_b"))
    est = F.aggregate(
        F.zip_with("sig_a", "sig_b",
                   lambda x, y: F.when(x == y, 1).otherwise(0)),
        F.lit(0), lambda acc, x: acc + x) / F.lit(float(rows_per_band * bands))
    return (cand.withColumn("est_jaccard", est)
            .where(F.col("est_jaccard") >= threshold)
            .select("id_a", "id_b", "est_jaccard"))


_ASCII_WS_RE = None


def _shingles_py(text: str, ngram: int = 1,
                 char_shingles: int | None = None) -> set[str]:
    """Python twin of :func:`_shingle_expr` — MUST keep the same token
    definition.  Spark ``trim`` strips spaces only, and Java regex
    ``\\s`` is ASCII-only — so the split here is an ASCII-flag regex,
    NOT ``str.split()`` (which splits on Unicode whitespace and would
    diverge on e.g. non-breaking spaces in multilingual text)."""
    global _ASCII_WS_RE
    if _ASCII_WS_RE is None:
        import re as _re
        _ASCII_WS_RE = _re.compile(r"\s+", _re.ASCII)
    if char_shingles is not None:
        k = char_shingles
        t = text.strip(" ")
        return ({t[i:i + k] for i in range(len(t) - k + 1)}
                if len(t) >= k else set())
    ws = [w for w in _ASCII_WS_RE.split(text) if w]
    if ngram == 1:
        return set(ws)
    return ({" ".join(ws[i:i + ngram]) for i in range(len(ws) - ngram + 1)}
            if len(ws) >= ngram else set())


def _simhash_batch(texts: pd.Series, ngram: int = 1,
                   char_shingles: int | None = None) -> pd.Series:
    """Vectorized SimHash of a pandas text batch: md5-derived 64-bit token
    hashes (memoized per unique token — real corpora have heavy token
    reuse), numpy bit-vote matrix, sign → signed-64 fingerprint."""
    cache: dict[str, int] = {}

    def tok_hash(t: str) -> int:
        h = cache.get(t)
        if h is None:
            h = int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big")
            cache[t] = h
        return h

    bit_idx = np.arange(64, dtype=np.uint64)
    out = np.zeros(len(texts), dtype=np.int64)
    for i, text in enumerate(texts):
        toks = _shingles_py(str(text), ngram, char_shingles)
        if not toks:
            continue
        hs = np.fromiter((tok_hash(t) for t in toks), dtype=np.uint64)
        bits = (hs[:, None] >> bit_idx) & np.uint64(1)      # (n_tok, 64)
        votes = bits.sum(axis=0) * 2 > len(hs)              # majority per bit
        out[i] = (votes.astype(np.uint64) << bit_idx).sum(
            dtype=np.uint64).astype(np.int64)
    return pd.Series(out, index=texts.index)


def _spread_small_input(df: DataFrame) -> DataFrame:
    """Repartition ONLY when the scan yields fewer partitions than cores
    (a handful of small files would pin a UDF-heavy stage to one task —
    measured 2.4× on a single-file input).  At production scale the scan
    already yields thousands of splits and this is a no-op — no shuffle
    is ever added to a well-partitioned input."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def simhash(df: DataFrame, id_col: str, text_col: str, ngram: int = 1,
            char_shingles: int | None = None) -> DataFrame:
    """64-bit SimHash per row: one Arrow-batched pass (no explode, no
    shuffle — the JVM-aggregate formulation needed 64 sum-aggs whose
    expression tree broke whole-stage codegen)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    def batch(texts: pd.Series) -> pd.Series:
        return _simhash_batch(texts, ngram, char_shingles)

    sh = pandas_udf(batch, LongType())
    return _spread_small_input(df).select(
        id_col, sh(F.col(text_col)).alias("simhash"))


def dup_clusters(pairs: DataFrame, id_a: str = "id_a",
                 id_b: str = "id_b", max_iters: int = 20) -> DataFrame:
    """DEPRECATED — use :func:`dup_clusters_star` (O(log n) rounds,
    diameter-independent, hybrid driver finish); this min-label
    propagation variant is kept only as the simple O(diameter) reference
    implementation the star algorithm is differential-tested against.

    Connected components over duplicate pairs → (doc_id, cluster_id)
    with ``cluster_id`` = min doc id in the component (the canonical
    keeper).  Iterative label propagation: each round every node adopts
    the min label in its neighborhood; converges in O(diameter) rounds —
    checkpoint-free because each round is one groupBy (no growing
    lineage problem at these iteration counts; ``localCheckpoint`` every
    5 rounds guards the long-tail case).  At 100 TB scale with
    high-diameter components, swap the propagation loop for the
    large-star/small-star algorithm (O(log n) rounds) — component
    diameters in dedup graphs are tiny in practice, so min-propagation
    is the simpler correct default.

    Training-data pipelines use this after minhash/simhash/embedding
    pair generation to drop all-but-one doc per duplicate group.
    """
    edges = (pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
             .unionByName(pairs.select(F.col(id_b).alias("src"),
                                       F.col(id_a).alias("dst")))
             .dropDuplicates(["src", "dst"]).cache())
    labels = (edges.select(F.col("src").alias("node"))
              .dropDuplicates(["node"])
              .withColumn("label", F.col("node")))
    for i in range(max_iters):
        neigh = (edges.join(labels, edges.dst == labels.node)
                 .groupBy("src").agg(F.min("label").alias("nbr_label")))
        new_labels = (labels.join(neigh, labels.node == neigh.src, "left")
                      .select(F.col("node"),
                              F.least(F.col("label"),
                                      F.coalesce(F.col("nbr_label"),
                                                 F.col("label")))
                              .alias("label")))
        if i % 5 == 4:
            new_labels = new_labels.localCheckpoint()
        changed = (new_labels.alias("n")
                   .join(labels.alias("o"), "node")
                   .where("n.label <> o.label").limit(1).count())
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    return labels.select(F.col("node").alias("doc_id"),
                         F.col("label").alias("cluster_id"))


def _union_find_local(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Driver-side union-find with path halving + min-root (the exact
    oracle the distributed variants are tested against)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def dup_clusters_star(pairs: DataFrame, id_a: str = "id_a",
                      id_b: str = "id_b", max_iters: int = 15,
                      driver_finish_edges: int = 1_000_000) -> DataFrame:
    """Connected components via alternating large-star / small-star
    (the two-round-primitive formulation from the public MapReduce-CC
    literature): converges in O(log n) rounds regardless of component
    DIAMETER, unlike :func:`dup_clusters`'s min-label propagation
    (O(diameter) rounds).  Same contract: (doc_id, cluster_id) with
    cluster_id = min doc id in the component.

    - large-star: every neighbor of ``u`` larger than ``u`` is re-pointed
      at ``min(Γ(u) ∪ {u})`` — long chains collapse geometrically.
    - small-star: every smaller-or-equal neighbor (and ``u`` itself) is
      pointed at the neighborhood min — keeps edges oriented
      (larger → smaller) and merges stars.

    Each round is two self-joins + groupBys on the (shrinking) edge set;
    ``localCheckpoint`` truncates lineage every round.  Convergence is
    detected by an aggregate digest (edge count + xxhash64 bit-XOR;
    XOR is order-independent and cannot overflow under ANSI mode) —
    one cheap single-row action per round instead of a full edge diff.
    Preferred at 10^12-node scale where adversarial pair graphs (e.g.
    chained near-dup shingles) have large diameters.

    **Hybrid driver finish**: once the (monotonically non-growing) edge
    set fits ``driver_finish_edges``, the remaining rounds are replaced
    by one Arrow collect + local union-find.  Driver cost at the 1M
    default: ~16 MB for the two int64 columns plus a union-find dict of
    up to ~100 B per distinct node (≈200 MB worst case) — sized for a
    modest driver; lower the budget on small drivers.  Distributed
    rounds cost whole-cluster job latency each; the long tail of tiny
    rounds is exactly where that latency dominates, so large graphs do
    O(log n) distributed rounds and finish locally the moment the data
    is small — small graphs skip the distributed phase entirely.
    If ``max_iters`` is exhausted before the fixpoint and the edge set
    is still above the driver budget, a ``RuntimeError`` is raised —
    never a silently-unconverged labeling.
    """
    raw = (pairs.select(F.col(id_a).cast("long").alias("u"),
                        F.col(id_b).cast("long").alias("v"))
           .where("u <> v"))
    nodes = (raw.select(F.col("u").alias("node"))
             .unionByName(raw.select(F.col("v").alias("node")))
             .dropDuplicates(["node"]).localCheckpoint())
    # orient every edge larger → smaller (small-star's input invariant)
    edges = (raw.select(F.greatest("u", "v").alias("u"),
                        F.least("u", "v").alias("v"))
             .dropDuplicates(["u", "v"]).localCheckpoint())

    def digest(e: DataFrame) -> tuple:
        row = e.agg(F.count("*").alias("c"),
                    F.bit_xor(F.xxhash64("u", "v")).alias("h")).first()
        return (row.c, row.h)

    def large_star(e: DataFrame) -> DataFrame:
        sym = e.unionByName(
            e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = (sym.groupBy("u").agg(F.min("v").alias("mn"))
                .select("u", F.least("u", "mn").alias("m")))
        return (sym.where(F.col("v") > F.col("u"))
                .join(mins, "u")
                .select(F.col("v").alias("u"), F.col("m").alias("v"))
                .where("u <> v").dropDuplicates(["u", "v"]))

    def small_star(e: DataFrame) -> DataFrame:
        mins = e.groupBy("u").agg(F.min("v").alias("mn"))
        with_m = e.join(mins, "u")
        return (with_m.select(F.col("v").alias("u"), F.col("mn").alias("v"))
                .unionByName(mins.select(F.col("u"), F.col("mn").alias("v")))
                .where("u <> v").dropDuplicates(["u", "v"]))

    def finish_local(e: DataFrame) -> DataFrame:
        # compact collect: Arrow → two int64 columns (~16 B/edge), not
        # per-row Row objects; the union-find dict dominates at up to
        # ~100 B per distinct node of Python heap
        pdf = e.toPandas()
        labels = _union_find_local(
            list(zip(pdf["u"].tolist(), pdf["v"].tolist())))
        lbl_df = e.sparkSession.createDataFrame(
            list(labels.items()), "node long, label long")
        return (nodes.join(lbl_df, "node", "left")
                .select(F.col("node").alias("doc_id"),
                        F.coalesce("label", "node").alias("cluster_id")))

    prev = digest(edges)
    converged = False
    for _ in range(max_iters):
        if prev[0] <= driver_finish_edges:
            return finish_local(edges)
        edges = small_star(large_star(edges)).localCheckpoint()
        cur = digest(edges)
        if cur == prev:   # fixpoint: every edge is (node → component min)
            converged = True
            break
        prev = cur
    if not converged:
        # max_iters exhausted before the fixpoint: the edge set still has
        # intermediate labels — returning it would yield duplicate
        # doc_ids with non-min cluster_ids.  Finish exactly on the driver
        # when it fits; otherwise FAIL LOUDLY rather than emit wrong
        # clusters.
        if prev[0] <= driver_finish_edges:
            return finish_local(edges)
        raise RuntimeError(
            f"dup_clusters_star did not converge within {max_iters} "
            f"rounds ({prev[0]} edges remain, above the "
            f"driver_finish_edges={driver_finish_edges} budget); raise "
            f"max_iters or the driver budget")
    return (nodes.join(edges.select(F.col("u").alias("node"),
                                    F.col("v").alias("label")),
                       "node", "left")
            .select(F.col("node").alias("doc_id"),
                    F.coalesce("label", "node").alias("cluster_id")))


def resolve_duplicates(df: DataFrame, pairs: DataFrame,
                       id_col: str = "doc_id") -> DataFrame:
    """End-to-end duplicate resolution: pair list → connected components
    → keep ONE doc per component (the min id, the canonical keeper) plus
    every unpaired doc.  The training-data pipeline's final dedup step:
    feed it pairs from any generator (exact digests, minhash/simhash
    LSH, embedding cosine) and anti-join the losers away.

    Plan shape: dup_clusters_star over the (small relative to corpus)
    pair graph, then one left-anti join of the corpus against the
    non-keeper ids — the corpus is scanned once and never shuffled
    (anti-join's build side is the loser set)."""
    clusters = dup_clusters_star(pairs)
    losers = (clusters.where(F.col("doc_id") != F.col("cluster_id"))
              .select(F.col("doc_id").alias(id_col)))
    return df.join(losers, on=id_col, how="left_anti")


def _exact_cosine_pairs_blocked(df: DataFrame, id_col: str, vec_col: str,
                                threshold: float,
                                nblocks: int | None = None) -> DataFrame:
    """EXACT all-pairs cosine ≥ threshold via block-matrix products.

    All-pairs is inherently O(N²) — the only question is the constant.
    The corpus is hash-partitioned into ``nblocks`` row blocks (each
    packed into one (ids, matrix) row); every unordered block pair —
    B(B+1)/2 independent tasks — is scored with ONE vectorized numpy
    matmul over normalized rows, emitting only passing pairs.  Replaces
    the keyed row-level cross join whose JVM ``aggregate``/``zip_with``
    fold cost ~25 µs per pair (sf0.1: 2000 vectors × dim 64 took ~50 s;
    this runs the same 2M pairs in under a second).

    Scale envelope: block size ~4096 rows → shuffle duplication is B×
    the corpus (inherent to exact quadratic work).  Past ~10^6 rows
    exact all-pairs stops being the right tool regardless of engine —
    that is what the LSH path is for.
    """
    import math

    from collections.abc import Iterator

    spark = df.sparkSession
    if nblocks is None:
        n = df.count()
        cores = spark.sparkContext.defaultParallelism
        # enough block pairs to feed every core, blocks capped ~4096 rows
        nblocks = max(math.isqrt(2 * cores) + 1, math.ceil(n / 4096), 1)
    # preserve the caller's id type (the LSH path does): numeric and
    # string ids both work — numpy compares either natively
    id_type = df.schema[id_col].dataType.simpleString()
    rows = df.select(F.col(id_col).alias("id"),
                     F.col(vec_col).cast("array<double>").alias("v"),
                     F.pmod(F.xxhash64(F.col(id_col)),
                            F.lit(nblocks)).alias("blk"))
    packed = (rows.groupBy("blk")
              .agg(F.collect_list(F.struct("id", "v")).alias("rs"))
              .select("blk",
                      F.transform("rs", lambda s: s["id"]).alias("ids"),
                      F.transform("rs", lambda s: s["v"]).alias("vecs")))
    pa = packed.select(F.col("blk").alias("blk_a"),
                       F.col("ids").alias("ids_a"),
                       F.col("vecs").alias("vecs_a"))
    pb = packed.select(F.col("blk").alias("blk_b"),
                       F.col("ids").alias("ids_b"),
                       F.col("vecs").alias("vecs_b"))
    pairs = pa.join(pb, F.col("blk_a") <= F.col("blk_b"))
    thr = float(threshold)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for ba, ids_a, vecs_a, bb_, ids_b, vecs_b in zip(
                    pdf["blk_a"], pdf["ids_a"], pdf["vecs_a"],
                    pdf["blk_b"], pdf["ids_b"], pdf["vecs_b"]):
                # object dtype: np.minimum/np.maximum below must compare
                # via Python str.__lt__ — on numpy '<U' arrays they raise
                ia = np.asarray(ids_a, dtype=object)
                ma = np.vstack([np.asarray(x, dtype=np.float64)
                                for x in vecs_a])
                if ba == bb_:
                    ib, mb = ia, ma
                else:
                    ib = np.asarray(ids_b, dtype=object)
                    mb = np.vstack([np.asarray(x, dtype=np.float64)
                                    for x in vecs_b])
                # floor like similarity.py's cosine paths: a zero-norm
                # vector yields sim 0.0 (never NaN / divide warnings)
                na = np.maximum(np.linalg.norm(ma, axis=1), 1e-300)
                nb = np.maximum(np.linalg.norm(mb, axis=1), 1e-300)
                sims = (ma @ mb.T) / np.outer(na, nb)
                mask = sims >= thr
                if ba == bb_:
                    # intra-block: strict upper triangle (one orientation)
                    mask &= ia[:, None] < ib[None, :]
                xi, yi = np.nonzero(mask)
                if not len(xi):
                    continue
                aa, bb2 = ia[xi], ib[yi]
                lo = np.minimum(aa, bb2)
                hi = np.maximum(aa, bb2)
                keep = lo != hi
                yield pd.DataFrame({"id_a": lo[keep], "id_b": hi[keep],
                                    "cosine": sims[xi, yi][keep]})

    return pairs.mapInPandas(
        gen, schema=f"id_a {id_type}, id_b {id_type}, cosine double")


def embedding_near_dup_pairs(df: DataFrame, id_col: str = "vec_id",
                             vec_col: str = "embedding",
                             threshold: float = 0.95,
                             dim: int | None = None,
                             use_lsh: bool = True,
                             nbits: int = 8, ntables: int = 6,
                             max_bucket: int | None = None) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: ``cosine >= threshold``,
    ``id_a < id_b``.

    Scale path (``use_lsh``): hyperplane-LSH buckets prune candidates (a
    self-join keyed on bucket id), exact cosine verifies — near-dups at
    0.95 cosine collide in a bucket with high probability across tables.
    ``use_lsh=False`` is the exact baseline:
    :func:`_exact_cosine_pairs_blocked` (block-matrix numpy products —
    the right way to spend inherently quadratic exact work).

    ``max_bucket``: same hot-bucket row-skew mitigation as
    :func:`minhash_lsh_pairs` (see its docstring for why AQE's
    byte-based skew detection cannot catch this) — buckets larger than
    the cap switch from all-pairs to a connectivity-preserving star
    expansion around the bucket's min id; the exact-cosine >= threshold
    verification still runs on every emitted pair.
    """
    from .similarity import _bucket_udf, _cosine

    if not use_lsh:
        return _exact_cosine_pairs_blocked(df, id_col, vec_col, threshold)
    if dim is None:
        raise ValueError("dim required for the LSH path")
    # bucket join on BARE ids (the minhash lesson, round 1: carrying the
    # payload through the bucket-join fanout multiplies shuffle volume
    # by the payload width — here 2×64 doubles per candidate, and
    # candidate counts are quadratic in bucket size).  Vectors are
    # re-attached per id AFTER pair dedup; the bucketed frame is
    # localCheckpointed so the UDF runs once, not once per join side.
    vecs = df.select(F.col(id_col).alias("_id"),
                     F.col(vec_col).cast("array<double>").alias("_v"))
    buckets = _bucket_udf(dim, nbits=nbits, ntables=ntables)
    bucketed = (vecs.select("_id", F.explode(buckets(F.col("_v")))
                    .alias("_bkt")).localCheckpoint())
    star = None
    if max_bucket is not None:
        from pyspark.sql import Window
        w = Window.partitionBy("_bkt")
        bucketed = (bucketed
                    .withColumn("_bsz", F.count(F.lit(1)).over(w))
                    .withColumn("_hub", F.min("_id").over(w)))
        star = (bucketed.where((F.col("_bsz") > max_bucket)
                               & (F.col("_id") != F.col("_hub")))
                .select(F.col("_hub").alias("id_a"),
                        F.col("_id").alias("id_b")))
        bucketed = (bucketed.where(F.col("_bsz") <= max_bucket)
                    .drop("_bsz", "_hub"))
    a = bucketed.select(F.col("_id").alias("id_a"), "_bkt")
    b = bucketed.select(F.col("_id").alias("id_b"), "_bkt")
    cand = (a.join(b, "_bkt").drop("_bkt")
            .where(F.col("id_a") < F.col("id_b")))
    if star is not None:
        cand = cand.unionByName(star)
    cand = cand.dropDuplicates(["id_a", "id_b"])
    cand = (cand.join(vecs.select(F.col("_id").alias("id_a"),
                                  F.col("_v").alias("va")), "id_a")
            .join(vecs.select(F.col("_id").alias("id_b"),
                              F.col("_v").alias("vb")), "id_b"))
    return (cand.withColumn("cosine", _cosine(F.col("va"), F.col("vb")))
            .where(F.col("cosine") >= threshold)
            .select("id_a", "id_b", "cosine"))


def simhash_near_pairs(df: DataFrame, id_col: str, text_col: str,
                       max_hamming: int = 3, blocks: int = 4,
                       ngram: int = 1,
                       char_shingles: int | None = None) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ max_hamming via the
    pigeonhole block trick: split the 64-bit fingerprint into ``blocks``
    chunks; any pair within distance must share ≥1 exact chunk → candidates
    meet in chunk-keyed buckets (equi-join), then exact Hamming filter."""
    assert max_hamming < blocks, "pigeonhole requires max_hamming < blocks"
    # localCheckpoint over cache(): see minhash_lsh_pairs — fingerprints
    # feed both join sides; checkpoint storage self-releases on drop
    sh = simhash(df, id_col, text_col, ngram=ngram,
                 char_shingles=char_shingles).localCheckpoint()
    width = 64 // blocks
    mask = (1 << width) - 1
    chunked = sh.select(
        id_col, "simhash",
        F.posexplode(F.array(*[
            F.shiftright(F.col("simhash"), i * width).bitwiseAND(F.lit(mask))
            for i in range(blocks)
        ])).alias("chunk_idx", "chunk"))
    a = chunked.select(F.col(id_col).alias("id_a"),
                       F.col("simhash").alias("sh_a"), "chunk_idx", "chunk")
    b = chunked.select(F.col(id_col).alias("id_b"),
                       F.col("simhash").alias("sh_b"), "chunk_idx", "chunk")
    cand = (a.join(b, ["chunk_idx", "chunk"])
            .where(F.col("id_a") < F.col("id_b"))
            .dropDuplicates(["id_a", "id_b"]))
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (cand.withColumn("hamming", ham)
            .where(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming"))


def snm_candidates(df: DataFrame, key_col: str, window: int,
                   id_col: str = "doc_id") -> DataFrame:
    """Sorted-neighborhood blocking (Hernández & Stolfo 1995) — the
    third candidate-generation strategy beside LSH banding and PPJoin
    prefix filtering: sort the corpus by a blocking key, and every pair
    within ``window`` positions of each other is a candidate.  The
    method of record-linkage pipelines whose similarity is strongest
    between records that sort adjacently (names, titles, text
    prefixes).

    Scale shape: the global sort position comes from
    ``ranking.global_rank`` (range partitioning — NO single-partition
    window), and the "within w positions" self-join is a BAND join:
    left rows carry band ``(rank−1) DIV w``; right rows are duplicated
    into their own band and the previous one, so every qualifying pair
    co-locates in exactly one keyed join bucket (a pair ≤ w apart
    spans at most adjacent bands) — candidate cost is O(N·w/P) per
    task, never quadratic, and a hot key cannot concentrate rows
    because rank is unique.  The residual ``0 < r2 − r1 ≤ w`` filter
    runs post-join.  The oracle keeps the direct rank-distance
    formulation, so the hash match proves the band-join rewrite.

    Note: ``global_rank`` executes eagerly at call time (documented
    there).  Output: (id_a, id_b, gap) with id_a the lower-ranked row.
    """
    from frogocr_spark.operators.ranking import global_rank
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    ranked = global_rank(
        df.select(F.col(id_col).alias("_id"),
                  F.col(key_col).alias("_key")),
        ["_key", "_id"], rank_col="r")
    left = (ranked.withColumn("band", F.expr(f"(r - 1) DIV {window}"))
            .select("_id", "r", "band"))
    right = (left.select(F.col("_id").alias("id_b"),
                         F.col("r").alias("r2"),
                         F.explode(F.array(F.col("band"),
                                           F.col("band") - 1))
                         .alias("band")))
    return (left.join(right, "band")
            .where((F.col("r2") > F.col("r"))
                   & (F.col("r2") - F.col("r") <= window))
            .select(F.col("_id").alias("id_a"), "id_b",
                    (F.col("r2") - F.col("r")).cast("int")
                    .alias("gap")))


def snm_candidates_oracle_sql(src_sql: str, key_expr: str,
                              window: int) -> str:
    """DuckDB twin of :func:`snm_candidates`: the textbook definition
    — row_number over the blocking order, pairs with rank distance ≤
    w.  ``src_sql`` must yield (doc_id, text-bearing columns) rows;
    ``key_expr`` is the blocking-key expression over them."""
    return f"""
        WITH src AS ({src_sql}),
        ranked AS (
            SELECT doc_id AS id, row_number() OVER (
                ORDER BY {key_expr}, doc_id) AS r
            FROM src
        )
        SELECT a.id AS id_a, b.id AS id_b, CAST(b.r - a.r AS INT) AS gap
        FROM ranked a JOIN ranked b
          ON b.r > a.r AND b.r - a.r <= {window}
    """


def cluster_size_profile(clusters: DataFrame,
                         cluster_col: str = "cluster_id") -> DataFrame:
    """Health profile of a duplicate-cluster assignment — the audit a
    pipeline runs BEFORE trusting dedup resolution at 100 TB: a
    cluster-size histogram (log2 buckets, bucket = ⌊log2 size⌋ via the
    binary-string length — no float log near powers of two) plus the
    giant-component fraction, the loudest over-merging alarm (one hub
    cluster absorbing the corpus means the pair generator or the CC is
    broken).

    Scale shape: ONE cluster-keyed count + ONE ≤64-row bucket agg; the
    (max, total) stats ride a 1-row broadcast back onto the bucket
    rows.  Output: one row per occupied bucket — ``(bucket,
    n_clusters, n_docs, max_size, giant_frac_e6)``, the last two
    repeated per row (giant_frac_e6 = max·1e6 DIV total docs)."""
    sz = (clusters.groupBy(F.col(cluster_col).alias("_cl"))
          .agg(F.count(F.lit(1)).alias("size")))
    tot = sz.agg(F.sum("size").alias("_td"), F.max("size").alias("_mx"))
    return (sz.groupBy(F.expr("length(bin(size)) - 1").cast("long")
                       .alias("bucket"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_clusters"),
                 F.sum("size").cast("long").alias("n_docs"))
            .crossJoin(F.broadcast(tot))
            .select("bucket", "n_clusters", "n_docs",
                    F.col("_mx").cast("long").alias("max_size"),
                    F.expr("(_mx * CAST(1000000 AS BIGINT)) DIV _td")
                    .cast("long").alias("giant_frac_e6")))


def edit_distance_pairs(df: DataFrame, max_dist: int = 10,
                        key_len: int = 12, window: int = 3,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Bounded edit-distance similarity join: sorted-neighborhood
    blocking (:func:`snm_candidates` on a ``key_len``-char trimmed text
    prefix) + exact Levenshtein verification — the classic
    record-linkage dedup for OCR/transcription noise, where near-dups
    differ by character edits that token-level Jaccard/MinHash
    under-weights (reference two-pass replacement analog: words that
    differ by recognition noise — the word-replacement gate family,
    ``Source/TaskProcessor.cpp:287-297``).

    Scale shape: candidates are SNM band-join output (O(N·w), never
    quadratic); texts ride back via two corpus-keyed equi-joins; the
    symmetric length filter ``|len(a)−len(b)| ≤ d`` prunes before the
    verify, and the verify itself uses Spark's THRESHOLDED
    ``levenshtein(l, r, d)`` (banded DP, O(d·min(m,n)) with early
    exit, returning −1 past the bound) so a pathological candidate
    pair never pays the full O(m·n) matrix.  Output:
    ``(id_a, id_b, dist)`` with dist ≤ max_dist.
    """
    if max_dist < 0:
        raise ValueError(f"max_dist must be >= 0, got {max_dist}")
    keyed = df.select(
        F.col(id_col).alias("doc_id"),
        F.substring(F.trim(F.col(text_col)), 1, key_len).alias("_k"))
    cands = snm_candidates(keyed, "_k", window)
    txt = df.select(F.col(id_col).alias("_tid"),
                    F.col(text_col).alias("_txt"),
                    F.length(text_col).alias("_len"))
    scored = (
        cands
        .join(txt.select(F.col("_tid").alias("id_a"),
                         F.col("_txt").alias("_ta"),
                         F.col("_len").alias("_la")), "id_a")
        .join(txt.select(F.col("_tid").alias("id_b"),
                         F.col("_txt").alias("_tb"),
                         F.col("_len").alias("_lb")), "id_b")
        .where(F.abs(F.col("_la") - F.col("_lb")) <= max_dist)
        .select("id_a", "id_b",
                F.levenshtein("_ta", "_tb", max_dist).alias("dist")))
    return scored.where(F.col("dist") >= 0)


def edit_distance_pairs_oracle_sql(src_sql: str, max_dist: int = 10,
                                   key_len: int = 12,
                                   window: int = 3) -> str:
    """DuckDB twin of :func:`edit_distance_pairs` — textbook form:
    rank-distance SNM candidates, length filter, full ``levenshtein``
    (DuckDB has no banded variant; equality with the thresholded Spark
    result on kept rows is exactly what the hash proves)."""
    return f"""
        WITH src AS ({src_sql}),
        ranked AS (
            SELECT doc_id AS id, text, length(text) AS len,
                   row_number() OVER (
                       ORDER BY substr(trim(text), 1, {key_len}),
                                doc_id) AS r
            FROM src
        )
        SELECT a.id AS id_a, b.id AS id_b,
               CAST(levenshtein(a.text, b.text) AS INT) AS dist
        FROM ranked a JOIN ranked b
          ON b.r > a.r AND b.r - a.r <= {window}
        WHERE abs(a.len - b.len) <= {max_dist}
          AND levenshtein(a.text, b.text) <= {max_dist}
    """
