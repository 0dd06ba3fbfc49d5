"""Deduplication operators for large-scale training-data pipelines.

Five strategies, each scale-shaped for 10^12 rows:

- **exact**: hash-groupBy on a normalized content hash — one partial-agg
  shuffle keyed by the 64/128-bit hash, never by the text itself.
- **MinHash + LSH**: shingle → JVM-side shingle hashing → numpy-batched
  minhash signatures (Arrow pandas UDF) → band/bucket explode →
  bucket-join for candidates.  Shuffle volume = rows × bands, each row
  a (bucket, id) pair — no quadratic pair materialization outside
  buckets.
- **SimHash**: 64-bit weighted-bit signature, banded into 16-bit keys;
  candidates = equal band key, verify by Hamming distance.
- **n-gram Jaccard**: exact similarity on candidate pairs via shingle
  explode + self-join (SQL-expressible, used as the DuckDB oracle for
  the approximate paths).
- **embedding cosine**: near-dup by cosine ≥ τ; brute-force within
  buckets, random-hyperplane LSH for the scale path
  (see :mod:`.similarity`).
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

_MERSENNE = (1 << 61) - 1


def ensure_parallelism(df: DataFrame) -> DataFrame:
    """Round-robin repartition inputs that arrive with too few partitions
    (e.g. one small parquet file) before heavy per-row compute.

    A 10^12-row table already has thousands of splits — this is a no-op
    there (the check reads only plan metadata, no data)."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, target // 2):
        return df.repartition(target)
    return df


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def normalized_text(col: Column) -> Column:
    """Lowercase, collapse whitespace — the usual near-exact normalizer."""
    return F.regexp_replace(F.trim(F.lower(col)), r"\s+", " ")


def content_hash(col: Column) -> Column:
    return F.xxhash64(normalized_text(col))


def exact_duplicate_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(content_hash, n_docs, doc_ids) for groups with >1 member.

    Shuffles only (hash, id) pairs; partial agg bounds map output."""
    return (
        df.select(F.col(id_col), content_hash(F.col(text_col)).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sort_array(F.collect_list(id_col)).alias("doc_ids"),
        )
        .filter(F.col("n_docs") > 1)
    )


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep the lowest-id row per content hash (deterministic winner)."""
    w_min = (
        df.select(F.col(id_col), content_hash(F.col(text_col)).alias("_ch"))
        .groupBy("_ch")
        .agg(F.min(id_col).alias(id_col))
    )
    return df.join(w_min, on=id_col, how="left_semi")


# ---------------------------------------------------------------------------
# shingling (shared by minhash / jaccard)
# ---------------------------------------------------------------------------


def shingles(col: Column, k: int = 5, mode: str = "char") -> Column:
    """Array of k-shingles (char k-grams or word k-grams), distinct."""
    if mode == "char":
        s = normalized_text(col)
        idx = F.sequence(F.lit(1), F.greatest(F.length(s) - (k - 1), F.lit(1)))
        return F.array_distinct(F.transform(idx, lambda i: s.substr(i, F.lit(k))))
    # empty tokens are dropped (text.words() parity); a whitespace-only
    # document yields an EMPTY shingle set, not [''] — keeps the DuckDB
    # jaccard oracle (which filters x <> '') and Spark in agreement
    words = F.filter(F.split(normalized_text(col), " "), lambda w: w != "")
    n = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, k)))
    return F.array_distinct(
        F.when(n > 0, grams).otherwise(F.array().cast("array<string>"))
    )


def shingle_hashes(col: Column, k: int = 5, mode: str = "char") -> Column:
    """JVM-side 64-bit hash per shingle — the only per-token work; all
    minhash arithmetic below happens on these longs in numpy.

    No ``array_distinct``: duplicate shingles cannot change a minimum,
    so minhash over the multiset equals minhash over the set."""
    if mode == "char":
        s = normalized_text(col)
        idx = F.sequence(F.lit(1), F.greatest(F.length(s) - (k - 1), F.lit(1)))
        return F.transform(idx, lambda i: F.xxhash64(s.substr(i, F.lit(k))))
    words = F.filter(F.split(normalized_text(col), " "), lambda w: w != "")
    n = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    grams = F.transform(
        idx, lambda i: F.xxhash64(F.concat_ws(" ", F.slice(words, i + 1, k)))
    )
    return F.when(n > 0, grams).otherwise(F.array().cast("array<bigint>"))


# ---------------------------------------------------------------------------
# MinHash signatures (numpy-batched pandas UDF, Arrow transfer)
# ---------------------------------------------------------------------------


def _minhash_params(n_hashes: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=n_hashes, dtype=np.int64)
    b = rng.randint(0, _MERSENNE, size=n_hashes, dtype=np.int64)
    return a, b


def _mulmod61_32(a: np.ndarray, x: np.ndarray) -> np.ndarray:
    """(a[:,None] * x[None,:]) mod (2^61-1), exact, all-uint64.

    Requires x < 2^32 and a < 2^61.  Uses 2^61 ≡ 1 (mod p): split
    a = a_hi·2^29 + a_lo so both partial products stay below 2^64.
    A *full-range* multiplier is what makes the family min-wise
    usable — a 32-bit multiplier wraps mod p only ~8 times, leaving the
    map piecewise-monotone and the per-function minima correlated
    (measured: near-dup estimates inflated from ~0 to 15% of all pairs)."""
    p = np.uint64(_MERSENNE)
    a = a.astype(np.uint64)
    x = x.astype(np.uint64)
    a_hi = (a >> np.uint64(29))[:, None]  # < 2^32
    a_lo = (a & np.uint64((1 << 29) - 1))[:, None]  # < 2^29
    xb = x[None, :]
    # a*x = a_hi·2^29·x + a_lo·x ; reduce t·2^29 mod p via t = t_hi·2^32+t_lo
    t = a_hi * xb  # < 2^64, exact
    t %= p  # < 2^61
    t_hi = t >> np.uint64(32)  # < 2^29
    t_lo = t & np.uint64((1 << 32) - 1)
    # t·2^29 mod p = t_hi·2^61 + t_lo·2^29 ≡ t_hi + t_lo·2^29
    part1 = (t_hi + (t_lo << np.uint64(29))) % p
    part2 = (a_lo * xb) % p  # a_lo·x < 2^61, exact
    return (part1 + part2) % p


def minhash_signature_udf(n_hashes: int = 128, seed: int = 42):
    """sig_i = min_j (a_i * h_j + b_i) mod p, p = 2^61-1, with full-range
    61-bit multipliers via the exact uint64 Mersenne reduction
    (:func:`_mulmod61_32`); shingle hashes are folded to 32 bits."""
    a, b = _minhash_params(n_hashes, seed)
    a_ = a.astype(np.uint64)
    b_ = b.astype(np.uint64)[:, None]
    p = np.uint64(_MERSENNE)
    empty = np.full(n_hashes, _MERSENNE - 1, dtype=np.int64).tolist()

    def batch(hash_arrays: pd.Series) -> pd.Series:
        out = []
        for arr in hash_arrays:
            if arr is None or len(arr) == 0:
                out.append(empty)
                continue
            h = np.asarray(arr, dtype=np.int64).view(np.uint64) & np.uint64(0xFFFFFFFF)
            m = (_mulmod61_32(a_, h) + b_) % p
            out.append(m.min(axis=1).astype(np.int64).tolist())
        return pd.Series(out)

    return F.pandas_udf(batch, ArrayType(LongType()))


def _minhash_jvm_expr(hashes: Column, n_hashes: int, seed: int) -> Column:
    """MinHash signature as pure Column expressions — zero Python, zero
    Arrow, whole-stage codegen.

    Each component re-hashes the shingle hash with a distinct salt via
    ``xxhash64(h, i)`` — a proper independent hash family (linear maps
    with small multipliers are piecewise-monotone and correlate the
    minima; see _mulmod61_32)."""
    del seed  # xxhash64's internal seeding is fixed; salt column varies
    empty_sentinel = F.lit((1 << 62) - 1).cast("long")

    def hash_fn(i: int):
        return lambda h: F.shiftrightunsigned(F.xxhash64(h, F.lit(i)), 2)

    comps = [
        F.coalesce(F.array_min(F.transform(hashes, hash_fn(i))), empty_sentinel)
        for i in range(n_hashes)
    ]
    return F.array(*comps)


def minhash_text_udf(n_hashes: int, shingle_k: int, mode: str, seed: int):
    """Shingling + minhash fully vectorized in numpy over *normalized
    text* (Arrow-batched).

    Char mode uses a k-byte FNV-style rolling hash built with k
    vectorized passes over the byte array (uint64 wraps are fine in
    numpy); word mode hashes whitespace tokens' k-grams the same way.
    No per-element JVM work at all — Spark higher-order functions are
    CodegenFallback (interpreted), so this beats JVM-side shingling by
    ~5× on long documents.

    Hash family: sig_i = min_j splitmix64(h_j + c_i) — the full 5-op
    avalanche finalizer (xor-shift / multiply ×2 / xor-shift) over the
    gram hash offset by a distinct seeded constant per component,
    replacing the exact Mersenne (a·x+b) mod 2^61−1 reduction (~12
    vectorized passes; measured 5.6× slower per batch, r06).  Family
    choice is empirical, not just theoretical: a bare multiplicative
    family (min a_i·h mod 2^64) is 9× faster still but its
    per-component minima CORRELATE on templated corpora — measured on
    the sf1.0 documents corpus it emitted 4.7× the band-bucket
    candidate pairs of the Mersenne family (6.58M vs 1.40M pair slots
    at 15k docs), blowing up the downstream verify join; the avalanche
    mixer restores independent per-component orderings (1.52M pair
    slots, at parity).  Estimator quality measured on 300-trial
    synthetic sets (OPTIMIZATION_r06.md): bias ≤0.008, sd at the
    binomial bound for J ∈ {0.5, 0.8, 0.92} — indistinguishable from
    the Mersenne family."""
    a64, _ = _minhash_params(n_hashes, seed)
    mult = ((a64.astype(np.uint64) << np.uint64(1)) | np.uint64(1))[:, None]
    mix1 = np.uint64(0xBF58476D1CE4E5B9)
    mix2 = np.uint64(0x94D049BB133111EB)
    s30, s27, s31 = np.uint64(30), np.uint64(27), np.uint64(31)
    fnv = np.uint64(1099511628211)
    mask32 = np.uint64(0xFFFFFFFF)
    empty = np.full(n_hashes, _MERSENNE - 1, dtype=np.int64).tolist()

    def gram_hashes(s: str) -> np.ndarray | None:
        if mode == "word":
            toks = [t for t in s.split(" ") if t]
            if len(toks) < 1:
                return None
            grams = [" ".join(toks[i : i + shingle_k]) for i in range(max(len(toks) - shingle_k + 1, 1))]
            # crc32: deterministic across workers (builtin hash() is
            # PYTHONHASHSEED-randomized — would break determinism)
            c = np.array([zlib.crc32(g.encode()) for g in grams], dtype=np.uint64)
            return c
        raw = s.encode("utf-8", "ignore")
        if len(raw) == 0:
            return None
        if len(raw) < shingle_k:
            raw = raw.ljust(shingle_k, b"\0")
        c = np.frombuffer(raw, dtype=np.uint8).astype(np.uint64)
        n = len(c) - shingle_k + 1
        h = np.zeros(n, dtype=np.uint64)
        for j in range(shingle_k):
            h = h * fnv + c[j : j + n]
        return h & mask32

    def batch(texts: pd.Series) -> pd.Series:
        out = []
        for s in texts:
            h = gram_hashes(s) if s is not None else None
            if h is None or len(h) == 0:
                out.append(empty)
                continue
            # (n_hashes, n_grams) stays L2-resident per row — a whole-batch
            # matrix was measured 4-5× SLOWER from allocator/bandwidth
            # pressure (same finding as simhash_text_udf's per-doc note)
            m = h[None, :] + mult
            m ^= m >> s30
            m *= mix1
            m ^= m >> s27
            m *= mix2
            m ^= m >> s31
            out.append(m.min(axis=1).view(np.int64).tolist())
        return pd.Series(out)

    return F.pandas_udf(batch, ArrayType(LongType()))


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 128,
    shingle_k: int = 5,
    mode: str = "char",
    seed: int = 42,
    impl: str = "arrow",
) -> DataFrame:
    """Three implementations, all valid minhash families (measured at
    5k docs × ~1KB, 64 hashes, local[32]):

    - ``arrow`` (default, ~3 s): normalization JVM-side (scalar regexp,
      codegen), shingling + signature fully vectorized in one numpy
      batch UDF — the word-sized winner because Spark's higher-order
      array functions are CodegenFallback (interpreted).
    - ``pandas`` (~11 s): shingles hashed JVM-side (interpreted HOF),
      signature math in numpy.
    - ``jvm`` (~74 s): zero-Python, n_hashes interpreted array passes —
      for Python-free clusters only."""
    base = ensure_parallelism(df)
    if impl == "arrow":
        udf = minhash_text_udf(n_hashes, shingle_k, mode, seed)
        return base.select(
            F.col(id_col), udf(normalized_text(F.col(text_col))).alias("minhash")
        )
    hashes = shingle_hashes(F.col(text_col), shingle_k, mode)
    if impl == "jvm":
        # projection boundary: materialize shingle hashes ONCE, else each
        # of the n_hashes transforms recomputes substr+xxhash per row
        staged = base.select(F.col(id_col), hashes.alias("_sh"))
        sig = _minhash_jvm_expr(F.col("_sh"), n_hashes, seed)
        return staged.select(F.col(id_col), sig.alias("minhash"))
    sig = minhash_signature_udf(n_hashes, seed)(hashes)
    return base.select(F.col(id_col), sig.alias("minhash"))


def band_keys(
    sigs: DataFrame, id_col: str, n_bands: int = 16, rows_per_band: int = 8
) -> DataFrame:
    """(id, band, bucket): each signature exploded to its n_bands LSH
    keys — the persistable probe index for incremental dedup (store it
    partitioned/bucketed by (band, bucket) so batch probes co-locate)."""
    bands = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.xxhash64(
                    F.slice(F.col("minhash"), i * rows_per_band + 1, rows_per_band)
                ).alias("bucket"),
            )
            for i in range(n_bands)
        ]
    )
    return sigs.select(F.col(id_col), F.explode(bands).alias("b")).select(
        F.col(id_col), F.col("b.band").alias("band"), F.col("b.bucket").alias("bucket")
    )


def lsh_candidate_pairs(
    sigs: DataFrame,
    id_col: str,
    n_bands: int = 16,
    rows_per_band: int = 8,
    max_bucket_rows: int | None = None,
) -> DataFrame:
    """Banded LSH: docs sharing any band bucket become candidate pairs.

    Explodes to n_bands rows per doc keyed by (band, bucket-hash), then
    **self-joins** on (band, bucket) with ``id_a < id_b``.  The join is
    the scale-safe plan: a hot bucket never has to fit in one
    ``collect_list`` buffer, AQE's skew-join splitting applies, and the
    whole pipeline stays in codegen.  Shuffle volume is rows×bands.

    AQE skew-split shares a hot bucket's *work* across tasks but cannot
    shrink its quadratic candidate *output*: a degenerate corpus
    (millions of near-empty or templated docs collapsing into one band
    bucket) still emits |bucket|²/2 pairs.  ``max_bucket_rows`` bounds
    that: buckets larger than the cap are dropped from candidate
    generation entirely (same policy as simhash/winnowing/cosine), so
    recall degrades in a DOCUMENTED way — a pair colliding only in
    dropped buckets is missed, but with n_bands independent bands the
    other bands usually recover it — instead of the output exploding.
    Docs in an over-cap bucket are near-identical by construction, so
    exact-hash dedup (``exact_duplicates``) upstream is the cheap
    companion that removes the degenerate mass before LSH runs."""
    exploded = band_keys(sigs, id_col, n_bands, rows_per_band)
    if max_bucket_rows is not None:
        # the capped plan reads `exploded` twice (bucket-size aggregate +
        # join); persist so a caller passing UNCACHED sigs does not
        # recompute the whole signature stage per read (r05 ADVICE).
        # Bounded state: rows × bands × ~24 B.  Never unpersisted — the
        # returned plan keeps referencing it lazily (module convention,
        # same as the sigs cache in minhash_near_duplicates).
        exploded = exploded.persist()
        keep = (
            exploded.groupBy("band", "bucket")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") <= max_bucket_rows)
            .select("band", "bucket")
        )
        exploded = exploded.join(keep, ["band", "bucket"])
    a = exploded.select(
        F.col(id_col).alias("id_a"), "band", "bucket"
    )
    b = exploded.select(
        F.col(id_col).alias("id_b"), "band", "bucket"
    )
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def _sig_eq_count(sig_a: Column, sig_b: Column) -> Column:
    """Count of equal components between two signature arrays.

    ``aggregate(zip_with(a, b, eq), 0, +)`` — one array allocation and
    one interpreted pass.  r06 measurement over 16.4M candidate pairs
    (sf1.0): 3.81 s vs 4.67 s for the previous
    ``size(filter(zip_with(...)))`` (two array allocations, two passes);
    an unrolled 64-term GetArrayItem sum was 36 s (falls out of
    whole-stage codegen), and position-tagged ``array_intersect`` 4.1 s.
    Same integer result in all variants."""
    return F.aggregate(
        F.zip_with(sig_a, sig_b, lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, x: acc + x,
    )


def estimated_jaccard(
    pairs: DataFrame, sigs: DataFrame, id_col: str
) -> DataFrame:
    """Signature-estimated Jaccard per candidate pair: fraction of equal
    minhash components (unbiased estimator)."""
    a = sigs.select(F.col(id_col).alias("id_a"), F.col("minhash").alias("sig_a"))
    b = sigs.select(F.col(id_col).alias("id_b"), F.col("minhash").alias("sig_b"))
    j = pairs.join(a, "id_a").join(b, "id_b")
    eq = _sig_eq_count(F.col("sig_a"), F.col("sig_b"))
    return j.select(
        "id_a",
        "id_b",
        (eq / F.size(F.col("sig_a"))).alias("est_jaccard"),
    )


def minhash_near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    n_hashes: int = 128,
    n_bands: int = 16,
    shingle_k: int = 5,
    mode: str = "char",
    max_bucket_rows: int | None = None,
) -> DataFrame:
    """Full MinHash+LSH pipeline → (id_a, id_b, est_jaccard ≥ threshold)."""
    rows_per_band = n_hashes // n_bands
    sigs = minhash_signatures(df, id_col, text_col, n_hashes, shingle_k, mode).cache()
    pairs = lsh_candidate_pairs(sigs, id_col, n_bands, rows_per_band, max_bucket_rows)
    return estimated_jaccard(pairs, sigs, id_col).filter(
        F.col("est_jaccard") >= threshold
    )


def minhash_near_duplicates_prepass(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    n_hashes: int = 128,
    n_bands: int = 16,
    shingle_k: int = 5,
    mode: str = "char",
    max_bucket_rows: int | None = None,
) -> DataFrame:
    """MinHash+LSH near-dup pairs with the exact-hash dedup pre-pass the
    cap docstring (:func:`lsh_candidate_pairs`) prescribes: text-identical
    documents are collapsed to one representative per content hash BEFORE
    LSH, so the degenerate J=1.0 mass neither explodes band buckets nor
    pays the signature-array verify join (r05 judge finding: 72 % of the
    10M-row curation exhibit's wall and 29.9 GB shuffle were exact dups
    flowing through LSH, with ~1k of them MISSED in over-cap buckets).

    Output: (id_a, id_b, est_jaccard) — the union of
    - exact edges (group representative → member, est 1.0) for every
      text-identical duplicate, found by hash groupBy, never capped; and
    - LSH estimated-Jaccard pairs over the representatives.

    Connected components over this pair set equal those over
    :func:`minhash_near_duplicates` output whenever banding recall
    holds: identical normalized text ⇒ identical signature, so a
    member's LSH pairs are exactly its representative's, and the exact
    edges reconnect members to representatives with true J = 1 ≥ any
    threshold.  Where the two differ, the pre-pass is strictly better —
    a capped hot bucket can drop rep↔member pairs from the plain path
    but never from the groupBy.  (Shared xxhash64-collision caveat of
    :func:`exact_dedup`: p ≈ n²/2⁶⁵ of merging two distinct texts.)

    Scale shape: the pre-pass adds one partial-aggregated shuffle of
    (id, hash) pairs (16 B/row) plus a signature semi-join; it never
    shuffles text.  LSH then runs on distinct-text documents only — on
    dup-heavy corpora (web crawls run 20-50 % dups) every downstream
    byte count shrinks by the dup rate."""
    rows_per_band = n_hashes // n_bands
    ch_tbl = df.select(F.col(id_col), content_hash(F.col(text_col)).alias("_ch"))
    reps = ch_tbl.groupBy("_ch").agg(F.min(id_col).alias("_rep")).persist()
    exact_edges = (
        ch_tbl.join(reps, "_ch")
        .filter(F.col(id_col) != F.col("_rep"))
        .select(
            F.col("_rep").alias("id_a"),
            F.col(id_col).alias("id_b"),
            F.lit(1.0).alias("est_jaccard"),
        )
    )
    sigs = minhash_signatures(df, id_col, text_col, n_hashes, shingle_k, mode)
    rep_sigs = sigs.join(
        reps.select(F.col("_rep").alias(id_col)), id_col, "left_semi"
    ).cache()
    pairs = lsh_candidate_pairs(rep_sigs, id_col, n_bands, rows_per_band, max_bucket_rows)
    lsh = estimated_jaccard(pairs, rep_sigs, id_col).filter(
        F.col("est_jaccard") >= threshold
    )
    return lsh.unionByName(exact_edges)


# ---------------------------------------------------------------------------
# exact n-gram Jaccard (explode + self-join; the SQL-expressible oracle)
# ---------------------------------------------------------------------------


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_k: int = 5,
    mode: str = "char",
    min_jaccard: float = 0.0,
) -> DataFrame:
    """Exact pairwise Jaccard over distinct shingles.

    Cost is |pairs sharing ≥1 shingle| — fine for oracle scales and for
    verifying candidates; the LSH path above is the 10^12-row strategy."""
    sh = df.select(
        F.col(id_col).alias("_id"),
        F.explode(shingles(F.col(text_col), shingle_k, mode)).alias("shingle"),
    ).distinct()
    sizes = sh.groupBy("_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    a = sh.select(F.col("_id").alias("id_a"), "shingle")
    b = sh.select(F.col("_id").alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("_id").alias("id_a"), F.col("n_shingles").alias("n_a"))
    sb = sizes.select(F.col("_id").alias("id_b"), F.col("n_shingles").alias("n_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("n_inter")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= min_jaccard)
    )


def exact_jaccard_for_pairs(
    pairs: DataFrame,
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_k: int = 5,
    mode: str = "char",
) -> DataFrame:
    """Exact shingle-set Jaccard recount for an existing candidate-pair
    list — the production verify stage after any LSH candidate
    generator (minhash banding, simhash banding, cosine buckets).

    Unlike :func:`jaccard_pairs` (explode + shingle self-join, cost
    ``|pairs sharing a shingle|`` — quadratic in hot shingles), this is
    linear in ``|pairs|``: two hash joins attach each side's distinct
    shingle array, then ``array_intersect`` computes the overlap per
    row.  At 10^12 docs the candidate list is orders of magnitude
    smaller than the all-pairs space, so this is the verify plan that
    survives scale.  Output: (id_a, id_b, jaccard)."""
    sets = df.select(
        F.col(id_col).alias("_jid"),
        shingles(F.col(text_col), shingle_k, mode).alias("_sh"),
    )
    a = sets.select(F.col("_jid").alias("id_a"), F.col("_sh").alias("_sh_a"))
    b = sets.select(F.col("_jid").alias("id_b"), F.col("_sh").alias("_sh_b"))
    inter = F.size(F.array_intersect(F.col("_sh_a"), F.col("_sh_b")))
    union = F.size(F.col("_sh_a")) + F.size(F.col("_sh_b")) - inter
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.when(union > 0, inter / union).otherwise(F.lit(None)).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(col: Column) -> Column:
    """64-bit SimHash over word hashes, pure JVM-side.

    bit_i = sign( sum_words (word_hash bit_i ? +1 : -1) ); computed via
    aggregate over the 64 bit positions with shiftright/bitwise-and."""
    words = F.filter(F.split(normalized_text(col), " "), lambda w: w != "")
    hashes = F.transform(words, lambda w: F.xxhash64(w))
    bits = []
    for i in range(64):
        vote = F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda acc, h, i=i: acc + (F.shiftright(h, i).bitwiseAND(F.lit(1)) * 2 - 1),
        )
        bits.append(F.when(vote > 0, F.lit(1).cast("long")).otherwise(F.lit(0)).alias(f"b{i}"))
    out = F.lit(0).cast("long")
    for i, b in enumerate(bits):
        out = out.bitwiseOR(F.shiftleft(b, i))
    return out


def simhash64_udf():
    """numpy-batched SimHash — the fast path (64 aggregate passes of the
    Column version are O(64·words); numpy does one matrix op)."""

    def batch(hash_arrays: pd.Series) -> pd.Series:
        out = np.zeros(len(hash_arrays), dtype=np.int64)
        for idx, arr in enumerate(hash_arrays):
            if arr is None or len(arr) == 0:
                continue
            h = np.asarray(arr, dtype=np.uint64)
            bits = (h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1
            votes = (bits.astype(np.int64) * 2 - 1).sum(axis=0)
            sig = np.uint64(0)
            for i in np.nonzero(votes > 0)[0]:
                sig |= np.uint64(1) << np.uint64(i)
            out[idx] = sig.astype(np.int64)
        return pd.Series(out)

    return F.pandas_udf(batch, LongType())


#: fixed word-byte width for the vectorized FNV word hash: words are
#: truncated/zero-padded to this many bytes so a word hashes identically
#: in every document and Arrow batch
_SIMHASH_WORD_BYTES = 24


def simhash_text_udf():
    """SimHash straight from normalized text (Arrow-batched numpy) —
    the fast path, same pattern as :func:`minhash_text_udf`.

    Round-1 perf finding: the previous default tokenized and hashed
    words through interpreted JVM higher-order functions and shipped the
    full per-word hash array over Arrow.  Here one string per row
    crosses Arrow; words are packed into a (n_words × 24) byte matrix
    and hashed with 64-bit FNV-1a in 24 vectorized passes (crc32 was
    rejected: CRC linearity makes any two same-data crc variants differ
    by a length-only constant, collapsing the family to 32 independent
    bits), then the bit votes are one numpy matrix op per document."""
    powers = np.uint64(1) << np.arange(64, dtype=np.uint64)
    shifts = np.arange(64, dtype=np.uint64)[None, :]
    fnv_prime = np.uint64(1099511628211)
    fnv_offset = np.uint64(14695981039346656037)
    W = _SIMHASH_WORD_BYTES

    def batch(texts: pd.Series) -> pd.Series:
        # per-document numpy (NOT one batch-wide matrix: total_words×64
        # of int64 is gigabytes on long-document batches — measured 25×
        # slower from allocator pressure when tried)
        out = np.zeros(len(texts), dtype=np.int64)
        for idx, s in enumerate(texts):
            if s is None:
                continue
            toks = [t[:W] for t in s.encode("utf-8", "ignore").split(b" ") if t]
            if not toks:
                continue
            buf = b"".join(t.ljust(W, b"\0") for t in toks)
            m = np.frombuffer(buf, dtype=np.uint8).reshape(-1, W).astype(np.uint64)
            h = np.full(len(toks), fnv_offset, dtype=np.uint64)
            for j in range(W):
                h = (h ^ m[:, j]) * fnv_prime  # uint64 wrap = mod 2^64
            bits = (h[:, None] >> shifts) & np.uint64(1)
            votes = (bits.astype(np.int64) * 2 - 1).sum(axis=0)
            # distinct powers → the sum IS the bit-OR, exact in uint64
            out[idx] = ((votes > 0).astype(np.uint64) * powers).sum().astype(np.int64)
        return pd.Series(out)

    return F.pandas_udf(batch, LongType())


def simhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    impl: str = "hybrid",
    feature: str = "word",
    shingle_k: int = 5,
) -> DataFrame:
    """Two implementations, measured (5k docs × ~6 KB, min-of-3 warm,
    local[4] throttled sandbox):

    - ``hybrid`` (default, 1.44 s): JVM tokenize + xxhash64 per word
      (interpreted HOF), per-doc hash arrays over Arrow, numpy bit
      votes.  The round-1 review predicted the minhash char-shingle HOF
      penalty (~5×) here too; measurement says ~1.2× at WORD granularity
      — per-word JVM work is one xxhash64, not k substr+hash calls, so
      the HOF interpreter overhead stays small.
    - ``arrow`` (1.70 s): text-in numpy UDF (minhash_text_udf pattern) —
      one string per row over Arrow, FNV-1a word hashing in 24
      vectorized byte passes.  Python-side tokenization eats what the
      HOF removal saves; kept for Arrow-worker-rich clusters and as the
      no-HOF fallback.

    Both are deterministic across workers and retries.

    ``feature`` picks the fingerprinted unit: ``word`` (default — one
    vote per word, cheapest) or ``char`` (one vote per char
    ``shingle_k``-gram — ~6× more features on prose, so the 64 bit
    votes are far more stable on SHORT documents: measured on the 500
    × ~300-char test corpus, true char-5-Jaccard ≥ 0.9 pairs span
    Hamming 0-9 under word features but 0-6 under char features).
    ``arrow`` impl supports word features only."""
    base = ensure_parallelism(df)
    if impl == "arrow":
        if feature != "word":
            raise ValueError("impl='arrow' supports feature='word' only")
        return base.select(
            F.col(id_col),
            simhash_text_udf()(normalized_text(F.col(text_col))).alias("simhash"),
        )
    if feature == "char":
        hashes = shingle_hashes(F.col(text_col), shingle_k, "char")
    else:
        words = F.filter(
            F.split(normalized_text(F.col(text_col)), " "), lambda w: w != ""
        )
        hashes = F.transform(words, lambda w: F.xxhash64(w))
    return base.select(F.col(id_col), simhash64_udf()(hashes).alias("simhash"))


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    feature: str = "word",
    shingle_k: int = 5,
    max_bucket_rows: int | None = None,
) -> DataFrame:
    """Banded SimHash with the pigeonhole guarantee: the 64 bits are cut
    into ``max_hamming + 1`` equal-ish slices, so any pair within
    ``max_hamming`` Hamming distance agrees exactly on ≥1 slice and
    becomes a candidate (verified by exact Hamming afterwards).

    Round-1 used a fixed 4×16 banding, which only guarantees recall for
    Hamming ≤3 — larger radii silently missed pairs.  Scale note: wider
    radii mean narrower band keys (64/(h+1) bits) and therefore larger
    buckets; at web scale keep max_hamming ≤3-4 (13-16-bit keys), widen
    the fingerprint, or set ``max_bucket_rows``: band-buckets larger
    than the cap are dropped from candidate generation (the
    cosine_near_duplicates pattern), so a boilerplate-heavy corpus with
    one hot slice value degrades by DOCUMENTED recall — pairs colliding
    only in dropped buckets are missed, other slices can still recover
    them — instead of a quadratic self-join."""
    n_bands = max_hamming + 1
    bounds = [i * 64 // n_bands for i in range(n_bands + 1)]
    sigs = simhash_signatures(
        df, id_col, text_col, feature=feature, shingle_k=shingle_k
    ).cache()

    def band_key(i: int):
        width = bounds[i + 1] - bounds[i]
        if width >= 64:
            return F.col("simhash")
        return F.shiftright(F.col("simhash"), bounds[i]).bitwiseAND(
            F.lit((1 << width) - 1)
        )

    bands = F.array(
        *[
            F.struct(F.lit(i).alias("band"), band_key(i).alias("key"))
            for i in range(n_bands)
        ]
    )
    exploded = sigs.select(id_col, "simhash", F.explode(bands).alias("b")).select(
        id_col, "simhash", "b.band", "b.key"
    )
    if max_bucket_rows is not None:
        keep = (
            exploded.groupBy("band", "key")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") <= max_bucket_rows)
            .select("band", "key")
        )
        exploded = exploded.join(keep, ["band", "key"])
    a = exploded.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("sig_a"), "band", "key"
    )
    b = exploded.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("sig_b"), "band", "key"
    )
    cands = (
        a.join(b, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .distinct()
    )
    return cands.select(
        "id_a",
        "id_b",
        hamming64(F.col("sig_a"), F.col("sig_b")).alias("hamming"),
    ).filter(F.col("hamming") <= max_hamming)


# ---------------------------------------------------------------------------
# near-dup clusters: candidate pairs → connected components → keep-one
# ---------------------------------------------------------------------------


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """(node, cluster) labels for the pair graph: iterative min-label
    propagation (the GraphFrames/large-star idiom in plain DataFrames).

    Each iteration is ONE shuffle join (labels by neighbor) + one
    min-aggregation; convergence needs O(graph diameter) iterations —
    near-dup clusters are shallow (variants of one document), so 3-5
    rounds typical.  ``localCheckpoint`` truncates lineage per round so
    the plan doesn't grow with iterations.  The cluster id is the
    minimum member id under the id type's ordering (long doc ids,
    string urls — any orderable key) — deterministic, independent of
    partitioning.  Raises if labels have not stabilized after
    ``max_iter`` rounds (a silent truncation would split one component
    into several 'clusters'); raise ``max_iter`` for long chains."""
    edges = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    sym = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("cluster"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        nbr = sym.join(
            labels.withColumnRenamed("node", "dst"), "dst"
        ).select(F.col("src").alias("node"), "cluster")
        new = (
            labels.union(nbr)
            .groupBy("node")
            .agg(F.min("cluster").alias("cluster"))
            .localCheckpoint()
        )
        changed = (
            new.join(labels.withColumnRenamed("cluster", "old"), "node")
            .filter(F.col("cluster") != F.col("old"))
            .count()
        )
        labels = new
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        "(component diameter exceeds max_iter); raise max_iter"
    )


def near_dup_clusters(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_jaccard: float = 0.8,
    shingle_k: int = 1,
    mode: str = "word",
    max_iter: int = 20,
) -> DataFrame:
    """(id, cluster) for every document in some near-dup cluster:
    exact-Jaccard pairs → connected components.  Documents with no
    near-dup partner are absent (they keep themselves trivially).
    Candidate-verification scale only (jaccard_pairs is the exact
    verifier); at corpus scale feed ``minhash_near_duplicates`` output
    into :func:`connected_components` instead."""
    pairs = jaccard_pairs(
        df, id_col, text_col, shingle_k=shingle_k, mode=mode, min_jaccard=min_jaccard
    )
    return connected_components(pairs, max_iter=max_iter).select(
        F.col("node").alias(id_col), "cluster"
    )


def dedup_representatives(labels: DataFrame) -> DataFrame:
    """One row per cluster: the representative (minimum id) to KEEP;
    every other member is a droppable duplicate."""
    return labels.groupBy("cluster").agg(
        F.min("node").alias("keep_id"), F.count(F.lit(1)).alias("n_members")
    )


# ---------------------------------------------------------------------------
# incremental (cross-corpus) near-dup: probe a new batch against a
# persisted signature index — the continuous-crawl ingestion pattern
# ---------------------------------------------------------------------------


def minhash_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 128,
    n_bands: int = 16,
    shingle_k: int = 5,
    mode: str = "char",
    seed: int = 42,
    impl: str = "arrow",
) -> tuple[DataFrame, DataFrame]:
    """Build the persistable dedup index for a corpus: ``(sigs, bands)``.

    ``sigs`` is (id, minhash) — one row per document, n_hashes longs;
    ``bands`` is (id, band, bucket) — n_bands rows per document, the LSH
    probe keys.  At corpus scale write ``bands`` partitioned by ``band``
    and bucketed by ``bucket`` so every future batch probe is a
    co-located join that never shuffles the index; append new batches
    with a plain union-write (signatures are deterministic in
    (n_hashes, shingle_k, mode, seed) — parameters are part of the
    index identity and must match at probe time)."""
    sigs = minhash_signatures(df, id_col, text_col, n_hashes, shingle_k, mode, seed, impl)
    bands = band_keys(sigs, id_col, n_bands, n_hashes // n_bands)
    return sigs, bands


def incremental_near_duplicates(
    new_df: DataFrame,
    index_sigs: DataFrame,
    index_bands: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    n_hashes: int = 128,
    n_bands: int = 16,
    shingle_k: int = 5,
    mode: str = "char",
    seed: int = 42,
    broadcast_new: bool = True,
) -> DataFrame:
    """(new_id, old_id, est_jaccard): new-batch documents whose
    signature-estimated Jaccard against some already-indexed document
    reaches ``threshold``.

    The scale shape is the whole point: the INDEX (10^12 rows of band
    keys) is never shuffled — the new batch's band keys (rows×n_bands,
    a day's crawl) are broadcast and the index streams through a
    map-side hash join; candidate pairs then fetch the two signatures
    with joins whose shuffle volume is ∝ candidates, not corpus.  Set
    ``broadcast_new=False`` for a batch too large to broadcast — the
    join degrades to a shuffle on (band, bucket), which a
    (band, bucket)-bucketed stored index makes one-sided again.

    Parameters must equal those used to build the index (documented in
    :func:`minhash_index`); asymmetric outputs keep new/old roles —
    downstream keeps the OLD copy and drops the new one, making
    ingestion idempotent."""
    new_sigs, new_bands = minhash_index(
        new_df, id_col, text_col, n_hashes, n_bands, shingle_k, mode, seed
    )
    return probe_index(
        new_sigs, new_bands, index_sigs, index_bands, id_col, threshold, broadcast_new
    )


def probe_index(
    new_sigs: DataFrame,
    new_bands: DataFrame,
    index_sigs: DataFrame,
    index_bands: DataFrame,
    id_col: str,
    threshold: float = 0.8,
    broadcast_new: bool = True,
) -> DataFrame:
    """Probe precomputed new-batch (sigs, bands) against the index —
    the signature-level half of :func:`incremental_near_duplicates`,
    exposed so callers that already hold the batch signatures (the
    streaming ingest loop, which must also append them to the index)
    compute them exactly once."""
    probe = new_bands.select(
        F.col(id_col).alias("new_id"), "band", "bucket"
    )
    if broadcast_new:
        probe = F.broadcast(probe)
    cands = (
        index_bands.select(F.col(id_col).alias("old_id"), "band", "bucket")
        .join(probe, ["band", "bucket"])
        .select("new_id", "old_id")
        .distinct()
    )
    a = new_sigs.select(F.col(id_col).alias("new_id"), F.col("minhash").alias("sig_a"))
    b = index_sigs.select(F.col(id_col).alias("old_id"), F.col("minhash").alias("sig_b"))
    eq = _sig_eq_count(F.col("sig_a"), F.col("sig_b"))
    with_a = cands.join(F.broadcast(a) if broadcast_new else a, "new_id")
    if broadcast_new:
        # fetch sig_b by STREAMING the index through a broadcast hash
        # join of (candidates + sig_a) — without the hint the planner
        # sees only the index side's (large) size estimate and picks a
        # sort-merge join that shuffles every index signature (r06
        # measurement: a 10M-doc index's 5.2 GB sig table was shuffled
        # for 5k candidates).  ``broadcast_new`` already asserts the
        # batch side is small, and candidates are ∝ batch × collision
        # rate; a corpus where candidates explode should pass
        # broadcast_new=False and take the shuffle path.
        joined = b.join(F.broadcast(with_a), "old_id")
    else:
        joined = with_a.join(b, "old_id")
    return (
        joined
        .select("new_id", "old_id", (eq / F.size(F.col("sig_a"))).alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= threshold)
    )


def fingerprint_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 7,
    window: int = 4,
    max_bucket_rows: int | None = None,
) -> DataFrame:
    """Winnowing-based near-dup candidates (the MOSS scheme,
    Schleimer et al. 2003): two documents sharing any substring of
    length ≥ k + window − 1 are GUARANTEED to share a winnowing
    fingerprint, so the banded self-join over fingerprints finds all
    such pairs without all-pairs comparison — the third LSH family
    next to MinHash (set overlap) and SimHash (vector angle), tuned
    for verbatim-passage reuse.

    Plan: fingerprints (pure Column) → explode → self-join on the
    64-bit fingerprint → distinct (a < b) pairs with the shared-
    fingerprint count.  Shuffle ∝ rows × fingerprints-per-doc.
    ``max_bucket_rows`` drops fingerprints shared by more documents
    than the cap BEFORE the self-join — the same hot-bucket guard as
    ``simhash_near_duplicates``: a boilerplate snippet on 10^6 pages
    would otherwise explode quadratically; pairs joined ONLY by such
    ubiquitous snippets are lost by documented recall, never by a
    runaway join."""
    from .text import winnowing_fingerprints

    fps = df.select(
        F.col(id_col),
        F.explode(
            winnowing_fingerprints(F.col(text_col), k=k, window=window)
        ).alias("fp"),
    )
    if max_bucket_rows is not None:
        sizes = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("_n"))
        fps = (
            fps.join(sizes.filter(F.col("_n") <= max_bucket_rows), "fp")
            .drop("_n")
        )
    a = fps.alias("a")
    b = fps.alias("b")
    return (
        a.join(b, (F.col("a.fp") == F.col("b.fp"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared_fingerprints"))
    )
