"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine near-dup.

Scale-first shapes (the whole point at 100 TB):
- exact dedup is one hash-groupBy (map-side combined);
- pairwise similarity NEVER enumerates O(n^2): candidates come from an
  inverted index (shared shingle / LSH band bucket / sign-LSH embedding
  bucket) self-join, so cost tracks the true near-dup density;
- every hash is deterministic (md5 / xxhash64 of content + salt), so runs
  are reproducible and the pytest/DuckDB oracles can recompute them.

The reference has only id-set dedup (reference gea_qa_agent_chroma.py:
222-245, ``added_ids``); this module is the training-pipeline extension
surface the task brief requires.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.window import Window
from pyspark.sql.types import LongType

# --- storage ownership -----------------------------------------------------


def _own(result: DataFrame, *indexes: DataFrame) -> DataFrame:
    """Attach persisted intermediates to the result they serve.

    Pair operators materialize a small index (hashed shingles, simhash
    signatures) that several branches of one plan replay from. A bare
    ``cache()`` would pin that index in executor storage for the session
    (the round-2 hygiene defect); instead the index rides on the result
    DataFrame as ``owned_storage``, so its lifetime is the result's —
    consumers call :func:`release_owned_storage` when done (pinned by
    test_dedup_operators_release_storage). Persist (not checkpoint) keeps
    lineage intact: a released-then-reused result silently recomputes
    instead of failing, and executor loss on a real cluster recovers."""
    result.owned_storage = indexes
    return result


def release_owned_storage(df: DataFrame) -> None:
    """Unpersist every index an operator pinned on behalf of ``df``."""
    for h in getattr(df, "owned_storage", ()):  # absent -> no-op
        h.unpersist()
    df.owned_storage = ()

# --- exact -----------------------------------------------------------------


def content_key(col: Column) -> Column:
    """THE content address of a document: md5 of the null-coalesced text.

    Every dedup surface — batch exact dedup, duplicate histograms, and
    the streaming ingest dedup (streaming/dedupe.py) — keys on this one
    expression, so "duplicate" means the same thing everywhere by
    construction."""
    return F.md5(F.coalesce(col, F.lit("")))


def exact_dedup(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Keep one row per distinct text (lowest id wins is NOT guaranteed by
    dropDuplicates; we make the survivor deterministic via min over a
    window-free groupBy + join back on the content hash)."""
    h = content_key(F.col(text_col))
    first_cols = [c for c in df.columns]
    keyed = df.withColumn("__h", h)
    survivors = keyed.groupBy("__h").agg(
        F.min(F.struct(*first_cols)).alias("__row"))
    return survivors.select("__row.*")


def duplicate_groups(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(content_hash, n_copies) for every text with more than one copy."""
    return (df.groupBy(content_key(F.col(text_col)).alias("content_hash"))
              .agg(F.count("*").alias("n_copies"))
              .where(F.col("n_copies") > 1))


# --- shingling -------------------------------------------------------------


def shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(id, shingle) — distinct word n-grams per document, JVM-side.

    Built from split + transform over index range + array_distinct, then
    explode — no Python. Documents shorter than n words yield their whole
    token string as the single shingle.
    """
    return df.select(F.col(id_col).alias("id"),
                     F.explode(_shingle_array(text_col, n)).alias("shingle"))


def shingle_hashes(df: DataFrame, id_col: str, text_col: str,
                   n: int = 3) -> DataFrame:
    """(id, shingle: long) — xxhash64 of each distinct word n-gram.

    The fixed-width twin of :func:`shingles` for set-similarity math:
    Jaccard needs only EQUALITY of shingles (intersection counts, set
    sizes, document-frequency caps), never their text, so 8-byte hashes
    carry the full signal at a bounded per-row cost. At 100 TB the raw
    shingle relation is ~n x the corpus size (every token appears in n
    shingles); the hashed relation is 16 bytes/row regardless of token
    length — the difference between a cacheable index and a disk-thrashing
    one. Distinct raw shingles collide at the 64-bit birthday bound
    (~2^-24 per billion distinct shingles), the standard web-dedup
    approximation.
    """
    return df.select(
        F.col(id_col).alias("id"),
        F.explode(F.transform(_shingle_array(text_col, n),
                              lambda g: F.xxhash64(g))).alias("shingle"))


# --- n-gram Jaccard --------------------------------------------------------


def ngram_jaccard_pairs(df: DataFrame, id_col: str, text_col: str,
                        n: int = 3, threshold: float = 0.5,
                        max_shingle_df: int | None = 128) -> DataFrame:
    """(id_a, id_b, jaccard) for pairs above threshold, id_a < id_b.

    Inverted-index join: pairs must share >= 1 shingle, so the self-join
    fans out only where overlap exists. |A ∩ B| = count of shared distinct
    shingles; |A ∪ B| = |A| + |B| - ∩. Three shuffles total (shingle
    build, pair count, size join) — all key-partitioned, AQE-coalesced.

    ``max_shingle_df`` caps shingle DOCUMENT FREQUENCY before the
    self-join: a shingle shared by d documents creates an O(d^2) pair
    bucket, so one corpus-common boilerplate phrase (d = 10^6 at 100 TB)
    would otherwise materialize 10^12 pairs in a single stage. Shingles
    with df > cap are removed from BOTH the intersection and the set
    sizes (a consistent Jaccard over the rare-shingle subsets — high-df
    shingles carry no near-dup signal, the standard web-dedup
    approximation). None disables the cap. The adversarial hot-shingle
    test (tests/test_analytics_ops.py) pins the bound.

    Storage hygiene: the shingle index is persisted ONCE as FIXED-WIDTH
    (id, xxhash64) longs — the hot-df aggregation, the size aggregation,
    and both self-join sides replay from those 16-byte rows instead of
    re-running the shingle build (or caching raw strings, which at 100 TB
    is larger than the corpus itself: every token appears in n shingles).
    The index is owned by the RESULT, not the session — see
    :func:`release_owned_storage`.
    """
    index = shingle_hashes(df, id_col, text_col, n) \
        .persist(StorageLevel.MEMORY_AND_DISK)
    sh = index
    if max_shingle_df is not None:
        hot = (sh.groupBy("shingle")
                 .agg(F.count("*").alias("df"))
                 .where(F.col("df") > max_shingle_df)
                 .select("shingle"))
        sh = sh.join(F.broadcast(hot), "shingle", "left_anti")
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
                    & (F.col("a.id") < F.col("b.id")))
             .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
             .agg(F.count("*").alias("n_inter")))
    return _own(
        inter
        .join(sizes.withColumnRenamed("id", "id_a")
                   .withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b")
                   .withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn("jaccard",
                    F.round(F.col("n_inter").cast("double")
                            / (F.col("sz_a") + F.col("sz_b")
                               - F.col("n_inter")), 6))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard"), index)


# --- MinHash + LSH ---------------------------------------------------------


def _shingle_array(text_col: str, n: int):
    """Distinct word-n-gram array as a single column expression."""
    toks = F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+")
    k = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1))
    grams = F.transform(F.sequence(F.lit(0), k - 1),
                        lambda i: F.array_join(F.slice(toks, i + 1, n), " "))
    return F.filter(F.array_distinct(grams), lambda g: F.length(g) > 0)


MINHASH_PRIME = 2147483647  # 2^31 - 1 (Mersenne prime)


def minhash_coeffs(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) for the affine min-hash family, derived
    from md5 so any engine can re-derive them (they are inlined as
    literals on both the Spark and the DuckDB side)."""
    out = []
    for i in range(num_hashes):
        a = int(hashlib.md5(f"a{i}".encode()).hexdigest()[:8], 16) \
            % (MINHASH_PRIME - 1) + 1
        b = int(hashlib.md5(f"b{i}".encode()).hexdigest()[:8], 16) \
            % MINHASH_PRIME
        out.append((a, b))
    return out


def minhash_signatures(df: DataFrame, id_col: str, text_col: str,
                       n: int = 3, num_hashes: int = 8) -> DataFrame:
    """(id, sig: array<long>) — per-document MinHash signature.

    ONE md5 per shingle (base = its first 15 hex digits as an integer),
    then ``num_hashes`` cheap affine permutations h_i = (a_i*(base mod p)
    + b_i) mod p over the 2^31-1 Mersenne prime — the standard universal-
    hash min-hash family. At 100 TB hashing volume IS the cost of MinHash,
    so this is num_hashes x cheaper than hashing every (shingle, i) pair,
    and every value stays exactly recomputable in DuckDB
    (CAST('0x'||hex AS BIGINT) + the same modular arithmetic; all
    intermediates < 2^62, no overflow on either engine).

    Execution shape: entirely MAP-SIDE — the min runs inside per-row
    ``array_min(transform(...))`` over the document's shingle array: no
    explode, no shuffle, no aggregation state; one scan total. Documents
    with no non-empty shingles produce no row.
    """
    grams = _shingle_array(text_col, n)

    def _base(g):
        return F.pmod(
            F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast("long"),
            F.lit(MINHASH_PRIME))

    bases = F.transform(grams, _base)
    coeffs = minhash_coeffs(num_hashes)
    init = F.array(*[F.lit(MINHASH_PRIME)] * num_hashes).cast("array<bigint>")

    def _fold(acc, h):
        # all num_hashes running minima advance in ONE pass over the bases
        # array. CRITICAL plan property: the bases/shingle expression is
        # referenced exactly ONCE — Catalyst's projection collapse inlines
        # multiply-referenced projection columns, so the naive
        # "array_min(transform(bases, ...)) per hash" shape silently
        # recomputes the whole shingle+md5 pipeline num_hashes times
        # (measured 5x wall on this expression).
        return F.array(*[
            F.least(acc[i], F.pmod(F.lit(a) * h + F.lit(b),
                                   F.lit(MINHASH_PRIME)))
            for i, (a, b) in enumerate(coeffs)])

    sig = F.aggregate(bases, init, _fold)
    # empty-shingle rows (== text that trims to nothing) produce no row;
    # the cheap trim test avoids re-evaluating the shingle build in the
    # filter (same projection-collapse trap)
    nonempty = F.length(F.trim(F.coalesce(F.col(text_col), F.lit("")))) > 0
    return df.where(nonempty).select(F.col(id_col).alias("id"),
                                     sig.alias("sig"))


def minhash_lsh_pairs(df: DataFrame, id_col: str, text_col: str,
                      n: int = 3, num_hashes: int = 8, bands: int = 4,
                      max_bucket_size: int | None = None) -> DataFrame:
    """Candidate near-dup pairs: equal LSH band -> bucket self-join.

    bands of rows r = num_hashes/bands; band key = md5(concat of the band's
    row hashes). Returns (id_a, id_b, n_bands_shared).

    ``max_bucket_size`` bounds the one quadratic shape LSH has: a bucket
    of m near-identical documents emits C(m,2) pairs. Over-cap buckets
    emit a star on the bucket's min id instead (m-1 pairs) — linear, and
    component-preserving for downstream clustering. ``n_bands_shared``
    still counts every band a surviving pair met in (star edges from
    over-cap bands AND clique edges from under-cap bands both
    contribute); what the cap removes is non-hub pairs of over-cap
    buckets. None (default) keeps exact clique output.

    The signature DF is repartitioned before the band build: the band
    structs reference ``sig`` 2 x bands times, and Catalyst's projection
    collapse would otherwise inline (= recompute) the whole
    shingle+hash pipeline per reference; the Exchange materializes the
    tiny (id, sig) rows once — the cheap side of that trade at any scale.
    """
    rows = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, n, num_hashes)
    sig = sig.repartition(sig.sparkSession.sparkContext.defaultParallelism,
                          "id")
    band_cols = [
        F.struct(F.lit(bi).alias("band"),
                 F.md5(F.concat_ws("|", *[F.col("sig")[bi * rows + ri]
                                          for ri in range(rows)]))
                 .alias("key"))
        for bi in range(bands)]
    buckets = sig.select("id", F.explode(F.array(*band_cols)).alias("b")) \
                 .select("id", "b.band", "b.key")
    if max_bucket_size is not None:
        # a bucket of m near-identical documents (boilerplate clusters —
        # the common case a dedup pipeline exists for) would emit
        # C(m,2) pairs: quadratic in the cluster, the same pathology
        # measured on the fixed simhash geometry. Over-cap buckets emit a
        # STAR instead — every member paired with the bucket's min id —
        # which is linear and preserves exactly the connectivity that
        # downstream connected-components clustering consumes (same
        # components, by construction). groupBy (map-side combined), not
        # a window, so the hot bucket never serializes onto one task.
        stats = (buckets.groupBy("band", "key")
                 .agg(F.count("*").alias("__m"), F.min("id").alias("__hub")))
        big = stats.where(F.col("__m") > max_bucket_size) \
                   .select("band", "key", "__hub")
        star = (buckets.join(big, ["band", "key"])
                .where(F.col("id") != F.col("__hub"))
                .select("id", "band", "key",
                        F.col("__hub").alias("__pair_with")))
        buckets = buckets.join(big.select("band", "key"), ["band", "key"],
                               "left_anti")
        a, b = buckets.alias("a"), buckets.alias("b")
        clique_pairs = (a.join(b, (F.col("a.band") == F.col("b.band"))
                        & (F.col("a.key") == F.col("b.key"))
                        & (F.col("a.id") < F.col("b.id")))
                        .select(F.col("a.id").alias("id_a"),
                                F.col("b.id").alias("id_b")))
        star_pairs = star.select(F.col("__pair_with").alias("id_a"),
                                 F.col("id").alias("id_b"))  # hub = min
        return (clique_pairs.unionByName(star_pairs)
                .groupBy("id_a", "id_b")
                .agg(F.count("*").alias("n_bands_shared")))
    a, b = buckets.alias("a"), buckets.alias("b")
    return (a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.key") == F.col("b.key"))
                   & (F.col("a.id") < F.col("b.id")))
            .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .agg(F.count("*").alias("n_bands_shared")))


# --- SimHash ---------------------------------------------------------------


def simhash_py(text: str | None, bits: int = 64) -> int:
    """64-bit SimHash over whitespace tokens (md5-derived token hashes).

    Pure Python, shared with the pytest oracle; returned as a SIGNED int64
    (two's complement) so it fits Spark LongType.
    """
    if not text:
        return 0
    from pdf_parser_spark.operators.textstats import ascii_tokens
    tokens = ascii_tokens(text)
    if not tokens:
        return 0
    acc = [0] * bits
    for t in tokens:
        h = int.from_bytes(hashlib.md5(t.encode("utf-8")).digest()[:8], "big")
        for i in range(bits):
            acc[i] += 1 if (h >> i) & 1 else -1
    v = 0
    for i in range(bits):
        if acc[i] > 0:
            v |= 1 << i
    if v >= 1 << 63:
        v -= 1 << 64
    return v


def _simhash_series(s: pd.Series) -> pd.Series:
    """Vectorized twin of :func:`simhash_py` (bit votes in numpy; md5
    stays hashlib). Equality with the scalar oracle is pinned by tests.

    The token-hash table is MEMOIZED ACROSS THE ARROW BATCH: token
    frequencies are Zipfian, so most occurrences in a few-thousand-row
    batch hit tokens already hashed — md5 (the dominant cost of SimHash)
    runs once per distinct token per batch instead of once per
    occurrence. Values are unchanged by construction (same hash per
    token, same per-occurrence votes); memory is bounded by the batch's
    distinct-token count."""
    import numpy as np

    from pdf_parser_spark.operators.textstats import ascii_tokens

    memo: dict[str, int] = {}
    shifts = np.arange(64, dtype=np.uint64)
    weights = np.uint64(1) << shifts
    out = np.zeros(len(s), dtype=np.int64)
    for j, text in enumerate(s.tolist()):
        if not text:
            continue
        tokens = ascii_tokens(text)
        if not tokens:
            continue
        hs = np.empty(len(tokens), dtype=np.uint64)
        for k, t in enumerate(tokens):
            v = memo.get(t)
            if v is None:
                v = int.from_bytes(
                    hashlib.md5(t.encode("utf-8")).digest()[:8], "big")
                memo[t] = v
            hs[k] = v
        bits = (hs[:, None] >> shifts) & np.uint64(1)
        ones = bits.sum(axis=0)
        # vote > 0  <=>  ones > n_tokens - ones
        v = int(np.bitwise_or.reduce(weights[2 * ones > len(tokens)],
                                     initial=np.uint64(0)))
        out[j] = v - (1 << 64) if v >= 1 << 63 else v
    return pd.Series(out)


simhash_udf = pandas_udf(_simhash_series, LongType())


def hamming_distance(a: Column, b: Column) -> Column:
    """popcount(a XOR b) as a JVM expression (bit_count on xor)."""
    return F.bit_count(a.bitwiseXOR(b))


def _band_specs(n_tables: int) -> list[tuple[int, int]]:
    """(shift, width) per band: 64 bits split as evenly as possible."""
    base, rem = divmod(64, n_tables)
    specs, lo = [], 0
    for i in range(n_tables):
        width = base + (1 if i < rem else 0)
        specs.append((lo, width))
        lo += width
    return specs


def simhash_band_buckets(sh: DataFrame, max_hamming: int = 3,
                         n_tables: int | None = None,
                         n_blocks: int | None = None) -> DataFrame:
    """(id, sh, band, key) — one row per blocking table for each hash of
    an (id, sh) DataFrame, under the combination construction documented
    on :func:`simhash_pairs_from_hashes`. Shared by the batch self-join
    and the streaming ingest path (batch-vs-signature-store join), so the
    two agree on the blocking by construction."""
    import itertools

    n_blocks = n_blocks or n_tables or (max_hamming + 1)
    if n_blocks <= max_hamming:
        raise ValueError(
            f"n_blocks={n_blocks} must exceed max_hamming={max_hamming} "
            "(pigeonhole needs an uncorrupted block combination)")
    specs = _band_specs(n_blocks)
    combos = list(itertools.combinations(range(n_blocks),
                                         n_blocks - max_hamming))

    def _key(combo):
        # concatenated bits of the combo's blocks, packed into one long
        key = None
        for bi in combo:
            lo, width = specs[bi]
            piece = F.shiftrightunsigned(F.col("sh"), lo) \
                     .bitwiseAND(F.lit((1 << width) - 1))
            key = piece if key is None else \
                F.shiftleft(key, width).bitwiseOR(piece)
        return key

    bands = F.array(*[
        F.struct(F.lit(ti).alias("band"), _key(combo).alias("key"))
        for ti, combo in enumerate(combos)])
    return (sh.select("id", "sh", F.explode(bands).alias("b"))
              .select("id", "sh", "b.band", "b.key"))


def simhash_pairs_from_hashes(sh: DataFrame, max_hamming: int = 3,
                              n_tables: int | None = None,
                              n_blocks: int | None = None) -> DataFrame:
    """(id_a, id_b, hamming) over an (id, sh) DataFrame of 64-bit simhashes.

    Combination blocking (Manku/Jain/Sarma, WWW 2007 — the construction
    Google's web near-dup system published): the 64 bits split into
    ``n_blocks`` contiguous blocks; a table is keyed on each
    C(n_blocks, n_blocks - max_hamming) combination of n_blocks - k
    blocks. Two hashes within hamming distance k corrupt at most k
    blocks, so some (n_blocks - k)-block combination is untouched and
    matches EXACTLY — recall 1.0 by pigeonhole, for ANY n_blocks > k.
    Candidates are verified with exact popcount(xor).

    ``n_blocks`` is the scale dial, and it matters QUADRATICALLY: with
    the minimum n_blocks = k + 1 (single-block keys, 64/(k+1) bits) a
    bucket holds ~n/2^16 rows at k=3, so candidate volume grows n^2 —
    measured as a 4-straggler-task stage at 6.3M docs (~1.2G candidate
    pairs). n_blocks = 5 keys tables on ~25 bits (C(5,2) = 10 tables):
    32x fewer per-bucket collisions for 2.5x the explode — candidates
    fall back to ~O(n) at tens of millions of docs. The legacy
    ``n_tables`` parameter is an alias for minimum-geometry n_blocks.

    The 100 TB shape is explode(tables) -> shuffle on (band, key) ->
    within-bucket self-join; never O(n^2) when n_blocks matches scale
    (see simhash_dup_pairs for the auto rule).
    """
    buckets = simhash_band_buckets(sh, max_hamming, n_tables, n_blocks)
    a, b = buckets.alias("a"), buckets.alias("b")
    return (a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.key") == F.col("b.key"))
                   & (F.col("a.id") < F.col("b.id")))
            .withColumn("hamming",
                        hamming_distance(F.col("a.sh"), F.col("b.sh")))
            .where(F.col("hamming") <= max_hamming)
            .select(F.col("a.id").alias("id_a"),
                    F.col("b.id").alias("id_b"), "hamming")
            .distinct())  # a pair can agree on several bands


def simhash_dup_pairs(df: DataFrame, id_col: str, text_col: str,
                      max_hamming: int = 3, n_tables: int | None = None,
                      n_blocks: int | None = None) -> DataFrame:
    """Near-dup pairs by SimHash over a text column (see
    :func:`simhash_pairs_from_hashes` for the guaranteed-recall blocking).

    The (id, sh) signatures are persisted once: the blocking self-join
    would otherwise evaluate the simhash UDF once per join side AND once
    more per side for the extracted isnotnull(key) filter (4 full UDF
    passes, visible as repeated ArrowEvalPython nodes in the plan).
    16 bytes/doc is materializable at any scale; one Python pass is the
    whole point. The signature store is owned by the RESULT, not the
    session — see :func:`release_owned_storage`.

    When no block geometry is forced, it is AUTO-SCALED from the corpus
    count (the count materializes the signature persist it needs anyway):
    minimum blocks (k+1, widest tables-fewest) up to 2M docs, 5 blocks to
    50M, 6 beyond — keeping expected bucket occupancy O(1) so candidate
    volume stays ~linear instead of quadratic in n (measured: the fixed
    16-bit geometry hit ~1.2G candidates at 6.3M docs). Deterministic
    for a given corpus; recall 1.0 at every setting."""
    sh = df.select(F.col(id_col).alias("id"),
                   simhash_udf(F.col(text_col)).alias("sh")) \
           .persist(StorageLevel.MEMORY_AND_DISK)
    if n_blocks is None and n_tables is None:
        n = sh.count()
        auto = 4 if n <= 2_000_000 else (5 if n <= 50_000_000 else 6)
        n_blocks = max(auto, max_hamming + 1)
    return _own(simhash_pairs_from_hashes(sh, max_hamming, n_tables,
                                          n_blocks), sh)


# --- near-dup components (pair graph -> cluster assignment) ---------------


def connected_components(pairs: DataFrame, id_a: str = "id_a",
                         id_b: str = "id_b", max_iter: int = 25) -> DataFrame:
    """(id, component) for every vertex of the pair graph; component =
    the minimum id reachable from the vertex.

    Candidate-pair lists alone do not deduplicate a corpus — transitive
    near-dups (A~B, B~C) must collapse into one cluster with one survivor.
    Each round does min-label propagation (every vertex adopts the minimum
    label among itself and its neighbors) PLUS pointer jumping (it also
    adopts its current label's own label), so the effective propagation
    distance doubles per round: ``max_iter`` rounds cover components of
    diameter ~2^max_iter, not max_iter — a 30-revision chain converges in
    ~5 rounds, and no realistic cluster shape can exhaust the default
    budget. If the fixpoint is still not reached the function RAISES
    instead of returning silently-split components (which would make
    ``dedup_by_components`` keep several "survivors" of one cluster).
    Per round: two key-partitioned joins + one map-side-combined groupBy;
    plans are cut per round with an eager ``localCheckpoint`` (the
    standard iterative-DataFrame pattern), and the loop stops at the first
    fixpoint. Two per-round costs are engineered away (round 3): the edge
    relation is repartitioned on the join key and persisted once, so the
    planner never re-shuffles it (only the label side exchanges), and the
    fixpoint check reads a ``prev`` label carried INTO each round's
    checkpoint — a scan over already-materialized rows, not the extra
    join + shuffle per round it used to be.

    Storage hygiene (round 3): rounds are cut with eager
    ``localCheckpoint`` — checkpointing (not persist) is load-bearing
    here, because each round's plan references the previous one TWICE
    (neighbor join + pointer jump), so without truncation the logical
    plan DAG doubles per round and the optimizer OOMs past ~10 rounds.
    Each superseded round's checkpoint blocks are freed immediately via
    its EXACT RDD id (read from the result's LogicalRDD plan node — no
    storage-listing diffs that could misattribute a concurrent thread's
    RDDs); only the FINAL labeling survives, attached as
    ``owned_storage`` (release with :func:`release_owned_storage` AFTER
    all consumers finish — a checkpointed result cannot recompute).
    """
    sc = pairs.sparkSession.sparkContext

    def _mat(df: DataFrame) -> DataFrame:
        return df.localCheckpoint(eager=True)

    def _ckpt_rdd_id(df: DataFrame) -> int | None:
        try:
            # localCheckpoint's analyzed plan IS the LogicalRDD holding
            # the persisted internal RDD
            return df._jdf.queryExecution().analyzed().rdd().id()
        except Exception:
            return None  # plan shape changed across Spark versions

    def _drop(df: DataFrame) -> None:
        rid = _ckpt_rdd_id(df)
        if rid is not None:
            # package-private Scala method, public in bytecode
            sc._jsc.sc().unpersistRDD(rid, False)

    a = F.col(id_a)
    b = F.col(id_b)
    n_part = sc.defaultParallelism
    # the symmetric edge list is built once: localCheckpoint truncates the
    # caller's pair-plan lineage, then repartition-on-the-join-key +
    # persist. The persist (NOT a second checkpoint) is load-bearing:
    # a checkpointed scan reports UnknownPartitioning (verified on this
    # Spark), while InMemoryRelation preserves the repartition's hash
    # partitioning — so every round's neighbor join shuffles only the
    # (label) side, never the edge relation
    # single-reference symmetrization: explode([struct(a,b), struct(b,a)])
    # references the pair plan ONCE — the union-of-two-selects shape
    # evaluates an unpersisted candidate-pair join twice in the same job
    # (measured: the full banding self-join ran 2x inside the edges build)
    edges_ck = _mat(pairs.select(F.explode(F.array(
                        F.struct(a.alias("src"), b.alias("dst")),
                        F.struct(b.alias("src"), a.alias("dst"))))
                    .alias("e"))
                    .select("e.src", "e.dst").distinct())
    edges = edges_ck.repartition(n_part, "src") \
                    .persist(StorageLevel.MEMORY_AND_DISK)
    ckpt = _mat(edges.select(F.col("src").alias("id")).distinct()
                .withColumn("component", F.col("id")))
    comps = ckpt  # comps is a (possibly projected) view; ckpt owns blocks
    try:
        for _ in range(max_iter):
            neigh = (edges.join(comps.withColumnRenamed("id", "src"), "src")
                     .groupBy(F.col("dst").alias("id"))
                     .agg(F.min("component").alias("n_min")))
            stepped = (comps.join(neigh, "id", "left")
                       .select("id",
                               F.least(F.col("component"),
                                       F.coalesce("n_min", "component"))
                               .alias("c1"),
                               F.col("component").alias("prev")))
            # pointer jump: comp[v] <- min(comp[v], comp[comp[v]]) —
            # doubles the propagation distance every round (log-diameter
            # convergence)
            grand = stepped.select(F.col("id").alias("c1"),
                                   F.col("c1").alias("g"))
            # the PREVIOUS label rides along into the checkpoint, so the
            # convergence check below is a scan over already-materialized
            # rows — not the extra join + shuffle per round it used to be
            new = _mat(stepped.join(grand, "c1", "left")
                       .select("id", F.least(F.col("c1"),
                                             F.coalesce("g", "c1"))
                               .alias("component"), "prev"))
            changed = new.where(F.col("component") != F.col("prev")).count()
            _drop(ckpt)             # superseded round's blocks freed NOW
            ckpt = new
            comps = new.select("id", "component")
            if changed == 0:
                rid = _ckpt_rdd_id(ckpt)
                handles = ([_RddHandle(sc, rid)] if rid is not None
                           else [])
                return _own(comps, *handles)
    finally:
        edges.unpersist()
        _drop(edges_ck)
    _drop(ckpt)
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        f"(diameter > ~2^{max_iter}); raise max_iter")


class _RddHandle:
    """unpersist()-able wrapper for a checkpointed RDD id, so iterative
    results compose with :func:`release_owned_storage`."""

    def __init__(self, sc, rdd_id: int):
        self._sc, self._id = sc, rdd_id

    def unpersist(self) -> None:
        self._sc._jsc.sc().unpersistRDD(self._id, False)


def near_dup_losers(pairs: DataFrame) -> DataFrame:
    """(id) of every row to DROP from the near-dup pair graph — the ONE
    definition of the survivor rule (survivor = the vertex whose id
    equals its component's minimum label), shared by
    :func:`dedup_by_components` and the training pipeline so the two can
    never silently diverge. Rows in no pair are absent (= survivors).
    The component labeling's checkpoint blocks ride along as
    ``owned_storage``."""
    comps = connected_components(pairs)
    return _own(comps.where(F.col("id") != F.col("component")).select("id"),
                *getattr(comps, "owned_storage", ()))


def dedup_by_components(df: DataFrame, pairs: DataFrame, id_col: str,
                        ) -> DataFrame:
    """Keep one survivor per near-dup cluster: the minimum id of each
    component (plus every row that is in no pair at all)."""
    losers = near_dup_losers(pairs)
    return _own(df.join(losers.withColumnRenamed("id", id_col),
                        id_col, "left_anti"),
                *getattr(losers, "owned_storage", ()))


def keep_best_per_cluster(df: DataFrame, pairs: DataFrame, *,
                          id_col: str = "doc_id",
                          quality_col: str = "quality_score",
                          components: DataFrame | None = None) -> DataFrame:
    """Quality-aware canonical selection: one survivor per near-dup
    cluster, chosen by QUALITY rather than min id.

    The min-id survivor rule (:func:`dedup_by_components`) is arbitrary
    about WHICH copy a corpus keeps; when near-dups differ (same article
    with/without boilerplate, truncated vs full mirror), keeping the
    highest-quality member is the curation-correct choice (the RefinedWeb
    /FineWeb "best rendition" refinement of cluster dedup). Returns one
    row per cluster — ``(component, survivor id, survivor quality,
    n_members)`` — covering every input row: singletons are their own
    one-member cluster.

    Deterministic tie policy, identical in the DuckDB oracle: NULL
    quality orders last, equal quality breaks to the smaller id (one
    min(struct(null_flag, -quality, id)) aggregate — map-side combined,
    no window, no second pass). The component labeling's checkpoint
    blocks ride along as ``owned_storage``.

    ``components``: pass a precomputed :func:`connected_components`
    labeling (over the same pairs) to reuse it across stages — the
    caller keeps ownership of its checkpoint storage then; ``pairs`` is
    ignored.
    """
    caller_owns = components is not None
    comps = components if caller_owns else connected_components(pairs)
    q = F.col(quality_col).cast("double")
    joined = df.select(F.col(id_col), q.alias("__q")) \
               .join(comps.withColumnRenamed("id", id_col), id_col, "left")
    comp = F.coalesce(F.col("component"), F.col(id_col).cast("string")) \
        if dict(joined.dtypes)["component"] == "string" \
        else F.coalesce(F.col("component"), F.col(id_col))
    best = (joined.groupBy(comp.alias("component"))
            .agg(F.min(F.struct(
                     F.when(F.col("__q").isNull(), 1).otherwise(0)
                      .alias("nullq"),
                     (-F.coalesce(F.col("__q"), F.lit(0.0))).alias("nq"),
                     F.col(id_col).alias("sid"),
                     F.col("__q").alias("sq"))).alias("b"),
                 F.count("*").alias("n_members"))
            .select("component",
                    F.col("b.sid").alias(id_col),
                    F.col("b.sq").alias(quality_col),
                    "n_members"))
    if caller_owns:
        return best
    return _own(best, *getattr(comps, "owned_storage", ()))


# --- cross-document exact substring spans ----------------------------------


def _ws_tokens(text_col: str) -> Column:
    """Whitespace token array of a text column — the span tier's single
    tokenizer expression (trim + split, the engine-wide convention
    textstats.token_count counts by)."""
    return F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+")


def span_gram_positions(df: DataFrame, id_col: str, text_col: str,
                        k: int) -> DataFrame:
    """(id, n_tokens, pos, h) — one row per k-token window position.

    h is the md5-prefix-as-bigint of the space-joined gram (the same
    60-bit fixed-width trick the MinHash oracle proved DuckDB-mirrorable)
    so the exploded relation is (string, 3 longs) — never the gram text
    itself. Documents shorter than k tokens emit no positions: a span
    tier has nothing to say about them (doc-level exact dedup covers
    whole-text copies). Volume is one row per token — linear, the same
    shape as the shingle explode in the Jaccard tier.

    Public so a caller running BOTH span operators over one corpus can
    build (and persist) the position relation once and pass it to each
    via ``positions=`` — the tokenize+md5 explode is the dominant cost
    and need not be paid twice."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}: a 0-token window "
                         "matches every position in every document and "
                         "would empty the corpus")
    from pdf_parser_spark.operators.textstats import token_count
    toks = _ws_tokens(text_col)
    n = token_count(F.col(text_col))
    base = df.select(F.col(id_col).alias("id"), toks.alias("__t"),
                     n.alias("n_tokens"))
    gram = F.array_join(F.slice(F.col("__t"), F.col("pos"), k), " ")
    h = F.conv(F.substring(F.md5(gram), 1, 15), 16, 10).cast("long")
    return (base.where(F.col("n_tokens") >= k)
            .select("id", "n_tokens",
                    F.explode(F.sequence(
                        F.lit(1), F.col("n_tokens") - k + 1)).alias("pos"),
                    F.col("__t"))
            .select("id", "n_tokens", "pos", h.alias("h")))


def duplicated_span_stats(df: DataFrame, id_col: str = "id",
                          text_col: str = "text", k: int = 8,
                          positions: DataFrame | None = None) -> DataFrame:
    """Per-document profile of exact substrings shared ACROSS documents:
    (id, n_tokens, n_dup_positions, dup_tokens, dup_token_frac).

    The span tier of the dedup stack (Lee et al., "Deduplicating Training
    Data Makes Language Models Better", ACL 2022): doc-level exact dedup
    and the near-dup tiers (MinHash/SimHash/Jaccard) only see whole
    documents, but crawl-scale corpora repeat long exact substrings —
    license headers, quoted passages, templated paragraphs — inside
    otherwise-distinct documents. Every k-token window is hashed; a
    window whose gram occurs in >= 2 DISTINCT documents is a duplicated
    position; a document's ``dup_tokens`` is the size of the UNION of
    its duplicated windows (overlapping windows are not double-counted)
    and ``dup_token_frac`` that union over the token count.

    Scale shape (the 100 TB story):
    - the gram index is an explode to one fixed-width row per token,
      then ONE map-side-combined groupBy; the cross-doc test is
      min(id) != max(id) — no countDistinct state;
    - a boilerplate gram shared by millions of docs collapses to one
      row per map task in the partial aggregation, and the join back to
      positions is AQE skew-splittable;
    - the interval union needs no per-doc UDF: with positions sorted,
      each window contributes min(pos - lag(pos), k) new tokens (the
      first contributes k), so one per-doc window-sum — bounded by
      document length — computes the merged coverage.

    Documents with no duplicated window (or fewer than k tokens) report
    zeros. The reference has no span tier at all (its corpus is 5 PDFs);
    this is training-pipeline extension surface per the task brief.
    """
    # the position relation feeds BOTH the cross-doc aggregate and the
    # join back; without a persist the tokenize+md5 explode (the dominant
    # cost) executes twice. The cached rows are fixed-width (id + three
    # longs) — the round-2 jaccard lesson: never cache gram TEXT. Rides
    # on the result as owned_storage; callers release when done. A
    # caller pairing this with remove_duplicated_spans passes one shared
    # span_gram_positions relation via ``positions`` (then THEY own it).
    owns: tuple[DataFrame, ...] = ()
    pos = positions
    if pos is None:
        pos = span_gram_positions(df, id_col, text_col, k) \
            .persist(StorageLevel.MEMORY_AND_DISK)
        owns = (pos,)
    dup = (pos.groupBy("h")
           .agg((F.min("id") != F.max("id")).alias("__cross"))
           .where(F.col("__cross")).select("h"))
    dpos = pos.join(dup, "h").select("id", "pos")
    w = Window.partitionBy("id").orderBy("pos")
    contrib = F.least(F.col("pos") - F.lag("pos").over(w), F.lit(k))
    cov = (dpos.withColumn("__c", F.coalesce(contrib, F.lit(k)))
           .groupBy("id")
           .agg(F.count("*").alias("n_dup_positions"),
                F.sum("__c").alias("dup_tokens")))
    from pdf_parser_spark.operators.textstats import token_count
    base = df.select(F.col(id_col).alias("id"),
                     token_count(F.col(text_col)).alias("n_tokens"))
    return _own(base.join(cov, "id", "left")
                .select("id", "n_tokens",
                        F.coalesce("n_dup_positions", F.lit(0))
                         .alias("n_dup_positions"),
                        F.coalesce("dup_tokens", F.lit(0))
                         .alias("dup_tokens"),
                        F.round(F.coalesce("dup_tokens", F.lit(0))
                                / F.greatest("n_tokens", F.lit(1)), 6)
                         .alias("dup_token_frac")),
                *owns)


def remove_duplicated_spans(df: DataFrame, id_col: str = "id",
                            text_col: str = "text", k: int = 8,
                            positions: DataFrame | None = None) -> DataFrame:
    """The removal half of the span tier: rewrite each document with its
    LOSING duplicated windows cut out, keeping canonical occurrences.

    Policy (deterministic, mirrored exactly by the DuckDB oracle): the
    canonical owner of a cross-document k-token gram is the MINIMUM id
    that contains it — the same survivor rule as every other dedup tier
    (exact dedup min-struct, near-dup min-label components). A token is
    removed iff some losing window covers it (a window is losing when
    its gram is cross-document and this id is not the owner). Owners
    keep their copy; every other document sheds the span. Output text is
    rebuilt by joining the kept tokens with single spaces, so whitespace
    is normalized for ALL rows (duplicated or not) — the rewrite is a
    tokenizer-level operation and says so.

    Returns (id, text_clean, n_tokens, n_removed_tokens, removed_frac).

    Scale: the losing-position relation is the duplicated fraction of
    the corpus; its k-fold covered-index expansion happens INSIDE a
    per-document aggregate (collect_list of sequences -> flatten ->
    distinct), so state is bounded by document length, and the rebuild
    is array_except + transform — JVM expressions, no Python. A caller
    pairing this with duplicated_span_stats builds the fixed-width
    position relation ONCE via span_gram_positions and passes it to
    both through ``positions`` (the tokenize+md5 explode is the
    dominant cost); left to itself the operator persists its own and
    attaches it to the result as owned_storage.
    """
    owns: tuple[DataFrame, ...] = ()
    pos = positions
    if pos is None:
        pos = span_gram_positions(df, id_col, text_col, k) \
            .persist(StorageLevel.MEMORY_AND_DISK)
        owns = (pos,)
    owners = (pos.groupBy("h")
              .agg(F.min("id").alias("__own"),
                   (F.min("id") != F.max("id")).alias("__cross"))
              .where(F.col("__cross")).select("h", "__own"))
    losing = (pos.join(owners, "h")
              .where(F.col("id") != F.col("__own"))
              .select("id", "pos"))
    covered = (losing
               .groupBy("id")
               .agg(F.array_sort(F.array_distinct(F.flatten(
                   F.collect_list(F.sequence(
                       F.col("pos"),
                       F.col("pos") + F.lit(k - 1))))))
                   .alias("__cov")))
    from pdf_parser_spark.operators.textstats import token_count
    base = df.select(F.col(id_col).alias("id"),
                     _ws_tokens(text_col).alias("__t"),
                     token_count(F.col(text_col)).alias("n_tokens"))
    cov = F.coalesce(F.col("__cov"), F.array().cast("array<int>"))
    kept = F.transform(
        F.array_except(F.sequence(F.lit(1), F.col("n_tokens")), cov),
        lambda i: F.element_at(F.col("__t"), i))
    out = (base.join(covered, "id", "left")
           .select("id",
                   F.when(F.col("n_tokens") == 0, F.lit(""))
                    .otherwise(F.array_join(kept, " ")).alias("text_clean"),
                   "n_tokens",
                   F.size(cov).alias("n_removed_tokens"),
                   F.round(F.size(cov)
                           / F.greatest("n_tokens", F.lit(1)), 6)
                    .alias("removed_frac")))
    return _own(out, *owns)


# --- paragraph / line tier ---------------------------------------------------


def paragraph_segments(df: DataFrame, id_col: str = "id",
                       text_col: str = "text",
                       delimiter: str = "\n") -> DataFrame:
    """(id, seg_idx, seg) — one row per trimmed non-empty segment of the
    delimiter-split text, seg_idx the 0-based position among KEPT
    segments (trim-empty segments are structure, not content, and no
    dedup decision should hinge on them).

    The unit relation for the paragraph tier; callers with a corpus
    whose paragraph structure lives elsewhere (pre-exploded tables,
    fixed-width pseudo-paragraphs for paragraph-less text) build this
    relation themselves and pass it to :func:`dedup_paragraphs` via
    ``segments=``.
    """
    import re as _re
    segs = F.filter(
        F.transform(F.split(F.coalesce(F.col(text_col), F.lit("")),
                            _re.escape(delimiter), -1),
                    lambda s: F.trim(s)),
        lambda s: F.length(s) > 0)
    return (df.select(F.col(id_col).alias("id"), segs.alias("__s"))
            .select("id", F.posexplode("__s").alias("seg_idx", "seg")))


def dedup_paragraphs(df: DataFrame, *, id_col: str = "id",
                     text_col: str = "text", delimiter: str = "\n",
                     scope: str = "corpus",
                     segments: DataFrame | None = None) -> DataFrame:
    """Paragraph-level dedup (the RefinedWeb / Dolma pass): drop repeated
    paragraphs while KEEPING the documents that contained them.

    Sits between doc-level exact dedup (whole-text copies) and the
    k-token span tier (arbitrary-offset substrings): crawl corpora repeat
    whole paragraphs — nav boilerplate, license blocks, share footers —
    inside otherwise-distinct pages, and removing the repeats beats
    dropping or keeping whole documents.

    Policy (deterministic, engine-replayable — the same survivor rule as
    every other tier):
    - scope="corpus": the canonical occurrence of a paragraph is the
      MINIMUM (id, seg_idx) that contains it, corpus-wide; every other
      occurrence is removed.
    - scope="doc": within-document only — the first occurrence in each
      document survives, later repeats in the SAME document are removed
      (cross-document repeats all survive).

    Returns one row per input document:
    (id, n_segs, n_removed_segs, removed_frac, text_clean) with
    text_clean the surviving segments in original order joined by
    ``delimiter``; documents whose every segment was removed (or that
    had none) yield text_clean = ''.

    Scale shape (100 TB):
    - segments are hashed to md5 immediately — the grouped/joined keys
      are fixed-width, never paragraph text (the round-2 shingle-cache
      lesson);
    - corpus scope is ONE map-side-combined min-struct groupBy on the
      hash plus one equality join back (AQE skew-splits the
      million-occurrence boilerplate paragraph); doc scope needs no
      global state at all — one per-(id, hash) window;
    - reassembly is a per-doc sort of its own kept segments — bounded by
      document length, the same shape as remove_duplicated_spans.
    """
    if scope not in ("corpus", "doc"):
        raise ValueError(f"scope must be 'corpus' or 'doc', got {scope!r}")
    segs = segments if segments is not None \
        else paragraph_segments(df, id_col, text_col, delimiter)
    segs = segs.withColumn("__h", F.md5("seg"))
    if scope == "corpus":
        winners = (segs.groupBy("__h")
                   .agg(F.min(F.struct("id", "seg_idx")).alias("__w")))
        kept = (segs.join(winners, "__h")
                .where((F.col("id") == F.col("__w.id"))
                       & (F.col("seg_idx") == F.col("__w.seg_idx"))))
    else:
        w = Window.partitionBy("id", "__h")
        kept = (segs.withColumn("__first", F.min("seg_idx").over(w))
                .where(F.col("seg_idx") == F.col("__first")))
    rebuilt = (kept.groupBy("id")
               .agg(F.count("*").alias("__n_kept"),
                    F.array_join(
                        F.transform(
                            F.array_sort(F.collect_list(
                                F.struct("seg_idx", "seg"))),
                            lambda s: s.seg),
                        delimiter).alias("text_clean")))
    base = segs.groupBy("id").agg(F.count("*").alias("n_segs"))
    all_ids = df.select(F.col(id_col).alias("id")).distinct()
    return (all_ids
            .join(base, "id", "left")
            .join(rebuilt, "id", "left")
            .select("id",
                    F.coalesce("n_segs", F.lit(0)).cast("long")
                     .alias("n_segs"),
                    (F.coalesce("n_segs", F.lit(0))
                     - F.coalesce("__n_kept", F.lit(0))).cast("long")
                     .alias("n_removed_segs"),
                    F.round((F.coalesce("n_segs", F.lit(0))
                             - F.coalesce("__n_kept", F.lit(0)))
                            / F.greatest(F.coalesce("n_segs", F.lit(0)),
                                         F.lit(1)), 6)
                     .alias("removed_frac"),
                    F.coalesce("text_clean", F.lit("")).alias("text_clean")))
