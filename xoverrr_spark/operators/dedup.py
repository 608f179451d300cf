"""Deduplication operators for training-data pipelines.

Four families, each scale-shaped for Spark:

- **Exact**: md5 of canonical text -> groupBy(hash) keep min(id). One
  key-hash shuffle; partial aggregation map-side.
- **MinHash + LSH**: word-shingles -> 40-bit md5 base hash -> k affine
  permutations ``(a_i*x+b_i) mod 2^40`` (odd ``a_i`` => bijection) ->
  per-doc signature -> band buckets -> candidate pairs from bucket
  self-join. Shuffle cost is O(docs x bands), never O(docs^2); only
  bucket-mates are paired, and the exact-Jaccard verify stage touches
  candidate docs only (``candidate_jaccard``).
- **SimHash**: 48-bit sign-aggregated token hashes; near-dups share a
  simhash (or differ in few bits). One explode + one groupBy.
- **N-gram Jaccard**: exact verification on candidate pairs via a shingle
  co-occurrence join (|A∩B| from the join, sizes from per-doc counts).
- **Embedding cosine near-dup**: see operators.similarity.

All hash math rides ``tokens.md5_long`` so every stage can be replayed
value-for-value in DuckDB by the driver's oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.tokens import fingerprint, md5_long

# Affine permutations (a*x+b) mod 2^40 with ODD a: for odd a the map is a
# bijection on Z_2^40, so each hash index i applies a genuinely different
# permutation to the 40-bit base hash (a mod-p formula with a*x+b < p never
# wraps, is strictly increasing, and collapses every min to the same
# min-shingle — ADVICE r01). a,b < 2^20 and x < 2^40 keep a*x+b < 2^60, so
# the arithmetic never overflows int64 even under ANSI mode. Identical
# plain-integer math runs in the DuckDB oracle.
MINHASH_MOD = 1 << 40
_COEF_BITS = 20


def minhash_params(num_hashes: int, seed: int = 1234567) -> list[tuple[int, int]]:
    """Deterministic (a, b) coefficient pairs below 2^20."""
    params = []
    state = seed
    mask = (1 << _COEF_BITS) - 1
    for _ in range(num_hashes):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a = ((state >> 20) & mask) | 1
        b = (state >> 43) & mask
        params.append((a, b))
    return params


def exact_dedup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(text_fp, canonical_id, dup_count) per duplicate group (count > 1)."""
    return (
        df.select(F.col(id_col).alias("doc_id"), fingerprint(F.col(text_col)).alias("text_fp"))
        .groupBy("text_fp")
        .agg(F.min("doc_id").alias("canonical_id"), F.count(F.lit(1)).alias("dup_count"))
        .filter(F.col("dup_count") > 1)
    )


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Survivors: the min-id row of every exact-duplicate group.

    Semi-join form: the input is scanned (and fingerprinted) TWICE — once
    for the groupBy, once for the probe side — but the groupBy partially
    aggregates map-side, so a boilerplate flood (10^7 copies of one page)
    never concentrates on one task. Prefer ``exact_dedup_window`` when the
    scan itself dominates (wide rows / remote storage) and duplicate
    groups are known to be modest.

    Null texts fingerprint to null; the group key is coalesced to a
    sentinel so they form ONE dedup group instead of vanishing (a null
    semi-join key never matches — scraped corpora always contain null
    payload rows, and silently dropping them all is data loss, not
    dedup). Same outcome as the window form's null partition."""
    null_fp = F.lit("\x00<null-text>")
    fp = df.withColumn(
        "text_fp", F.coalesce(fingerprint(F.col(text_col)), null_fp)
    )
    keep = fp.groupBy("text_fp").agg(F.min(id_col).alias(id_col))
    return fp.join(keep, [id_col, "text_fp"], "left_semi").drop("text_fp")


def exact_dedup_window(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Same survivors via ONE scan + one window (row_number over the
    fingerprint partition): the input is read and fingerprinted once and
    the full rows ride a single exchange. Trade-off vs ``exact_dedup``:
    a window partition cannot be split, so a degenerate duplicate flood
    serializes on one task — pick this form when rows are wide/remote and
    dup groups are bounded, the semi-join form for flood-prone corpora
    (mirrors the cap_per_source / cap_per_source_hash pairing)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("text_fp").orderBy(id_col)
    return (
        df.withColumn("text_fp", fingerprint(F.col(text_col)))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "text_fp")
    )


def md5_long40(c):
    """40-bit md5-based hash (first 10 hex chars) — MinHash base hash;
    small enough that (a*x+b) never overflows int64. DuckDB twin:
    ('0x'||substr(md5(x),1,10))::BIGINT."""
    return F.conv(F.substring(F.md5(c), 1, 10), 16, 10).cast("bigint")


# rolling-combine multiplier for shingle hashing (~2^20: products stay
# under 2^60, int64-safe under ANSI; identical plain-integer math in DuckDB)
SHINGLE_P = 1000003


def _word_hash_array(text_col):
    """Per-word 40-bit md5 hashes as an array column (one md5 per word).
    MUST be materialized (withColumn/select alias) before a gram fold
    references it — a lambda-captured tree re-evaluates per element_at
    (the CLAUDE.md Catalyst-duplication trap)."""
    words = F.split(F.trim(F.lower(text_col)), r"\s+")
    return F.transform(words, lambda w: md5_long40(w))


def _gram_fold_array(wh, n: int):
    """Word n-gram rolling-fold hashes over a MATERIALIZED word-hash array
    attribute ``wh`` — the exact integer fold the oracle replays (see
    ``shingle_table``); includes the <n-words 0-padded single-shingle
    fallback."""
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(wh) - (n - 1), F.lit(1))),
        lambda i: F.aggregate(
            F.sequence(F.lit(0), F.lit(n - 1)),
            F.lit(0).cast("bigint"),
            lambda acc, j: (
                acc * SHINGLE_P + F.coalesce(F.try_element_at(wh, i + j), F.lit(0))
            ) % MINHASH_MOD,
        ),
    )


def shingle_sets(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(doc_id, shset) — each doc's DISTINCT shingle hashes as ONE array
    row: the zero-shuffle row form of ``shingle_table`` (same fold, same
    degenerate-text semantics; ``explode(shset)`` is exactly the row
    table). Signature aggregation and candidate verification both work
    per-row on this form, so the explode + re-group shuffle of the
    exploded table is never paid (guide §2.4: remove shuffles outright).
    One row per input row — callers dedup ids upstream as usual."""
    with_wh = df.select(
        F.col(id_col).alias("doc_id"), _word_hash_array(F.col(text_col)).alias("_wh")
    )
    return with_wh.select(
        "doc_id", F.array_distinct(_gram_fold_array(F.col("_wh"), n)).alias("shset")
    )


def shingle_table(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(doc_id, shingle_hash) — distinct word n-gram hashes.

    Each WORD is md5-hashed ONCE (40-bit, md5_long40 spec) into a
    materialized array, then each n-gram combines its n word hashes with a
    left-assoc rolling fold ``h = (h*P + w) % 2^40`` — measured 4.2x
    faster than the previous md5-of-concatenated-shingle-string form at
    sf0.1 (the md5 ran once per WORD-OCCURRENCE-PER-SHINGLE, i.e. n times
    per word, plus a string build per shingle; this is the hottest map
    stage of every dedup pipeline). The word-hash array MUST be
    materialized via withColumn before the gram transform references it —
    as a lambda-captured expression tree it would re-evaluate per
    element_at (the CLAUDE.md Catalyst-duplication trap; measured 10x
    SLOWER that way). try_element_at, not element_at: ANSI mode THROWS on
    the 0-padding reads past the array end.

    Documents with fewer than n words yield ONE shingle folding the
    available hashes with 0-padding (they still participate in dedup).
    That INCLUDES degenerate texts — a NULL text folds a null word array
    to shingle 0 (``greatest`` skips the null size, so the gram sequence
    is [1]) and empty/whitespace-only texts fold the md5('') word hash —
    so all null-text docs shingle-match each other, as do all blank docs
    (verified identical in both engines; consistent with exact_dedup's
    sentinel policy of grouping null texts as duplicates of each other).
    The DuckDB oracle replays the identical integer fold
    (oracle._SHINGLES_CTE).
    """
    # the explode must sit DIRECTLY over the _wh projection: stacking it
    # on shingle_sets' two projects lets CollapseProject merge them and
    # inline the per-word md5 transform into every element access of the
    # gram fold (the CLAUDE.md Catalyst-duplication trap — measured 3.5x
    # slower on curate_documents when it fired)
    with_wh = df.select(
        F.col(id_col).alias("doc_id"), _word_hash_array(F.col(text_col)).alias("_wh")
    )
    return with_wh.select(
        "doc_id",
        F.explode(
            F.array_distinct(_gram_fold_array(F.col("_wh"), n))
        ).alias("shingle_hash"),
    )


def minhash_signature_from_shingles(
    shingles: DataFrame, num_hashes: int = 16, seed: int = 1234567,
) -> DataFrame:
    """Signatures from a prebuilt (doc_id, shingle_hash) table — lets a
    pipeline that needs the shingles AGAIN downstream (candidate_jaccard)
    build and persist them once instead of re-running the explode+md5
    map stage, the most expensive scan-side work at corpus scale."""
    aggs = [
        F.min((F.lit(a) * F.col("shingle_hash") + F.lit(b)) % F.lit(MINHASH_MOD)).alias(f"mh_{i}")
        for i, (a, b) in enumerate(minhash_params(num_hashes, seed))
    ]
    return shingles.groupBy("doc_id").agg(*aggs)


def minhash_signature_from_sets(
    sets: DataFrame, num_hashes: int = 16, seed: int = 1234567,
) -> DataFrame:
    """Signatures computed PER ROW from a ``shingle_sets`` frame:
    ``mh_i = array_min(transform(shset, x -> (a_i*x+b_i) mod 2^40))`` —
    the same min over the same distinct-shingle universe as the exploded
    groupBy form, with zero shuffle and no per-shingle rows (guide §2.4).
    ``shset`` must be a materialized attribute (it is — ``shingle_sets``
    aliases it), since each of the k transforms references it."""
    sh = F.col("shset")
    sigs = [
        F.array_min(
            F.transform(sh, lambda x: (F.lit(a) * x + F.lit(b)) % F.lit(MINHASH_MOD))
        ).alias(f"mh_{i}")
        for i, (a, b) in enumerate(minhash_params(num_hashes, seed))
    ]
    return sets.select("doc_id", *sigs)


def minhash_signature(
    df: DataFrame, id_col: str, text_col: str,
    num_hashes: int = 16, shingle_n: int = 3, seed: int = 1234567,
) -> DataFrame:
    """(doc_id, mh_0..mh_{k-1}) MinHash signature via universal hashing.

    Computed per-row over the doc's distinct-shingle array (one scan, no
    explode, no shuffle — r6: the previous explode + groupBy formulation
    shuffled a row per shingle to rebuild exactly the per-doc grouping
    the input already had). Ids are expected unique per row (every
    pipeline here dedups upstream); duplicate ids now yield one signature
    row each instead of a merged shingle union.
    """
    return minhash_signature_from_sets(
        shingle_sets(df, id_col, text_col, shingle_n), num_hashes, seed
    )


# Buckets larger than this self-join quadratically for no recall benefit —
# a degenerate hot bucket (boilerplate near-identical docs) is exact-dup
# territory handled by exact_dedup upstream. Dropped buckets are a
# replayable predicate (HAVING count <= cap in the DuckDB oracle), not a
# sampling step, so parity is exact.
DEFAULT_MAX_BUCKET = 200


def _attach_intermediates(result: DataFrame, frames) -> DataFrame:
    """Record persisted intermediate frames on the RESULT DataFrame so a
    long-lived driver can free them deterministically once the result has
    been materialized/written (``release_intermediates``). The functions
    themselves stay lazy — an eager unpersist inside them would silently
    re-run the bucket join twice when the caller finally acts."""
    existing = list(getattr(result, "_xoverrr_intermediates", ()))
    result._xoverrr_intermediates = existing + [f for f in frames if f is not None]
    return result


def release_intermediates(df: DataFrame) -> int:
    """Unpersist every cached intermediate attached to ``df`` (see
    ``_attach_intermediates``). Call AFTER materializing/writing ``df`` —
    the result is lazy, so releasing earlier re-triggers the double
    compute the caches exist to prevent. Returns the number of frames
    released. Long-lived sessions (the runner, notebook drivers) should
    call this per result; short-lived jobs can rely on session teardown."""
    frames = list(getattr(df, "_xoverrr_intermediates", ()))
    for f in frames:
        f.unpersist()
    df._xoverrr_intermediates = []
    return len(frames)


def _cap_buckets(buckets: DataFrame, max_bucket_size: int | None) -> DataFrame:
    """Drop rows of over-cap buckets via a window count over (band, bkey) —
    ONE shuffle on the same key the downstream self-join uses (the join
    reuses the exchange), instead of a groupBy + semi-join (two extra
    shuffles). Identical predicate to the oracle's HAVING count <= cap."""
    if max_bucket_size is None:
        return buckets
    from pyspark.sql.window import Window

    w = Window.partitionBy("band", "bkey")
    return (
        buckets.withColumn("_bsz", F.count(F.lit(1)).over(w))
        .filter(F.col("_bsz") <= max_bucket_size)
        .drop("_bsz")
    )


def _capped_bucket_self_join(buckets: DataFrame, max_bucket_size: int | None) -> DataFrame:
    """(doc_a, doc_b) distinct pairs from a (doc_id, band, bkey) bucket
    table, self-joined per bucket with an optional bucket-size cap.

    The bucket table is persisted before the self-join: Spark does not
    reuse the exchange across the two sides of a self-join (verified:
    ReusedExchange never fires here), so without the cache the upstream
    shingle explode + k-min aggregation — the most expensive stage —
    executes twice. Caching costs ~40 bytes/doc/band; LRU eviction
    reclaims it under pressure (an eager unpersist would re-trigger the
    double compute because the result is lazy); callers can free it
    deterministically after materializing via ``release_intermediates``."""
    buckets = _cap_buckets(buckets, max_bucket_size).persist()
    a = buckets.alias("a")
    b2 = buckets.alias("b")
    pairs = (
        a.join(b2, ["band", "bkey"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    return _attach_intermediates(pairs, [buckets])


def _lsh_buckets(signatures: DataFrame, num_hashes: int, bands: int) -> DataFrame:
    """(doc_id, band, bkey) — one row per doc per band; bkey is md5 of the
    concatenated band slice (a string both engines hash identically)."""
    rows_per_band = num_hashes // bands
    band_structs = []
    for b in range(bands):
        cols = [F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_structs.append(
            F.struct(F.lit(b).alias("band"), F.md5(F.concat_ws("_", *cols)).alias("bkey"))
        )
    return signatures.select(
        F.col("doc_id"), F.explode(F.array(*band_structs)).alias("bb")
    ).select("doc_id", "bb.band", "bb.bkey")


def bucket_size_stats(buckets: DataFrame, max_bucket_size: int) -> DataFrame:
    """Per-band audit of the bucket-size cap — the "no silent caps"
    companion to ``_cap_buckets`` (ADVICE r02): (band, n_buckets,
    max_bucket_size, over_cap_buckets, over_cap_docs). A non-zero
    ``over_cap_docs`` means the cap dropped every pair inside those
    buckets; pipelines should surface this next to their pair counts.
    Works on any (band, bkey) bucket table (text LSH, SimHash bands,
    embedding LSH)."""
    per_bucket = buckets.groupBy("band", "bkey").agg(F.count(F.lit(1)).alias("n"))
    return per_bucket.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.max("n").alias("max_bucket_size"),
        F.count(F.when(F.col("n") > max_bucket_size, 1)).alias("over_cap_buckets"),
        F.coalesce(
            F.sum(F.when(F.col("n") > max_bucket_size, F.col("n"))), F.lit(0)
        ).alias("over_cap_docs"),
    )


def lsh_bucket_stats(
    signatures: DataFrame, num_hashes: int = 16, bands: int = 4,
    max_bucket_size: int = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Bucket-size audit for the MinHash LSH banding (see
    ``bucket_size_stats``) — run alongside ``lsh_candidate_pairs`` to make
    the cap's recall loss observable instead of silent."""
    return bucket_size_stats(_lsh_buckets(signatures, num_hashes, bands), max_bucket_size)


def lsh_candidate_pairs(
    signatures: DataFrame, num_hashes: int = 16, bands: int = 4,
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """(doc_a, doc_b) candidate pairs: docs sharing any LSH band bucket.

    Self-join per bucket; doc_a < doc_b dedups the pair space. Buckets
    above ``max_bucket_size`` are skipped (W3: bounded worst case on
    degenerate boilerplate corpora). The cap drops ALL pairs of an
    over-cap bucket — including genuine near-dups in >cap templated
    families — so audit it with ``lsh_bucket_stats`` (same bucket table,
    reports over-cap bucket/doc counts) or pass ``max_bucket_size=None``
    to disable.
    """
    buckets = _lsh_buckets(signatures, num_hashes, bands)
    return _capped_bucket_self_join(buckets, max_bucket_size)


def candidate_jaccard(
    df: DataFrame, id_col: str, text_col: str, candidates: DataFrame,
    shingle_n: int = 3, shingles: DataFrame | None = None,
) -> DataFrame:
    """Exact shingle Jaccard computed ONLY for (doc_a, doc_b) in
    ``candidates`` — O(|candidates|), never a shingle self-join.

    Per-doc distinct-shingle sets are collected as arrays for candidate
    docs only (``left_semi`` against the candidate id set), then each
    candidate pair joins to its two arrays and |A∩B| is a JVM-side
    ``array_intersect``. This is the verify stage LSH exists to enable:
    the full-corpus co-occurrence join (``ngram_jaccard``) is never built.
    Pass a prebuilt (persisted) ``shingles`` table to skip re-running the
    explode+md5 map stage when the caller already built one.
    """
    cand_ids = (
        candidates.select(F.col("doc_a").alias("doc_id"))
        .unionByName(candidates.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    if shingles is not None:
        # prebuilt (persisted) shingle table: restrict its rows, regroup
        sets = (
            shingles.join(cand_ids, "doc_id", "left_semi")
            .groupBy("doc_id")
            .agg(F.collect_set("shingle_hash").alias("shset"))
            .persist()
        )
    else:
        # no prebuilt table: restrict the DOCS before shingling — the
        # candidate id set is small (broadcast semi-join), so the md5+fold
        # map stage runs over candidate docs only instead of the whole
        # corpus — and build the per-doc arrays directly (r6: zero-shuffle
        # row form; the explode + collect_set round-trip is gone)
        docs_cand = df.join(
            cand_ids.withColumnRenamed("doc_id", id_col), id_col, "left_semi"
        )
        sets = shingle_sets(docs_cand, id_col, text_col, shingle_n).persist()
    # `sets` feeds BOTH sides of the pair join; without the persist the
    # whole shingle scan would execute twice (Spark never reuses a
    # self-join exchange — measured 93s -> ~45s at 1M docs)
    out = _pairs_jaccard_from_sets(candidates, sets)
    return _attach_intermediates(out, [sets])


def _pairs_jaccard_from_sets(candidates: DataFrame, sets: DataFrame) -> DataFrame:
    """Exact Jaccard for (doc_a, doc_b) pairs from a (doc_id, shset)
    distinct-shingle-array frame: |A∩B| via JVM ``array_intersect``,
    sizes from the arrays — identical math to the exploded collect_set
    form (the arrays ARE the distinct sets)."""
    return (
        candidates.join(
            sets.select(F.col("doc_id").alias("doc_a"), F.col("shset").alias("sa")), "doc_a"
        )
        .join(
            sets.select(F.col("doc_id").alias("doc_b"), F.col("shset").alias("sb")), "doc_b"
        )
        .withColumn("inter", F.size(F.array_intersect("sa", "sb")))
        .select(
            "doc_a", "doc_b",
            (
                F.col("inter").cast("double")
                / (F.size("sa") + F.size("sb") - F.col("inter"))
            ).alias("jaccard"),
        )
    )


def minhash_near_dups(
    df: DataFrame, id_col: str, text_col: str,
    num_hashes: int = 16, bands: int = 4, shingle_n: int = 3,
    jaccard_threshold: float = 0.7,
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """LSH candidates verified with exact candidate-restricted Jaccard
    -> (doc_a, doc_b, jaccard >= threshold).

    The per-doc distinct-shingle ARRAY table (``shingle_sets``) is built
    ONCE and persisted — it feeds the per-row signature computation AND
    the Jaccard verify (r6: previously a per-shingle exploded table was
    persisted, signatures re-grouped it and the verify collect_set'ed it
    back into arrays — two shuffles rebuilding a grouping the input
    already had; now both consumers read the arrays directly, and the
    md5+fold map stage remains the only scan-side work). The candidate
    pair set is persisted so its two consumers share one LSH bucket
    join. Both caches are LRU-evicted under pressure; after
    materializing the result, call ``release_intermediates(result)`` to
    free them deterministically (long-lived sessions otherwise
    accumulate disk-spilled blocks that eviction never reclaims —
    ADVICE r02).
    """
    sets = shingle_sets(df, id_col, text_col, shingle_n).persist()
    sig = minhash_signature_from_sets(sets, num_hashes)
    cands = lsh_candidate_pairs(sig, num_hashes, bands, max_bucket_size)
    inner = list(getattr(cands, "_xoverrr_intermediates", ()))
    cands = cands.persist()
    j = _pairs_jaccard_from_sets(cands, sets)
    out = j.filter(F.col("jaccard") >= jaccard_threshold).select("doc_a", "doc_b", "jaccard")
    return _attach_intermediates(out, inner + [sets, cands])


def ngram_jaccard(
    df: DataFrame, id_col: str, text_col: str, shingle_n: int = 3,
    min_shared: int = 1, max_shingle_doc_freq: int | None = None,
) -> DataFrame:
    """Exact pairwise n-gram Jaccard for pairs sharing >= min_shared
    shingles: |A∩B| from a shingle co-occurrence self-join, |A|,|B| from
    per-doc counts. At scale, run on LSH candidates (minhash_near_dups /
    candidate_jaccard) — the raw self-join explodes on common shingles.

    ``max_shingle_doc_freq`` is the standard stop-shingle mitigation for
    the standalone form: shingles present in more than that many docs are
    dropped BEFORE the self-join (a shingle in f docs contributes f^2/2
    join rows; one boilerplate shingle in 1% of 10^9 docs is ~5*10^13
    rows). The filter is applied FIRST and |A|, |B| are computed from the
    FILTERED table, so |A|, |B| and |A∩B| share one shingle universe —
    the Jaccard is the exact Jaccard of the stop-shingle-free shingle
    sets (computing sizes pre-filter would divide a filtered intersection
    by unfiltered denominators, collapsing boilerplate-heavy true
    near-dups toward 0 — ADVICE r02). Pairs whose every shared shingle
    was a stop-shingle get no row (0/0), which is the conservative
    outcome — those are exact-dup/LSH territory. None = exact
    (oracle-parity mode).
    """
    sh = shingle_table(df, id_col, text_col, shingle_n)
    if max_shingle_doc_freq is not None:
        rare = (
            sh.groupBy("shingle_hash")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") <= max_shingle_doc_freq)
            .drop("_df")
        )
        sh = sh.join(rare, "shingle_hash", "left_semi")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, "shingle_hash")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
        .filter(F.col("inter") >= min_shared)
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
        .select(
            "doc_a", "doc_b",
            (F.col("inter").cast("double") / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))).alias("jaccard"),
        )
    )


def dup_shingle_fraction(
    df: DataFrame, id_col: str, text_col: str,
    n: int = 3, min_docs: int = 2,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Per-document CROSS-corpus duplicated n-gram fraction — the
    MassiveText/RefinedWeb "duplicate n-gram" quality signal (Rae et al.
    2021 §A1.2 applies it within documents via ``repetition_stats``; the
    corpus-level variant flags docs largely assembled from text that also
    appears elsewhere: mirrored articles, templated spam, quote farms).

    Returns ``(doc_id, n_shingles, n_dup_shingles, dup_fraction)`` where
    ``dup_fraction`` is the share of the doc's DISTINCT word n-grams that
    occur in at least ``min_docs`` documents corpus-wide. Every doc
    participates — degenerate texts fold to a single sentinel shingle
    (``shingle_table`` contract: null texts share shingle 0, blank texts
    share the md5('') fold), so two null-text docs score 1.0 against each
    other, consistent with exact_dedup's null-grouping policy.

    Plan shape at corpus scale: the shingle table is persisted once and
    feeds BOTH the doc-frequency aggregation and the join-back (Spark
    never reuses a self-referencing exchange — same reason as
    ``candidate_jaccard``). The frequency side is filtered to shingles
    with doc-freq >= ``min_docs`` BEFORE the join, so the shuffled build
    side carries only the (typically rare) duplicated shingles, and the
    left join marks membership — the 40-bit hash keys are near-uniform,
    so both shuffles are skew-free. No self-join, no window, no
    driver-side state. The fraction is a single int/int double division
    (correctly rounded — bit-identical in the DuckDB oracle twin,
    oracle.dup_shingle_fraction_documents). Pass a prebuilt PERSISTED
    ``shingles`` table to share the explode+md5 map stage with a dedup
    pipeline that already built one.

    Extends the reference's row-level rule battery (sniff predicates,
    /root/reference/src/xoverrr/utils.py:262) with a corpus-statistics
    rule a single-node engine has no analogue for.
    """
    own = None
    if shingles is None:
        own = shingle_table(df, id_col, text_col, n).persist()
        shingles = own
    dup = (
        shingles.groupBy("shingle_hash")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") >= min_docs)
        .drop("_df")
        .withColumn("_dup", F.lit(1))
    )
    out = (
        shingles.join(dup, "shingle_hash", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.coalesce(F.col("_dup"), F.lit(0))).alias("n_dup_shingles"),
        )
        .withColumn(
            "dup_fraction",
            F.col("n_dup_shingles").cast("double") / F.col("n_shingles"),
        )
    )
    return _attach_intermediates(out, [own])


SIMHASH_BANDS = 4  # pigeonhole: hamming <= 3 pairs share at least one band


def simhash_near_dups(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3,
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """(doc_a, doc_b, hamming) pairs with simhash Hamming distance <=
    ``max_hamming``.

    Banded candidate generation (pigeonhole: a pair within distance d must
    agree exactly on >= 1 of d+1 bands) keeps the join O(docs x bands) —
    then one ``bit_count(xor)`` verifies exactly. Requires
    SIMHASH_BANDS > max_hamming. Buckets above ``max_bucket_size`` are
    skipped (same W3 cap as LSH — identical-simhash floods are exact-dup
    territory).
    """
    if max_hamming >= SIMHASH_BANDS:
        raise ValueError("max_hamming must be < SIMHASH_BANDS for the pigeonhole")
    sig = simhash(df, id_col, text_col)
    band_bits = SIMHASH_BITS // SIMHASH_BANDS
    mask = (1 << band_bits) - 1
    bands = sig.select(
        "doc_id", "simhash",
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(F.col("simhash"), b * band_bits).bitwiseAND(F.lit(mask)).alias("bkey"),
            )
            for b in range(SIMHASH_BANDS)
        ])).alias("bb"),
    ).select("doc_id", "simhash", "bb.band", "bb.bkey")
    # persisted for the same self-join double-compute reason as
    # _capped_bucket_self_join (the 48-column simhash agg runs once);
    # freed via release_intermediates(result) after materialization
    bands = _cap_buckets(bands, max_bucket_size).persist()
    a, b = bands.alias("a"), bands.alias("b")
    cands = (
        a.join(b, ["band", "bkey"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .distinct()
    )
    return _attach_intermediates(cands.filter(F.col("hamming") <= max_hamming), [bands])


class ClusteringNotConverged(RuntimeError):
    """min-label propagation hit max_iter with labels still changing —
    cluster_ids would be silently split (ADVICE r01)."""


def _changed_count_frame(new_labels: DataFrame, labels: DataFrame) -> DataFrame:
    """Rows whose label changed this iteration, built from the CHECKPOINTED
    new labels — counting from the un-materialized propagation plan and
    then checkpointing it would execute every iteration's joins twice
    (VERDICT r02). Split out so tests can pin that this frame reads only
    checkpointed RDD scans, never the propagation aggregation."""
    return (
        new_labels.alias("n")
        .join(labels.alias("o"), "doc_id")
        .filter(F.col("n.cluster_id") != F.col("o.cluster_id"))
        .limit(1)
    )


def cluster_near_dups(pairs: DataFrame, max_iter: int = 10) -> DataFrame:
    """Connected components over near-dup pairs -> (doc_id, cluster_id).

    Min-label propagation with POINTER DOUBLING: each iteration every node
    adopts min(own label, neighbors' labels, label-of-own-label). The
    doubling hop (labels joined to labels) halves the remaining diameter
    each round, so convergence is O(log diameter) iterations — a
    10^6-long duplicate chain converges in ~20 rounds, not 10^6. Each
    iteration is two joins + one groupBy on doc_id, executed ONCE: the new
    labels are localCheckpoint'ed FIRST (cutting lineage) and the
    convergence check then reads the checkpointed RDD, so the propagation
    plan never runs twice per iteration. cluster_id = min doc_id of the
    component. Raises ClusteringNotConverged instead of returning silently
    split clusters when max_iter is insufficient (ADVICE r01).
    """
    edges = (
        pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
        .unionByName(pairs.select(F.col("doc_b").alias("a"), F.col("doc_a").alias("b")))
        .distinct()
        .cache()
    )
    # checkpointed so every _changed_count_frame compares two materialized
    # RDDs (the initial distinct would otherwise re-run under the compare)
    labels = (
        edges.select(F.col("a").alias("doc_id"))
        .distinct()
        .withColumn("cluster_id", F.col("doc_id"))
        .localCheckpoint(eager=True)
    )
    converged = False
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.b == labels.doc_id)
            .groupBy(F.col("a").alias("doc_id"))
            .agg(F.min("cluster_id").alias("nbr_min"))
        )
        # pointer doubling: label of my label (cluster_id -> that node's label)
        parent = labels.select(
            F.col("doc_id").alias("cluster_id"), F.col("cluster_id").alias("grand")
        )
        new_labels = (
            labels.join(neighbor_min, "doc_id", "left")
            .join(parent, "cluster_id", "left")
            .select(
                "doc_id",
                F.least(
                    F.col("cluster_id"),
                    F.coalesce("nbr_min", F.col("cluster_id")),
                    F.coalesce("grand", F.col("cluster_id")),
                ).alias("cluster_id"),
            )
        )
        # checkpoint FIRST, then count changes from the materialized frame:
        # the propagation joins execute exactly once per iteration
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = _changed_count_frame(new_labels, labels).count()
        labels = new_labels
        if changed == 0:
            converged = True
            break
    edges.unpersist()
    if not converged:
        raise ClusteringNotConverged(
            f"label propagation still changing after {max_iter} iterations; "
            "raise max_iter (doubling converges in O(log diameter))"
        )
    return labels


def contaminated_docs(
    df: DataFrame, benchmark: DataFrame, id_col: str, text_col: str,
    shingle_n: int = 3,
) -> DataFrame:
    """Training-data decontamination: doc ids sharing ANY word ``shingle_n``-gram
    with the benchmark corpus (eval-set leakage must not reach training data).

    Scale shape: benchmarks are thousands of rows while the corpus is
    billions, so the benchmark's distinct shingle set broadcasts and the
    corpus side is ONE pass — explode + broadcast left_semi + distinct,
    no shuffle of the corpus rows themselves (only the surviving ids
    deduplicate).
    """
    bench_sh = (
        shingle_table(benchmark, id_col, text_col, shingle_n)
        .select("shingle_hash").distinct()
    )
    doc_sh = shingle_table(df, id_col, text_col, shingle_n)
    return (
        doc_sh.join(F.broadcast(bench_sh), "shingle_hash", "left_semi")
        .select("doc_id").distinct()
    )


def contamination_scores(
    df: DataFrame, benchmark: DataFrame, id_col: str, text_col: str,
    shingle_n: int = 3,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Fractional decontamination scoring: per document, the share of its
    distinct word n-grams that appear anywhere in the benchmark corpus —
    ``(doc_id, n_shingles, n_bench_shingles, contamination)``.

    ``contaminated_docs`` answers the binary question (ANY shared
    shingle — the conservative "remove it" policy); real curation
    recipes also threshold FRACTIONAL overlap so a doc quoting one
    benchmark sentence is distinguishable from a doc that IS the
    benchmark page with ads around it. A caller filters
    ``contamination >= t`` for the policy it wants; 0.0 rows are kept so
    the output is a per-doc feature, not a flag list.

    Same scale shape as ``contaminated_docs``: the benchmark's distinct
    shingle set broadcasts (benchmarks are thousands of rows, the corpus
    is billions), so the corpus side is one explode + broadcast left
    join + one groupBy on doc_id — the corpus text rows themselves never
    shuffle, only (doc_id, counters) pairs with map-side partial
    aggregation. The fraction is a single int/int double division
    (correctly rounded — bit-identical in the DuckDB twin,
    oracle.contamination_scores_documents). Pass a prebuilt PERSISTED
    ``shingles`` table for the CORPUS side to share the explode+md5 map
    stage with other consumers (the benchmark side is small enough to
    re-shingle).
    """
    bench_sh = (
        shingle_table(benchmark, id_col, text_col, shingle_n)
        .select("shingle_hash").distinct()
        .withColumn("_b", F.lit(1))
    )
    doc_sh = (
        shingles if shingles is not None
        else shingle_table(df, id_col, text_col, shingle_n)
    )
    return (
        doc_sh.join(F.broadcast(bench_sh), "shingle_hash", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.coalesce(F.col("_b"), F.lit(0))).alias("n_bench_shingles"),
        )
        .withColumn(
            "contamination",
            F.col("n_bench_shingles").cast("double") / F.col("n_shingles"),
        )
    )


def cluster_survivors(
    labels: DataFrame, scores: DataFrame,
    id_col: str = "doc_id", score_col: str = "quality_score",
) -> DataFrame:
    """One survivor per near-dup cluster: the HIGHEST-QUALITY member (ties
    to the smallest id) — quality-aware canonical selection, replacing the
    min-id default when a score column is available (dedup should keep the
    best copy of boilerplate families, not an arbitrary one).

    ``labels`` = cluster_near_dups output (doc_id, cluster_id); ``scores``
    keyed by ``id_col``. One join + a rank window partitioned by
    cluster_id — near-dup clusters are small, so the window never
    serializes a hot partition.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy("cluster_id").orderBy(F.desc(score_col), F.asc(id_col))
    return (
        labels.join(scores, id_col)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


SIMHASH_BITS = 48


def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, simhash) — 48-bit sign-aggregated token-hash fingerprint.

    explode(tokens) -> per-bit +-1 sums in ONE aggregate (48 agg columns,
    partial combine map-side) -> bits reassembled as a long.
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("tok"),
    ).select("doc_id", md5_long(F.col("tok")).alias("th"))
    aggs = [
        F.sum(
            F.when(F.shiftright(F.col("th"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(SIMHASH_BITS)
    ]
    agged = toks.groupBy("doc_id").agg(*aggs)
    sim = None
    for i in range(SIMHASH_BITS):
        term = F.when(F.col(f"b{i}") > 0, F.lit(1 << i).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
        sim = term if sim is None else sim + term
    return agged.select("doc_id", sim.alias("simhash"))


# -------------------------------------------------- incremental ingestion ----

def fingerprint_index(corpus: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(text_fp) distinct fingerprint index of a corpus — the small table an
    ingestion pipeline PERSISTS between batches so incremental exact dedup
    never rescans the corpus (at 100 TB the index is the only thing you can
    afford to touch per batch). Null texts map to the same sentinel as
    exact_dedup, so a null-text new doc is recognized as a dup of the
    corpus's null-text group."""
    null_fp = F.lit("\x00<null-text>")
    return corpus.select(
        F.coalesce(fingerprint(F.col(text_col)), null_fp).alias("text_fp")
    ).distinct()


def incremental_exact_dedup(
    new_docs: DataFrame, corpus_fps: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Ingestion-time exact dedup: new-batch docs that survive BOTH checks —
    not byte-identical (canonical-form fingerprint) to any corpus doc
    (anti-join against the fingerprint index), nor to an earlier new-batch
    doc (min-id within batch).

    Shapes: the anti-join shuffles the (small) batch and the fp index —
    the corpus itself is never read; within-batch dedup is the same
    min-id-per-fingerprint groupBy as exact_dedup. Null-safe throughout via
    the shared sentinel.
    """
    null_fp = F.lit("\x00<null-text>")
    fp = new_docs.withColumn(
        "text_fp", F.coalesce(fingerprint(F.col(text_col)), null_fp)
    )
    fresh = fp.join(corpus_fps, "text_fp", "left_anti")
    keep = fresh.groupBy("text_fp").agg(F.min(id_col).alias(id_col))
    return fresh.join(keep, [id_col, "text_fp"], "left_semi").drop("text_fp")


def incremental_near_dups(
    new_docs: DataFrame,
    corpus: DataFrame | None,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.7,
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET,
    corpus_shingles: DataFrame | None = None,
    corpus_sigs: DataFrame | None = None,
    check_disjoint_ids: bool = False,
) -> DataFrame:
    """Ingestion-time near-dup detection: (new_id, corpus_id, jaccard) pairs
    where a NEW doc near-duplicates an EXISTING corpus doc — the two-table
    variant of ``minhash_near_dups``.

    The corpus side is NEVER self-joined: corpus band buckets join only
    against the (small) new-batch bucket table, so cost is
    O(corpus scan + batch×bucket-hits), not O(corpus²). The bucket cap
    applies to the CORPUS side of each bucket (a degenerate corpus bucket
    is exact-dup territory upstream); audit with ``bucket_size_stats``.

    Raw-corpus form (``corpus`` given): the corpus is scanned twice
    (signature pass + verify-shingle pass restricted by semi-join). The
    production ingestion loop instead passes the PERSISTED per-batch index
    (``corpus_shingles`` (doc_id, shingle_hash) and optionally
    ``corpus_sigs``) built by ``pipeline.dedup_runner.build_dedup_index``
    — then the raw corpus is never touched and ``corpus`` may be None.
    ``corpus_sigs`` defaults to re-aggregating from ``corpus_shingles``
    (cheap relative to the corpus scan it replaces).

    CONTRACT: new-batch doc ids must be DISJOINT from corpus doc ids — the
    verify step unions the two shingle tables, so a colliding id silently
    merges the two docs' shingle sets and corrupts the Jaccard. This can
    happen if batch id numbering restarts. ``check_disjoint_ids=True``
    verifies the contract with one semi-join count against the (small)
    new-batch side and raises on violation (costs one extra action; on by
    default in the staged runner, off here for composition).
    """
    if corpus_shingles is None and corpus is None:
        raise ValueError("pass either corpus or corpus_shingles")
    new_sh = shingle_table(new_docs, id_col, text_col, shingle_n).persist()
    new_buckets = _lsh_buckets(
        minhash_signature_from_shingles(new_sh, num_hashes), num_hashes, bands
    ).persist()

    corpus_sh = (
        corpus_shingles
        if corpus_shingles is not None
        else shingle_table(corpus, id_col, text_col, shingle_n)
    )
    sigs = (
        corpus_sigs
        if corpus_sigs is not None
        else minhash_signature_from_shingles(corpus_sh, num_hashes)
    )
    corpus_buckets = _cap_buckets(
        _lsh_buckets(sigs, num_hashes, bands),
        max_bucket_size,
    )
    nb = new_buckets.select(
        F.col("doc_id").alias("new_id"), "band", "bkey"
    )
    cb = corpus_buckets.select(
        F.col("doc_id").alias("corpus_id"), "band", "bkey"
    )
    cands = (
        nb.join(cb, ["band", "bkey"])
        .select(F.col("new_id").alias("doc_a"), F.col("corpus_id").alias("doc_b"))
        .distinct()
        .persist()
    )
    if check_disjoint_ids:
        ndup = (
            new_sh.select("doc_id")
            .distinct()
            .join(corpus_sh.select("doc_id").distinct(), "doc_id", "left_semi")
        )
        hits = [r.doc_id for r in ndup.limit(5).collect()]
        if hits:
            for frame in (new_sh, new_buckets, cands):
                frame.unpersist()
            raise ValueError(
                "incremental_near_dups: new-batch doc ids collide with "
                f"corpus doc ids (examples: {hits}) — colliding ids would "
                "silently merge shingle sets and corrupt the verified "
                "Jaccard. Renumber the batch (ids must be disjoint)."
            )
    # verify over ONE shingle universe (new persisted + corpus lazy —
    # that's the second corpus pass); ids must not collide across tables
    j = candidate_jaccard(
        new_docs, id_col, text_col, cands, shingle_n,
        shingles=new_sh.unionByName(corpus_sh),
    )
    j_inner = list(getattr(j, "_xoverrr_intermediates", ()))
    out = (
        j.filter(F.col("jaccard") >= jaccard_threshold)
        .select(
            F.col("doc_a").alias("new_id"),
            F.col("doc_b").alias("corpus_id"),
            "jaccard",
        )
    )
    return _attach_intermediates(out, j_inner + [new_sh, new_buckets, cands])


# ------------------------------------------------- bloom decontamination ----

BLOOM_M_BITS = 1 << 20
BLOOM_K = 3
BLOOM_SEED = 7654321


def bloom_contaminated_docs(
    df: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
    seed: int = BLOOM_SEED,
) -> DataFrame:
    """Bloom-filter variant of ``contaminated_docs`` — the scale path when
    the benchmark's exact shingle set outgrows a broadcast.

    ``contaminated_docs`` broadcasts the benchmark's distinct shingles:
    unbounded in benchmark size. Here the benchmark is folded into a Bloom
    filter — k affine positions mod ``m_bits`` per shingle — whose distinct
    set-bit table is BOUNDED at m_bits rows (8·m bytes worst case, ~8 MB at
    the default) no matter how many shingles the benchmark holds. A corpus
    shingle is flagged iff ALL its k positions are set (classic Bloom
    semantics: no false negatives, FP rate ~(1-e^{-kn/m})^k, deterministic
    given the affine family — the DuckDB oracle replays it bit-for-bit, so
    even the false positives are verified values, not noise).

    Duplicate positions within one shingle's k hashes are collapsed
    (array_distinct) BEFORE the hit count, else a shingle whose p_i collide
    could reach the count with fewer distinct matches than positions.

    Same corpus shape as the exact form: one pass, broadcast semi-join,
    only surviving (doc, shingle) keys aggregate.
    """
    if m_bits <= 0 or k <= 0:
        raise ValueError("m_bits and k must be positive")
    params = minhash_params(k, seed)

    def positions(x):
        return F.array_distinct(
            F.array(
                *[
                    ((F.lit(a) * x + F.lit(b)) % F.lit(MINHASH_MOD)) % F.lit(m_bits)
                    for a, b in params
                ]
            )
        )

    bench_pos = (
        shingle_table(benchmark, id_col, text_col, shingle_n)
        .select(F.explode(positions(F.col("shingle_hash"))).alias("pos"))
        .distinct()
    )
    doc_sh = shingle_table(df, id_col, text_col, shingle_n)
    dx = doc_sh.select(
        "doc_id",
        "shingle_hash",
        F.size(positions(F.col("shingle_hash"))).alias("_npos"),
        F.explode(positions(F.col("shingle_hash"))).alias("pos"),
    )
    hits = (
        dx.join(F.broadcast(bench_pos), "pos", "left_semi")
        .groupBy("doc_id", "shingle_hash", "_npos")
        .agg(F.count(F.lit(1)).alias("_hits"))
        .filter(F.col("_hits") == F.col("_npos"))
    )
    return hits.select("doc_id").distinct()
