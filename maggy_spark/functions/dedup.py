"""Deduplication over the `documents` table: exact, MinHash+LSH,
n-gram Jaccard.

Scale design (the whole point at 100 TB):
- exact dedup is a hash-groupBy on md5(text) — one shuffle on a
  16-byte key, never on the document bodies;
- MinHash signatures are per-row expressions (explode-free aggregate
  over the shingle array) — map-side only;
- LSH candidate generation joins on band keys (equi-join on short
  strings), so the pair space is bucketed, never the full n^2;
- Jaccard verification joins on shingles and only for co-bucketed
  pairs — count-based, exact, and the join key (shingle md5) is
  uniform so no skew.

MinHash trick for cross-engine parity: each "hash" is an 8-hex-char
window of a salted md5 of the shingle (4 independent 32-bit hashes
per digest, ceil(n_hashes/4) digests per shingle) and the signature
takes the lexicographic min per window — both engines order ASCII hex
identically, so signatures match bit-for-bit without any integer-hash
agreement between engines.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from maggy_spark.plans.fixtures import corpus_count, load_table, session_cached as _session_cached

# -- MinHash geometry: corpus-derived, like simhash_band_bits ----------
#
# The round-4/5 build used a FIXED 2-band x 2-hash signature, which
# surfaces a true jaccard-0.5 pair with only p ~ 0.44. Geometry now
# derives from corpus size and the near-dup threshold:
#
# - rows/band r: a random pair collides on an r-row band with
#   probability ~ j_bg^r where j_bg is the background (boilerplate)
#   jaccard of unrelated documents. With ~n^2/2 unrelated pairs, the
#   per-doc candidate load is ~ n * b * j_bg^r; holding it at a
#   constant C as the corpus grows needs r >= log(n/C) / log(1/j_bg)
#   — the exact analogue of simhash_band_bits' bits = log2(n/C).
# - bands b: the S-curve midpoint sits at (1/b)^(1/r); putting the
#   midpoint AT the threshold gives b = (1/t)^r (MMDS ch.3 recipe),
#   so recall at j = t is 1-(1-t^r)^b ~ 1-1/e and climbs steeply
#   above it (≥ 0.98 at j = 0.8 for every geometry in range).
#
# Caps: r <= 6 keeps the digest count bounded; b*r <= 96 caps signing
# CPU at 24 md5s/shingle no matter the corpus (at the cap, recall at
# the threshold degrades gracefully instead of CPU exploding — dd8's
# exact-jaccard verification downstream is unaffected either way).

NEAR_DUP_JACCARD = 0.5    # near-dup decision threshold; dd8 verifies exactly
MH_TARGET_BUCKET_DOCS = 8  # expected sub-threshold candidates per doc
MH_BG_INV = 10.0           # 1 / assumed background jaccard (0.1)
MH_MAX_ROWS = 6
MH_MAX_HASHES = 96


def minhash_geometry(n_docs: int, threshold: float = NEAR_DUP_JACCARD) -> tuple[int, int]:
    """(bands, rows) for a corpus of `n_docs` at `threshold`. The SQL
    twin (_MH_PARAMS_SQL) derives the identical values from count(*);
    literals are shared so the two cannot drift. The log quotient is
    snapped to 9 decimals BEFORE ceil in both engines: at corpus
    sizes where n/C is an exact power of the background (n = C·10^k)
    a last-ulp libm difference between Python's and DuckDB's ln would
    otherwise flip r by 1 (same snap as simhash_band_bits)."""
    q = round(math.log(max(n_docs, 1) / MH_TARGET_BUCKET_DOCS) / math.log(MH_BG_INV), 9)
    r = min(MH_MAX_ROWS, max(2, math.ceil(q)))
    b = min(int(round((1.0 / threshold) ** r)), MH_MAX_HASHES // r)
    return b, r


# SQL twin: same formula in value space, evaluated from count(*).
# Yields one row (b, r, nh = b*r, nd = digests per shingle).
_MH_PARAMS_SQL = f"""
    SELECT r,
           least(CAST(round(pow(1.0 / {NEAR_DUP_JACCARD}, r)) AS INTEGER), {MH_MAX_HASHES} // r) AS b,
           least(CAST(round(pow(1.0 / {NEAR_DUP_JACCARD}, r)) AS INTEGER), {MH_MAX_HASHES} // r) * r AS nh,
           (least(CAST(round(pow(1.0 / {NEAR_DUP_JACCARD}, r)) AS INTEGER), {MH_MAX_HASHES} // r) * r + 3) // 4 AS nd
    FROM (SELECT least({MH_MAX_ROWS}, greatest(2,
              CAST(ceil(round(ln(greatest(n, 1) / {MH_TARGET_BUCKET_DOCS}.0) / ln({MH_BG_INV}), 9)) AS INTEGER))) AS r
          FROM (SELECT count(*) AS n FROM documents))
"""


def _shingles_expr():
    """Distinct word-3-gram shingles as an array column (empty when
    the doc has < 3 tokens)."""
    w = F.split(F.col("text"), " ")
    n = F.size(w)
    grams = F.transform(
        F.sequence(F.lit(1), n - 2),
        lambda i: F.concat_ws(" ", F.element_at(w, i), F.element_at(w, i + 1), F.element_at(w, i + 2)),
    )
    return F.when(n >= 3, F.array_distinct(grams)).otherwise(F.array().cast("array<string>"))


_SHINGLES_SQL = """
    SELECT doc_id,
           list_distinct(
               CASE WHEN len(w) >= 3
                    THEN list_transform(generate_series(1, len(w) - 2),
                                        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
                    ELSE [] END
           ) AS shingles
    FROM (SELECT doc_id, str_split(text, ' ') AS w FROM documents)
"""


def dd1_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group by content hash, keep the lowest doc_id.
    One shuffle on a 16-byte key."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.md5("text").alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count("*").alias("n_copies"),
        )
    )


DD1_SQL = """
SELECT md5(text) AS text_hash, min(doc_id) AS keep_id, count(*) AS n_copies
FROM documents GROUP BY md5(text)
"""




def _shingled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, sh) with sh = distinct word-3-gram shingles, scan
    fanned out to the session's cores (shingling + hashing is the
    CPU-bound step of every operator below). Session-cached and
    persisted: dd3/dd4/dd8/dd9/pl1 all derive from this one
    materialization instead of re-shingling the corpus per call."""
    return _session_cached(
        spark,
        (sf_dir, "shingles"),
        lambda: load_table(spark, sf_dir, "documents", fan_out=True).select(
            "doc_id", _shingles_expr().alias("sh")
        ),
    )


def _hashed(sh_df: DataFrame, n_digests: int) -> DataFrame:
    """(doc_id, hl) with hl = one long hex string per shingle — the
    concatenation of `n_digests` salted md5s (md5(s || '#d')), i.e.
    4 * n_digests independent 32-bit hash windows. A separate select
    so the hash array is a named producer column: CollapseProject
    keeps non-cheap expressions referenced more than once in their
    own projection, so the digests run ONCE per shingle even though
    every signature window reads them."""
    def digest(s):
        return F.concat(*[F.md5(F.concat(s, F.lit(f"#{d}"))) for d in range(n_digests)])

    return sh_df.select("doc_id", F.transform("sh", digest).alias("hl"))


def _sig_expr(n_hashes: int):
    """The MinHash signature as ONE hex string (8 chars per window):
    window w is the lexicographic min over shingles of hl chars
    [w*8, w*8+8). Null (= no shingles) propagates through concat, so
    short docs never join a band bucket on either engine."""
    # NB: plain closure over w — pyspark would treat a `w=w` default
    # as a second lambda variable; transform() evaluates the lambda
    # eagerly, so each window binds its own w
    return F.concat(
        *[
            F.array_min(F.transform("hl", lambda h: h.substr(8 * w + 1, 8)))
            for w in range(n_hashes)
        ]
    ).alias("sig")


def _band_keys(sig: DataFrame, bands: int, rows: int) -> DataFrame:
    """(doc_id, band_key) — band i is windows [i*rows, (i+1)*rows) of
    the signature string, tagged with the band index so distinct
    bands never cross-match."""
    return sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.concat(F.lit(f"b{i}:"), F.col("sig").substr(i * rows * 8 + 1, rows * 8))
                    for i in range(bands)
                ]
            )
        ).alias("band_key"),
    )


def _candidate_pairs(bands: DataFrame) -> DataFrame:
    """Distinct co-bucketed (doc_a < doc_b) pairs from a band-key
    relation. Callers persist `bands` first — the self-join must read
    a materialized relation, not re-derive the minhash pipeline on
    both sides."""
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(b, "band_key")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def dd2_minhash_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc MinHash signature with corpus-derived (bands, rows):
    one hex string of bands*rows 8-char windows. Map-side only —
    aggregate over the shingle array, no explode, no shuffle — and
    ceil(n_hashes/4) digest evaluations per shingle. Session-cached
    (r14 optimization): the digest chain is the CPU-bound step of the
    whole MinHash stack, and dd22 joins the relation on BOTH sides of
    its candidate compare — unpinned, the full-corpus signing ran once
    per side (plus once inside the band build). One signing pass now
    serves the band relation and every verification consumer — the
    long-lived signatures store of a production deployment."""
    b, r = minhash_geometry(corpus_count(spark, sf_dir, "documents"))
    nh = b * r
    return _session_cached(
        spark,
        (sf_dir, "minhash_sig"),
        lambda: _hashed(_shingled(spark, sf_dir), (nh + 3) // 4).select(
            "doc_id", _sig_expr(nh)
        ),
    )


# shared SQL fragments: geometry, signature, banding, and candidate
# generation are written ONCE and composed by DD2/DD3/DD8 (mirrors how
# the Spark side builds dd3/dd8 on dd2). Everything is value-space —
# window counts come from the params CTE, so the same static SQL is
# correct at every corpus size.
_SIG_SQL = """
    SELECT doc_id,
           list_reduce(
               list_transform(generate_series(0, nh - 1),
                   w -> list_min(list_transform(hl, h -> substr(h, w * 8 + 1, 8)))),
               (x, y) -> x || y
           ) AS sig
    FROM (
        SELECT doc_id,
               list_transform(shingles, s -> list_reduce(
                   list_transform(generate_series(0, nd - 1),
                       d -> md5(s || '#' || CAST(d AS VARCHAR))),
                   (x, y) -> x || y)) AS hl
        FROM sh CROSS JOIN p
    ) CROSS JOIN p
"""

_BANDS_SQL = """
    SELECT doc_id,
           'b' || CAST(i AS VARCHAR) || ':' || substr(sig, i * r * 8 + 1, r * 8) AS band_key
    FROM sig
    CROSS JOIN p
    CROSS JOIN (SELECT unnest(range((SELECT b FROM p))) AS i) g
"""

_CAND_SQL = """
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b ON a.band_key = b.band_key AND a.doc_id < b.doc_id
"""

DD2_SQL = f"""
WITH p AS ({_MH_PARAMS_SQL}),
sh AS ({_SHINGLES_SQL})
{_SIG_SQL}
"""


def dd3_lsh_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding with corpus-derived (bands, rows); docs sharing a
    band key are near-dup candidates. Self-join on the band key only —
    the pair space never materializes beyond actual bucket
    collisions."""
    # materialize band keys once: in production this is the
    # signatures table written to storage; without it the self-join
    # recomputes the full shingle+minhash pipeline on both sides
    return _candidate_pairs(_minhash_bands(spark, sf_dir))


def _minhash_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The session-persisted MinHash band-key relation — one signing
    pass shared by dd3's candidate join and dd8's verification path
    (both sides of each self-join read this one materialization)."""
    b, r = minhash_geometry(corpus_count(spark, sf_dir, "documents"))
    return _session_cached(
        spark,
        (sf_dir, "minhash_bands"),
        lambda: _band_keys(dd2_minhash_signature(spark, sf_dir), b, r),
    )


DD3_SQL = f"""
WITH p AS ({_MH_PARAMS_SQL}),
sh AS ({_SHINGLES_SQL}),
sig AS ({_SIG_SQL}),
bands AS ({_BANDS_SQL})
{_CAND_SQL}
"""


def dd4_ngram_jaccard(
    spark: SparkSession, sf_dir: str, min_common: int = 2, max_doc_freq: int = 50
) -> DataFrame:
    """Exact n-gram Jaccard for pairs sharing >= `min_common`
    shingles: explode distinct shingles, equi-join on the shingle,
    count intersections, Jaccard = inter / (|A| + |B| - inter).

    Shingles appearing in more than `max_doc_freq` docs are excluded
    from PAIR GENERATION (not from the jaccard denominator): a
    shingle shared by f docs contributes f^2 join pairs, so without
    the cap one viral shingle quadratically dominates the shuffle —
    the classic skew bomb of naive near-dup at corpus scale.
    Pairs whose every common shingle is viral are below any useful
    similarity threshold anyway.
    """
    d = _shingled(spark, sf_dir)
    sizes = d.select("doc_id", F.size("sh").alias("n_sh"))
    # join key is the 64-bit hash of the shingle, not the string:
    # narrow shuffle rows and cheap comparisons (engine-local detail —
    # the oracle joins on raw shingles; a 64-bit collision over the
    # shingle vocabulary is ~1e-10 at this scale)
    ex = d.select("doc_id", F.explode("sh").alias("shingle")).select(
        "doc_id", F.xxhash64("shingle").alias("sid")
    )
    # doc-frequency cap as a windowed count over sid: the window's
    # hash-partition on sid is the SAME partitioning the self-join
    # below needs, so the cap costs zero extra shuffles (the earlier
    # groupBy-count + semi-join formulation paid two; 2x at sf0.1).
    # Materialize the pruned postings once; both sides of the
    # self-join read the persisted relation instead of re-deriving
    # the shingle pipeline.
    from pyspark.sql.window import Window

    pruned = ex.withColumn("f", F.count("*").over(Window.partitionBy("sid"))).where(
        F.col("f") <= max_doc_freq
    ).drop("f")
    ex = _session_cached(spark, (sf_dir, "dd4_postings", max_doc_freq), lambda: pruned)
    a = ex.alias("a")
    b = ex.alias("b")
    inter = (
        a.join(b, "sid")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
        .where(F.col("n_common") >= min_common)
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.col("n_common").alias("n_common"),
            (
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double")
            ).alias("jaccard"),
        )
    )


DD4_SQL = f"""
WITH sh AS ({_SHINGLES_SQL}),
sizes AS (SELECT doc_id, len(shingles) AS n_sh FROM sh),
ex_all AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
rare AS (SELECT shingle FROM ex_all GROUP BY shingle HAVING count(*) <= 50),
ex AS (SELECT e.doc_id, e.shingle FROM ex_all e JOIN rare r ON e.shingle = r.shingle),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
    FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    HAVING count(*) >= 2
)
SELECT i.doc_a, i.doc_b, i.n_common,
       cast(i.n_common AS DOUBLE) / cast(sa.n_sh + sb.n_sh - i.n_common AS DOUBLE) AS jaccard
FROM inter i
JOIN sizes sa ON i.doc_a = sa.doc_id
JOIN sizes sb ON i.doc_b = sb.doc_id
"""


def dd5_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One union-find level over the exact-hash relation: every doc
    mapped to its cluster representative (min doc_id with the same
    content hash) plus an is_duplicate flag — the materialized
    keep/drop decision a corpus pipeline writes back."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", F.md5("text").alias("h"))
    reps = d.groupBy("h").agg(F.min("doc_id").alias("cluster_rep"))
    return d.join(reps, "h").select(
        "doc_id",
        "cluster_rep",
        (F.col("doc_id") != F.col("cluster_rep")).alias("is_duplicate"),
    )


DD5_SQL = """
WITH d AS (SELECT doc_id, md5(text) AS h FROM documents),
reps AS (SELECT h, min(doc_id) AS cluster_rep FROM d GROUP BY h)
SELECT d.doc_id, reps.cluster_rep, (d.doc_id != reps.cluster_rep) AS is_duplicate
FROM d JOIN reps ON d.h = reps.h
"""


# -- scale-aware SimHash ------------------------------------------------
#
# Blocking geometry derives from the corpus size instead of being a
# constant (the round-1 verdict's scale defect: a fixed 8-bit band =
# max 256 buckets, so in-bucket pair joins grow quadratically with the
# corpus). Pigeonhole banding keeps recall EXACT: with bands =
# max_hamming + 1, any pair within hamming distance max_hamming agrees
# on at least one whole band, so banded candidate generation loses no
# pair — the output is blocking-independent, which also lets the
# oracle verify it with a structure of its own choosing.

MAX_HAMMING = 3
SIMHASH_BANDS = MAX_HAMMING + 1  # pigeonhole: lossless for hamming <= MAX_HAMMING
TARGET_BUCKET_DOCS = 8           # expected docs per band bucket


def simhash_band_bits(n_docs: int) -> int:
    """Band width so that 2^bits ~ n/TARGET_BUCKET_DOCS: bucket
    population stays ~constant as the corpus grows, which makes the
    in-bucket pair join LINEAR in n instead of quadratic. Clamped to
    [4, 15] — 15 keeps the total signature (4 bands) inside a signed
    64-bit int so hamming is one bit_count(xor). The SQL twin derives
    the identical value from count(*); the log2 is snapped to 9
    decimals before ceil in both engines so a last-ulp libm
    difference cannot flip the band width at n = C·2^k corpus
    sizes (same snap as minhash_geometry)."""
    import math

    return min(15, max(4, math.ceil(round(math.log2(max(n_docs, 1) / TARGET_BUCKET_DOCS), 9))))


# SQL twin of the parameter derivation (total bits t = bands * b;
# one md5 per 32 signature bits -> chunks hex chars per token)
_SIMHASH_PARAMS_SQL = f"""
    SELECT b, {SIMHASH_BANDS} * b AS t, CAST(ceil(({SIMHASH_BANDS} * b) / 32.0) AS INTEGER) AS chunks
    FROM (
        SELECT GREATEST(4, LEAST(15,
            CAST(ceil(round(log2(GREATEST(count(*), 1) / {TARGET_BUCKET_DOCS}.0), 9)) AS INTEGER))) AS b
        FROM documents
    )
"""


def _simhash_expr(total_bits: int, chunks: int):
    """`total_bits`-bit SimHash over distinct tokens as a bit-string.

    Vote k for a token is the high bit of hex char (k mod 32) of
    md5('<k//32>|' || token) — ONE md5 per token per 32 bits (the
    md5 hex is the shared cross-engine hash family), not one md5 per
    bit. The vote tally is a single fold over the token array with an
    integer-vector accumulator: map-side only, no explode, no shuffle,
    and the md5s are evaluated once per token because the hash string
    appears exactly once in the expression tree.
    """
    toks = F.array_distinct(F.split(F.col("text"), " "))
    hashes = F.transform(
        toks, lambda t: F.concat(*[F.md5(F.concat(F.lit(f"{i}|"), t)) for i in range(chunks)])
    )
    idx = F.sequence(F.lit(1), F.lit(total_bits))
    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), total_bits),
        lambda acc, h: F.zip_with(
            acc, idx, lambda a, k: a + F.when(h.substr(k, F.lit(1)) < "8", 1).otherwise(-1)
        ),
    )
    return F.array_join(F.transform(votes, lambda v: F.when(v >= 0, "1").otherwise("0")), "")


# SQL twin: same hash family, same vote rule, same bit order. The
# derived parameters ride along as columns (CROSS JOIN with the 1-row
# params relation) because DuckDB forbids subqueries inside lambdas.
# The per-bit list_sum walks the hash array once per bit — fine for
# the oracle, which only runs at gate scale. NULL text yields a NULL
# signature, matching Spark's natural NULL propagation (a non-NULL
# text always has >= 1 token, so list_sum is never NULL otherwise).
_SIMHASH_SIG_SQL = """
    SELECT doc_id, b, t,
           CASE WHEN hs IS NULL THEN NULL ELSE
               array_to_string(list_transform(generate_series(1, t), k ->
                   CASE WHEN list_sum(list_transform(hs, h ->
                            CASE WHEN substr(h, k, 1) < '8' THEN 1 ELSE -1 END)) >= 0
                        THEN '1' ELSE '0' END), '')
           END AS simhash
    FROM (
        SELECT doc_id, p.b AS b, p.t AS t,
               list_transform(list_distinct(str_split(text, ' ')), tk ->
                   array_to_string(list_transform(generate_series(0, p.chunks - 1), i ->
                       md5(CAST(i AS VARCHAR) || '|' || tk)), '')) AS hs
        FROM documents CROSS JOIN p
    )
"""


def dd6_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc SimHash signature + its first band (one of the
    SIMHASH_BANDS blocking keys dd7 generates). Signature width is
    corpus-derived: bands * simhash_band_bits(n)."""
    d = load_table(spark, sf_dir, "documents", fan_out=True)
    b = simhash_band_bits(corpus_count(spark, sf_dir, "documents"))
    t = SIMHASH_BANDS * b
    chunks = -(-t // 32)
    return d.select("doc_id", _simhash_expr(t, chunks).alias("simhash")).select(
        "doc_id", "simhash", F.substring("simhash", 1, b).alias("band")
    )


DD6_SQL = f"""
WITH p AS ({_SIMHASH_PARAMS_SQL}),
sig AS ({_SIMHASH_SIG_SQL})
SELECT doc_id, simhash, substr(simhash, 1, b) AS band FROM sig
"""


def dd7_simhash_near_dup(spark: SparkSession, sf_dir: str, max_hamming: int = MAX_HAMMING) -> DataFrame:
    """SimHash near-duplicate pairs: candidates from SIMHASH_BANDS
    band-key equi-joins (pigeonhole — lossless for hamming <=
    max_hamming), then exact hamming over the full signature. Bucket
    count is 2^band_bits ~ n/TARGET_BUCKET_DOCS, so candidate volume
    scales LINEARLY with the corpus; the output is the exact set of
    pairs within max_hamming, independent of the blocking.

    Pair-level mechanics are integer, not string: the signature rides
    as a 64-bit int, the band key is one long (band index in the high
    bits, band value in the low), hamming is one bit_count(xor) per
    candidate, and a pair sharing several bands is emitted only by its
    FIRST matching band (statically-unrolled shift/mask prefix-
    inequality guard) — no DISTINCT, so nothing reshuffles the
    candidate stream, and the shuffled rows are three longs wide.
    """
    if max_hamming > MAX_HAMMING:
        # pigeonhole banding is lossless only for distances < bands:
        # dd6 signatures carry SIMHASH_BANDS = MAX_HAMMING + 1 bands,
        # so a larger radius would silently lose pairs
        raise ValueError(
            f"max_hamming={max_hamming} exceeds the banding's exact-recall "
            f"radius {MAX_HAMMING} (SIMHASH_BANDS={SIMHASH_BANDS})"
        )
    bands, b, t = simhash_band_relation(spark, sf_dir)
    a = bands.select(F.col("doc_id").alias("doc_a"), F.col("sigint").alias("sa"), "band_key")
    bb = bands.select(F.col("doc_id").alias("doc_b"), F.col("sigint").alias("sb"), "band_key")
    first_match, ham = _first_match_and_hamming(b, t)
    return (
        a.join(bb, "band_key")
        .where(F.col("doc_a") < F.col("doc_b"))
        .where(ham <= max_hamming)
        .where(first_match)
        .select("doc_a", "doc_b", ham.cast("int").alias("hamming"))
    )


def _bval(col, i: int, b: int, t: int):
    # simhash[ i*b+1 .. (i+1)*b ] as an int: the string's leftmost
    # bit is the integer's most significant
    return F.shiftrightunsigned(col, t - (i + 1) * b).bitwiseAND(F.lit((1 << b) - 1))


def simhash_bands_for(docs: DataFrame, n_docs: int, *, persist: bool = True):
    """(bands, band_bits, total_bits) over ANY (doc_id, text) relation
    — including a STREAMING one, since every expression is map-side:
    one (doc_id, sigint, band_key) row per band, band key as one long
    (band index in the high bits, value in the low). `n_docs` shapes
    the banding geometry and must describe the relation the bands will
    be JOINED against (for a stream probing a store, the store)."""
    b = simhash_band_bits(n_docs)
    t = SIMHASH_BANDS * b
    chunks = -(-t // 32)
    sig = docs.withColumn(
        "sigint", F.conv(_simhash_expr(t, chunks), 2, 10).cast("long")
    )
    bands = sig.select(
        *[c for c in docs.columns if c != "text"],
        "sigint",
        F.explode(
            F.array(*[F.lit(i << b) + _bval(F.col("sigint"), i, b, t) for i in range(SIMHASH_BANDS)])
        ).alias("band_key"),
    )
    if persist:
        bands = bands.persist()
    return bands, b, t


def simhash_band_relation(spark: SparkSession, sf_dir: str):
    """The persisted SimHash signatures table over the corpus — the
    production relation every near-dup pass (dd7 full sweep, dd11
    ingest probe, streaming alerts) joins against. Goes through the
    SHARED session cache (plans.fixtures.session_cached, same
    immutable-fixture-dir contract) so passes that compose — dd10
    runs dd7's join, dd11 probes the same bands — sign the corpus
    ONCE per session; the geometry (band_bits, total_bits) re-derives
    from the memoized corpus count."""
    n = corpus_count(spark, sf_dir, "documents")
    b = simhash_band_bits(n)
    t = SIMHASH_BANDS * b
    bands = _session_cached(
        spark,
        (sf_dir, "simhash_bands"),
        lambda: simhash_bands_for(
            load_table(spark, sf_dir, "documents", fan_out=True).select("doc_id", "text"),
            n,
            persist=False,
        )[0],
    )
    return bands, b, t


def _first_match_and_hamming(b: int, t: int):
    """(first_match, hamming) expressions over join columns sa/sb/
    band_key: a pair sharing several bands is emitted only by its
    FIRST matching band (statically-unrolled shift/mask prefix-
    inequality guard) — no DISTINCT, so nothing reshuffles the
    candidate stream. Both expressions are symmetric in sa/sb."""
    from functools import reduce
    from operator import and_

    band_idx = F.shiftrightunsigned(F.col("band_key"), b)
    first_match = band_idx == 0
    for j in range(1, SIMHASH_BANDS):
        prior_diff = reduce(
            and_, [_bval(F.col("sa"), jj, b, t) != _bval(F.col("sb"), jj, b, t) for jj in range(j)]
        )
        first_match = first_match | ((band_idx == j) & prior_diff)
    ham = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    return first_match, ham


# The oracle generates candidates the same banded way (cheap at gate
# scale); because pigeonhole banding is lossless, this is exactly the
# set of pairs within MAX_HAMMING — any Spark-side blocking bug that
# drops a band or mis-slices a key shows up as missing rows. The
# band/candidate CTE bodies are shared with DD10's oracle, which
# clusters the same pair relation.
_SIMHASH_BANDS_SQL = f"""
    SELECT doc_id, simhash, t,
           CAST(i AS VARCHAR) || ':' || substr(simhash, i * b + 1, b) AS band_key
    FROM sig CROSS JOIN generate_series(0, {SIMHASH_BANDS - 1}) gs(i)
"""

_SIMHASH_CAND_SQL = """
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.simhash AS ha, b.simhash AS hb, a.t AS t
    FROM bands a JOIN bands b ON a.band_key = b.band_key AND a.doc_id < b.doc_id
"""

DD7_SQL = f"""
WITH p AS ({_SIMHASH_PARAMS_SQL}),
sig AS ({_SIMHASH_SIG_SQL}),
bands AS ({_SIMHASH_BANDS_SQL}),
cand AS ({_SIMHASH_CAND_SQL})
SELECT doc_a, doc_b,
       CAST(list_sum(list_transform(generate_series(1, t),
            i -> CASE WHEN substr(ha, i, 1) != substr(hb, i, 1) THEN 1 ELSE 0 END)) AS INTEGER) AS hamming
FROM cand
WHERE list_sum(list_transform(generate_series(1, t),
        i -> CASE WHEN substr(ha, i, 1) != substr(hb, i, 1) THEN 1 ELSE 0 END)) <= {MAX_HAMMING}
"""


def dd8_lsh_verified_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production near-dup pipeline: LSH band candidates (dd3)
    verified with EXACT jaccard via array_intersect of the two docs'
    distinct-shingle arrays. Work is proportional to the candidate
    count, not Σf² over shingle frequencies — this is the path that
    replaces dd4's exhaustive verification at corpus scale.

    The shingle relation is computed ONCE and persisted; signatures,
    band keys, and the verification arrays all derive from it, so the
    text is scanned and shingled a single time (the naive composition
    dd3 ∘ scan re-shingled the corpus for each side).
    """
    sh = _shingled(spark, sf_dir)
    cand = _candidate_pairs(_minhash_bands(spark, sf_dir))
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    joined = cand.join(a, "doc_a").join(b, "doc_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return joined.select(
        "doc_a",
        "doc_b",
        inter.cast("bigint").alias("n_common"),
        (inter.cast("double") / union.cast("double")).alias("jaccard"),
    )


DD8_SQL = f"""
WITH p AS ({_MH_PARAMS_SQL}),
sh AS ({_SHINGLES_SQL}),
sig AS ({_SIG_SQL}),
bands AS ({_BANDS_SQL}),
cand AS ({_CAND_SQL})
SELECT c.doc_a, c.doc_b,
       cast(len(list_intersect(sa.shingles, sb.shingles)) AS BIGINT) AS n_common,
       cast(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
           / cast(len(sa.shingles) + len(sb.shingles) - len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE) AS jaccard
FROM cand c
JOIN sh sa ON c.doc_a = sa.doc_id
JOIN sh sb ON c.doc_b = sb.doc_id
"""


def dd9_decontaminate(
    spark: SparkSession, sf_dir: str, eval_mod: int = 100, min_containment: float = 0.5
) -> DataFrame:
    """Benchmark decontamination: find training documents whose
    3-gram shingle sets CONTAIN a large fraction of any held-out
    eval document's shingles (the GPT-3-style n-gram overlap test a
    training pipeline must run before every release).

    Here the eval set is the deterministic `doc_id % eval_mod == 0`
    slice; in production it is the benchmark suite. Containment —
    |train ∩ eval| / |eval| — not Jaccard: a 100-word eval prompt
    embedded verbatim in a 10k-word web page has tiny Jaccard but
    containment 1.0.

    Scale shape: the corpus is shingled ONCE (shared persisted
    relation); the exploded EVAL side is broadcast — benchmarks are
    MBs while the corpus is 100 TB, so the contamination probe is a
    map-side broadcast join + one aggregation keyed by
    (train_doc, eval_doc): candidate-bounded, never corpus x corpus.
    Not in the driver registry (50-entry cap); parity is enforced by
    tests/test_offline_oracles.py with the same three-way compare.
    """
    sh = _shingled(spark, sf_dir)
    is_eval = F.col("doc_id") % eval_mod == 0
    ev = sh.where(is_eval).select(
        F.col("doc_id").alias("eval_doc"),
        F.explode("sh").alias("s"),
        F.size("sh").alias("n_eval"),
    )
    tr = sh.where(~is_eval).select(F.col("doc_id").alias("train_doc"), F.explode("sh").alias("s"))
    hits = (
        tr.join(F.broadcast(ev), "s")
        .groupBy("train_doc", "eval_doc", "n_eval")
        .agg(F.count("*").alias("n_common"))  # shingles are distinct per doc
    )
    containment = F.col("n_common").cast("double") / F.col("n_eval").cast("double")
    return hits.where(containment >= min_containment).select(
        "train_doc",
        "eval_doc",
        F.col("n_common").cast("bigint").alias("n_common"),
        containment.alias("containment"),
    )


DD9_SQL = f"""
WITH sh AS ({_SHINGLES_SQL}),
ev AS (
    SELECT doc_id AS eval_doc, unnest(shingles) AS s, len(shingles) AS n_eval
    FROM sh WHERE doc_id % 100 = 0
),
tr AS (
    SELECT doc_id AS train_doc, unnest(shingles) AS s
    FROM sh WHERE doc_id % 100 != 0
),
hits AS (
    SELECT t.train_doc, e.eval_doc, e.n_eval, count(*) AS n_common
    FROM tr t JOIN ev e ON t.s = e.s
    GROUP BY t.train_doc, e.eval_doc, e.n_eval
)
SELECT train_doc, eval_doc,
       cast(n_common AS BIGINT) AS n_common,
       cast(n_common AS DOUBLE) / cast(n_eval AS DOUBLE) AS containment
FROM hits
WHERE cast(n_common AS DOUBLE) / cast(n_eval AS DOUBLE) >= 0.5
"""


# -- dd10: near-duplicate connected components -------------------------
#
# Pair relations (dd7/dd8) are NOT the keep/drop decision: near-dup
# similarity is not transitive, so a corpus pipeline clusters the pair
# graph into connected components and keeps one representative per
# component (the fuzzy twin of dd5's exact-hash clusters). At 100 TB
# the pair graph doesn't fit one machine, so this is the alternating
# large-star / small-star MapReduce algorithm (Kiveris et al.,
# "Connected Components in MapReduce and Beyond", SoCC'14): O(log^2 n)
# rounds, each round a constant number of groupBy/join/distinct
# shuffles over a 2-long-column edge relation.


def _large_star(e: DataFrame) -> DataFrame:
    """One large-star round over an undirected edge set stored as
    (hi, lo): every node u links each STRICTLY LARGER neighbor v to
    m = min(neighborhood(u) + {u}). High-degree hubs (the skew risk
    of any CC algorithm) cost one map-side partial min plus one
    equi-join on u — the neighbor list is never materialized, and the
    skewed join partition a hub creates is AQE-skew-splittable (a
    window-min spelling would not be: AQE cannot split window
    partitions — guide §2.5).

    Shuffle shape (r14 optimization, guide §2.4): both orientations
    come from ONE explode over the checkpointed edge scan (not a
    self-union that scans it twice), and the closing dedup is planned
    as repartition(hi) + dropDuplicates — hashpartitioning(hi) already
    satisfies the (hi, lo) dedup's clustering requirement AND is
    exactly the distribution `_small_star`'s per-hi min and relink
    join need, so the whole small-star half of the round runs with no
    further shuffle (verified in plans/r14/star_round_after.txt: 4
    distinct Exchanges per round vs 6 in the r13 spelling)."""
    sym = e.select(
        F.explode(
            F.array(
                F.struct(F.col("hi").alias("u"), F.col("lo").alias("v")),
                F.struct(F.col("lo").alias("u"), F.col("hi").alias("v")),
            )
        ).alias("s")
    ).select("s.u", "s.v")
    mins = sym.groupBy("u").agg(F.min("v").alias("mv"))
    return (
        sym.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("hi"), F.least("mv", "u").alias("lo"))
        .where(F.col("hi") != F.col("lo"))
        .repartition("hi")
        .dropDuplicates()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """One small-star round: edges are already oriented (hi, lo) with
    hi > lo; every node hi links all its smaller neighbors AND itself
    to m = min of those neighbors. When composed after `_large_star`
    the input is already hashpartitioning(hi), so the min aggregate
    and the relink join plan with no new Exchange; standalone, the
    usual partial-min + equi-join shape applies."""
    mins = e.groupBy("hi").agg(F.min("lo").alias("m"))
    relink = e.join(mins, "hi").select(F.col("lo").alias("child"), F.col("m").alias("parent"))
    selfl = mins.select(F.col("hi").alias("child"), F.col("m").alias("parent"))
    return (
        relink.unionAll(selfl)
        .where(F.col("child") != F.col("parent"))
        .select(F.col("child").alias("hi"), F.col("parent").alias("lo"))
        .distinct()
    )


def _is_star_forest(e: DataFrame) -> bool:
    """True iff the (hi, lo) edge set is a depth-1 star forest: every
    hi appears in exactly one edge and no node is both a hi and a lo.
    That shape is EXACTLY the fixpoint of a small∘large star round
    (each star's root is its component minimum because hi > lo on
    every edge, and one round maps a star forest to itself), so a
    True here proves convergence without paying the confirming round
    the checksum criterion needs. One union scan + one groupBy over
    2|E| (node, flag) rows, with isEmpty's early exit."""
    nodes = e.select(F.col("hi").alias("node"), F.lit(1).alias("is_hi")).unionAll(
        e.select(F.col("lo").alias("node"), F.lit(0).alias("is_hi"))
    )
    viol = (
        nodes.groupBy("node")
        .agg(F.sum("is_hi").alias("n_hi"), F.count("*").alias("n"))
        .where((F.col("n_hi") > 1) | ((F.col("n_hi") > 0) & (F.col("n") > F.col("n_hi"))))
    )
    return viol.isEmpty()


def _free_local_checkpoint(df: DataFrame) -> None:
    """Release the storage blocks behind a localCheckpoint'd frame.

    `DataFrame.unpersist` only clears CacheManager entries and never
    touches the RDD a localCheckpoint pinned (verified on this Spark:
    the checkpointed RDD stays in storage after unpersist), so the
    contraction loop frees the PREVIOUS round through the LogicalRDD
    plan node instead. Best-effort: if the plan shape ever changes,
    the ContextCleaner still frees the blocks on GC — this just makes
    the bound deterministic."""
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() == "LogicalRDD":
            plan.rdd().unpersist(False)
    except Exception:  # noqa: BLE001 - py4j access is version-sensitive
        pass


def star_components(edges: DataFrame, max_iter: int = 30, checkpoint_dir: str | None = None) -> DataFrame:
    """Contract an undirected edge relation (columns `hi`, `lo`) to
    star edges (node -> component minimum) by alternating large-star /
    small-star rounds to fixpoint.

    Provably O(log^2 n) rounds; real near-dup graphs converge in a
    handful because components are band-blocked and shallow.
    Convergence is detected by an order-insensitive checksum of the
    edge set — count + xxhash64 sum — collected as OBSERVED metrics
    (`Dataset.observe`) on the round's checkpoint materialization
    (r15 optimization): the eager checkpoint is already an action, so
    the checksum rides its pass as a CollectMetrics accumulator and
    costs ZERO extra jobs (the r14 spelling paid one separate agg job
    per round over the cached blocks; a lazy checkpoint with the agg
    as materializer was measured 2x slower — see the ckpt note). The
    edge relation itself never leaves the cluster; the driver sees
    two scalars per round.

    Each round ends in an EAGER checkpoint: one star round references
    the previous edge relation three times, so carrying raw lineage
    would grow the logical plan (and Catalyst analysis time)
    exponentially with the round count — the checkpoint pins the round
    to a materialized 2-long-column relation and keeps every round's
    plan constant-size. (A lazy checkpoint measured 2x slower here —
    see the ckpt note below.)

    Checkpoint durability: by default rounds pin executor-local blocks
    (`localCheckpoint` — fastest, but lost with an executor). On a real
    cluster with executor loss to tolerate, pass `checkpoint_dir` (or
    set the session conf `spark.maggy.checkpointDir`) and rounds go
    through RELIABLE `df.checkpoint()` against that directory — same
    loop shape, durable files, nothing pinned in block storage (round
    files are cleaned by Spark's ContextCleaner with
    `spark.cleaner.referenceTracking.cleanCheckpoints=true`, or by
    deleting the directory after the job).
    """
    spark = edges.sparkSession
    if checkpoint_dir is None:
        checkpoint_dir = spark.conf.get("spark.maggy.checkpointDir", None)
    durable = bool(checkpoint_dir)
    prev_ckpt_dir = None
    if durable:
        # setCheckpointDir is SparkContext-GLOBAL: remember any dir the
        # session had configured and restore it on exit, so this call
        # never redirects unrelated checkpoints elsewhere in the app.
        # (If NO dir was set before, ours necessarily stays set after —
        # Spark has no unset — which is harmless: other code that never
        # called checkpoint() keeps not calling it.)
        opt = spark.sparkContext._jsc.sc().getCheckpointDir()
        prev_ckpt_dir = opt.get() if opt.isDefined() else None
        spark.sparkContext.setCheckpointDir(checkpoint_dir)
        ckpt = lambda df: df.checkpoint(eager=True)  # noqa: E731
    else:
        # Stays EAGER deliberately (r14 optimization note): a lazy
        # localCheckpoint here was measured 2x SLOWER per dd10 run
        # (12.4 s vs 5.8 s solo median at sf0.1) — the convergence
        # checksum's aggregate then fuses into the round's result
        # stage and the materialization loses the coalesced final
        # plan the eager count() gets, so the "saved" job costs more
        # than it saves. (bpe_train shows the opposite profile and
        # uses the lazy form — see text.py.)
        ckpt = lambda df: df.localCheckpoint()  # noqa: E731
    try:
        from maggy_spark.plans.fixtures import checkpoint_with_metrics

        edges = ckpt(edges)
        prev_sig = None
        for _ in range(max_iter):
            # the convergence checksum rides the checkpoint's own
            # materializing action as a named CollectMetrics node — no
            # separate checksum job per round (r15; verified value-
            # identical to the old edges.agg spelling, empty relation
            # included). NOT a pyspark Observation: that would poison
            # the session for later ml closures (checkpoint_with_metrics).
            # checksum sums 64-bit hashes: accumulate in decimal(38,0)
            # so ANSI mode can't overflow the long accumulator
            nxt, sig = checkpoint_with_metrics(
                _small_star(_large_star(edges)),
                ckpt,
                F.count(F.lit(1)).alias("n"),
                F.sum(F.xxhash64("hi", "lo").cast("decimal(38,0)")).alias("h"),
            )
            # the eager checkpoint above fully materialized nxt, so the
            # previous round's blocks are dead — free them now instead
            # of waiting for JVM GC, bounding storage to two edge-set
            # copies (local mode only: reliable checkpoints live as
            # files, not pinned blocks, so there is nothing to free)
            if not durable:
                _free_local_checkpoint(edges)
            edges = nxt
            if sig == prev_sig:
                return edges
            # r14 optimization: when the edge COUNT has stabilized but
            # the content still moved, the loop is typically one round
            # from its fixpoint (measured at sf0.1: counts stable from
            # round 1, content from round 3, round 4 purely
            # confirmatory). A star-forest test over the checkpointed
            # edges proves convergence NOW for the cost of one light
            # groupBy job, saving the full confirming round (4 shuffles
            # + checkpoint + checksum) the sig comparison would pay.
            # Output-identical: the test only passes at the fixpoint
            # (see _is_star_forest), so the returned edge SET is the
            # same one the confirming round would have returned.
            if prev_sig is not None and sig[0] == prev_sig[0] and _is_star_forest(edges):
                return edges
            prev_sig = sig
        raise RuntimeError(f"connected components did not converge in {max_iter} rounds")
    finally:
        if durable and prev_ckpt_dir is not None:
            spark.sparkContext.setCheckpointDir(prev_ckpt_dir)


def components_over(universe: DataFrame, id_col: str, stars: DataFrame) -> DataFrame:
    """Materialize per-row cluster assignments from a star edge set:
    one row per `universe` row with (id, cluster_rep, cluster_size,
    is_duplicate). Singletons (rows with no edge) come back as their
    own representative via the left join.

    Skew note: `cluster_rep` is inherently skewed — a boilerplate-
    heavy corpus has giant components (95% of the synthetic corpus
    shares one; see SCALING.md) — so the sizes join deliberately
    stays a plain equi-join and leans on AQE skew-join splitting
    (`spark.sql.adaptive.enabled`, on by default): the build side is
    ONE row per key, which splits for free across the subdivided
    probe partitions. The sizes relation is O(#components) — up to
    one row per doc when all are singletons — so a broadcast hint
    here would be a scale bug, not an optimization."""
    reps = stars.groupBy("hi").agg(F.min("lo").alias("rep")).withColumnRenamed("hi", id_col)
    comp = universe.join(reps, id_col, "left").select(
        id_col, F.coalesce("rep", id_col).alias("cluster_rep")
    )
    sizes = comp.groupBy("cluster_rep").agg(F.count("*").alias("cluster_size"))
    return comp.join(sizes, "cluster_rep").select(
        id_col,
        "cluster_rep",
        "cluster_size",
        (F.col(id_col) != F.col("cluster_rep")).alias("is_duplicate"),
    )


def dd10_near_dup_components(spark: SparkSession, sf_dir: str, max_iter: int = 30) -> DataFrame:
    """Connected components over the dd7 SimHash near-dup pair graph:
    every document mapped to its component representative (the min
    doc_id reachable through near-dup edges), the component size, and
    the keep/drop decision — the fuzzy-dedup capstone that turns pair
    evidence into a deduplicated corpus. See `star_components` for the
    round mechanics and scale design.
    """
    pairs = dd7_simhash_near_dup(spark, sf_dir)
    # no .distinct(): dd7's first-matching-band guard already emits
    # each (doc_a, doc_b) pair exactly once, so deduping here was a
    # pure extra shuffle of the whole edge set (guide §2.4 — removed
    # r14; pinned by test_dd7_pairs_are_unique)
    edges = pairs.select(F.col("doc_b").alias("hi"), F.col("doc_a").alias("lo"))
    stars = star_components(edges, max_iter)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return components_over(docs, "doc_id", stars)


# Oracle: an INDEPENDENT algorithm — transitive closure by recursive
# CTE (min reachable id per node), feasible at gate scale. Any
# star-round bug (a lost edge, a wrong orientation, premature
# convergence) splits or merges a component and shows up as a
# cluster_rep / cluster_size mismatch. The closure block is shared by
# every components oracle (dd10, ann6, pl6) so the algorithm can't
# silently diverge between them.


def cc_closure_sql(universe_table: str, id_col: str, pair_a: str = "doc_a", pair_b: str = "doc_b") -> str:
    """CTE block (for a WITH RECURSIVE list) computing `comp`
    (id, cluster_rep) and `sizes` from a preceding `pairs` CTE with
    columns (pair_a, pair_b), over every row of `universe_table`."""
    return f"""sym AS (
    SELECT {pair_a} AS u, {pair_b} AS v FROM pairs
    UNION ALL
    SELECT {pair_b} AS u, {pair_a} AS v FROM pairs
),
reach(node, r) AS (
    SELECT {id_col}, {id_col} FROM {universe_table}
    UNION
    SELECT s.u, reach.r FROM reach JOIN sym s ON reach.node = s.v
),
comp AS MATERIALIZED (SELECT node AS {id_col}, min(r) AS cluster_rep FROM reach GROUP BY node),
sizes AS (SELECT cluster_rep, count(*) AS cluster_size FROM comp GROUP BY cluster_rep)"""


def cc_select_sql(id_col: str) -> str:
    """The standard components projection over cc_closure_sql's
    `comp`/`sizes` — the SQL twin of `components_over`."""
    return f"""SELECT c.{id_col}, c.cluster_rep, cast(s.cluster_size AS BIGINT) AS cluster_size,
       c.{id_col} != c.cluster_rep AS is_duplicate
FROM comp c JOIN sizes s USING (cluster_rep)"""


_SIMHASH_PAIRS_CTE = f"""
    SELECT doc_a, doc_b FROM cand
    WHERE list_sum(list_transform(generate_series(1, t),
            i -> CASE WHEN substr(ha, i, 1) != substr(hb, i, 1) THEN 1 ELSE 0 END)) <= {MAX_HAMMING}
"""

DD10_SQL = f"""
WITH RECURSIVE p AS ({_SIMHASH_PARAMS_SQL}),
sig AS ({_SIMHASH_SIG_SQL}),
bands AS ({_SIMHASH_BANDS_SQL}),
cand AS ({_SIMHASH_CAND_SQL}),
pairs AS ({_SIMHASH_PAIRS_CTE}),
{cc_closure_sql("documents", "doc_id")}
{cc_select_sql("doc_id")}
"""


def dd11_incremental_near_dup(
    spark: SparkSession, sf_dir: str, delta_mod: int = 10, max_hamming: int = MAX_HAMMING
) -> DataFrame:
    """Incremental near-dup: the pairs a NEWLY INGESTED batch
    introduces against the existing corpus — the production ingest
    path, where the signature store is long-lived and each arriving
    batch probes it instead of re-running store x store.

    The delta here is the deterministic `doc_id % delta_mod == 0`
    slice; in production it is the landed batch. Only the DELTA side's
    band keys enter the join's left side, so work is
    |delta| x bucket_population — INDEPENDENT of the store size beyond
    the bucket lookup, which is what makes per-batch dedup affordable
    against a 100 TB corpus. Emits exactly the dd7 pairs touching a
    delta doc (verified by test_dd11_equals_filtered_dd7): banding is
    pigeonhole-lossless, delta-internal pairs keep the a < b guard,
    and delta-vs-store pairs carry a symmetric first-match guard so no
    pair is emitted twice. Not in the driver registry (50-entry cap);
    DuckDB parity in tests/test_offline_oracles.py.
    """
    if max_hamming > MAX_HAMMING:
        raise ValueError(
            f"max_hamming={max_hamming} exceeds the banding's exact-recall "
            f"radius {MAX_HAMMING} (SIMHASH_BANDS={SIMHASH_BANDS})"
        )
    bands, b, t = simhash_band_relation(spark, sf_dir)
    is_delta = F.col("doc_id") % delta_mod == 0
    a = bands.where(is_delta).select(
        F.col("doc_id").alias("doc_a"), F.col("sigint").alias("sa"), "band_key"
    )
    bb = bands.select(F.col("doc_id").alias("doc_b"), F.col("sigint").alias("sb"), "band_key")
    first_match, ham = _first_match_and_hamming(b, t)
    both_delta = F.col("doc_b") % delta_mod == 0
    return (
        a.join(bb, "band_key")
        .where(F.col("doc_a") != F.col("doc_b"))
        # a delta-delta pair is reachable from both sides: keep the
        # a < b orientation only, like dd7
        .where(~both_delta | (F.col("doc_a") < F.col("doc_b")))
        .where(ham <= max_hamming)
        .where(first_match)
        .select(
            F.least("doc_a", "doc_b").alias("doc_a"),
            F.greatest("doc_a", "doc_b").alias("doc_b"),
            ham.cast("int").alias("hamming"),
        )
    )


def dd11_sql(delta_mod: int = 10, max_hamming: int = MAX_HAMMING) -> str:
    """DD11's DuckDB twin, generated from the SAME parameters the
    Spark operator takes (like cc_closure_sql) — a parity run with
    non-default delta_mod/max_hamming compares like with like instead
    of silently falling back to the defaults."""
    return f"""
WITH p AS ({_SIMHASH_PARAMS_SQL}),
sig AS ({_SIMHASH_SIG_SQL}),
bands AS ({_SIMHASH_BANDS_SQL}),
cand AS ({_SIMHASH_CAND_SQL})
SELECT doc_a, doc_b,
       CAST(list_sum(list_transform(generate_series(1, t),
            i -> CASE WHEN substr(ha, i, 1) != substr(hb, i, 1) THEN 1 ELSE 0 END)) AS INTEGER) AS hamming
FROM cand
WHERE list_sum(list_transform(generate_series(1, t),
        i -> CASE WHEN substr(ha, i, 1) != substr(hb, i, 1) THEN 1 ELSE 0 END)) <= {max_hamming}
  AND (doc_a % {delta_mod} = 0 OR doc_b % {delta_mod} = 0)
"""


DD11_SQL = dd11_sql()  # default-argument twin for the offline oracle table


OPERATORS = [
    ("dd1_exact_dedup", dd1_exact_dedup, DD1_SQL),
    # dd2_minhash_signature rotated OUT round 9 (the signature relation
    # is the internal first stage of the gate-green dd8 pipeline and
    # its corpus-derived width is pinned by the geometry tests) to free
    # a slot for ann8_ivf_quantized; parity continues in
    # tests/test_offline_oracles.py at the gate's sf0.01.
    # dd3_lsh_candidate_pairs rotated OUT of the registry round 7 (it is a
    # strict subset of the registered dd8 = dd3 + exact verify); parity
    # continues in tests/test_offline_oracles.py at sf0.01.
    # dd4_ngram_jaccard rotated OUT round 10 (VERDICT r9 item 2): its
    # exact-Jaccard verify is the verification stage of gate-green
    # dd8's LSH-verified pipeline, and it is intrinsically Σf² on the
    # dense synthetic vocab — the verification twin, not the
    # production path. Parity continues in
    # tests/test_offline_oracles.py at the gate's sf0.01.
    ("dd5_dedup_clusters", dd5_dedup_clusters, DD5_SQL),
    # dd6_simhash rotated OUT round 11 (pre-declared in COVERAGE.md r10):
    # it is the internal first stage of gate-green dd7's banded
    # near-dup pipeline, which recomputes the identical signature
    # relation. Parity continues in tests/test_offline_oracles.py at
    # the gate's sf0.01.
    ("dd7_simhash_near_dup", dd7_simhash_near_dup, DD7_SQL),
    ("dd8_lsh_verified_jaccard", dd8_lsh_verified_jaccard, DD8_SQL),
    ("dd10_near_dup_components", dd10_near_dup_components, DD10_SQL),
]


# -- DD12: per-doc duplicated-content profile ---------------------------


def dd12_boilerplate_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-content profile: for each doc, how many
    of its distinct 3-gram shingles occur in MORE THAN ONE document
    (corpus doc-frequency > 1) and the resulting shared fraction —
    the C4/RefinedWeb-style "duplicated mass" diagnostic a pipeline
    runs to pick its dedup thresholds and to monitor boilerplate
    creep between crawl snapshots.

    Scale shape: shingles come from the session-shared materialization
    (_shingled); the doc-frequency is a COUNT window over the exploded
    postings keyed by the 64-bit shingle hash — the same uniform key
    dd4 shuffles on, and the per-doc rollup is one further groupBy.
    Two shuffles total, both on uniform keys; no self-join, so viral
    shingles cost rows, never row-pairs. Not in the driver registry
    (50-entry cap); DuckDB parity in tests/test_offline_oracles.py.
    """
    return boilerplate_profile(_shingled(spark, sf_dir))


def boilerplate_profile(sh_df: DataFrame) -> DataFrame:
    """The profiling core over ANY (doc_id, sh) distinct-shingle
    relation — factored out so property tests can drive it with
    synthetic corpora (pack_plan pattern)."""
    from pyspark.sql import Window

    ex = sh_df.select("doc_id", F.explode("sh").alias("shingle")).select(
        "doc_id", F.xxhash64("shingle").alias("sid")
    )
    # shingles are DISTINCT per doc, so count-over-sid IS the doc
    # frequency; the window's sid partitioning replaces a groupBy +
    # join-back (one shuffle instead of two, as in dd4's df cap)
    tagged = ex.withColumn("df", F.count("*").over(Window.partitionBy("sid")))
    n_shared = F.sum(F.when(F.col("df") > 1, 1).otherwise(0))
    return (
        tagged.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            n_shared.alias("n_shared"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_shared",
            (F.col("n_shared").cast("double") / F.col("n_shingles").cast("double")).alias(
                "shared_frac"
            ),
        )
    )


DD12_SQL = f"""
WITH sh AS ({_SHINGLES_SQL}),
ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
tagged AS (SELECT doc_id, count(*) OVER (PARTITION BY s) AS df FROM ex)
SELECT doc_id,
       count(*) AS n_shingles,
       cast(sum(CASE WHEN df > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
       cast(sum(CASE WHEN df > 1 THEN 1 ELSE 0 END) AS DOUBLE) / cast(count(*) AS DOUBLE) AS shared_frac
FROM tagged
GROUP BY doc_id
"""


# Registered at the END of the module (dd12 is defined below the main
# OPERATORS list): the registry slot was freed by the round-6 ev1
# rotation (see operators/events.py) so the duplicated-mass
# diagnostic sits under the driver's hard gate.
OPERATORS.append(("dd12_boilerplate_profile", dd12_boilerplate_profile, DD12_SQL))


# --- dd13: exact duplicated-span mass (substring dedup) -----------------

SPAN_W = 8  # tokens per window; the testdata docs run ~30 tokens, so 8
# plays the role Lee et al.'s 50-token window plays on real corpora


def dd13_span_dedup(spark: SparkSession, sf_dir: str, w: int = SPAN_W) -> DataFrame:
    """Exact duplicated-SPAN mass per document: slide a ``w``-token
    window over every doc, find windows whose exact text occurs in
    >= 2 distinct documents, merge each doc's overlapping duplicated
    windows into maximal spans (gaps-and-islands), and report the
    token mass those spans cover — the quantity the substring-dedup
    pass of Lee et al. 2021 ("Deduplicating Training Data Makes
    Language Models Better", arXiv:2107.06499) would actually REMOVE
    from the corpus. dd12 profiles bag-of-shingles overlap; dd13 is
    the contiguous-span counterpart: only verbatim runs count, and
    overlapping windows are merged so mass is never double-counted.

    Reference parity note: the reference engine has no substring
    dedup; this is a §7.2-step-9 extension operator (SURVEY.md).

    Scale shape: suffix arrays don't distribute; the windowed-hash
    formulation does. One scan + one explode (~n_tokens rows/doc,
    16-byte md5 keys — bodies never cross a shuffle); duplicated
    windows via groupBy on the window hash (uniform key) with a
    count(distinct doc) HAVING — NOT collect_list, so a boilerplate
    span appearing in millions of docs costs rows, never a hot-key
    array; join-back on the same hash (exchange reuse); island
    merging is one per-doc sort window. No self-join anywhere, so
    viral spans never become row-pairs.

    The (doc_id, pos, whash) windows relation is session-cached (the
    long-lived signatures-table pattern, like _shingled): it feeds
    BOTH the duplicated-hash aggregate and the join-back, and without
    the materialization Catalyst re-scanned and re-hashed the corpus
    on each side (plan audit: the two consumers now read
    InMemoryTableScans; the tokenize+md5 explode runs once).
    """
    d = load_table(spark, sf_dir, "documents", fan_out=True)
    wins = _session_cached(
        spark, (sf_dir, "span_windows", w), lambda: _span_windows(d, w)
    )
    return span_dedup_profile(d, w, wins=wins)


def _span_windows(d: DataFrame, w: int) -> DataFrame:
    """(doc_id, pos, whash): every w-token sliding window's position
    and exact-text hash."""
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    idx = F.when(n >= w, F.sequence(F.lit(1), n - F.lit(w - 1))).otherwise(
        F.array().cast("array<int>")
    )
    return d.select("doc_id", toks.alias("toks"), F.explode(idx).alias("pos")).select(
        "doc_id",
        "pos",
        F.md5(F.concat_ws(" ", F.slice(F.col("toks"), F.col("pos"), w))).alias("whash"),
    )


def span_dedup_profile(d: DataFrame, w: int = SPAN_W, wins: DataFrame | None = None) -> DataFrame:
    """The span-dedup core over ANY (doc_id, text) relation —
    factored out so property tests can drive it with synthetic
    corpora (boilerplate_profile pattern). `wins` optionally supplies
    a pre-materialized _span_windows relation (dd13 passes the
    session-cached one)."""
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    if wins is None:
        wins = _span_windows(d, w)
    dup = (
        wins.groupBy("whash")
        .agg(F.count_distinct("doc_id").alias("n_docs"))
        .where(F.col("n_docs") >= 2)
        .select("whash")
    )
    from pyspark.sql import Window

    dw = wins.join(dup, "whash").select("doc_id", "pos", (F.col("pos") + (w - 1)).alias("endp"))
    order = Window.partitionBy("doc_id").orderBy("pos")
    prev_end = F.max("endp").over(order.rowsBetween(Window.unboundedPreceding, -1))
    brk = F.when(prev_end.isNull() | (F.col("pos") > prev_end), 1).otherwise(0)
    islands = dw.withColumn("gid", F.sum(brk).over(order.rowsBetween(Window.unboundedPreceding, 0)))
    per_island = islands.groupBy("doc_id", "gid").agg(
        (F.max("endp") - F.min("pos") + 1).alias("covered")
    )
    per_doc = per_island.groupBy("doc_id").agg(
        F.count("*").alias("n_dup_spans"), F.sum("covered").alias("dup_tokens")
    )
    base = d.select("doc_id", n.cast("bigint").alias("n_tokens"))
    return base.join(per_doc, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce(F.col("n_dup_spans"), F.lit(0)).cast("bigint").alias("n_dup_spans"),
        F.coalesce(F.col("dup_tokens"), F.lit(0)).cast("bigint").alias("dup_tokens"),
        F.when(
            F.col("n_tokens") > 0,
            F.coalesce(F.col("dup_tokens"), F.lit(0)).cast("double")
            / F.col("n_tokens").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_token_frac"),
    )


def dd13_sql(w: int = SPAN_W) -> str:
    """DuckDB twin, parameterized like dd11_sql so a non-default
    window width compares like with like."""
    return f"""
WITH t AS (SELECT doc_id, str_split(text, ' ') AS toks FROM documents),
w AS (
    SELECT doc_id, cast(i AS INTEGER) AS pos,
           md5(array_to_string(list_slice(toks, cast(i AS INTEGER), cast(i AS INTEGER) + {w - 1}), ' ')) AS whash
    FROM t, unnest(range(1, greatest(len(toks) - {w - 1}, 0) + 1)) AS u(i)
),
dup AS (SELECT whash FROM w GROUP BY whash HAVING count(DISTINCT doc_id) >= 2),
dw AS (SELECT doc_id, pos, pos + {w - 1} AS endp FROM w JOIN dup USING (whash)),
marked AS (
    SELECT doc_id, pos, endp,
           CASE WHEN max(endp) OVER (PARTITION BY doc_id ORDER BY pos
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
                  OR pos > max(endp) OVER (PARTITION BY doc_id ORDER BY pos
                                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                THEN 1 ELSE 0 END AS brk
    FROM dw
),
islands AS (
    SELECT doc_id, pos, endp,
           sum(brk) OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS gid
    FROM marked
),
per_island AS (
    SELECT doc_id, gid, max(endp) - min(pos) + 1 AS covered
    FROM islands GROUP BY doc_id, gid
),
per_doc AS (
    SELECT doc_id, cast(count(*) AS BIGINT) AS n_dup_spans,
           cast(sum(covered) AS BIGINT) AS dup_tokens
    FROM per_island GROUP BY doc_id
),
base AS (SELECT doc_id, cast(len(str_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents)
SELECT b.doc_id, b.n_tokens,
       coalesce(pd.n_dup_spans, 0) AS n_dup_spans,
       coalesce(pd.dup_tokens, 0) AS dup_tokens,
       CASE WHEN b.n_tokens > 0
            THEN cast(coalesce(pd.dup_tokens, 0) AS DOUBLE) / cast(b.n_tokens AS DOUBLE)
            ELSE 0.0 END AS dup_token_frac
FROM base b LEFT JOIN per_doc pd USING (doc_id)
"""


DD13_SQL = dd13_sql()

# Registered round 7 in the slot freed by the dd3 rotation (dd3 is a
# strict subset of dd8; dd13 is the far-higher-traffic production pass —
# Lee-et-al substring dedup). Rotation documented in COVERAGE.md.
OPERATORS.append(("dd13_span_dedup", dd13_span_dedup, DD13_SQL))


# --- dd14: near-dup cluster representative selection --------------------


def dd14_cluster_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivor selection over the dd10 near-dup components: per
    cluster, KEEP the longest member (token count, ties to the lowest
    doc_id) and mark every other member for drop — the policy step a
    RefinedWeb-style pipeline runs between "we know the clusters" and
    "write the deduplicated corpus" (dd10's is_duplicate keeps the
    min-id member; real pipelines keep the most content-rich one).
    The ranking keys are EXACT integers, so the choice is engine- and
    partition-order-independent.

    Reference parity note: the reference engine has no dedup at all;
    §7.2-step-9 extension (SURVEY.md).

    Scale shape: the winner per cluster comes from groupBy(cluster_rep)
    + max(struct(n_tokens, -doc_id)) — partial aggregation collapses
    the giant component map-side, so the hot cluster key arrives at
    the shuffle as one pre-reduced row per input partition (a window
    over partitionBy(cluster_rep) would funnel the whole component
    through one task instead). The winner join-back carries ONE row
    per cluster on the build side; probe-side skew on the giant
    cluster is AQE's skew-join case.
    """
    def _membership() -> DataFrame:
        comp = dd10_near_dup_components(spark, sf_dir)
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tokens")
        )
        return comp.join(docs, "doc_id").select(
            "doc_id", "cluster_rep", "cluster_size", "n_tokens"
        )

    # session-cached: the membership relation feeds BOTH the winner
    # aggregate and the final probe join — unmaterialized, Catalyst
    # re-runs the components join and re-tokenizes the corpus on each
    # side (dd13's two-consumer lesson)
    j = _session_cached(spark, (sf_dir, "dd14_membership"), _membership)
    winners = j.groupBy("cluster_rep").agg(
        F.max(F.struct(F.col("n_tokens").alias("nt"), (-F.col("doc_id")).alias("neg_id"))).alias(
            "w"
        )
    )
    return j.join(winners, "cluster_rep").select(
        "doc_id",
        "cluster_rep",
        "cluster_size",
        "n_tokens",
        ((F.col("n_tokens") == F.col("w.nt")) & (F.col("doc_id") == -F.col("w.neg_id"))).alias(
            "keep"
        ),
    )


DD14_SQL = f"""
WITH RECURSIVE p AS ({_SIMHASH_PARAMS_SQL}),
sig AS ({_SIMHASH_SIG_SQL}),
bands AS ({_SIMHASH_BANDS_SQL}),
cand AS ({_SIMHASH_CAND_SQL}),
pairs AS ({_SIMHASH_PAIRS_CTE}),
{cc_closure_sql("documents", "doc_id")},
toks AS (SELECT doc_id, cast(len(str_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents),
membership AS MATERIALIZED (
    SELECT c.doc_id, c.cluster_rep, cast(s.cluster_size AS BIGINT) AS cluster_size, t.n_tokens
    FROM comp c JOIN sizes s USING (cluster_rep) JOIN toks t USING (doc_id)
),
winners AS (
    SELECT cluster_rep, doc_id AS win_id, n_tokens AS win_nt
    FROM (SELECT *, row_number() OVER (PARTITION BY cluster_rep
                                       ORDER BY n_tokens DESC, doc_id ASC) AS rn
          FROM membership)
    WHERE rn = 1
)
SELECT m.doc_id, m.cluster_rep, m.cluster_size, m.n_tokens,
       m.doc_id = w.win_id AS keep
FROM membership m JOIN winners w USING (cluster_rep)
"""

# Rotated INTO the driver registry round 8 (survivor selection is the
# highest-traffic dedup step a production corpus build runs); t1/t2
# rotated out to the offline suite to stay under the 50-entry cap.
OPERATORS.append(("dd14_cluster_representatives", dd14_cluster_representatives, DD14_SQL))


# -- dd15: cross-source duplication matrix -------------------------------


def dd15_cross_source_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Where is the boilerplate COMING FROM: for every pair of
    ingestion sources, how many distinct content fingerprints appear
    in BOTH — the provenance matrix a curation team reads before
    deciding which feed to fix (dd12 says how much duplicated mass a
    doc carries; dd15 says which source pairs share it; pl12 is the
    same shape applied to split leakage).

    Reference parity note: the reference engine has no dedup at all;
    §7.2-step-9 extension (SURVEY.md).

    Scale shape: the (fingerprint, source) relation is DISTINCT —
    at most |sources| rows per fingerprint — so the fingerprint
    self-join is bounded per key (≤ C(|sources|,2) pairs per
    fingerprint, sources are a handful even at 100 TB) and the rollup
    emits at most |source pairs| rows. One md5 groupBy inherited from
    dd1/dd5; viral fingerprints cost |sources| rows, never doc-pairs.
    Output: (source_a < source_b, shared_fingerprints, shared_docs)
    where shared_docs counts the documents on BOTH sides carrying a
    shared fingerprint. Not in the driver registry (50-entry cap);
    DuckDB parity in tests/test_offline_oracles.py.

    Since round 9 the relation UNIONs ``DD15_PROBE_DOCS`` (negative
    doc_ids, two synthetic probe sources sharing two texts) on both
    engines: the sf0.01 fixture has ZERO cross-source exact dups, so
    without them the offline row at the gate scale verified only the
    empty relation (the tx12 probe-union argument applied here).
    """
    probes = spark.createDataFrame(DD15_PROBE_DOCS, "doc_id bigint, source string, text string")
    d = (
        load_table(spark, sf_dir, "documents", fan_out=True)
        .select("doc_id", "source", "text")
        .unionByName(probes)
        .select("doc_id", "source", F.md5("text").alias("h"))
    )
    hs = d.groupBy("h", "source").agg(F.count("*").alias("n_docs"))
    a = hs.select("h", F.col("source").alias("source_a"), F.col("n_docs").alias("na"))
    b = hs.select("h", F.col("source").alias("source_b"), F.col("n_docs").alias("nb"))
    return (
        a.join(b, "h")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(
            F.count("*").cast("bigint").alias("shared_fingerprints"),
            F.sum(F.col("na") + F.col("nb")).cast("bigint").alias("shared_docs"),
        )
    )


# Two probe sources sharing two texts (one text duplicated WITHIN a
# probe source too, so n_docs > 1 exercises the shared_docs sum);
# negative doc_ids cannot collide with the corpus's non-negative ids.
DD15_PROBE_DOCS: list[tuple[int, str, str]] = [
    (-1, "probe_src_a", "shared boilerplate footer one"),
    (-2, "probe_src_b", "shared boilerplate footer one"),
    (-3, "probe_src_b", "shared boilerplate footer one"),
    (-4, "probe_src_a", "shared boilerplate footer two"),
    (-5, "probe_src_b", "shared boilerplate footer two"),
    (-6, "probe_src_a", "unshared text unique to source a"),
]

_DD15_PROBE_VALUES = ", ".join(
    f"(cast({i} AS BIGINT), '{s}', '{x}')" for i, s, x in DD15_PROBE_DOCS
)

DD15_SQL = f"""
WITH u AS (
    SELECT doc_id, source, text FROM documents
    UNION ALL
    SELECT * FROM (VALUES {_DD15_PROBE_VALUES}) probes(doc_id, source, text)
),
hs AS (
    SELECT md5(text) AS h, source, cast(count(*) AS BIGINT) AS n_docs
    FROM u GROUP BY md5(text), source
)
SELECT a.source AS source_a, b.source AS source_b,
       cast(count(*) AS BIGINT) AS shared_fingerprints,
       cast(sum(a.n_docs + b.n_docs) AS BIGINT) AS shared_docs
FROM hs a JOIN hs b ON a.h = b.h AND a.source < b.source
GROUP BY a.source, b.source
"""

# Not in the driver registry: at the gate's sf0.01 the synthetic
# corpus has ZERO cross-source exact duplicates, so a gate row would
# be an empty relation that verifies nothing. Parity runs where the
# data has support — tests/test_offline_oracles.py at sf0.01 plus the
# sf0.1 replay (8 shared fingerprints) and the crafted-payload
# three-way test (test_dd15_crafted_cross_source_duplicates: Spark ==
# hand truth == DD15_SQL on a corpus with known cross-source dups).


# --- dd16: exact-substring REMOVAL PLAN (Lee et al. 2021) ----------------


def dd16_span_removal_plan(spark: SparkSession, sf_dir: str, w: int = SPAN_W) -> DataFrame:
    """The actionable half of substring dedup: dd13 MEASURES the
    duplicated-span mass; this emits the REMOVAL PLAN — one row per
    maximal span to excise — that the rewrite pass of Lee et al. 2021
    (arXiv:2107.06499, ExactSubstr) actually consumes. For every
    ``w``-token window occurring >= 2 times CORPUS-WIDE (across docs
    OR repeated within one doc — dd13's cross-doc-only rule measures
    provenance; removal must also collapse intra-doc repetition), the
    single canonical occurrence — the global (doc_id, pos) minimum —
    survives; every other occurrence seeds a cut, and per-doc
    overlapping cuts merge into maximal disjoint spans
    (gaps-and-islands, dd13's machinery).

    Output: (doc_id, span_start, span_end, span_tokens), one row per
    cut span; docs needing no cuts are absent (a plan is sparse). The
    canonical occurrence is never itself a cut SEED, so each
    duplicated window's content provably survives the plan at its
    canonical site unless a DIFFERENT duplicate's span swallowed it —
    the same acceptance ExactSubstr makes.

    Reference parity note: the reference engine has no dedup at all;
    §7.2-step-9 extension (SURVEY.md).

    Scale shape: identical to dd13's (SCALING.md: flat windows/doc
    across 4 decades) — it rides the SAME session-cached
    (doc_id, pos, whash) windows relation, the canonical-occurrence
    pick is one groupBy on the uniform hash key (count + min(struct)
    both partial-aggregate map-side; no collect_list, so a viral
    boilerplate window costs rows, never a hot-key array), the
    join-back reuses the hash exchange, and island merging is one
    per-doc sort window. No self-join anywhere.
    """
    d = load_table(spark, sf_dir, "documents", fan_out=True)
    wins = _session_cached(
        spark, (sf_dir, "span_windows", w), lambda: _span_windows(d, w)
    )
    return span_removal_plan_over(d, w, wins=wins)


def span_removal_plan_over(
    d: DataFrame, w: int = SPAN_W, wins: DataFrame | None = None
) -> DataFrame:
    """The dd16 core over ANY (doc_id, text) relation — factored out
    (round 11, the span_dedup_profile pattern) so the ExactSubstr
    convergence probe can iterate plan→rewrite→plan over rewritten
    corpora. ``wins`` optionally supplies a pre-materialized
    _span_windows relation (dd16 passes the session-cached one)."""
    from pyspark.sql import Window

    if wins is None:
        wins = _span_windows(d, w)
    keep = (
        wins.groupBy("whash")
        .agg(
            F.count("*").alias("cnt"),
            F.min(F.struct("doc_id", "pos")).alias("keep"),
        )
        .where(F.col("cnt") >= 2)
        .select("whash", F.col("keep.doc_id").alias("kd"), F.col("keep.pos").alias("kp"))
    )
    cuts = (
        wins.join(keep, "whash")
        .where(~((F.col("doc_id") == F.col("kd")) & (F.col("pos") == F.col("kp"))))
        .select("doc_id", "pos", (F.col("pos") + (w - 1)).alias("endp"))
    )
    order = Window.partitionBy("doc_id").orderBy("pos")
    prev_end = F.max("endp").over(order.rowsBetween(Window.unboundedPreceding, -1))
    brk = F.when(prev_end.isNull() | (F.col("pos") > prev_end), 1).otherwise(0)
    islands = cuts.withColumn(
        "gid", F.sum(brk).over(order.rowsBetween(Window.unboundedPreceding, 0))
    )
    return islands.groupBy("doc_id", "gid").agg(
        F.min("pos").cast("int").alias("span_start"),
        F.max("endp").cast("int").alias("span_end"),
        (F.max("endp") - F.min("pos") + 1).cast("bigint").alias("span_tokens"),
    ).select("doc_id", "span_start", "span_end", "span_tokens")


def dd16_sql(w: int = SPAN_W) -> str:
    """DuckDB twin, parameterized like dd13_sql. The canonical pick is
    spelled as min-doc-then-min-pos-in-that-doc — exactly the
    lexicographic min(struct(doc_id, pos)) the Spark side computes."""
    return f"""
WITH t AS (SELECT doc_id, str_split(text, ' ') AS toks FROM documents),
w AS (
    SELECT doc_id, cast(i AS INTEGER) AS pos,
           md5(array_to_string(list_slice(toks, cast(i AS INTEGER), cast(i AS INTEGER) + {w - 1}), ' ')) AS whash
    FROM t, unnest(range(1, greatest(len(toks) - {w - 1}, 0) + 1)) AS u(i)
),
agg AS (SELECT whash, min(doc_id) AS kd FROM w GROUP BY whash HAVING count(*) >= 2),
keep AS (
    SELECT a.whash, a.kd, min(ww.pos) AS kp
    FROM agg a JOIN w ww ON ww.whash = a.whash AND ww.doc_id = a.kd
    GROUP BY a.whash, a.kd
),
cuts AS (
    SELECT ww.doc_id, ww.pos, ww.pos + {w - 1} AS endp
    FROM w ww JOIN keep k USING (whash)
    WHERE NOT (ww.doc_id = k.kd AND ww.pos = k.kp)
),
marked AS (
    SELECT doc_id, pos, endp,
           CASE WHEN max(endp) OVER (PARTITION BY doc_id ORDER BY pos
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
                  OR pos > max(endp) OVER (PARTITION BY doc_id ORDER BY pos
                                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                THEN 1 ELSE 0 END AS brk
    FROM cuts
),
islands AS (
    SELECT doc_id, pos, endp,
           sum(brk) OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS gid
    FROM marked
)
SELECT doc_id,
       cast(min(pos) AS INTEGER) AS span_start,
       cast(max(endp) AS INTEGER) AS span_end,
       cast(max(endp) - min(pos) + 1 AS BIGINT) AS span_tokens
FROM islands GROUP BY doc_id, gid
"""


DD16_SQL = dd16_sql()

# Rotated INTO the driver registry round 10 (VERDICT r9 item 2): the
# removal plan is the production complement of gate-green dd13 —
# ExactSubstr's rewrite pass consumes exactly this relation. dd4
# rotated out in exchange (verification twin of gate-green dd8).
OPERATORS.append(("dd16_span_removal_plan", dd16_span_removal_plan, DD16_SQL))


# --- dd17: apply the removal plan (the ExactSubstr rewrite) --------------


def dd17_apply_removal_plan(spark: SparkSession, sf_dir: str, w: int = SPAN_W) -> DataFrame:
    """The rewrite pass itself — the third and final step of the
    substring-dedup loop (dd13 MEASURES duplicated-span mass, dd16
    PLANS the cuts, dd17 APPLIES them): every token position covered
    by one of the doc's dd16 spans is excised and the survivors
    rejoin into the deduplicated text. Output: (doc_id, n_tokens,
    n_kept, new_text) for EVERY document (uncut docs pass through
    with n_kept = n_tokens). The removal invariant — n_tokens −
    n_kept == the doc's total dd16 span_tokens — is pinned by
    tests/test_functions.py, and as in Lee et al. 2021 the rewrite
    may create NEW adjacencies whose windows duplicate (their
    documented acceptance; a second pass converges in practice).

    Scale shape: dd16's plan is sparse (one row per cut span) and
    per-doc span counts are bounded by doc length, so collecting each
    doc's spans into an array is a safe groupBy; the rewrite is then
    one per-row expression over the corpus — a positional filter via
    the two-argument array lambda with an exists() over the tiny
    spans array — with the plan LEFT-joined on doc_id (skew-free:
    one row per doc each side). No explode of token positions, no
    token ever crosses a shuffle.
    """
    plan = dd16_span_removal_plan(spark, sf_dir, w)
    d = load_table(spark, sf_dir, "documents", fan_out=True)
    return apply_removal_plan_over(d, plan)


def apply_removal_plan_over(d: DataFrame, plan: DataFrame) -> DataFrame:
    """The dd17 core over ANY (doc_id, text) relation and its
    (doc_id, span_start, span_end, ...) removal plan — factored out
    (round 11) so the convergence probe can chain rewrite passes."""
    spans = plan.groupBy("doc_id").agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("spans")
    )
    toks = F.split(F.col("text"), " ")
    empty = F.expr("CAST(array() AS array<struct<span_start:int,span_end:int>>)")
    with_spans = d.select("doc_id", toks.alias("toks")).join(spans, "doc_id", "left")
    covered = lambda t, i: F.exists(  # noqa: E731 - positional filter
        "spans",
        lambda s: ((i + 1) >= s["span_start"]) & ((i + 1) <= s["span_end"]),
    )
    kept = F.filter("toks", lambda t, i: ~covered(t, i))
    return with_spans.select(
        "doc_id", "toks", F.coalesce("spans", empty).alias("spans")
    ).select(
        "doc_id",
        F.size("toks").cast("bigint").alias("n_tokens"),
        F.size(kept).cast("bigint").alias("n_kept"),
        F.array_join(kept, " ").alias("new_text"),
    )


def dd17_sql(w: int = SPAN_W) -> str:
    """DuckDB twin: dd16's plan as a nested-WITH CTE, coverage via a
    positional range join (an independent formulation of the same
    excision — the Spark side never explodes positions), survivors
    reassembled with an ORDER BY pos string_agg."""
    return f"""
WITH plan AS ({dd16_sql(w)}),
t AS (SELECT doc_id, str_split(text, ' ') AS toks FROM documents),
pos AS (
    SELECT doc_id, cast(i AS INTEGER) AS pos, toks[cast(i AS INTEGER)] AS tok
    FROM t, unnest(range(1, len(toks) + 1)) u(i)
),
cov AS (
    SELECT DISTINCT p.doc_id, p.pos
    FROM pos p JOIN plan s ON p.doc_id = s.doc_id
                          AND p.pos BETWEEN s.span_start AND s.span_end
),
kept AS (
    SELECT p.doc_id, p.pos, p.tok
    FROM pos p LEFT JOIN cov c ON p.doc_id = c.doc_id AND p.pos = c.pos
    WHERE c.pos IS NULL
),
agg AS (
    SELECT doc_id, cast(count(*) AS BIGINT) AS n_kept,
           string_agg(tok, ' ' ORDER BY pos) AS new_text
    FROM kept GROUP BY doc_id
)
SELECT t.doc_id, cast(len(t.toks) AS BIGINT) AS n_tokens,
       coalesce(a.n_kept, 0) AS n_kept,
       coalesce(a.new_text, '') AS new_text
FROM t LEFT JOIN agg a USING (doc_id)
"""


DD17_SQL = dd17_sql()

# Round-11 rotation (pre-declared in COVERAGE.md r10): the production
# ExactSubstr REWRITE joins the driver gate — dd13 measures, dd16 plans
# (gate-green since r10), dd17 applies the cuts. Offline-green at
# sf0.001/0.01/0.1 and sf1 before registration.
OPERATORS.append(("dd17_apply_removal_plan", dd17_apply_removal_plan, DD17_SQL))


def exact_substr_converge(d: DataFrame, w: int = SPAN_W, max_passes: int = 3) -> list:
    """MEASURED convergence of the ExactSubstr loop (VERDICT r10 item
    3): dd17's docstring cites Lee et al. 2021's acceptance that a
    rewrite may create NEW duplicated adjacencies and "a second pass
    converges in practice" — this turns the citation into a number.
    Each iteration plans the cuts over the CURRENT corpus (so entry
    k's ``plan_tokens`` is exactly what rewrite pass k+1 would
    remove), records corpus + plan mass, then applies the rewrite and
    repeats. Returns one dict per measurement, entry 0 describing the
    ORIGINAL corpus; stops early once a plan is empty (a fixed
    point — the next rewrite would be the identity).

    Scale shape: each pass is one dd16 plan + one dd17 rewrite — the
    same banded/windowed shapes as the single-pass operators, times a
    SMALL constant number of passes (the measured tables in
    SCALING.md show pass-2 plans at ~1e-4 of the original mass). The
    rewritten corpus is eagerly checkpointed between passes so the
    logical plan stays flat (the iterative-loop rule): localCheckpoint
    in local mode, or RELIABLE df.checkpoint() against
    ``spark.maggy.checkpointDir`` when the session conf is set — the
    same executor-loss contract as star_components/bpe_train
    (CLUSTER.md), with any pre-existing app checkpoint dir restored
    on exit. Spark cannot UNSET a checkpoint dir: if the app had none
    configured, the context stays pointed at the maggy dir after
    return (ADVICE r11 — later unrelated df.checkpoint() calls land
    there)."""
    spark = d.sparkSession
    checkpoint_dir = spark.conf.get("spark.maggy.checkpointDir", None)
    prev_ckpt_dir = None
    if checkpoint_dir:
        opt = spark.sparkContext._jsc.sc().getCheckpointDir()
        prev_ckpt_dir = opt.get() if opt.isDefined() else None
        spark.sparkContext.setCheckpointDir(checkpoint_dir)
        ckpt = lambda df: df.checkpoint(eager=True)  # noqa: E731
    else:
        ckpt = lambda df: df.localCheckpoint()  # noqa: E731
    try:
        return _exact_substr_converge_loop(d, w, max_passes, ckpt, bool(checkpoint_dir))
    finally:
        if prev_ckpt_dir is not None:
            spark.sparkContext.setCheckpointDir(prev_ckpt_dir)


def _exact_substr_converge_loop(
    d: DataFrame, w: int, max_passes: int, ckpt, durable: bool
) -> list:
    out: list = []
    cur = d.select("doc_id", "text")
    prev_local: DataFrame | None = None  # prior pass's localCheckpoint, freed below
    for p in range(max_passes + 1):
        # persist the plan: it is consumed twice per pass (the stats
        # row and the rewrite) and its derivation — window hashing +
        # groupBy + join-back + sort window — is the loop's dominant
        # cost; without the pin Catalyst recomputes it from scratch
        # inside apply_removal_plan_over
        plan = span_removal_plan_over(cur, w).persist()
        c = cur.agg(
            F.count("*").alias("docs"),
            # split('') yields [''] — count fully-excised docs as 0
            F.sum(
                F.when(F.col("text") == "", F.lit(0)).otherwise(F.size(F.split("text", " ")))
            )
            .cast("bigint")
            .alias("tokens"),
        ).collect()[0]
        ps = plan.agg(
            F.count("*").cast("bigint").alias("spans"),
            F.coalesce(F.sum("span_tokens"), F.lit(0)).cast("bigint").alias("plan_tokens"),
        ).collect()[0]
        tokens = int(c["tokens"] or 0)
        out.append(
            {
                "pass": p,
                "docs": int(c["docs"]),
                "tokens": tokens,
                "plan_spans": int(ps["spans"]),
                "plan_tokens": int(ps["plan_tokens"]),
                "removable_frac": (int(ps["plan_tokens"]) / tokens) if tokens else 0.0,
            }
        )
        if ps["spans"] == 0 or p == max_passes:
            plan.unpersist()
            break
        nxt = ckpt(
            apply_removal_plan_over(cur, plan).select(
                "doc_id", F.col("new_text").alias("text")
            )
        )
        plan.unpersist()  # nxt is eagerly materialized; the plan is spent
        # free the PRIOR pass's localCheckpoint blocks (unpersist alone
        # is a no-op for checkpoint storage — the star_components rule);
        # durable checkpoints are files, nothing to free. The caller's
        # input frame (pass 0's `cur`) is never ours to free.
        if not durable and prev_local is not None:
            _free_local_checkpoint(prev_local)
        prev_local = nxt
        cur = nxt
    # the loop returns only driver-side stats dicts — the last
    # checkpointed corpus has no consumers either
    if not durable and prev_local is not None:
        _free_local_checkpoint(prev_local)
    return out


# -- dd18: cross-modal near-dup verification ------------------------------

DD18_TAU = 0.3  # embedding-cosine verification threshold (ann4's tau)


def dd18_crossmodal_verify(
    spark: SparkSession,
    sf_dir: str,
    max_hamming: int = MAX_HAMMING,
    tau: float = DD18_TAU,
) -> DataFrame:
    """Cross-modal near-dup verification: dd7's SimHash banded text
    candidates, re-scored in EMBEDDING space — the screen that
    separates surface-form near-dups (high text similarity AND high
    cosine) from template collisions (texts that band together but
    whose embeddings disagree). Emits every dd7 pair where BOTH sides
    have an embedding (vec_id == doc_id on the covered prefix), with
    the pair's exact cosine and the verified flag (cosine >= tau,
    ann4's threshold).

    Scale shape: the pair relation (linear in n by dd7's banding) is
    the SMALL side — it joins the embedding corpus twice on its id
    (broadcast at gate scale, shuffle-on-id at 100 TB where AQE
    picks); embeddings never pair with each other, so nothing here is
    quadratic. Zero-norm embeddings are dropped per the module rule
    (similarity._cosine), identically in the twin. Not in the driver
    registry (50-entry cap); DuckDB parity in
    tests/test_offline_oracles.py. Reference anchor: none — SURVEY
    §7.2-step-9 extension surface (composes dd7 x ann4's scoring)."""
    from maggy_spark.functions.similarity import _cosine_pre, _dot

    pairs = dd7_simhash_near_dup(spark, sf_dir, max_hamming)
    e = (
        load_table(spark, sf_dir, "embeddings", fan_out=True)
        .select(
            "vec_id",
            "embedding",
            F.sqrt(_dot("embedding", "embedding")).alias("en"),
        )
        .where(F.col("en") > 0)  # degenerate-vector rule
    )
    a = e.select(F.col("vec_id").alias("doc_a"), F.col("embedding").alias("ea"), F.col("en").alias("na"))
    b = e.select(F.col("vec_id").alias("doc_b"), F.col("embedding").alias("eb"), F.col("en").alias("nb"))
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "hamming",
            _cosine_pre("ea", "eb", "na", "nb").alias("cosine"),
            (_cosine_pre("ea", "eb", "na", "nb") >= tau).alias("verified"),
        )
    )


def _dd18_sql(max_hamming: int = MAX_HAMMING, tau: float = DD18_TAU) -> str:
    from maggy_spark.functions.similarity import _NONZERO_SQL, _cos_sql

    ham = (
        "CAST(list_sum(list_transform(generate_series(1, t), "
        "i -> CASE WHEN substr(ha, i, 1) != substr(hb, i, 1) THEN 1 ELSE 0 END)) AS INTEGER)"
    )
    cos = _cos_sql("ea.embedding", "eb.embedding")
    return f"""
WITH p AS ({_SIMHASH_PARAMS_SQL}),
sig AS ({_SIMHASH_SIG_SQL}),
bands AS ({_SIMHASH_BANDS_SQL}),
cand AS ({_SIMHASH_CAND_SQL}),
dd7 AS (
    SELECT doc_a, doc_b, {ham} AS hamming
    FROM cand WHERE {ham} <= {max_hamming}
),
nz AS (SELECT * FROM embeddings WHERE {_NONZERO_SQL})
SELECT d.doc_a, d.doc_b, d.hamming,
       {cos} AS cosine,
       {cos} >= {tau} AS verified
FROM dd7 d
JOIN nz ea ON d.doc_a = ea.vec_id
JOIN nz eb ON d.doc_b = eb.vec_id
"""


DD18_SQL = _dd18_sql()


# --- dd19: containment screen (asymmetric doc-in-doc duplication) -------

CONTAIN_TAU = 0.8  # fraction of the smaller doc's shingles that must
# be shared — the "A is (nearly) a sub-document of B" bar

# A verbatim-inclusion probe triple (negative doc_ids, tokens outside
# the 31-word corpus vocabulary so no organic shingle collides): -12's
# text is a verbatim substring of -11, so its 3 shingles are ALL
# contained in -11's 18 — containment 1.0 at Jaccard 3/18 — while
# -13 shares only 1 of its 3 shingles with -11 (below min_common).
# The organic tau-passing pairs at the gate scale are exact
# duplicates (containment 1.0 AND jaccard 1.0), so without the probe
# the offline row would never separate the two measures — the
# dd15/tx12 probe-union argument.
DD19_PROBE_DOCS: list[tuple[int, str]] = [
    (
        -11,
        "proba probb probc probd probe probf probg probh probi probj "
        "probk probl probm probn probo probp probq probr probs probt",
    ),
    (-12, "probd probe probf probg probh"),
    (-13, "probh probi probz proby"),
]


def dd19_containment_screen(
    spark: SparkSession,
    sf_dir: str,
    tau: float = CONTAIN_TAU,
    min_common: int = 2,
    max_doc_freq: int = 50,
) -> DataFrame:
    """Asymmetric CONTAINMENT screen: pairs where the smaller
    document's shingle set is >= ``tau`` contained in the larger's —
    C(A, B) = |sh(A) ∩ sh(B)| / |sh(A)|. Symmetric Jaccard (dd4/dd8)
    MISSES doc-in-doc duplication: a short document quoted verbatim
    inside a long one has containment ~1 but Jaccard ~|A|/|B|, far
    below any near-dup threshold — yet for a training corpus the
    short doc is pure duplicated mass (Broder 1997's resemblance vs
    containment distinction). Output: one row per flagged pair,
    normalized so `contained_doc` is the smaller-shingle-set side
    (tie -> lower doc_id): (contained_doc, container_doc,
    n_contained, n_common, containment, jaccard).

    Scale shape: identical to dd4's exact-intersection relation —
    postings explode with the viral-shingle doc-frequency cap (a
    shingle in f docs contributes f^2 pairs; the cap bounds the
    self-join's skew), one groupBy per pair key, broadcast-size
    probe union. The containment projection adds zero shuffles over
    dd4: sizes join + a directed-normalization expression. The
    corpus side reuses the session-cached _shingled materialization;
    only the 3 probe docs are shingled per call. Not in the driver
    registry (50-entry cap); DuckDB parity in
    tests/test_offline_oracles.py.
    """
    probes = spark.createDataFrame(DD19_PROBE_DOCS, "doc_id bigint, text string").select(
        "doc_id", _shingles_expr().alias("sh")
    )
    d = _shingled(spark, sf_dir).unionByName(probes)
    sizes = d.select("doc_id", F.size("sh").alias("n_sh"))
    ex = d.select("doc_id", F.explode("sh").alias("shingle")).select(
        "doc_id", F.xxhash64("shingle").alias("sid")
    )
    # pair generation from POSTING LISTS (r14 optimization, guide
    # §2.4): one groupBy(sid) collects each shingle's sorted doc list,
    # the doc-frequency cap filters on list size, and the i<j pairs
    # are emitted by an in-stage nested transform + explode — exactly
    # the rows the earlier window-count + self-join produced, with
    # ONE exchange of the postings instead of a windowed sort feeding
    # both sides of a sort-merge join. Skew/memory profile unchanged:
    # a viral shingle concentrated one window partition before and
    # concentrates one list row now (8 bytes/doc), and viral lists
    # are dropped by the size filter BEFORE the O(f^2) pair explode —
    # the same quadratic-bomb cap as before.
    posts = (
        ex.groupBy("sid")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ds"))
        .where((F.size("ds") >= 2) & (F.size("ds") <= max_doc_freq))
    )
    pair = F.explode(
        F.flatten(
            F.transform(
                F.sequence(F.lit(1), F.size("ds") - 1),
                lambda i: F.transform(
                    F.slice(F.col("ds"), i + 1, F.size("ds") - i),
                    lambda y: F.struct(
                        F.element_at("ds", i).alias("doc_a"), y.alias("doc_b")
                    ),
                ),
            )
        )
    )
    inter = (
        posts.select(pair.alias("p"))
        .groupBy(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
        .agg(F.count("*").cast("bigint").alias("n_common"))
        .where(F.col("n_common") >= min_common)
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    j = inter.join(sa, "doc_a").join(sb, "doc_b")
    small_is_a = (F.col("n_a") < F.col("n_b")) | (F.col("n_a") == F.col("n_b"))
    return (
        j.select(
            F.when(small_is_a, F.col("doc_a")).otherwise(F.col("doc_b")).alias("contained_doc"),
            F.when(small_is_a, F.col("doc_b")).otherwise(F.col("doc_a")).alias("container_doc"),
            F.least("n_a", "n_b").cast("bigint").alias("n_contained"),
            "n_common",
            (F.col("n_common").cast("double") / F.least("n_a", "n_b").cast("double")).alias(
                "containment"
            ),
            (
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double")
            ).alias("jaccard"),
        )
        .where(F.col("containment") >= tau)
    )


# the mm8 fail-loud convention (ADVICE r11): a probe payload with a
# quote or non-ASCII char would silently malform the VALUES twin
assert all(
    t.isascii() and t.isprintable() and "'" not in t for _i, t in DD19_PROBE_DOCS
), "dd19 probe payloads must be quote-free printable ASCII"
_DD19_PROBE_VALUES = ", ".join(
    f"(cast({i} AS BIGINT), '{t}')" for i, t in DD19_PROBE_DOCS
)


def dd19_sql(tau: float = CONTAIN_TAU, min_common: int = 2, max_doc_freq: int = 50) -> str:
    return f"""
WITH u AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT * FROM (VALUES {_DD19_PROBE_VALUES}) probes(doc_id, text)
),
sh AS (
    SELECT doc_id,
           list_distinct(
               CASE WHEN len(w) >= 3
                    THEN list_transform(generate_series(1, len(w) - 2),
                                        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
                    ELSE [] END
           ) AS shingles
    FROM (SELECT doc_id, str_split(text, ' ') AS w FROM u)
),
sizes AS (SELECT doc_id, len(shingles) AS n_sh FROM sh),
ex_all AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
rare AS (SELECT shingle FROM ex_all GROUP BY shingle HAVING count(*) <= {max_doc_freq}),
ex AS (SELECT e.doc_id, e.shingle FROM ex_all e JOIN rare r ON e.shingle = r.shingle),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, cast(count(*) AS BIGINT) AS n_common
    FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    HAVING count(*) >= {min_common}
)
SELECT CASE WHEN sa.n_sh <= sb.n_sh THEN i.doc_a ELSE i.doc_b END AS contained_doc,
       CASE WHEN sa.n_sh <= sb.n_sh THEN i.doc_b ELSE i.doc_a END AS container_doc,
       cast(least(sa.n_sh, sb.n_sh) AS BIGINT) AS n_contained,
       i.n_common,
       cast(i.n_common AS DOUBLE) / cast(least(sa.n_sh, sb.n_sh) AS DOUBLE) AS containment,
       cast(i.n_common AS DOUBLE) / cast(sa.n_sh + sb.n_sh - i.n_common AS DOUBLE) AS jaccard
FROM inter i
JOIN sizes sa ON i.doc_a = sa.doc_id
JOIN sizes sb ON i.doc_b = sb.doc_id
WHERE cast(i.n_common AS DOUBLE) / cast(least(sa.n_sh, sb.n_sh) AS DOUBLE) >= {tau}
"""


DD19_SQL = dd19_sql()


# -- DD20: incremental component refresh (snapshot + delta) --------------


def incremental_components_over(
    universe: DataFrame,
    id_col: str,
    prev_stars: DataFrame,
    new_edges: DataFrame,
    max_iter: int = 30,
) -> DataFrame:
    """Merge a PREVIOUS snapshot's component map with a delta batch's
    new edges — the core of incremental fuzzy dedup. `prev_stars` is
    the stored (hi -> lo=component rep) star relation of the landed
    corpus; `new_edges` are the (hi, lo) pairs the delta introduced
    (delta-internal + delta-vs-store). Star edges SPAN their
    components, so contracting their union with the new edges yields
    exactly the components of the full pair graph — the store's
    internal pairs never need recomputing, and a delta doc that
    bridges two landed components merges them (the case the unit
    test drives explicitly). Cost: |prev map| + |delta edges|,
    independent of the landed corpus's pair volume.

    Before contracting, each delta-edge endpoint is REWRITTEN through
    the previous map (node -> its component rep — the union-find
    path-compression step): a delta doc adjacent to k members of one
    landed clique contributes ONE (doc, rep) edge instead of k, so
    the contracted edge set is |distinct (delta, component)| pairs,
    not the raw pair fan-out, and the star loop starts one hop from
    its fixpoint. Semantics-preserving: rep(s) is in s's component,
    so endpoint substitution never changes connectivity, and reps are
    component MINIMA, so the merged component's global-min rep is
    unchanged (pinned by the dd20==dd10 frame-equality tests)."""
    rep = prev_stars.select(F.col("hi").alias("_node"), F.col("lo").alias("_rep"))
    e = new_edges
    for side in ("hi", "lo"):
        e = (
            e.join(rep.withColumnRenamed("_node", side), side, "left")
            .withColumn(side, F.coalesce("_rep", F.col(side)))
            .drop("_rep")
        )
    e = (
        e.where(F.col("hi") != F.col("lo"))
        .select(
            F.greatest("hi", "lo").alias("hi"),
            F.least("hi", "lo").alias("lo"),
        )
        .distinct()
    )
    edges = prev_stars.unionByName(e).distinct()
    stars = star_components(edges, max_iter)
    return components_over(universe, id_col, stars)


def dd20_store_star_map(
    spark: SparkSession, sf_dir: str, delta_mod: int = 10, max_iter: int = 30
) -> DataFrame:
    """The landed corpus's (hi -> lo) star map — the relation a real
    deployment PERSISTED when the store snapshot landed (one
    store-internal banded pair sweep + contraction over the
    `doc_id % delta_mod != 0` slice, dd11's store convention). This
    is the one-time snapshot-build cost; every later batch refresh
    (`dd20_refresh`) reads it back instead of re-running it."""
    bands, b, t = simhash_band_relation(spark, sf_dir)
    store_bands = bands.where(F.col("doc_id") % delta_mod != 0)
    a = store_bands.select(
        F.col("doc_id").alias("doc_a"), F.col("sigint").alias("sa"), "band_key"
    )
    bb = store_bands.select(
        F.col("doc_id").alias("doc_b"), F.col("sigint").alias("sb"), "band_key"
    )
    first_match, ham = _first_match_and_hamming(b, t)
    store_pairs = (
        a.join(bb, "band_key")
        .where(F.col("doc_a") < F.col("doc_b"))
        .where(ham <= MAX_HAMMING)
        .where(first_match)
        .select("doc_a", "doc_b")
    )
    # no .distinct(): the first-matching-band guard emits each store
    # pair exactly once (see dd10 — guide §2.4, removed r14)
    return star_components(
        store_pairs.select(F.col("doc_b").alias("hi"), F.col("doc_a").alias("lo")),
        max_iter,
    )


def dd20_refresh(
    spark: SparkSession,
    sf_dir: str,
    snapshot_path: str,
    delta_mod: int = 10,
    max_iter: int = 30,
) -> DataFrame:
    """The PRODUCTION per-batch refresh: read the persisted star-map
    snapshot (written by `dd20_store_star_map(...).write.parquet`),
    probe the delta against the store's band buckets (dd11), and
    contract map + delta star edges. This is the path whose cost
    bounds 100 TB ingest — |delta| x bucket probe plus one bounded
    contraction, never a store x store re-join — and the path
    `bench.py`'s dd20_refresh row times against a pre-written
    snapshot fixture (VERDICT r12 item 3: the simulation stays in the
    oracle/test path; drift here is drift on the real ingest path)."""
    prev_stars = spark.read.parquet(snapshot_path)
    new_edges = dd11_incremental_near_dup(spark, sf_dir, delta_mod).select(
        F.col("doc_b").alias("hi"), F.col("doc_a").alias("lo")
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return incremental_components_over(docs, "doc_id", prev_stars, new_edges, max_iter)


def dd20_incremental_components(
    spark: SparkSession, sf_dir: str, delta_mod: int = 10, max_iter: int = 30
) -> DataFrame:
    """dd10's component map maintained INCREMENTALLY: when the delta
    slice (`doc_id % delta_mod == 0`, dd11's convention) lands, the
    only pair work is dd11's delta-side probe — the landed corpus
    contributes its PREVIOUS star map, not a store x store re-join.
    Output is dd10's exact schema and, by construction, dd10's exact
    relation (star edges span components; verified three ways: a
    direct frame-equality test vs dd10, the offline oracle suite
    against dd10's own recursive-closure twin, and the sf1 sweep
    against the independent union-find oracle).

    The fixture has no stored snapshot, so the previous map is
    simulated IN-PLAN by `dd20_store_star_map` (the one
    store-internal pass a REAL deployment did when that snapshot
    landed); in production the snapshot is persisted and the
    per-batch path is `dd20_refresh`, which reads it back — that
    split is what bench.py times (VERDICT r12 item 3). Scale: the
    per-batch cost is dd11's |delta| x bucket probe plus a
    contraction over |landed map| + |delta edges| star edges — the
    100 TB ingest path, vs dd10's full corpus-pair sweep per refresh.
    Not in the driver registry (50-entry cap); DuckDB parity in
    tests/test_offline_oracles.py."""
    prev_stars = dd20_store_star_map(spark, sf_dir, delta_mod, max_iter)
    new_edges = dd11_incremental_near_dup(spark, sf_dir, delta_mod).select(
        F.col("doc_b").alias("hi"), F.col("doc_a").alias("lo")
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return incremental_components_over(docs, "doc_id", prev_stars, new_edges, max_iter)


# -- DD21: LSH banding S-curve planner ------------------------------------
#
# The tuning relation behind every (bands, rows) choice in this family
# (Leskovec/Rajaraman/Ullman, Mining of Massive Datasets ch.3): for a
# pair with true Jaccard s, P(candidate) = 1 - (1 - s^r)^b. The planner
# tabulates that curve over the r ladder the geometry rule can pick
# (2..MH_MAX_ROWS) with the b each r implies at the family's threshold
# (b = round((1/tau)^r), capped by the hash budget — the same formula
# minhash_geometry applies), so a pipeline owner can READ the
# false-positive/false-negative trade-off instead of trusting the
# defaults blind.
#
# Cross-engine determinism without pow(): libm pow is not correctly
# rounded and differs between the JVM and DuckDB in the last ulp, so
# s^r and (1-p)^b are UNROLLED into explicit left-to-right IEEE
# multiplication chains — the generated Spark expressions and the
# generated SQL spell the identical sequence, and every input
# (s = i/100.0) is an exact small-integer division. Corpus-independent
# (a pure planning matrix), so the twin is static and the relation
# needs no scan at all.

DD21_S_STEPS = 100  # s grid: 0/100 .. 100/100


def _dd21_configs() -> list[tuple[int, int]]:
    """The (r, b) ladder minhash_geometry can choose from: r in
    2..MH_MAX_ROWS, b = round((1/tau)^r) capped by the hash budget —
    the same literals, so planner rows and production geometry cannot
    drift."""
    out = []
    for r in range(2, MH_MAX_ROWS + 1):
        b = min(int(round((1.0 / NEAR_DUP_JACCARD) ** r)), MH_MAX_HASHES // r)
        out.append((r, b))
    return out


def dd21_lsh_s_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(r, b, s_pct, p_candidate, above_tau) over the r ladder and a
    101-point similarity grid. `above_tau` marks the region where a
    candidate SHOULD fire: p_candidate mass below tau is the
    verification bill (false candidates dd8's exact check pays for),
    1 - p_candidate above tau is the miss risk (pairs banding never
    surfaces). sf_dir is unused (planning matrix); kept for the
    uniform (spark, sf_dir) operator signature."""
    from functools import reduce
    from operator import mul

    tau_pct = int(round(NEAR_DUP_JACCARD * 100))
    grid = spark.range(0, DD21_S_STEPS + 1).select(
        F.col("id").cast("int").alias("s_pct"),
        (F.col("id").cast("double") / 100.0).alias("s"),
    )
    parts = []
    for r, b in _dd21_configs():
        p1 = reduce(mul, [F.col("s")] * r)              # s^r, unrolled
        miss1 = F.lit(1.0) - p1
        pm = reduce(mul, [miss1] * b)                   # (1-s^r)^b, unrolled
        parts.append(
            grid.select(
                F.lit(r).alias("r"),
                F.lit(b).alias("b"),
                "s_pct",
                (F.lit(1.0) - pm).alias("p_candidate"),
                (F.col("s_pct") >= tau_pct).alias("above_tau"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def dd21_sql() -> str:
    """Static DuckDB twin: the SAME unrolled multiplication chains
    over the same generated grid (range + i/100.0), one UNION ALL arm
    per (r, b) config."""
    tau_pct = int(round(NEAR_DUP_JACCARD * 100))
    arms = []
    for r, b in _dd21_configs():
        p1 = "(" + " * ".join(["s"] * r) + ")"
        pm = "(" + " * ".join([f"(1.0 - {p1})"] * b) + ")"
        arms.append(
            f"SELECT {r} AS r, {b} AS b, s_pct, 1.0 - {pm} AS p_candidate,\n"
            f"       s_pct >= {tau_pct} AS above_tau\n"
            f"FROM (SELECT CAST(i AS INTEGER) AS s_pct, CAST(i AS DOUBLE) / 100.0 AS s\n"
            f"      FROM generate_series(0, {DD21_S_STEPS}) gs(i))"
        )
    return "\nUNION ALL\n".join(arms)


DD21_SQL = dd21_sql()


# -- DD22: MinHash estimator calibration ----------------------------------


def dd22_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured counterpart of dd21's theory: for every LSH candidate
    pair, compare the MinHash ESTIMATE of Jaccard (fraction of
    matching signature windows — the estimator whose E[est] = J
    underwrites the whole banding scheme, MMDS ch.3) against the
    EXACT shingle Jaccard dd8 verifies, rolled up per exact-Jaccard
    decile: (band, n_pairs, sum_err_milli, max_err_milli). A fat
    error band at the threshold decile means the geometry
    (minhash_geometry) needs more rows per band — this relation is
    how a deployment VALIDATES its (b, r) choice on its own corpus
    instead of trusting the s-curve blind.

    Cross-engine determinism: est = matches/nh and exact =
    inter/union are int/int IEEE divisions (identical doubles per
    row on both engines), so err_milli = floor(|est - exact| * 1000)
    and the decile floor are identical per row; the aggregates are
    then exact-integer sums/maxes. Scale shape: everything derives
    from the session-cached shingle/signature/band relations
    (candidate volume is the banding's, never n^2); the window
    compare is a bounded nh-term map-side expression per candidate.
    Not in the driver registry (50-entry cap); DuckDB parity in
    tests/test_offline_oracles.py."""
    b, r = minhash_geometry(corpus_count(spark, sf_dir, "documents"))
    nh = b * r
    sig = dd2_minhash_signature(spark, sf_dir)
    sh = _shingled(spark, sf_dir)
    cand = _candidate_pairs(_minhash_bands(spark, sf_dir))
    a = sig.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"))
    bb = sig.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"))
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    j = cand.join(a, "doc_a").join(bb, "doc_b").join(sa, "doc_a").join(sb, "doc_b")
    matches = F.aggregate(
        F.sequence(F.lit(0), F.lit(nh - 1)),
        F.lit(0).cast("bigint"),
        lambda acc, w: acc
        + F.when(
            F.col("sig_a").substr(w * 8 + 1, F.lit(8))
            == F.col("sig_b").substr(w * 8 + 1, F.lit(8)),
            1,
        ).otherwise(0),
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("bigint")
    union = F.size("sh_a") + F.size("sh_b") - inter
    est = matches.cast("double") / F.lit(float(nh))
    exact = inter.cast("double") / union.cast("double")
    err_milli = F.floor(F.abs(est - exact) * 1000).cast("bigint")
    band = F.least(F.floor(exact * 10).cast("bigint"), F.lit(9).cast("bigint"))
    per = j.select(band.alias("band"), err_milli.alias("err_milli"))
    return per.groupBy("band").agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        F.sum("err_milli").cast("bigint").alias("sum_err_milli"),
        F.max("err_milli").cast("bigint").alias("max_err_milli"),
    )


DD22_SQL = f"""
WITH p AS ({_MH_PARAMS_SQL}),
sh AS ({_SHINGLES_SQL}),
sig AS ({_SIG_SQL}),
bands AS ({_BANDS_SQL}),
cand AS ({_CAND_SQL}),
per AS (
    SELECT least(CAST(floor((cast(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
               / cast(len(sa.shingles) + len(sb.shingles)
                      - len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)) * 10)
               AS BIGINT), 9) AS band,
           CAST(floor(abs(
               cast(list_sum(list_transform(generate_series(0, p.nh - 1), w ->
                   CASE WHEN substr(ga.sig, w * 8 + 1, 8) = substr(gb.sig, w * 8 + 1, 8)
                        THEN 1 ELSE 0 END)) AS DOUBLE) / cast(p.nh AS DOUBLE)
               - cast(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
                 / cast(len(sa.shingles) + len(sb.shingles)
                        - len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
           ) * 1000) AS BIGINT) AS err_milli
    FROM cand c
    JOIN sig ga ON c.doc_a = ga.doc_id
    JOIN sig gb ON c.doc_b = gb.doc_id
    JOIN sh sa ON c.doc_a = sa.doc_id
    JOIN sh sb ON c.doc_b = sb.doc_id
    CROSS JOIN p
)
SELECT band, cast(count(*) AS BIGINT) AS n_pairs,
       cast(sum(err_milli) AS BIGINT) AS sum_err_milli,
       cast(max(err_milli) AS BIGINT) AS max_err_milli
FROM per GROUP BY band
"""


# -- dd23: contamination audit report --------------------------------------

# Probe triple keeping the report non-vacuous at every scale (the
# dd19/dd15 probe-union pattern): one eval-slice doc (-100 % 100 == 0
# on both engines) embedded VERBATIM in two train docs from two
# distinct probe sources -> containment 1.0 rows per source exist by
# construction, on top of whatever organic contamination the corpus
# carries.
DD23_EVAL_TEXT = "quick brown fox eval prompt alpha beta gamma delta epsilon zeta"
DD23_PROBE_DOCS = [
    (-100, DD23_EVAL_TEXT),
    (-1, "crawl page one header " + DD23_EVAL_TEXT + " footer filler words trailing"),
    (-3, "another page intro " + DD23_EVAL_TEXT + " closing boilerplate lines here"),
]
DD23_PROBE_SOURCES = [(-1, "probe_src_a"), (-3, "probe_src_b")]

assert all(
    t.isascii() and t.isprintable() and "'" not in t for _i, t in DD23_PROBE_DOCS
), "dd23 probe payloads must be quote-free printable ASCII"
_DD23_PROBE_VALUES = ", ".join(
    f"(cast({i} AS BIGINT), '{t}')" for i, t in DD23_PROBE_DOCS
)
_DD23_SRC_VALUES = ", ".join(
    f"(cast({i} AS BIGINT), '{srcname}')" for i, srcname in DD23_PROBE_SOURCES
)


def dd23_contamination_report(
    spark: SparkSession, sf_dir: str, eval_mod: int = 100, min_containment: float = 0.5
) -> DataFrame:
    """The AUDIT rollup on top of dd9's pair semantics — the
    contamination report a lab publishes next to a release (the
    GPT-3 appendix-C form): for every (eval doc, TRAINING SOURCE),
    how many training docs from that source contaminate it, the
    worst containment, and the total overlapping shingle mass. dd9
    answers "which docs do I drop"; dd23 answers "WHICH FEEDS leak
    benchmarks" — the per-source signal that turns a dedup pass into
    a pipeline fix. Output: (eval_doc, source, n_contaminating,
    max_containment, sum_common).

    Carries the dd19-style probe union (one eval probe embedded
    verbatim in two probe-source train docs), so the relation is
    non-vacuous on every corpus — the synthetic fixtures produce no
    organic >= 0.5 containment at sf0.01, and a 0-row oracle pin
    would be meaningless. Determinism: counts and masses are exact
    integers; containment is an int/int IEEE division; max over
    identical doubles is engine-free. Scale: dd9's exact shape (one
    shared shingle pass, broadcast eval side, candidate-bounded pair
    aggregation) + one join to the doc->source map + an
    (eval x sources)-bounded rollup. Not in the driver registry
    (50-entry cap); DuckDB parity in tests/test_offline_oracles.py."""
    probes = spark.createDataFrame(DD23_PROBE_DOCS, "doc_id bigint, text string").select(
        "doc_id", _shingles_expr().alias("sh")
    )
    sh = _shingled(spark, sf_dir).unionByName(probes)
    is_eval = F.col("doc_id") % eval_mod == 0
    ev = sh.where(is_eval).select(
        F.col("doc_id").alias("eval_doc"),
        F.explode("sh").alias("s"),
        F.size("sh").alias("n_eval"),
    )
    tr = sh.where(~is_eval).select(F.col("doc_id").alias("train_doc"), F.explode("sh").alias("s"))
    hits = (
        tr.join(F.broadcast(ev), "s")
        .groupBy("train_doc", "eval_doc", "n_eval")
        .agg(F.count("*").alias("n_common"))
    )
    containment = F.col("n_common").cast("double") / F.col("n_eval").cast("double")
    pairs = hits.where(containment >= min_containment).select(
        "train_doc", "eval_doc",
        F.col("n_common").cast("bigint").alias("n_common"),
        containment.alias("containment"),
    )
    src = (
        load_table(spark, sf_dir, "documents")
        .select(F.col("doc_id").alias("train_doc"), "source")
        .unionByName(
            spark.createDataFrame(DD23_PROBE_SOURCES, "train_doc bigint, source string")
        )
    )
    return (
        pairs.join(src, "train_doc")
        .groupBy("eval_doc", "source")
        .agg(
            F.count("*").cast("bigint").alias("n_contaminating"),
            F.max("containment").alias("max_containment"),
            F.sum("n_common").cast("bigint").alias("sum_common"),
        )
    )


DD23_SQL = f"""
WITH u AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT * FROM (VALUES {_DD23_PROBE_VALUES}) probes(doc_id, text)
),
sh AS (
    SELECT doc_id,
           list_distinct(
               CASE WHEN len(w) >= 3
                    THEN list_transform(generate_series(1, len(w) - 2),
                                        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
                    ELSE [] END
           ) AS shingles
    FROM (SELECT doc_id, str_split(text, ' ') AS w FROM u)
),
ev AS (
    SELECT doc_id AS eval_doc, unnest(shingles) AS s, len(shingles) AS n_eval
    FROM sh WHERE doc_id % 100 = 0
),
tr AS (
    SELECT doc_id AS train_doc, unnest(shingles) AS s
    FROM sh WHERE doc_id % 100 != 0
),
hits AS (
    SELECT t.train_doc, e.eval_doc, e.n_eval, count(*) AS n_common
    FROM tr t JOIN ev e ON t.s = e.s
    GROUP BY t.train_doc, e.eval_doc, e.n_eval
),
pairs AS (
    SELECT train_doc, eval_doc, cast(n_common AS BIGINT) AS n_common,
           cast(n_common AS DOUBLE) / cast(n_eval AS DOUBLE) AS containment
    FROM hits
    WHERE cast(n_common AS DOUBLE) / cast(n_eval AS DOUBLE) >= 0.5
),
src AS (
    SELECT doc_id AS train_doc, source FROM documents
    UNION ALL
    SELECT * FROM (VALUES {_DD23_SRC_VALUES}) psrc(train_doc, source)
)
SELECT p.eval_doc, s.source,
       cast(count(*) AS BIGINT) AS n_contaminating,
       max(p.containment) AS max_containment,
       cast(sum(p.n_common) AS BIGINT) AS sum_common
FROM pairs p JOIN src s ON p.train_doc = s.train_doc
GROUP BY p.eval_doc, s.source
"""
