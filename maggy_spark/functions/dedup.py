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

MinHash trick for cross-engine parity: the "hash" is the md5 hex
string itself and the signature takes the lexicographic min — both
engines order ASCII hex identically, so signatures match bit-for-bit
without any integer-hash agreement between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from maggy_spark.plans.fixtures import load_table

N_HASHES = 4


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


def dd2_minhash_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc MinHash signature: for seed k, min over shingles of
    md5(k || '|' || shingle). Map-side only — aggregate over the
    shingle array, no explode, no shuffle."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", _shingles_expr().alias("sh"))
    cols = [F.array_min(F.transform("sh", lambda s: F.md5(F.concat(F.lit(f"{k}|"), s)))).alias(f"mh{k}")
            for k in range(N_HASHES)]
    return d.select("doc_id", *cols)


# shared SQL fragments: signature, banding, and candidate generation
# are written ONCE and composed by DD2/DD3/DD8 (mirrors how the Spark
# side builds dd3/dd8 on dd2)
_SIG_SQL = """
    SELECT doc_id,
           list_min(list_transform(shingles, s -> md5('0|' || s))) AS mh0,
           list_min(list_transform(shingles, s -> md5('1|' || s))) AS mh1,
           list_min(list_transform(shingles, s -> md5('2|' || s))) AS mh2,
           list_min(list_transform(shingles, s -> md5('3|' || s))) AS mh3
    FROM sh
"""

_BANDS_SQL = """
    SELECT doc_id, 'b0:' || mh0 || mh1 AS band_key FROM sig
    UNION ALL
    SELECT doc_id, 'b1:' || mh2 || mh3 AS band_key FROM sig
"""

_CAND_SQL = """
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b ON a.band_key = b.band_key AND a.doc_id < b.doc_id
"""

DD2_SQL = f"""
WITH sh AS ({_SHINGLES_SQL})
{_SIG_SQL}
"""


def dd3_lsh_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding: 2 bands of 2 hashes; docs sharing a band key are
    near-dup candidates. Self-join on the band key only — the pair
    space never materializes beyond actual bucket collisions."""
    sig = dd2_minhash_signature(spark, sf_dir)
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                F.concat(F.lit("b0:"), F.col("mh0"), F.col("mh1")),
                F.concat(F.lit("b1:"), F.col("mh2"), F.col("mh3")),
            )
        ).alias("band_key"),
    )
    # materialize signatures once: in production this is the
    # signatures table written to storage; without it the self-join
    # recomputes the full shingle+minhash pipeline on both sides
    bands = bands.persist()
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(b, "band_key")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


DD3_SQL = f"""
WITH sh AS ({_SHINGLES_SQL}),
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
    d = load_table(spark, sf_dir, "documents").select("doc_id", _shingles_expr().alias("sh"))
    sizes = d.select("doc_id", F.size("sh").alias("n_sh"))
    # join key is the 64-bit hash of the shingle, not the string:
    # narrow shuffle rows and cheap comparisons (engine-local detail —
    # the oracle joins on raw shingles; a 64-bit collision over the
    # shingle vocabulary is ~1e-10 at this scale)
    ex = d.select("doc_id", F.explode("sh").alias("shingle")).select(
        "doc_id", F.xxhash64("shingle").alias("sid")
    )
    rare = ex.groupBy("sid").count().where(F.col("count") <= max_doc_freq).select("sid")
    # materialize the pruned postings once; both sides of the
    # self-join read the persisted relation instead of re-deriving
    # the shingle pipeline
    ex = ex.join(rare, "sid").persist()
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


N_SIMHASH_BITS = 16


def _simhash_expr():
    """16-bit SimHash over distinct tokens as a bit-string column.

    Bit k is the sign of sum over tokens of +-1, where the vote is the
    high bit of the first hex char of md5('k|' || token) — one
    independent hash per bit, identical in both engines (md5 hex is
    the shared hash family, as with MinHash). Map-side only: an
    aggregate over the token array, no explode, no shuffle.
    """
    toks = F.array_distinct(F.split(F.col("text"), " "))

    def bit_col(k: int):
        s = F.aggregate(
            toks,
            F.lit(0),
            lambda acc, t: acc
            + F.when(F.substring(F.md5(F.concat(F.lit(f"{k}|"), t)), 1, 1) < "8", 1).otherwise(-1),
        )
        return F.when(s >= 0, F.lit("1")).otherwise(F.lit("0"))

    return F.concat(*[bit_col(k) for k in range(N_SIMHASH_BITS)])


def _simhash_sql_expr() -> str:
    parts = []
    for k in range(N_SIMHASH_BITS):
        s = (
            f"list_sum(list_transform(list_distinct(str_split(text, ' ')), "
            f"t -> CASE WHEN substr(md5('{k}|' || t), 1, 1) < '8' THEN 1 ELSE -1 END))"
        )
        parts.append(f"(CASE WHEN {s} >= 0 THEN '1' ELSE '0' END)")
    return " || ".join(parts)


def dd6_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc SimHash signature + its band prefix (the blocking key
    for hamming-distance candidate generation)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        _simhash_expr().alias("simhash"),
    ).select(
        "doc_id", "simhash", F.substring("simhash", 1, 8).alias("band")
    )


DD6_SQL = f"""
SELECT doc_id, simhash, substr(simhash, 1, 8) AS band
FROM (SELECT doc_id, {_simhash_sql_expr()} AS simhash FROM documents)
"""


def dd7_simhash_near_dup(spark: SparkSession, sf_dir: str, max_hamming: int = 3) -> DataFrame:
    """SimHash near-duplicate pairs: candidates blocked on an 8-bit
    band prefix (docs differing in the first byte are never paired),
    then exact hamming distance <= `max_hamming` over the 16-bit
    signatures. The band equi-join keeps the pair space bucket-local.
    """
    sig = dd6_simhash(spark, sf_dir).persist()
    a = sig.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("ha"), "band")
    b = sig.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("hb"), "band")
    # hamming = count of differing chars between equal-length bit strings
    idx = F.sequence(F.lit(1), F.lit(N_SIMHASH_BITS))
    return (
        a.join(b, "band")
        .where(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.aggregate(
                idx,
                F.lit(0),
                lambda acc, i: acc
                + F.when(F.col("ha").substr(i, F.lit(1)) != F.col("hb").substr(i, F.lit(1)), 1).otherwise(0),
            ).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
    )


DD7_SQL = f"""
WITH sig AS (
    SELECT doc_id, simhash, substr(simhash, 1, 8) AS band
    FROM (SELECT doc_id, {_simhash_sql_expr()} AS simhash FROM documents)
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       cast(list_sum(list_transform(generate_series(1, {N_SIMHASH_BITS}),
            i -> CASE WHEN substr(a.simhash, i, 1) != substr(b.simhash, i, 1) THEN 1 ELSE 0 END)) AS INTEGER) AS hamming
FROM sig a JOIN sig b ON a.band = b.band AND a.doc_id < b.doc_id
WHERE list_sum(list_transform(generate_series(1, {N_SIMHASH_BITS}),
        i -> CASE WHEN substr(a.simhash, i, 1) != substr(b.simhash, i, 1) THEN 1 ELSE 0 END)) <= 3
"""


def dd8_lsh_verified_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production near-dup pipeline: LSH band candidates (dd3)
    verified with EXACT jaccard via array_intersect of the two docs'
    distinct-shingle arrays. Work is proportional to the candidate
    count, not Σf² over shingle frequencies — this is the path that
    replaces dd4's exhaustive verification at corpus scale.
    """
    sh = load_table(spark, sf_dir, "documents").select("doc_id", _shingles_expr().alias("sh")).persist()
    cand = dd3_lsh_candidate_pairs(spark, sf_dir)
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
WITH sh AS ({_SHINGLES_SQL}),
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


OPERATORS = [
    ("dd1_exact_dedup", dd1_exact_dedup, DD1_SQL),
    ("dd2_minhash_signature", dd2_minhash_signature, DD2_SQL),
    ("dd3_lsh_candidate_pairs", dd3_lsh_candidate_pairs, DD3_SQL),
    ("dd4_ngram_jaccard", dd4_ngram_jaccard, DD4_SQL),
    ("dd5_dedup_clusters", dd5_dedup_clusters, DD5_SQL),
    ("dd6_simhash", dd6_simhash, DD6_SQL),
    ("dd7_simhash_near_dup", dd7_simhash_near_dup, DD7_SQL),
    ("dd8_lsh_verified_jaccard", dd8_lsh_verified_jaccard, DD8_SQL),
]
