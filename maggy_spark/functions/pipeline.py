"""The composed training-data pipeline: dedup -> near-dup drop ->
quality filter -> token accounting, as ONE declarative plan.

This is the capstone of the LLM-pipeline operator family: each stage
is an operator that already exists (dd5 exact-dup clusters, dd8
LSH-verified near-dups, tx2 quality ratios, tx1 token counts), and
the pipeline composes them into a single DataFrame query that
Catalyst optimizes end-to-end — no intermediate materialization, no
driver round-trips. The final relation is what a pre-training run
would read; `corpus_to_shards` writes it worker-aligned.

At 100 TB: every stage is bucket/band-blocked (inherited from its
operator), the keep-set anti-joins are broadcast-able (the drop side
is pairs, orders of magnitude smaller than the corpus), and the
output is column-pruned to the training schema at the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from maggy_spark.functions.dedup import (
    _BANDS_SQL,
    _CAND_SQL,
    _SHINGLES_SQL,
    _SIG_SQL,
    dd5_dedup_clusters,
    dd8_lsh_verified_jaccard,
)
from maggy_spark.plans.fixtures import hash_uniform, load_table

MIN_TOKENS = 10
MIN_RICHNESS = 0.3
NEAR_DUP_JACCARD = 0.5


def pl1_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surviving documents with their training-relevant stats.

    keep = not an exact duplicate (cluster rep survives)
         AND not the higher-id member of a verified near-dup pair
         AND n_tokens >= 10 AND vocab_richness >= 0.3
    """
    exact = dd5_dedup_clusters(spark, sf_dir).where(~F.col("is_duplicate")).select("doc_id")
    near_drop = (
        dd8_lsh_verified_jaccard(spark, sf_dir)
        .where(F.col("jaccard") >= NEAR_DUP_JACCARD)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    # all per-doc stats in ONE projection over one scan (joining the
    # tx1/tx2 operators would tokenize the corpus twice and add a
    # corpus-wide shuffle join — Catalyst can't fuse two derivations
    # of the same table through a join)
    d = load_table(spark, sf_dir, "documents", fan_out=True)
    toks = F.split(F.col("text"), " ")
    n_toks = F.size(toks).cast("bigint")
    stats = d.select(
        "doc_id",
        n_toks.alias("n_tokens"),
        (F.size(F.array_distinct(toks)).cast("double") / n_toks.cast("double")).alias("richness"),
        F.aggregate(
            toks, F.lit(0).cast("bigint"), lambda acc, t: acc + F.ceil(F.length(t) / 4.0).cast("bigint")
        ).alias("bpe_tokens"),
    )
    return (
        exact.join(F.broadcast(near_drop), "doc_id", "left_anti")
        .join(stats, "doc_id")
        .where((F.col("n_tokens") >= MIN_TOKENS) & (F.col("richness") >= MIN_RICHNESS))
        .select("doc_id", "n_tokens", "bpe_tokens", "richness")
    )


PL1_SQL = f"""
WITH sh AS ({_SHINGLES_SQL}),
sig AS ({_SIG_SQL}),
bands AS ({_BANDS_SQL}),
cand AS ({_CAND_SQL}),
near_drop AS (
    SELECT DISTINCT c.doc_b AS doc_id
    FROM cand c
    JOIN sh sa ON c.doc_a = sa.doc_id
    JOIN sh sb ON c.doc_b = sb.doc_id
    WHERE cast(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
          / cast(len(sa.shingles) + len(sb.shingles) - len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
          >= {NEAR_DUP_JACCARD}
),
exact_reps AS (
    SELECT doc_id FROM (
        SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(text)) AS rep
        FROM documents
    ) WHERE doc_id = rep
),
stats AS (
    SELECT doc_id,
           cast(len(str_split(text, ' ')) AS BIGINT) AS n_tokens,
           cast(len(list_distinct(str_split(text, ' '))) AS DOUBLE)
               / cast(len(str_split(text, ' ')) AS DOUBLE) AS richness,
           cast(list_sum(list_transform(str_split(text, ' '), t -> cast(ceil(length(t) / 4.0) AS BIGINT))) AS BIGINT) AS bpe_tokens
    FROM documents
)
SELECT s.doc_id, s.n_tokens, s.bpe_tokens, s.richness
FROM stats s
JOIN exact_reps e ON s.doc_id = e.doc_id
WHERE s.doc_id NOT IN (SELECT doc_id FROM near_drop)
  AND s.n_tokens >= {MIN_TOKENS} AND s.richness >= {MIN_RICHNESS}
"""


def corpus_to_shards(spark: SparkSession, sf_dir: str, out_path: str, n_shards: int = 8) -> str:
    """Materialize the surviving corpus (full text + stats) as
    worker-aligned shards for the training loop."""
    from maggy_spark.sources.data import write_training_shards

    keep = pl1_corpus_prep(spark, sf_dir).select("doc_id", "n_tokens")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    return write_training_shards(docs.join(keep, "doc_id"), out_path, n_shards)


# per-language sampling quotas (percent) — the domain-mixing knob of
# a pre-training data recipe
LANG_QUOTAS = {"en": 80, "de": 50, "fr": 50, "es": 50, "zh": 25}


def pl2_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling by language: doc selected iff
    hash(doc_id) mod 100 < quota[lang]. Hash-based selection (not
    rand()) is THE reproducible sampling method at corpus scale —
    identical across runs, engines, partitionings, and retries; no
    sampling state, no seed plumbing. Selection rides the scan as a
    pure filter."""
    d = load_table(spark, sf_dir, "documents")
    bucket = (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast("bigint") % 100)
    quota = F.coalesce(
        *[F.when(F.col("lang") == lang, F.lit(pct)) for lang, pct in LANG_QUOTAS.items()],
        F.lit(0),
    )
    return d.select("doc_id", "lang", bucket.cast("int").alias("sample_bucket")).where(
        F.col("sample_bucket") < quota
    )


_QUOTA_CASE = " ".join(f"WHEN lang = '{lang}' THEN {pct}" for lang, pct in LANG_QUOTAS.items())
PL2_SQL = f"""
SELECT doc_id, lang, sample_bucket FROM (
    SELECT doc_id, lang,
           cast(cast(('0x' || substr(md5(cast(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS INTEGER) AS sample_bucket
    FROM documents
)
WHERE sample_bucket < (CASE {_QUOTA_CASE} ELSE 0 END)
"""


# target token share per language for the training mixture — the
# up/down-weighting recipe knob (weights need not sum to 1; they are
# shares of the token budget)
MIX_WEIGHTS = {"en": 0.5, "de": 0.2, "fr": 0.15, "es": 0.1, "zh": 0.05}


def pl3_token_budget_mix(spark: SparkSession, sf_dir: str, budget_share: float = 0.5) -> DataFrame:
    """Language-weighted token budgeting: sample the corpus down to
    `budget_share` of its total tokens, split across languages by
    MIX_WEIGHTS — the mixture-reweighting step of a pre-training data
    recipe (desired_l = weight_l * budget; keep fraction_l =
    min(1, desired_l / available_l) of language l's documents).

    Selection is hash-uniform per doc (md5 counter like g1/pl2), so
    the sample is reproducible across runs, engines, partitionings,
    and retries, and the expected kept-token mass per language hits
    the quota without any global sort or per-language accounting
    state.

    Scale shape: one low-cardinality groupBy(lang) over a pruned
    (lang, n_tokens) projection builds the per-language totals; the
    corpus total derives from THAT |langs|-row relation (sum of
    sums — never a second corpus aggregation), the per-language
    fractions broadcast back, and the doc-level decision is a
    map-side filter riding the scan. Two corpus passes total (stats,
    then selection) and the corpus is never shuffled.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "lang", F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tokens")
    )
    # consumed twice (fractions + corpus total): materialize the
    # |langs|-row aggregate so the corpus stats pass runs ONCE
    avail = toks.groupBy("lang").agg(F.sum("n_tokens").alias("avail")).persist()
    total = avail.agg(F.sum("avail").alias("total"))
    weight = F.coalesce(
        *[F.when(F.col("lang") == lang, F.lit(wt)) for lang, wt in MIX_WEIGHTS.items()],
        F.lit(0.0),
    )
    frac = F.least(
        F.lit(1.0),
        (weight * F.lit(budget_share) * F.col("total").cast("double")) / F.col("avail").cast("double"),
    )
    fracs = avail.crossJoin(F.broadcast(total)).select("lang", frac.alias("keep_frac"))
    u = hash_uniform("pl3", F.col("doc_id").cast("string"))
    return (
        toks.join(F.broadcast(fracs), "lang")
        .where(u < F.col("keep_frac"))
        .select("doc_id", "lang", "n_tokens", "keep_frac")
    )


_MIX_CASE = " ".join(f"WHEN lang = '{lang}' THEN {wt}" for lang, wt in MIX_WEIGHTS.items())
PL3_SQL = f"""
WITH toks AS (
    SELECT doc_id, lang, cast(len(str_split(text, ' ')) AS BIGINT) AS n_tokens
    FROM documents
),
avail AS (SELECT lang, sum(n_tokens) AS avail FROM toks GROUP BY lang),
total AS (SELECT sum(avail) AS total FROM avail),
fracs AS (
    SELECT lang,
           least(1.0, ((CASE {_MIX_CASE} ELSE 0.0 END) * 0.5 * cast(total AS DOUBLE))
                      / cast(avail AS DOUBLE)) AS keep_frac
    FROM avail CROSS JOIN total
)
SELECT t.doc_id, t.lang, t.n_tokens, f.keep_frac
FROM toks t JOIN fracs f ON t.lang = f.lang
WHERE cast(cast(('0x' || substr(md5('pl3:' || cast(t.doc_id AS VARCHAR)), 1, 13)) AS BIGINT) AS DOUBLE)
      / 4503599627370496.0 < f.keep_frac
"""


OPERATORS = [
    ("pl1_corpus_prep", pl1_corpus_prep, PL1_SQL),
    ("pl2_stratified_sample", pl2_stratified_sample, PL2_SQL),
]
