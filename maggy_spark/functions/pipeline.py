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
from maggy_spark.plans.fixtures import load_table

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


OPERATORS = [
    ("pl1_corpus_prep", pl1_corpus_prep, PL1_SQL),
    ("pl2_stratified_sample", pl2_stratified_sample, PL2_SQL),
]
