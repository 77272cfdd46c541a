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
operator); the keep-set anti-joins carry no broadcast hints — the
drop side is a corpus FRACTION on duplicate-heavy data, so the join
shuffles on its key and AQE broadcasts only when it measures small;
and the output is column-pruned to the training schema at the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from maggy_spark.functions.dedup import (
    _BANDS_SQL,
    _CAND_SQL,
    _MH_PARAMS_SQL,
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
    # no broadcast hint on near_drop: it is O(duplicate docs) — a
    # constant FRACTION of the corpus on duplicate-heavy data (95% on
    # the synthetic corpus, SCALING.md), so forcing it through the
    # driver is a scale bug; the anti-join shuffles on the doc_id key
    # and AQE still broadcasts it at runtime when it measures small
    return (
        exact.join(near_drop, "doc_id", "left_anti")
        .join(stats, "doc_id")
        .where((F.col("n_tokens") >= MIN_TOKENS) & (F.col("richness") >= MIN_RICHNESS))
        .select("doc_id", "n_tokens", "bpe_tokens", "richness")
    )


PL1_SQL = f"""
WITH p AS ({_MH_PARAMS_SQL}),
sh AS ({_SHINGLES_SQL}),
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


# pl4 rule thresholds (Gopher-style surface filters)
FUNNEL_MIN_TOKENS = 10
FUNNEL_MIN_RICHNESS = 0.3
FUNNEL_MAX_MEAN_WORD_LEN = 12.0
FUNNEL_MIN_MEAN_WORD_LEN = 2.0


def funnel_fail_flags() -> list[tuple[str, "F.Column"]]:
    """The pl4 quality-rule FAIL predicates as one shared expression
    list — pl4's funnel report and pl13's ledger both build from it
    (the pii_decision_columns pattern: two gate-checked relations must
    not be able to drift on a rule's expression)."""
    toks = F.split(F.col("text"), " ")
    n_toks = F.size(toks).cast("bigint")
    mean_wlen = (
        F.aggregate(toks, F.lit(0).cast("bigint"), lambda a, t: a + F.length(t).cast("bigint")).cast("double")
        / n_toks.cast("double")
    )
    richness = F.size(F.array_distinct(toks)).cast("double") / n_toks.cast("double")
    return [
        ("min_tokens", n_toks < FUNNEL_MIN_TOKENS),
        ("min_richness", richness < FUNNEL_MIN_RICHNESS),
        (
            "mean_word_len",
            (mean_wlen > FUNNEL_MAX_MEAN_WORD_LEN) | (mean_wlen < FUNNEL_MIN_MEAN_WORD_LEN),
        ),
        ("lang_known", F.col("lang") == "unknown"),
    ]


def pl4_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-rule drop accounting for the quality-filter chain — the
    "filter funnel" report a corpus-curation run publishes so each
    rule's bite is visible before committing to a recipe.

    Output: one row per rule with how many documents fail it in
    isolation (`n_failing`) and how many survive the chain up to and
    including it (`n_surviving_cum`, rules applied in seq order).

    Scale shape: ONE corpus scan computes every per-doc predicate in a
    single projection; a single 1-row aggregate (partial map-side
    sums) collapses them, and `stack` pivots that one row to the
    4-row report — no joins, no window, no second scan, report size
    O(rules) regardless of corpus size.
    """
    d = load_table(spark, sf_dir, "documents", fan_out=True)
    rules = funnel_fail_flags()
    flags = d.select(
        rules[0][1].cast("bigint").alias("f_short"),
        rules[1][1].cast("bigint").alias("f_rich"),
        rules[2][1].cast("bigint").alias("f_wlen"),
        rules[3][1].cast("bigint").alias("f_lang"),
    )
    agg = flags.agg(
        F.count("*").alias("n_docs"),
        F.sum("f_short").alias("d1"),
        F.sum("f_rich").alias("d2"),
        F.sum("f_wlen").alias("d3"),
        F.sum("f_lang").alias("d4"),
        F.sum("f_short").alias("c1"),
        F.sum(F.greatest("f_short", "f_rich").cast("bigint")).alias("c2"),
        F.sum(F.greatest("f_short", "f_rich", "f_wlen").cast("bigint")).alias("c3"),
        F.sum(F.greatest("f_short", "f_rich", "f_wlen", "f_lang").cast("bigint")).alias("c4"),
    )
    return agg.select(
        F.expr(
            "stack(4, "
            "1, 'min_tokens',    d1, n_docs - c1, "
            "2, 'min_richness',  d2, n_docs - c2, "
            "3, 'mean_word_len', d3, n_docs - c3, "
            "4, 'lang_known',    d4, n_docs - c4) "
            "AS (seq, rule, n_failing, n_surviving_cum)"
        )
    )


PL4_SQL = f"""
WITH flags AS (
    SELECT
        CASE WHEN cast(len(str_split(text, ' ')) AS BIGINT) < {FUNNEL_MIN_TOKENS} THEN 1 ELSE 0 END AS f_short,
        CASE WHEN cast(len(list_distinct(str_split(text, ' '))) AS DOUBLE)
                  / cast(len(str_split(text, ' ')) AS DOUBLE) < {FUNNEL_MIN_RICHNESS} THEN 1 ELSE 0 END AS f_rich,
        CASE WHEN (cast(list_sum(list_transform(str_split(text, ' '), t -> cast(length(t) AS BIGINT))) AS DOUBLE)
                   / cast(len(str_split(text, ' ')) AS DOUBLE)) > {FUNNEL_MAX_MEAN_WORD_LEN}
               OR (cast(list_sum(list_transform(str_split(text, ' '), t -> cast(length(t) AS BIGINT))) AS DOUBLE)
                   / cast(len(str_split(text, ' ')) AS DOUBLE)) < {FUNNEL_MIN_MEAN_WORD_LEN} THEN 1 ELSE 0 END AS f_wlen,
        CASE WHEN lang = 'unknown' THEN 1 ELSE 0 END AS f_lang
    FROM documents
),
agg AS (
    SELECT count(*) AS n_docs,
           sum(f_short) AS d1, sum(f_rich) AS d2, sum(f_wlen) AS d3, sum(f_lang) AS d4,
           sum(f_short) AS c1,
           sum(greatest(f_short, f_rich)) AS c2,
           sum(greatest(f_short, f_rich, f_wlen)) AS c3,
           sum(greatest(f_short, f_rich, f_wlen, f_lang)) AS c4
    FROM flags
)
SELECT 1 AS seq, 'min_tokens' AS rule,    cast(d1 AS BIGINT) AS n_failing, cast(n_docs - c1 AS BIGINT) AS n_surviving_cum FROM agg
UNION ALL
SELECT 2, 'min_richness',  cast(d2 AS BIGINT), cast(n_docs - c2 AS BIGINT) FROM agg
UNION ALL
SELECT 3, 'mean_word_len', cast(d3 AS BIGINT), cast(n_docs - c3 AS BIGINT) FROM agg
UNION ALL
SELECT 4, 'lang_known',    cast(d4 AS BIGINT), cast(n_docs - c4 AS BIGINT) FROM agg
"""


# pl5 split quotas: [0,80) train, [80,90) val, [90,100) test
SPLIT_QUOTAS = (("train", 0, 80), ("val", 80, 90), ("test", 90, 100))


def pl5_leakage_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free train/val/test split: every document is assigned
    the split of its exact-dup CLUSTER REPRESENTATIVE, so duplicate
    copies can never straddle the train/eval boundary (the classic
    contamination path when splitting at the doc level).

    The split decision is hash-deterministic on the representative id
    (md5 counter like pl2/g1): reproducible across runs, engines,
    partitionings, and retries, and stable under corpus growth — a new
    duplicate of an existing document lands in its cluster's split.

    Scale shape: the dd5 cluster relation (one md5 groupBy) joined
    back on doc_id; the split expression is map-side arithmetic on the
    joined rep — one shuffle total, inherited from dd5.
    """
    clusters = dd5_dedup_clusters(spark, sf_dir)
    return clusters.select(
        "doc_id", "cluster_rep", "is_duplicate", _rep_split_expr("pl5").alias("split")
    )


def _rep_split_expr(salt: str):
    """SPLIT_QUOTAS bucket decision, hash-deterministic on the
    `cluster_rep` column — one expression shared by the exact (pl5)
    and fuzzy (pl6) splits so the quota arithmetic can't diverge; the
    salt keeps the two splits' hash streams independent."""
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{salt}:"), F.col("cluster_rep").cast("string"))), 1, 8),
            16,
            10,
        )
        .cast("bigint")
        % 100
    )
    return F.coalesce(
        *[F.when((bucket >= lo) & (bucket < hi), F.lit(name)) for name, lo, hi in SPLIT_QUOTAS]
    )


_SPLIT_CASE = " ".join(
    f"WHEN bucket >= {lo} AND bucket < {hi} THEN '{name}'" for name, lo, hi in SPLIT_QUOTAS
)
PL5_SQL = f"""
WITH d AS (SELECT doc_id, md5(text) AS h FROM documents),
reps AS (SELECT h, min(doc_id) AS cluster_rep FROM d GROUP BY h),
joined AS (
    SELECT d.doc_id, reps.cluster_rep, (d.doc_id != reps.cluster_rep) AS is_duplicate,
           cast(('0x' || substr(md5('pl5:' || cast(reps.cluster_rep AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS bucket
    FROM d JOIN reps ON d.h = reps.h
)
SELECT doc_id, cluster_rep, is_duplicate, (CASE {_SPLIT_CASE} END) AS split
FROM joined
"""


def pl6_fuzzy_leakage_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pl5's leakage-free split hardened against NEAR duplicates:
    every document inherits the split of its dd10 near-dup COMPONENT
    representative, so a lightly-edited copy of a training document
    can never land in eval (exact-dup splitting — pl5 — misses it; a
    one-word edit changes the md5). On this synthetic corpus the giant
    near-dup component makes the assignment lopsided, which is the
    semantics working as intended: documents that are near-copies of
    each other must share a split whatever their count.

    Scale shape: dd10's component relation (star contraction, see
    SCALING.md) + map-side hash arithmetic on the representative —
    nothing beyond dd10's own cost. Not in the driver registry
    (50-entry cap); DuckDB parity (recursive-closure components +
    the same split hash) in tests/test_offline_oracles.py.
    """
    from maggy_spark.functions.dedup import dd10_near_dup_components

    comps = dd10_near_dup_components(spark, sf_dir)
    return comps.select(
        "doc_id", "cluster_rep", "is_duplicate", _rep_split_expr("pl6").alias("split")
    )


def _pl6_sql() -> str:
    from maggy_spark.functions.dedup import (
        _SIMHASH_BANDS_SQL,
        _SIMHASH_CAND_SQL,
        _SIMHASH_PAIRS_CTE,
        _SIMHASH_PARAMS_SQL,
        _SIMHASH_SIG_SQL,
        cc_closure_sql,
    )

    return f"""
WITH RECURSIVE p AS ({_SIMHASH_PARAMS_SQL}),
sig AS ({_SIMHASH_SIG_SQL}),
bands AS ({_SIMHASH_BANDS_SQL}),
cand AS ({_SIMHASH_CAND_SQL}),
pairs AS ({_SIMHASH_PAIRS_CTE}),
{cc_closure_sql("documents", "doc_id")},
withb AS (
    SELECT doc_id, cluster_rep, (doc_id != cluster_rep) AS is_duplicate,
           cast(('0x' || substr(md5('pl6:' || cast(cluster_rep AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS bucket
    FROM comp
)
SELECT doc_id, cluster_rep, is_duplicate, (CASE {_SPLIT_CASE} END) AS split
FROM withb
"""


PL6_SQL = _pl6_sql()


# -- PL7: sequence-packing plan ----------------------------------------

PACK_CTX = 512     # context window length (tokens)
PACK_SHARDS = 8    # output shards; production = number of output files


def pl7_sequence_pack_plan(
    spark: SparkSession, sf_dir: str, ctx: int = PACK_CTX, shards: int = PACK_SHARDS
) -> DataFrame:
    """Concatenate-and-chunk packing plan: assign every document its
    token span and the context windows it lands in when the corpus is
    concatenated shard-by-shard and sliced into fixed `ctx`-token
    training sequences — the sample-packing step between a prepared
    corpus and a pretraining dataloader.

    Scale shape: packing is PER SHARD (doc_id mod `shards`; production
    uses the output-file assignment), so the running token cumsum is a
    window partitioned by shard — there is NO global-order cumsum,
    which would funnel the corpus through one task. With thousands of
    shards at 100 TB every partition packs independently, and each
    doc's plan row is (shard, tok_start, window_start, window_end).
    Token counts are tx1's deterministic BPE proxy. Not in the driver
    registry (50-entry cap); DuckDB parity in
    tests/test_offline_oracles.py.
    """
    from maggy_spark.functions.text import tx1_token_count

    return pack_plan(tx1_token_count(spark, sf_dir).select("doc_id", "bpe_tokens"), ctx, shards)


def pack_plan(toks: DataFrame, ctx: int = PACK_CTX, shards: int = PACK_SHARDS) -> DataFrame:
    """The packing core over ANY (doc_id, bpe_tokens) relation —
    factored out so property tests can drive it with synthetic token
    tables (including zero-token documents, whose window_end is
    window_start - 1, i.e. n_windows = 0)."""
    from pyspark.sql import Window

    t = toks.withColumn("shard", (F.col("doc_id") % shards).cast("int"))
    w = Window.partitionBy("shard").orderBy("doc_id")
    c = t.withColumn("cum_end", F.sum("bpe_tokens").over(w))
    tok_start = F.col("cum_end") - F.col("bpe_tokens")
    win_start = F.floor(tok_start / F.lit(ctx))
    win_end = F.floor((F.col("cum_end") - 1) / F.lit(ctx))
    return c.select(
        "doc_id",
        "shard",
        "bpe_tokens",
        tok_start.alias("tok_start"),
        win_start.alias("window_start"),
        win_end.alias("window_end"),
        (win_end - win_start + 1).alias("n_windows"),
    )


def pl7_sql(ctx: int = PACK_CTX, shards: int = PACK_SHARDS) -> str:
    """PL7's DuckDB twin, generated from the operator's parameters
    (dd11_sql pattern). DuckDB sums BIGINT into HUGEINT, hence the
    explicit BIGINT casts. Division uses floor() of a DOUBLE quotient,
    NOT `//`: DuckDB's integer `//` truncates toward zero, which
    diverges from Spark's F.floor for a zero-token document at the
    head of a shard (cum_end - 1 = -1 -> floor gives -1, n_windows 0;
    `//` would give 0). Quotients are tiny integers over a 2^53-exact
    range, so floor(double) is exact on both engines."""
    return f"""
WITH toks AS (
    SELECT doc_id,
           cast(list_sum(list_transform(str_split(text, ' '),
                t -> cast(ceil(length(t) / 4.0) AS BIGINT))) AS BIGINT) AS bpe_tokens
    FROM documents
),
t AS (SELECT doc_id, cast(doc_id % {shards} AS INTEGER) AS shard, bpe_tokens FROM toks),
c AS (
    SELECT doc_id, shard, bpe_tokens,
           cast(sum(bpe_tokens) OVER (PARTITION BY shard ORDER BY doc_id) AS BIGINT) AS cum_end
    FROM t
)
SELECT doc_id, shard, bpe_tokens,
       cum_end - bpe_tokens AS tok_start,
       cast(floor((cum_end - bpe_tokens) / {ctx}.0) AS BIGINT) AS window_start,
       cast(floor((cum_end - 1) / {ctx}.0) AS BIGINT) AS window_end,
       cast(floor((cum_end - 1) / {ctx}.0) AS BIGINT)
         - cast(floor((cum_end - bpe_tokens) / {ctx}.0) AS BIGINT) + 1 AS n_windows
FROM c
"""


PL7_SQL = pl7_sql()


OPERATORS = [
    # pl1_corpus_prep rotated OUT round 14 (pre-declared in COVERAGE.md
    # r13): its filter chain is the first three stages of the
    # gate-green pl13 ledger, pinned equal by
    # test_pl13_quality_stage_equals_pl4_survivors; the slot went to
    # pl17_shard_plan (the two-phase distributed prefix-sum write
    # manifest — a plan shape the gate lacked). Parity continues in
    # tests/test_offline_oracles.py at the gate's sf0.01.
    # pl2_stratified_sample rotated OUT round 9 (its hash-quota filter
    # is a sub-expression of the gate-green pl9/pl13 hash family) to
    # free a slot for pl14_curriculum_order; parity continues in
    # tests/test_offline_oracles.py at the gate's sf0.01.
]


# --- pl8: source-mix rebalancing ----------------------------------------


def pl8_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rebalance the corpus to a uniform source mixture by downsampling
    every source to the size of the smallest one — the deterministic
    skeleton of the domain-reweighting step every pre-training mix
    runs (fixed-weight DoReMi/Pile-style mixing with equal targets).
    Selection is hash-uniform per doc (md5 counter like pl2/g1), with
    the KEEP RATE DERIVED FROM CORPUS STATS rather than fixed quotas
    — pl2's fixed-quota sampler can't equalize a drifting mix; pl8
    re-derives rates every snapshot.

    Keep rule (exact integer arithmetic, no float rate): doc kept iff
    ``bucket(doc_id) * n_source < n_min * 10000`` with bucket in
    [0, 10000): the kept fraction of each source is within 1e-4 of
    n_min/n_source, the smallest source keeps everything, and the
    decision is reproducible across runs, engines and partitionings.

    Scale shape: per-source counts are a groupBy on `source` whose
    result is dims-sized (sources are a handful even at 100 TB), so
    the rate relation broadcast-joins back onto the scan and the keep
    decision rides the scan as a filter — the corpus never shuffles.
    """
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count("*").alias("n_source"))
    n_min = counts.agg(F.min("n_source").alias("n_min"))
    rates = F.broadcast(counts.crossJoin(F.broadcast(n_min)))
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("pl8:"), F.col("doc_id").cast("string"))), 1, 8),
            16,
            10,
        ).cast("bigint")
        % 10000
    )
    return (
        d.join(rates, "source")
        .where(bucket * F.col("n_source") < F.col("n_min") * 10000)
        .select("doc_id", "source", "n_source", "n_min")
    )


PL8_SQL = """
WITH c AS (SELECT source, cast(count(*) AS BIGINT) AS n_source FROM documents GROUP BY source),
m AS (SELECT min(n_source) AS n_min FROM c)
SELECT d.doc_id, d.source, c.n_source, m.n_min
FROM documents d
JOIN c USING (source)
CROSS JOIN m
WHERE (cast(('0x' || substr(md5('pl8:' || cast(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000)
      * c.n_source < m.n_min * 10000
"""


# --- pl9: deterministic epoch-shuffle plan ------------------------------

SHUFFLE_EPOCHS = 3
SHUFFLE_SHARDS = 8
SHUFFLE_SEED = 42


def pl9_epoch_shuffle_plan(
    spark: SparkSession,
    sf_dir: str,
    epochs: int = SHUFFLE_EPOCHS,
    shards: int = SHUFFLE_SHARDS,
    seed: int = SHUFFLE_SEED,
) -> DataFrame:
    """Deterministic per-epoch training-order shuffle: for each epoch,
    every document gets a (shard, pos) slot derived from
    md5(seed:epoch:doc_id) — a different reproducible permutation per
    epoch with NO RNG state and NO global sort. This is the ordering
    step between a packed corpus and the dataloader: epoch boundaries
    reshuffle, any worker can recompute its own shard's order, and
    resume-from-step is exact because the plan is a pure function.

    Scale shape: the hash is a per-row expression; shard = hash mod
    `shards` spreads uniformly BY CONSTRUCTION (md5 is uniform), so
    the position window partitions by (epoch, shard) — per-shard
    row_number, never a global-order window. At 100 TB with thousands
    of shards every partition orders independently; the only shuffle
    is the (epoch, shard) hash partitioning a real run needs anyway
    to write shard files. Driver-gate row since round 8 (rotated in
    with dd14; t1/t2 out — COVERAGE.md).
    """
    d = load_table(spark, sf_dir, "documents", fan_out=True).select("doc_id")
    return epoch_shuffle_plan(d, epochs=epochs, shards=shards, seed=seed)


def epoch_shuffle_plan(
    docs: DataFrame,
    epochs: int = SHUFFLE_EPOCHS,
    shards: int = SHUFFLE_SHARDS,
    seed: int = SHUFFLE_SEED,
) -> DataFrame:
    """The ordering core over ANY (doc_id) relation — factored out
    (pack_plan pattern) so pl13's composed build can order just its
    surviving training docs and property tests can drive it with
    synthetic ids."""
    from pyspark.sql import Window

    spark = docs.sparkSession
    e = spark.range(epochs).select(F.col("id").cast("int").alias("epoch"))
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":", F.lit(str(seed)), F.col("epoch").cast("string"), F.col("doc_id").cast("string")
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    hashed = docs.select("doc_id").crossJoin(F.broadcast(e)).select(
        "epoch", "doc_id", h.alias("hv"), (h % shards).cast("int").alias("shard")
    )
    w = Window.partitionBy("epoch", "shard").orderBy("hv", "doc_id")
    return hashed.select(
        "epoch",
        "doc_id",
        "shard",
        (F.row_number().over(w) - 1).cast("bigint").alias("pos"),
    )


def pl9_sql(epochs: int = SHUFFLE_EPOCHS, shards: int = SHUFFLE_SHARDS, seed: int = SHUFFLE_SEED) -> str:
    """DuckDB twin, parameterized like pl7_sql/dd13_sql."""
    return f"""
WITH e AS (SELECT unnest(range({epochs})) AS epoch),
h AS (
    SELECT cast(e.epoch AS INTEGER) AS epoch, d.doc_id,
           CAST(('0x' || substr(md5('{seed}' || ':' || cast(e.epoch AS VARCHAR) || ':'
                                || cast(d.doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
    FROM documents d CROSS JOIN e
)
SELECT epoch, doc_id, cast(hv % {shards} AS INTEGER) AS shard,
       cast(row_number() OVER (PARTITION BY epoch, hv % {shards} ORDER BY hv, doc_id) - 1 AS BIGINT) AS pos
FROM h
"""


PL9_SQL = pl9_sql()

# Rotated INTO the driver registry round 8 (the dataloader ordering step
# every training run replays); t1/t2 rotated out to the offline suite.
OPERATORS.append(("pl9_epoch_shuffle_plan", pl9_epoch_shuffle_plan, PL9_SQL))


# --- pl10: quality-weighted upsample plan -------------------------------

UPSAMPLE_RICH = 0.70   # vocab_richness >= this -> 2 copies
UPSAMPLE_POOR = 0.35   # vocab_richness < this  -> dropped


def pl10_quality_upsample_plan(
    spark: SparkSession,
    sf_dir: str,
    rich: float = UPSAMPLE_RICH,
    poor: float = UPSAMPLE_POOR,
) -> DataFrame:
    """Quality-weighted repeat plan: high-quality documents appear
    TWICE in the training mix, mid-quality once, low-quality not at
    all — the FineWeb-Edu/phi-style upsampling step between quality
    scoring and the epoch shuffle (pl9 then permutes the emitted
    copies). Thresholds are FIXED constants on tx2's vocab-richness
    score, not data-derived quantiles: rank-based quantiles need a
    global order (one-task funnel at any scale) and make every doc's
    fate depend on the whole corpus — fixed published cutoffs are
    what the production recipes actually ship.

    Output: one row per (doc_id, copy) with the copy index and the
    doc's repeat count — the exploded relation a dataloader unions
    into its sample stream. Deterministic, no RNG. Scale shape: the
    score is a per-row expression over the scan and the explode emits
    <= 2 rows/doc; no shuffle at all. Not in the driver registry
    (50-entry cap); DuckDB parity in tests/test_offline_oracles.py.
    """
    d = load_table(spark, sf_dir, "documents", fan_out=True)
    toks = F.split(F.col("text"), " ")
    richness = F.size(F.array_distinct(toks)).cast("double") / F.size(toks).cast("double")
    n_copies = (
        F.when(richness >= rich, F.lit(2)).when(richness < poor, F.lit(0)).otherwise(F.lit(1))
    )
    return (
        d.select(
            "doc_id",
            richness.alias("vocab_richness"),
            n_copies.cast("int").alias("n_copies"),
        )
        .where(F.col("n_copies") > 0)
        .select(
            "doc_id",
            "vocab_richness",
            "n_copies",
            F.explode(F.sequence(F.lit(1), F.col("n_copies"))).alias("copy_idx"),
        )
    )


def pl10_sql(rich: float = UPSAMPLE_RICH, poor: float = UPSAMPLE_POOR) -> str:
    """DuckDB twin, parameterized like pl9_sql."""
    return f"""
WITH scored AS (
    SELECT doc_id,
           cast(len(list_distinct(str_split(text, ' '))) AS DOUBLE)
               / cast(len(str_split(text, ' ')) AS DOUBLE) AS vocab_richness
    FROM documents
),
planned AS (
    SELECT doc_id, vocab_richness,
           CASE WHEN vocab_richness >= {rich} THEN 2
                WHEN vocab_richness < {poor} THEN 0
                ELSE 1 END AS n_copies
    FROM scored
)
SELECT doc_id, vocab_richness, cast(n_copies AS INTEGER) AS n_copies,
       cast(unnest(range(1, n_copies + 1)) AS INTEGER) AS copy_idx
FROM planned WHERE n_copies > 0
"""


PL10_SQL = pl10_sql()


# --- pl11: per-document overlapping chunk plan --------------------------

CHUNK_W = 32   # tokens per chunk
CHUNK_S = 24   # stride (overlap = W - S)


def pl11_chunk_plan(
    spark: SparkSession, sf_dir: str, w: int = CHUNK_W, s: int = CHUNK_S
) -> DataFrame:
    """Per-document overlapping chunking plan: each doc is sliced into
    `w`-token chunks at stride `s` (overlap w-s), the last chunk
    clamped to the doc end — the RAG/embedding-index counterpart of
    pl7's packing (pl7 concatenates docs into fixed training windows;
    pl11 keeps document boundaries and overlaps for retrieval
    context). Output is one row per (doc_id, chunk_idx) with the
    token span; the downstream embedder maps chunks, not docs.

    Chunk-count rule: ceil((n - w) / s) + 1 for n > w, else 1 — every
    token is covered, the final chunk ends exactly at n, and a doc
    shorter than one window is a single full-doc chunk.

    Scale shape: a per-row sequence + explode (≤ n/s rows per doc),
    no shuffle at all; the plan relation is what the embedding stage
    feeds through mapInPandas. Not in the driver registry (50-entry
    cap); DuckDB parity in tests/test_offline_oracles.py.
    """
    d = load_table(spark, sf_dir, "documents", fan_out=True)
    n = F.size(F.split(F.col("text"), " ")).cast("bigint")
    n_chunks = (
        F.when(n > w, F.ceil((n - F.lit(w)).cast("double") / F.lit(float(s))).cast("bigint") + 1)
        .otherwise(F.lit(1).cast("bigint"))
    )
    base = d.select("doc_id", n.alias("n_tokens"), n_chunks.alias("n_chunks"))
    idx = F.explode(F.sequence(F.lit(0).cast("bigint"), F.col("n_chunks") - 1)).alias("chunk_idx")
    start = F.least(F.col("chunk_idx") * s, F.col("n_tokens") - F.lit(w))
    start = F.greatest(start, F.lit(0).cast("bigint"))
    return base.select("doc_id", "n_tokens", "n_chunks", idx).select(
        "doc_id",
        "n_tokens",
        "chunk_idx",
        start.alias("tok_start"),
        F.least(start + w, F.col("n_tokens")).alias("tok_end"),
    )


def pl11_sql(w: int = CHUNK_W, s: int = CHUNK_S) -> str:
    """DuckDB twin, parameterized like pl9_sql/pl10_sql."""
    return f"""
WITH base AS (
    SELECT doc_id,
           cast(len(str_split(text, ' ')) AS BIGINT) AS n_tokens,
           CASE WHEN len(str_split(text, ' ')) > {w}
                THEN cast(ceil((len(str_split(text, ' ')) - {w}) / {s}.0) AS BIGINT) + 1
                ELSE 1 END AS n_chunks
    FROM documents
),
ex AS (
    SELECT doc_id, n_tokens, cast(unnest(range(n_chunks)) AS BIGINT) AS chunk_idx FROM base
)
SELECT doc_id, n_tokens, chunk_idx,
       greatest(least(chunk_idx * {s}, n_tokens - {w}), 0) AS tok_start,
       least(greatest(least(chunk_idx * {s}, n_tokens - {w}), 0) + {w}, n_tokens) AS tok_end
FROM ex
"""


PL11_SQL = pl11_sql()


# --- pl12: split-leakage audit ------------------------------------------


def pl12_split_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Queryable leakage audit over the pl5 split: for every split
    pair, how many exact content fingerprints appear on BOTH sides —
    the check a pipeline materializes after every split build and
    alerts on, not just a test assertion. By pl5's construction
    (every doc inherits its dup-cluster representative's split) all
    counts are zero; a regression in the split logic shows up as a
    nonzero row here before it shows up as benchmark contamination.

    Scale shape: the (fingerprint, split) relation is DISTINCT (≤ 3
    rows per fingerprint — one per split it touches), so the
    fingerprint self-join is bounded per key and the rollup emits
    |split pairs| rows. One md5 groupBy inherited from pl5/dd5.
    Not in the driver registry (50-entry cap); DuckDB parity in
    tests/test_offline_oracles.py.
    """
    splits = pl5_leakage_split(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents", fan_out=True).select(
        "doc_id", F.md5("text").alias("h")
    )
    hs = splits.join(d, "doc_id").select("h", "split").distinct()
    a = hs.select("h", F.col("split").alias("split_a"))
    b = hs.select("h", F.col("split").alias("split_b"))
    shared = (
        a.join(b, "h")
        .where(F.col("split_a") < F.col("split_b"))
        .groupBy("split_a", "split_b")
        .agg(F.count_distinct("h").alias("shared_fingerprints"))
    )
    names = sorted(q[0] for q in SPLIT_QUOTAS)
    tpl = spark.createDataFrame(
        [(x, y) for i, x in enumerate(names) for y in names[i + 1 :]],
        "split_a string, split_b string",
    )
    return tpl.join(shared, ["split_a", "split_b"], "left").select(
        "split_a",
        "split_b",
        F.coalesce(F.col("shared_fingerprints"), F.lit(0)).cast("bigint").alias(
            "shared_fingerprints"
        ),
    )


PL12_SQL = f"""
WITH d AS (SELECT doc_id, md5(text) AS h FROM documents),
reps AS (SELECT h, min(doc_id) AS cluster_rep FROM d GROUP BY h),
joined AS (
    SELECT d.h,
           cast(('0x' || substr(md5('pl5:' || cast(reps.cluster_rep AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS bucket
    FROM d JOIN reps ON d.h = reps.h
),
hs AS (SELECT DISTINCT h, (CASE {_SPLIT_CASE} END) AS split FROM joined),
shared AS (
    SELECT a.split AS split_a, b.split AS split_b, count(DISTINCT a.h) AS shared_fingerprints
    FROM hs a JOIN hs b ON a.h = b.h AND a.split < b.split
    GROUP BY a.split, b.split
),
tpl AS (
    SELECT x.s AS split_a, y.s AS split_b
    FROM (SELECT unnest(['test','train','val']) AS s) x
    JOIN (SELECT unnest(['test','train','val']) AS s) y ON x.s < y.s
)
SELECT t.split_a, t.split_b,
       cast(coalesce(s.shared_fingerprints, 0) AS BIGINT) AS shared_fingerprints
FROM tpl t LEFT JOIN shared s ON t.split_a = s.split_a AND t.split_b = s.split_b
"""


# --- pl13: the end-to-end corpus-build ledger ----------------------------

PL13_EVAL_MOD = 100          # dd9's eval slice: doc_id % mod == 0
PL13_MIN_CONTAINMENT = 0.5   # dd9's contamination threshold


def _pl13_doc_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document survival flags for every pl13 stage, session-cached
    (two consumers: the ledger aggregate and the train-side pack/epoch
    stages — unmaterialized, Catalyst would replay the dd10 component
    build and the dd9 contamination probe once per consumer).

    Columns: doc_id, bpe_tokens, split, s2 (passes the pl4 quality
    chain), s3 (s2 AND is its dd14 near-dup-cluster representative),
    s4 (s3 AND not in the held-out eval slice AND not dd9-contaminated).
    Composition caveat, documented on purpose: the dedup/contamination
    relations are the corpus-wide cached seams (dd14/dd9), so a cluster
    whose dd14 winner fails the quality filter has no survivor — the
    conservative policy for a training corpus (nothing from a cluster
    whose best member is junk)."""
    from maggy_spark.functions.dedup import (
        dd9_decontaminate,
        dd14_cluster_representatives,
    )

    def _build() -> DataFrame:
        from maggy_spark.functions.text import bpe_token_estimate

        d = load_table(spark, sf_dir, "documents", fan_out=True)
        # the SAME rule expressions pl4's funnel report publishes —
        # pass_quality is "fails none of them", so a rule change
        # reaches both gate-checked relations or neither
        fails = [flag for _name, flag in funnel_fail_flags()]
        pass_quality = ~fails[0]
        for f_rule in fails[1:]:
            pass_quality = pass_quality & ~f_rule
        base = d.select(
            "doc_id",
            "source",
            F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_ws"),
            bpe_token_estimate(F.split(F.col("text"), " ")).alias("bpe_tokens"),
            pass_quality.alias("pass_quality"),
            (F.col("doc_id") % PL13_EVAL_MOD == 0).alias("is_eval"),
        )
        keep = dd14_cluster_representatives(spark, sf_dir).select("doc_id", "keep")
        contam = (
            dd9_decontaminate(spark, sf_dir, PL13_EVAL_MOD, PL13_MIN_CONTAINMENT)
            .select(F.col("train_doc").alias("doc_id"))
            .distinct()
            .withColumn("contaminated", F.lit(True))
        )
        split = pl5_leakage_split(spark, sf_dir).select("doc_id", "split")
        s2 = F.col("pass_quality")
        s3 = s2 & F.col("keep")
        s4 = s3 & ~F.col("is_eval") & ~F.coalesce(F.col("contaminated"), F.lit(False))
        return (
            base.join(keep, "doc_id")
            .join(contam, "doc_id", "left")
            .join(split, "doc_id")
            .select(
                "doc_id",
                "source",
                "n_ws",
                "bpe_tokens",
                "split",
                s2.alias("s2"),
                s3.alias("s3"),
                s4.alias("s4"),
            )
        )

    from maggy_spark.plans.fixtures import session_cached

    return session_cached(spark, (sf_dir, "pl13_doc_stages"), _build)


def pl13_full_corpus_build(
    spark: SparkSession,
    sf_dir: str,
    ctx: int = PACK_CTX,
    shards: int = PACK_SHARDS,
    epochs: int = SHUFFLE_EPOCHS,
) -> DataFrame:
    """The END-TO-END corpus build as one audited lineage: pl4's
    quality chain -> dd14 near-dup survivor selection (over dd10
    components) -> dd9 decontamination + eval-slice holdout -> pl5
    leakage-free split -> pl18/pl19 temperature mixture realized over
    the train survivors -> pl7 packing of the train split -> pl9
    epoch ordering — returning the per-stage survivor/token LEDGER a
    corpus release publishes (one row per stage: docs surviving, bpe
    tokens surviving; for temperature_apply, the realized doc-copy
    and token volume of pl18's mixture under pl19's exact copy rule;
    for pack, the packed ctx-window token capacity; for
    epoch_shuffle, the dataloader plan's row and token volume across
    epochs).

    The pack and epoch rows aggregate the ACTUAL derived plans
    (pack_plan / epoch_shuffle_plan over the surviving train docs),
    not arithmetic shortcuts — the DuckDB twin replays them
    independently (cumsum windows / count arithmetic), so a drift in
    the composed lineage shows up as a ledger mismatch.

    Scale shape: every stage rides its operator's own 100-TB story
    (cached shingle postings, banded components, broadcast eval side,
    per-shard cumsum windows); the ledger itself is one conditional
    aggregate over the session-cached per-doc stage relation, so the
    corpus is never re-scanned per stage (pinned by the scan-audit
    test in tests/test_plans.py). Driver-gate row since round 8
    (rotated in for mm2 — COVERAGE.md).
    """
    flags = _pl13_doc_stages(spark, sf_dir)
    b = F.col("bpe_tokens")

    def _n(cond):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("bigint")

    def _t(cond):
        return F.sum(F.when(cond, b).otherwise(0)).cast("bigint")

    s2, s3, s4 = F.col("s2"), F.col("s3"), F.col("s4")
    head = flags.agg(
        F.count("*").cast("bigint").alias("n1"),
        F.sum(b).cast("bigint").alias("t1"),
        _n(s2).alias("n2"),
        _t(s2).alias("t2"),
        _n(s3).alias("n3"),
        _t(s3).alias("t3"),
        _n(s4).alias("n4"),
        _t(s4).alias("t4"),
        _n(s4 & (F.col("split") == "train")).alias("n5"),
        _t(s4 & (F.col("split") == "train")).alias("t5"),
        _n(s4 & (F.col("split") == "val")).alias("n6"),
        _t(s4 & (F.col("split") == "val")).alias("t6"),
        _n(s4 & (F.col("split") == "test")).alias("n7"),
        _t(s4 & (F.col("split") == "test")).alias("t7"),
    ).select(
        F.expr(
            "stack(7, "
            "1, 'raw',            n1, t1, "
            "2, 'quality_filter', n2, t2, "
            "3, 'near_dedup',     n3, t3, "
            "4, 'decontaminate',  n4, t4, "
            "5, 'split:train',    n5, t5, "
            "6, 'split:val',      n6, t6, "
            "7, 'split:test',     n7, t7) "
            "AS (seq, stage, n_docs, n_tokens)"
        )
    )

    # the temperature stage (VERDICT r12 item 4): pl18's mixture
    # derived FROM THE SAME cached per-doc relation (per-source
    # whitespace-token masses over the full corpus — pl18's corpus-
    # wide rule), realized with pl19's exact copy decision over the
    # surviving train docs. No new corpus scan: both aggregates read
    # the pl13_doc_stages seam (the scan-audit test pins this).
    per_src = flags.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_ws").cast("bigint").alias("n_tokens"),
    )
    mix = temperature_mix_over(per_src).select("source", "epochs")
    train_src = flags.where(s4 & (F.col("split") == "train")).select(
        "doc_id", "source", "bpe_tokens"
    )
    nc = temperature_copies_expr().cast("bigint")
    temp_row = (
        train_src.join(F.broadcast(mix), "source")
        .select(nc.alias("nc"), "bpe_tokens")
        .agg(
            F.lit(8).alias("seq"),
            F.lit("temperature_apply").alias("stage"),
            F.coalesce(F.sum("nc"), F.lit(0)).cast("bigint").alias("n_docs"),
            F.coalesce(F.sum(F.col("nc") * F.col("bpe_tokens")), F.lit(0))
            .cast("bigint")
            .alias("n_tokens"),
        )
    )
    train = flags.where(s4 & (F.col("split") == "train")).select("doc_id", "bpe_tokens")
    pack_row = (
        pack_plan(train, ctx, shards)
        .groupBy("shard")
        .agg(F.max("window_end").alias("we"), F.count("*").alias("n"))
        .agg(
            F.lit(9).alias("seq"),
            F.lit("pack").alias("stage"),
            F.coalesce(F.sum("n"), F.lit(0)).cast("bigint").alias("n_docs"),
            (F.coalesce(F.sum(F.col("we") + 1), F.lit(0)) * ctx).cast("bigint").alias("n_tokens"),
        )
    )
    epoch_row = (
        epoch_shuffle_plan(train, epochs=epochs)
        .join(train, "doc_id")
        .agg(
            F.lit(10).alias("seq"),
            F.lit("epoch_shuffle").alias("stage"),
            F.count("*").cast("bigint").alias("n_docs"),
            F.coalesce(F.sum("bpe_tokens"), F.lit(0)).cast("bigint").alias("n_tokens"),
        )
    )
    return head.unionAll(temp_row).unionAll(pack_row).unionAll(epoch_row)


def pl13_sql(
    ctx: int = PACK_CTX,
    shards: int = PACK_SHARDS,
    epochs: int = SHUFFLE_EPOCHS,
    eval_mod: int = PL13_EVAL_MOD,
    min_containment: float = PL13_MIN_CONTAINMENT,
) -> str:
    """pl13's DuckDB twin, generated from the operator's parameters.
    Deliberately INDEPENDENT formulations where the Spark side derives
    from actual plans: dd14's winner via row_number (not max-struct),
    the epoch row via count arithmetic (not a replayed md5 plan), the
    pack row via its own cumsum."""
    from maggy_spark.functions.dedup import (
        _SHINGLES_SQL,
        _SIMHASH_BANDS_SQL,
        _SIMHASH_CAND_SQL,
        _SIMHASH_PAIRS_CTE,
        _SIMHASH_PARAMS_SQL,
        _SIMHASH_SIG_SQL,
        cc_closure_sql,
    )

    return f"""
WITH RECURSIVE p AS ({_SIMHASH_PARAMS_SQL}),
sig AS ({_SIMHASH_SIG_SQL}),
bands AS ({_SIMHASH_BANDS_SQL}),
cand AS ({_SIMHASH_CAND_SQL}),
pairs AS ({_SIMHASH_PAIRS_CTE}),
{cc_closure_sql("documents", "doc_id")},
toksn AS (SELECT doc_id, cast(len(str_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents),
membership AS MATERIALIZED (
    SELECT c.doc_id, c.cluster_rep, t.n_tokens
    FROM comp c JOIN toksn t USING (doc_id)
),
winners AS (
    SELECT cluster_rep, doc_id AS win_id
    FROM (SELECT *, row_number() OVER (PARTITION BY cluster_rep
                                       ORDER BY n_tokens DESC, doc_id ASC) AS rn
          FROM membership)
    WHERE rn = 1
),
keepf AS (
    SELECT m.doc_id, m.doc_id = w.win_id AS keep
    FROM membership m JOIN winners w USING (cluster_rep)
),
sh AS ({_SHINGLES_SQL}),
ev AS (
    SELECT doc_id AS eval_doc, unnest(shingles) AS s, len(shingles) AS n_eval
    FROM sh WHERE doc_id % {eval_mod} = 0
),
tr AS (
    SELECT doc_id AS train_doc, unnest(shingles) AS s
    FROM sh WHERE doc_id % {eval_mod} != 0
),
contam AS (
    SELECT DISTINCT train_doc AS doc_id
    FROM (SELECT t.train_doc, e.eval_doc, e.n_eval, count(*) AS n_common
          FROM tr t JOIN ev e ON t.s = e.s
          GROUP BY t.train_doc, e.eval_doc, e.n_eval)
    WHERE cast(n_common AS DOUBLE) / cast(n_eval AS DOUBLE) >= {min_containment}
),
dh AS (SELECT doc_id, md5(text) AS h FROM documents),
reps AS (SELECT h, min(doc_id) AS cluster_rep FROM dh GROUP BY h),
splj AS (
    SELECT dh.doc_id,
           cast(('0x' || substr(md5('pl5:' || cast(reps.cluster_rep AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS bucket
    FROM dh JOIN reps ON dh.h = reps.h
),
splits AS (SELECT doc_id, (CASE {_SPLIT_CASE} END) AS split FROM splj),
qual AS (
    SELECT doc_id, source,
           cast(len(str_split(text, ' ')) AS BIGINT) AS n_ws,
           cast(list_sum(list_transform(str_split(text, ' '),
                t -> cast(ceil(length(t) / 4.0) AS BIGINT))) AS BIGINT) AS bpe_tokens,
           (cast(len(str_split(text, ' ')) AS BIGINT) >= {FUNNEL_MIN_TOKENS}
            AND cast(len(list_distinct(str_split(text, ' '))) AS DOUBLE)
                / cast(len(str_split(text, ' ')) AS DOUBLE) >= {FUNNEL_MIN_RICHNESS}
            AND (cast(list_sum(list_transform(str_split(text, ' '), t -> cast(length(t) AS BIGINT))) AS DOUBLE)
                 / cast(len(str_split(text, ' ')) AS DOUBLE)) <= {FUNNEL_MAX_MEAN_WORD_LEN}
            AND (cast(list_sum(list_transform(str_split(text, ' '), t -> cast(length(t) AS BIGINT))) AS DOUBLE)
                 / cast(len(str_split(text, ' ')) AS DOUBLE)) >= {FUNNEL_MIN_MEAN_WORD_LEN}
            AND lang != 'unknown') AS pass_quality,
           (doc_id % {eval_mod} = 0) AS is_eval
    FROM documents
),
docstage AS (
    SELECT q.doc_id, q.source, q.n_ws, q.bpe_tokens, s.split,
           q.pass_quality AS s2,
           (q.pass_quality AND k.keep) AS s3,
           (q.pass_quality AND k.keep AND NOT q.is_eval AND c.doc_id IS NULL) AS s4
    FROM qual q
    JOIN keepf k USING (doc_id)
    JOIN splits s USING (doc_id)
    LEFT JOIN contam c USING (doc_id)
),
head AS (
    SELECT cast(count(*) AS BIGINT) AS n1, cast(sum(bpe_tokens) AS BIGINT) AS t1,
           cast(sum(CASE WHEN s2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
           cast(sum(CASE WHEN s2 THEN bpe_tokens ELSE 0 END) AS BIGINT) AS t2,
           cast(sum(CASE WHEN s3 THEN 1 ELSE 0 END) AS BIGINT) AS n3,
           cast(sum(CASE WHEN s3 THEN bpe_tokens ELSE 0 END) AS BIGINT) AS t3,
           cast(sum(CASE WHEN s4 THEN 1 ELSE 0 END) AS BIGINT) AS n4,
           cast(sum(CASE WHEN s4 THEN bpe_tokens ELSE 0 END) AS BIGINT) AS t4,
           cast(sum(CASE WHEN s4 AND split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS n5,
           cast(sum(CASE WHEN s4 AND split = 'train' THEN bpe_tokens ELSE 0 END) AS BIGINT) AS t5,
           cast(sum(CASE WHEN s4 AND split = 'val' THEN 1 ELSE 0 END) AS BIGINT) AS n6,
           cast(sum(CASE WHEN s4 AND split = 'val' THEN bpe_tokens ELSE 0 END) AS BIGINT) AS t6,
           cast(sum(CASE WHEN s4 AND split = 'test' THEN 1 ELSE 0 END) AS BIGINT) AS n7,
           cast(sum(CASE WHEN s4 AND split = 'test' THEN bpe_tokens ELSE 0 END) AS BIGINT) AS t7
    FROM docstage
),
train AS (SELECT doc_id, source, bpe_tokens FROM docstage WHERE s4 AND split = 'train'),
tmix_per AS (
    SELECT source, cast(sum(n_ws) AS BIGINT) AS n_tokens
    FROM docstage GROUP BY source
),
tmix2 AS (
    SELECT source, n_tokens,
           cast(floor(sqrt(cast(n_tokens AS DOUBLE)) * 1000) AS BIGINT) AS weight_milli
    FROM tmix_per
),
tmix_tot AS (SELECT cast(sum(weight_milli) AS BIGINT) AS tw,
                    cast(sum(n_tokens) AS BIGINT) AS tt FROM tmix2),
tmix AS (
    SELECT source,
           cast(cast(floor(cast(weight_milli AS DOUBLE) / cast(tw AS DOUBLE)
                           * cast(tt AS DOUBLE)) AS BIGINT) AS DOUBLE)
               / cast(n_tokens AS DOUBLE) AS epochs
    FROM tmix2 CROSS JOIN tmix_tot
),
temprow AS (
    SELECT cast(coalesce(sum(nc), 0) AS BIGINT) AS n_docs,
           cast(coalesce(sum(nc * bpe_tokens), 0) AS BIGINT) AS n_tokens
    FROM (
        SELECT t.bpe_tokens,
               cast(floor(m.epochs) AS BIGINT)
               + CASE WHEN cast(cast(('0x' || substr(md5('pl19:' || cast(t.doc_id AS VARCHAR)), 1, 13))
                                     AS BIGINT) AS DOUBLE) / 4503599627370496.0
                           < m.epochs - floor(m.epochs)
                      THEN 1 ELSE 0 END AS nc
        FROM train t JOIN tmix m USING (source)
    )
),
packc AS (
    SELECT doc_id, cast(doc_id % {shards} AS INTEGER) AS shard, bpe_tokens,
           cast(sum(bpe_tokens) OVER (PARTITION BY doc_id % {shards} ORDER BY doc_id) AS BIGINT) AS cum_end
    FROM train
),
packsh AS (
    SELECT shard, max(cast(floor((cum_end - 1) / {ctx}.0) AS BIGINT)) AS we, count(*) AS n
    FROM packc GROUP BY shard
),
packrow AS (
    SELECT cast(coalesce(sum(n), 0) AS BIGINT) AS n_docs,
           cast(coalesce(sum(we + 1), 0) * {ctx} AS BIGINT) AS n_tokens
    FROM packsh
),
eprow AS (
    SELECT cast(count(*) * {epochs} AS BIGINT) AS n_docs,
           cast(coalesce(sum(bpe_tokens), 0) * {epochs} AS BIGINT) AS n_tokens
    FROM train
)
SELECT 1 AS seq, 'raw' AS stage,          n1 AS n_docs, t1 AS n_tokens FROM head
UNION ALL SELECT 2, 'quality_filter', n2, t2 FROM head
UNION ALL SELECT 3, 'near_dedup',     n3, t3 FROM head
UNION ALL SELECT 4, 'decontaminate',  n4, t4 FROM head
UNION ALL SELECT 5, 'split:train',    n5, t5 FROM head
UNION ALL SELECT 6, 'split:val',      n6, t6 FROM head
UNION ALL SELECT 7, 'split:test',     n7, t7 FROM head
UNION ALL SELECT 8, 'temperature_apply', n_docs, n_tokens FROM temprow
UNION ALL SELECT 9, 'pack', n_docs, n_tokens FROM packrow
UNION ALL SELECT 10, 'epoch_shuffle', n_docs, n_tokens FROM eprow
"""


PL13_SQL = pl13_sql()

# Rotated INTO the driver registry round 8 (the corpus-build capstone);
# mm2_frame_sample rotated out to the offline suite in exchange.
OPERATORS.append(("pl13_full_corpus_build", pl13_full_corpus_build, PL13_SQL))


# --- pl14: quality-curriculum ordering ------------------------------------

CURRICULUM_BANDS = 4


def pl14_curriculum_order(
    spark: SparkSession,
    sf_dir: str,
    epochs: int = SHUFFLE_EPOCHS,
    shards: int = SHUFFLE_SHARDS,
    seed: int = SHUFFLE_SEED,
    bands: int = CURRICULUM_BANDS,
) -> DataFrame:
    """Curriculum-learning dataloader order: epoch 0 presents the
    corpus quality-band-major (highest vocabulary richness first,
    pl9's hash order WITHIN each band), and every later epoch decays
    to the plain deterministic shuffle — the warm-up schedule
    curriculum pre-training runs without materializing a re-sorted
    corpus per epoch.

    The band is a map-side expression (floor(richness x bands),
    clamped): fixed arithmetic on tx2's vocabulary-richness score, so
    banding never needs a global quantile sort — the ev9 histogram
    argument applied to curriculum (exact score quantiles would funnel
    the corpus through one task at any scale).

    Scale shape: pl9's machinery verbatim — the only shuffle is the
    (epoch, shard) hash partitioning a real run needs to write shard
    files; position windows are per-(epoch, shard); the curriculum
    key only prepends to the in-window sort. Driver-gate row since
    round 9 (rotated in for pl2_stratified_sample).
    """
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents", fan_out=True)
    toks = F.split(F.col("text"), " ")
    richness = F.size(F.array_distinct(toks)).cast("double") / F.size(toks).cast("double")
    band = F.least(F.lit(bands - 1), F.floor(richness * bands).cast("int"))
    docs = d.select("doc_id", band.alias("quality_band"))
    e = spark.range(epochs).select(F.col("id").cast("int").alias("epoch"))
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":", F.lit(str(seed)), F.col("epoch").cast("string"), F.col("doc_id").cast("string")
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    hashed = docs.crossJoin(F.broadcast(e)).select(
        "epoch", "doc_id", "quality_band", h.alias("hv"), (h % shards).cast("int").alias("shard")
    )
    # epoch 0: richest band first (bands-1 down to 0); epochs >= 1:
    # the curriculum term is constant and the hash order takes over
    curriculum = F.when(F.col("epoch") == 0, F.lit(bands - 1) - F.col("quality_band")).otherwise(F.lit(0))
    w = Window.partitionBy("epoch", "shard").orderBy(curriculum, F.col("hv"), F.col("doc_id"))
    return hashed.select(
        "epoch",
        "doc_id",
        "quality_band",
        "shard",
        (F.row_number().over(w) - 1).cast("bigint").alias("pos"),
    )


def pl14_sql(
    epochs: int = SHUFFLE_EPOCHS,
    shards: int = SHUFFLE_SHARDS,
    seed: int = SHUFFLE_SEED,
    bands: int = CURRICULUM_BANDS,
) -> str:
    """DuckDB twin, parameterized like pl9_sql."""
    return f"""
WITH e AS (SELECT unnest(range({epochs})) AS epoch),
docs AS (
    SELECT doc_id,
           cast(LEAST({bands - 1}, cast(floor(
               (cast(len(list_distinct(str_split(text, ' '))) AS DOUBLE)
                / cast(len(str_split(text, ' ')) AS DOUBLE)) * {bands}) AS INTEGER)) AS INTEGER) AS quality_band
    FROM documents
),
h AS (
    SELECT cast(e.epoch AS INTEGER) AS epoch, d.doc_id, d.quality_band,
           CAST(('0x' || substr(md5('{seed}' || ':' || cast(e.epoch AS VARCHAR) || ':'
                                || cast(d.doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
    FROM docs d CROSS JOIN e
)
SELECT epoch, doc_id, quality_band, cast(hv % {shards} AS INTEGER) AS shard,
       cast(row_number() OVER (
           PARTITION BY epoch, hv % {shards}
           ORDER BY CASE WHEN epoch = 0 THEN {bands - 1} - quality_band ELSE 0 END, hv, doc_id
       ) - 1 AS BIGINT) AS pos
FROM h
"""


PL14_SQL = pl14_sql()

# Rotated INTO the driver registry round 9 (slot freed by pl2 — see
# COVERAGE.md "Round-10 rotation candidates", executed early); rotated
# back OUT round 13 (pre-declared in VERDICT r12 item 1): pl14's later
# epochs are pinned identical to gate-green pl9 by
# test_pl14_curriculum_shape, so the epoch-0 banding is the only novel
# stage and it stays offline-oracled at the gate's sf0.01. The slot
# went to pl16_repeat_schedule.


# ---------------------------------------------------------------- pl15
# Semantic-diversity selection: the step AFTER SemDeDup in a curation
# recipe — spend a token budget evenly across semantic clusters,
# diversity-first within each cluster.

PL15_SHARE = 0.5  # keep ~half the surviving token mass


def pl15_semantic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced, diversity-first token-budget selection over
    the SemDeDup survivors: the selection step a semantic-curation
    recipe runs after ann10 (cluster) -> ann11 (prune near-dups) —
    spread PL15_SHARE of the surviving token mass EVENLY across
    semantic clusters, and inside each cluster admit documents
    farthest-from-centroid first (cos ASC — the same diversity
    priority SemDeDup keeps by), until the per-cluster budget is
    exhausted (greedy prefix; a document that would overshoot is
    excluded whole).

    Documents and embeddings share an id space by data contract:
    vec_id IS the doc_id of the embedded document (the first operator
    to join the two tables — the inner join means only embedded
    documents participate, identically in both engines; at every
    fixture decade the embedding ids are a prefix of the doc ids);
    budget = ceil(total_surviving_tokens / ((1/PL15_SHARE) * n_clusters)),
    both inputs exact integers so the double division and ceil are
    engine-agreed.

    Scale shape: everything is linear — one n-row unique-key join
    (survivor flags back to assignment, then to the documents
    projection), one 2-column global aggregate broadcast back, and
    per-cluster windows whose partitions are the ~KM_TARGET_VECS
    cluster populations (never corpus-sized). No pair stage here;
    ann11 already paid it. Not in the driver registry (50-entry cap);
    DuckDB parity in tests/test_offline_oracles.py."""
    from pyspark.sql.window import Window

    from maggy_spark.functions.similarity import _km_final, semdedup_over

    km = _km_final(spark, sf_dir)
    flags = semdedup_over(km)
    surv = (
        flags.where(~F.col("pruned"))
        .select("vec_id", "cluster_id")
        .join(km.select("vec_id", "cos"), "vec_id")
    )
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tokens")
    )
    j = surv.join(docs, surv.vec_id == docs.doc_id).select(
        "doc_id", "cluster_id", "cos", "n_tokens"
    )
    st = j.agg(
        F.sum("n_tokens").alias("total"),
        F.countDistinct("cluster_id").alias("k"),
    )
    w = Window.partitionBy("cluster_id").orderBy(F.col("cos").asc(), F.col("doc_id"))
    r = j.select(
        "doc_id",
        "cluster_id",
        "n_tokens",
        F.row_number().over(w).cast("long").alias("div_rank"),
        F.sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).alias("cum"),
    )
    budget = F.ceil(
        F.col("total").cast("double") / (F.lit(1.0 / PL15_SHARE) * F.col("k"))
    ).cast("long")
    return r.crossJoin(F.broadcast(st)).select(
        "doc_id",
        "cluster_id",
        "div_rank",
        "n_tokens",
        (F.col("cum") <= budget).alias("selected"),
    )


def pl15_sql(share: float = PL15_SHARE) -> str:
    from maggy_spark.functions.similarity import _km_prefix_sql, _KM_FINAL, KM_SEM_TAU

    return f"""
{_km_prefix_sql()},
flags AS (
    SELECT v.vec_id, v.cid, v.cos,
           EXISTS (
               SELECT 1 FROM {_KM_FINAL} o
               WHERE o.cid = v.cid
                 AND (o.cos < v.cos OR (o.cos = v.cos AND o.vec_id < v.vec_id))
                 AND list_dot_product(o.e::DOUBLE[], v.e::DOUBLE[])
                     / (o.en * v.en) >= {KM_SEM_TAU}
           ) AS pruned
    FROM {_KM_FINAL} v),
docs AS (
    SELECT doc_id, cast(len(str_split(text, ' ')) AS BIGINT) AS n_tokens
    FROM documents),
j AS (
    SELECT d.doc_id, s.cid AS cluster_id, s.cos, d.n_tokens
    FROM (SELECT * FROM flags WHERE NOT pruned) s
    JOIN docs d ON d.doc_id = s.vec_id),
st AS (
    SELECT cast(sum(n_tokens) AS BIGINT) AS total,
           count(DISTINCT cluster_id) AS k
    FROM j),
r AS (
    SELECT doc_id, cluster_id, n_tokens,
           cast(row_number() OVER w AS BIGINT) AS div_rank,
           cast(sum(n_tokens) OVER w AS BIGINT) AS cum
    FROM j
    WINDOW w AS (PARTITION BY cluster_id ORDER BY cos ASC, doc_id
                 ROWS UNBOUNDED PRECEDING))
SELECT doc_id, cluster_id, div_rank, n_tokens,
       cum <= cast(ceil(cast(total AS DOUBLE) / ({1.0 / share} * k)) AS BIGINT)
           AS selected
FROM r CROSS JOIN st
"""


PL15_SQL = pl15_sql()


# -- pl16: data-constrained repeat schedule -------------------------------

PL16_R_MAX = 4        # Muennighoff et al. 2023: ~4 epochs of repeats
                      # are near-as-good-as-fresh; value decays beyond
PL16_DECAY = 0.5      # per-extra-epoch value decay
PL16_Q_RICH = 3.0     # band value densities chosen so the 8 block
PL16_Q_MID = 1.0      # densities {3,1.5,.75,.375} u {1,.5,.25,.125}
                      # are pairwise distinct -> the greedy order is a
                      # total order with no tie rule needed


def pl16_repeat_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-constrained repeat schedule (Muennighoff et al. 2023,
    "Scaling Data-Constrained Language Models"): when the corpus is
    smaller than the token budget, schedule REPEAT EPOCHS of the
    quality bands, highest value-density first, where an extra epoch
    of a band is worth DECAY times the previous one. Bands are pl10's
    fixed vocab-richness cutoffs (rich / mid; poor is dropped, the
    same rule as the upsample plan); blocks are (band, epoch<=R_MAX);
    density(band, e) = Q_band * DECAY^(e-1); blocks are taken greedily
    by density until the budget of 1.5x one epoch of the kept corpus
    is spent.

    The budget predicate is PURE INTEGER — selected iff
    8 * cum_tokens <= 3 * sum_all_blocks (sum_all = R_MAX * T = 4T, so
    this is cum <= 1.5T without ever dividing) — which makes the
    whole schedule engine-agreed with no float thresholds beyond the
    distinct density ORDER. Output: one row per block with its token
    mass, density, greedy cumulative position, and the keep flag.

    Scale shape: one map-side-combined aggregation over the corpus
    scan (2 groups), then an 8-row broadcast-side schedule — the plan
    relation is O(bands x R_MAX) regardless of corpus size; no
    shuffle beyond the 2-group partial agg. Not in the driver
    registry (50-entry cap); DuckDB parity in
    tests/test_offline_oracles.py. Reference anchor: none — SURVEY
    §7.2-step-9 extension surface (the selection step between pl10's
    upsample and pl9's epoch shuffle)."""
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents", fan_out=True)
    toks = F.split(F.col("text"), " ")
    richness = F.size(F.array_distinct(toks)).cast("double") / F.size(toks).cast("double")
    band = (
        F.when(richness >= UPSAMPLE_RICH, F.lit("rich"))
        .when(richness >= UPSAMPLE_POOR, F.lit("mid"))
        .otherwise(F.lit(None).cast("string"))
    )
    per = d.select(
        band.alias("band"), F.size(toks).cast("long").alias("n_tokens")
    ).where(F.col("band").isNotNull())
    sums = per.groupBy("band").agg(F.sum("n_tokens").alias("block_tokens"))
    epochs = spark.range(1, PL16_R_MAX + 1).select(F.col("id").cast("int").alias("epoch"))
    q = F.when(F.col("band") == "rich", F.lit(PL16_Q_RICH)).otherwise(F.lit(PL16_Q_MID))
    blocks = sums.crossJoin(F.broadcast(epochs)).select(
        "band",
        "epoch",
        "block_tokens",
        (q * F.pow(F.lit(PL16_DECAY), F.col("epoch") - F.lit(1))).alias("density"),
    )
    w = Window.orderBy(F.col("density").desc())
    wall = Window.partitionBy()
    return blocks.select(
        "band",
        "epoch",
        "block_tokens",
        "density",
        F.sum("block_tokens").over(w).alias("cum_tokens"),
        (
            F.lit(8) * F.sum("block_tokens").over(w)
            <= F.lit(3) * F.sum("block_tokens").over(wall)
        ).alias("selected"),
    )


PL16_SQL = f"""
WITH scored AS (
    SELECT CASE WHEN cast(len(list_distinct(str_split(text, ' '))) AS DOUBLE)
                     / cast(len(str_split(text, ' ')) AS DOUBLE) >= {UPSAMPLE_RICH} THEN 'rich'
                WHEN cast(len(list_distinct(str_split(text, ' '))) AS DOUBLE)
                     / cast(len(str_split(text, ' ')) AS DOUBLE) >= {UPSAMPLE_POOR} THEN 'mid'
           END AS band,
           len(str_split(text, ' ')) AS n_tokens
    FROM documents
),
sums AS (
    SELECT band, cast(sum(n_tokens) AS BIGINT) AS block_tokens
    FROM scored WHERE band IS NOT NULL GROUP BY band
),
blocks AS (
    SELECT band, cast(e.epoch AS INTEGER) AS epoch, block_tokens,
           (CASE WHEN band = 'rich' THEN {PL16_Q_RICH} ELSE {PL16_Q_MID} END)
               * power({PL16_DECAY}, e.epoch - 1) AS density
    FROM sums CROSS JOIN (SELECT unnest(range(1, {PL16_R_MAX} + 1)) AS epoch) e
)
SELECT band, epoch, block_tokens, density,
       cast(sum(block_tokens) OVER (ORDER BY density DESC) AS BIGINT) AS cum_tokens,
       8 * cast(sum(block_tokens) OVER (ORDER BY density DESC) AS BIGINT)
           <= 3 * cast(sum(block_tokens) OVER () AS BIGINT) AS selected
FROM blocks
"""

# rotated INTO the driver registry round 13 (pre-declared in VERDICT r12
# item 1, in exchange for pl14_curriculum_order): the data-constrained
# repeat schedule (Muennighoff et al. 2023) — greedy (band, epoch) block
# selection by decaying value density under a pure-integer 1.5-epoch
# token budget; the selection step between pl10's upsample and pl9's
# epoch shuffle.
OPERATORS.append(("pl16_repeat_schedule", pl16_repeat_schedule, PL16_SQL))


# --- pl17: balanced output-shard layout (distributed prefix sum) --------

PL17_BUCKET_DOCS = 4096    # doc_ids per prefix-sum range bucket
PL17_SHARD_TOKENS = 4096   # target whitespace tokens per output shard


def pl17_shard_plan(
    spark: SparkSession,
    sf_dir: str,
    shard_tokens: int = PL17_SHARD_TOKENS,
    bucket_docs: int = PL17_BUCKET_DOCS,
) -> DataFrame:
    """The WRITE plan for the curated corpus: assign every document a
    global token offset in doc_id order and cut the stream into
    shards of ~``shard_tokens`` whitespace tokens — the balanced-
    output-file layout a 100 TB corpus build computes before its
    final write (equal-token shards keep downstream dataloader ranks
    balanced, where equal-DOC shards skew with document length).
    Output: one row per shard — (shard_id, n_docs, shard_tokens,
    first_doc, last_doc). Shards are contiguous doc_id ranges by
    construction, so the relation IS the write manifest.

    The semantics is a global running sum, but a global window is a
    single-task sort at scale, so the plan computes the classic
    two-phase distributed prefix sum: docs fold into doc_id-range
    buckets of ``bucket_docs`` (map-side combined groupBy), bucket
    offsets come from one tiny cumulative window over the n/4096-row
    bucket relation (16-byte rows — ~6M rows at 25B docs, a single
    cheap task), and the per-document running sum is a window INSIDE
    each bucket plus the broadcast bucket offset. The DuckDB twin
    spells the naive single-window form — the twin is the semantics,
    the two-phase plan is its scale-honest realization, and the
    parity hash proves they agree. Pure integer arithmetic
    throughout (token counts, cumulative sums, floor-div shard ids):
    no cross-engine float surface.

    Known plan shape (audited): the offsets branch and the join
    branch each scan `documents` (column-pruned to doc_id + text) —
    the self-referential DAG is the price of the distributed prefix
    sum. A corpus build that has already materialized a per-doc
    token-count relation (tx1's output, or pl13's ledger) should
    compute the manifest from THAT skinny relation instead; the
    parquet rescan here is the standalone-operator cost, not an
    algorithmic one. Not in the driver registry (50-entry cap);
    DuckDB parity in tests/test_offline_oracles.py.
    """
    d = load_table(spark, sf_dir, "documents")
    return shard_plan_over(
        d.select("doc_id", F.size(F.split("text", " ")).cast("bigint").alias("n")),
        shard_tokens,
        bucket_docs,
    )


def shard_assignments_over(
    t: DataFrame,
    shard_tokens: int = PL17_SHARD_TOKENS,
    bucket_docs: int = PL17_BUCKET_DOCS,
) -> DataFrame:
    """Per-document shard routing (doc_id, n, shard_id) — the two-
    phase prefix sum BEFORE the manifest rollup, shared by the pl17
    relation and the token-balanced writer so the routing rule
    cannot drift between the plan and the files on disk."""
    from pyspark.sql.window import Window

    starts = prefix_starts_over(t, bucket_docs)
    return starts.select("doc_id", "n", F.expr(f"start DIV {shard_tokens}").alias("shard_id"))


def prefix_starts_over(t: DataFrame, bucket_docs: int = PL17_BUCKET_DOCS) -> DataFrame:
    """(doc_id, n, start) — the doc_id-ordered EXCLUSIVE token prefix
    sum as a two-phase plan (per-bucket totals + one bounded offsets
    window, then within-bucket running sums), factored out of
    shard_assignments_over so pl22's PPS sampler shares the identical
    realization."""
    from pyspark.sql.window import Window

    t = t.select("doc_id", "n", F.expr(f"doc_id DIV {bucket_docs}").alias("bkt"))
    # phase 1: per-bucket totals, then EXCLUSIVE cumulative offsets
    # over the bounded bucket relation
    wb = Window.orderBy("bkt")
    offsets = (
        t.groupBy("bkt")
        .agg(F.sum("n").alias("bt"))
        .select("bkt", (F.sum("bt").over(wb) - F.col("bt")).alias("off"))
    )
    # phase 2: within-bucket running sum + broadcast bucket offset
    start = F.col("off") + F.sum("n").over(
        Window.partitionBy("bkt").orderBy("doc_id")
    ) - F.col("n")
    return (
        t.join(F.broadcast(offsets), "bkt")
        .select("doc_id", "n", start.cast("bigint").alias("start"))
    )


def shard_plan_over(
    t: DataFrame,
    shard_tokens: int = PL17_SHARD_TOKENS,
    bucket_docs: int = PL17_BUCKET_DOCS,
) -> DataFrame:
    """The two-phase prefix-sum core over ANY (doc_id, n) relation —
    factored out (pack_plan discipline) so property tests can drive
    random gappy id/token multisets against a naive Python running
    sum at arbitrary bucket widths."""
    sharded = shard_assignments_over(t, shard_tokens, bucket_docs)
    return sharded.groupBy("shard_id").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n").alias("shard_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


def pl17_sql(shard_tokens: int = PL17_SHARD_TOKENS) -> str:
    """DuckDB twin: the NAIVE global-window spelling of the same
    semantics (single node, no need for the two-phase plan)."""
    return f"""
WITH t AS (
    SELECT doc_id, cast(len(str_split(text, ' ')) AS BIGINT) AS n
    FROM documents),
c AS (
    SELECT doc_id, n,
           cast(sum(n) OVER (ORDER BY doc_id) AS BIGINT) - n AS start
    FROM t),
s AS (SELECT doc_id, n, start // {shard_tokens} AS shard_id FROM c)
SELECT shard_id, cast(count(*) AS BIGINT) AS n_docs,
       cast(sum(n) AS BIGINT) AS shard_tokens,
       min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM s GROUP BY shard_id
"""


PL17_SQL = pl17_sql()

# rotated INTO the driver registry round 14 (pre-declared in
# COVERAGE.md r13) for pl1_corpus_prep OUT — the gate gains the
# two-phase distributed prefix-sum plan shape.
OPERATORS.append(("pl17_shard_plan", pl17_shard_plan, PL17_SQL))


def corpus_to_token_shards(
    spark: SparkSession,
    sf_dir: str,
    out_path: str,
    shard_tokens: int = PL17_SHARD_TOKENS,
    bucket_docs: int = PL17_BUCKET_DOCS,
) -> str:
    """Materialize the corpus as TOKEN-balanced parquet shards — the
    writer that consumes pl17's manifest. `write_training_shards`
    (sources/data.py) balances by DOC COUNT, which skews shard bytes
    with document length; this writer routes each doc through the
    SAME shard_assignments_over relation the pl17 manifest reports,
    so the files on disk and the manifest agree row for row. Layout:
    `out_path/shard_id=N/*.parquet` (one leaf dir per shard — the
    partitionBy layout `shard_parquet_reader` deliberately rejects;
    a token-sharded corpus is read per-directory by construction).

    Scale shape: the routing join is broadcast on the tiny offsets
    side (inherited); `repartition(shard_id)` hash-distributes the
    write so each task writes whole shards; the writer adds exactly
    one shuffle (the repartition) over the manifest's own plan."""
    d = load_table(spark, sf_dir, "documents")
    assign = shard_assignments_over(
        d.select("doc_id", F.size(F.split("text", " ")).cast("bigint").alias("n")),
        shard_tokens,
        bucket_docs,
    )
    (
        d.join(assign.select("doc_id", "shard_id"), "doc_id")
        .repartition(F.col("shard_id"))
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .parquet(out_path)
    )
    return out_path


# --- pl18: temperature-sampled source mixture ---------------------------


def pl18_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-sampled source mixture — the step that PRODUCES
    the weights pl3 consumes: p_i ∝ n_i^alpha over the per-source
    token masses, the multilingual/multi-domain mixing rule of
    XLM-R (Conneau et al. 2020, alpha=0.3) and mT5 (Xue et al. 2021,
    alpha=0.3; T5 uses 0.5), here at alpha = 0.5 so the exponent is
    an exact IEEE sqrt. Downweights the head source, upsamples the
    tail (epochs > 1), and reports the whole recipe per source:
    (source, n_docs, n_tokens, weight, p, budget_tokens, epochs)
    at a budget of one corpus-size pass (budget = total tokens, so
    `epochs` reads directly as the per-source repeat factor).

    Cross-engine determinism: n_tokens is an exact integer; sqrt is
    correctly-rounded IEEE (bit-identical both engines); the weight
    quantizes to an exact INTEGER of milli-units (floor(sqrt*1000))
    BEFORE the normalizing sum, so the sum is a bigint (order-free)
    and p is one IEEE division of two exact integers. A decimal
    weight is NOT enough here: the sf10 sweep caught Spark and
    DuckDB disagreeing by 1 ulp on the decimal(38,12)->double cast
    at 17 significant digits (Spark's BigDecimal conversion is
    correctly rounded, DuckDB's scale division is not guaranteed
    to be) — integers have no such cast surface.

    Scale shape: one map-side-combined groupBy on `source` (a
    dims-sized key — a handful of crawls even at 100 TB), a
    single-row total crossJoined back broadcast. One corpus pass,
    no corpus shuffle, output |sources| rows. Not in the driver
    registry (50-entry cap); DuckDB parity in
    tests/test_offline_oracles.py."""
    d = load_table(spark, sf_dir, "documents")
    per = (
        d.select("source", F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n"))
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n").cast("bigint").alias("n_tokens"),
        )
    )
    return temperature_mix_over(per)


def temperature_mix_over(per: DataFrame) -> DataFrame:
    """pl18's exact mixture arithmetic over ANY (source, n_docs,
    n_tokens) relation — shared by pl18 (per built from the corpus
    scan) and pl13's ledger (per built from the cached per-doc stage
    relation), so the recipe's weights cannot drift between the
    standalone operator and the audited lineage."""
    per = per.select(
        "source",
        "n_docs",
        "n_tokens",
        F.floor(F.sqrt(F.col("n_tokens").cast("double")) * 1000)
        .cast("bigint")
        .alias("weight_milli"),
    )
    tot = per.agg(
        F.sum("weight_milli").cast("bigint").alias("tw"),
        F.sum("n_tokens").cast("bigint").alias("tt"),
    )
    p = F.col("weight_milli").cast("double") / F.col("tw").cast("double")
    budget = F.floor(p * F.col("tt").cast("double")).cast("bigint")
    return per.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        "weight_milli",
        p.alias("p"),
        budget.alias("budget_tokens"),
        (budget.cast("double") / F.col("n_tokens").cast("double")).alias("epochs"),
    )


PL18_SQL = """
WITH per AS (
    SELECT source, cast(count(*) AS BIGINT) AS n_docs,
           cast(sum(len(str_split(text, ' '))) AS BIGINT) AS n_tokens
    FROM documents GROUP BY source
),
per2 AS (
    SELECT source, n_docs, n_tokens,
           cast(floor(sqrt(cast(n_tokens AS DOUBLE)) * 1000) AS BIGINT) AS weight_milli
    FROM per
),
tot AS (SELECT cast(sum(weight_milli) AS BIGINT) AS tw,
               cast(sum(n_tokens) AS BIGINT) AS tt FROM per2)
SELECT source, n_docs, n_tokens, weight_milli,
       cast(weight_milli AS DOUBLE) / cast(tw AS DOUBLE) AS p,
       cast(floor(cast(weight_milli AS DOUBLE) / cast(tw AS DOUBLE) * cast(tt AS DOUBLE))
            AS BIGINT) AS budget_tokens,
       cast(cast(floor(cast(weight_milli AS DOUBLE) / cast(tw AS DOUBLE) * cast(tt AS DOUBLE))
                 AS BIGINT) AS DOUBLE) / cast(n_tokens AS DOUBLE) AS epochs
FROM per2 CROSS JOIN tot
"""


def temperature_copies_expr():
    """pl19's copy-count decision as a reusable expression over rows
    carrying (doc_id, epochs): floor(epochs) copies plus one more when
    the md5 hash-uniform falls below frac(epochs) — deterministic
    stochastic rounding, shared by pl19 and pl13's ledger row."""
    base = F.floor(F.col("epochs")).cast("int")
    frac = F.col("epochs") - F.floor(F.col("epochs"))
    u = hash_uniform("pl19", F.col("doc_id").cast("string"))
    return (base + F.when(u < frac, 1).otherwise(0)).cast("int")


def pl19_temperature_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REALIZE pl18's temperature mixture as a per-document repeat
    plan: each doc appears floor(epochs_source) times plus one more
    with probability frac(epochs_source) — deterministic stochastic
    rounding via the md5 hash-uniform (pl3/pl10's counter), so the
    expected token mass per source hits pl18's budget exactly while
    every decision is reproducible across runs, engines, partitions
    and retries. Output one row per (doc_id, copy): the exploded
    relation pl9's epoch shuffle permutes — closing the recipe loop
    derive (pl18) -> apply (pl19) -> order (pl9).

    Cross-engine determinism: epochs is pl18's bit-identical double
    (int/int IEEE division), floor/frac are IEEE ops on it, and the
    keep decision compares the 52-bit hash uniform against frac —
    the same double comparison both engines spell.

    Scale shape: pl18's dims-sized relation broadcast-joins onto the
    scan, the copy decision is a map-side expression, and the
    explode emits floor(epochs)+1 <= ~2 rows/doc at the synthetic
    mix — no shuffle at all past pl18's own aggregation. Not in the
    driver registry (50-entry cap); DuckDB parity in
    tests/test_offline_oracles.py."""
    mix = pl18_temperature_mix(spark, sf_dir).select("source", "epochs")
    d = load_table(spark, sf_dir, "documents", fan_out=True).select("doc_id", "source")
    n_copies = temperature_copies_expr()
    return (
        d.join(F.broadcast(mix), "source")
        .select("doc_id", "source", "epochs", n_copies.alias("n_copies"))
        .where(F.col("n_copies") > 0)
        .select(
            "doc_id",
            "source",
            "n_copies",
            F.explode(F.sequence(F.lit(1), F.col("n_copies"))).alias("copy_idx"),
        )
    )


PL19_SQL = f"""
WITH per AS (
    SELECT source, cast(sum(len(str_split(text, ' '))) AS BIGINT) AS n_tokens
    FROM documents GROUP BY source
),
per2 AS (
    SELECT source,
           cast(floor(sqrt(cast(n_tokens AS DOUBLE)) * 1000) AS BIGINT) AS weight_milli,
           n_tokens
    FROM per
),
tot AS (SELECT cast(sum(weight_milli) AS BIGINT) AS tw,
               cast(sum(n_tokens) AS BIGINT) AS tt FROM per2),
mix AS (
    SELECT source,
           cast(cast(floor(cast(weight_milli AS DOUBLE) / cast(tw AS DOUBLE)
                           * cast(tt AS DOUBLE)) AS BIGINT) AS DOUBLE)
               / cast(n_tokens AS DOUBLE) AS epochs
    FROM per2 CROSS JOIN tot
),
copies AS (
    SELECT d.doc_id, d.source, m.epochs,
           cast(floor(m.epochs) AS INTEGER)
           + CASE WHEN cast(cast(('0x' || substr(md5('pl19:' || cast(d.doc_id AS VARCHAR)), 1, 13))
                                 AS BIGINT) AS DOUBLE) / 4503599627370496.0
                       < m.epochs - floor(m.epochs)
                  THEN 1 ELSE 0 END AS n_copies
    FROM documents d JOIN mix m USING (source)
)
SELECT doc_id, source, n_copies, cast(unnest(range(1, n_copies + 1)) AS INTEGER) AS copy_idx
FROM copies WHERE n_copies > 0
"""


# --- pl20: pack-efficiency audit -----------------------------------------


def pl20_pack_efficiency(
    spark: SparkSession, sf_dir: str, ctx: int = PACK_CTX, shards: int = PACK_SHARDS
) -> DataFrame:
    """Per-shard audit of pl7's packing plan: how full the fixed
    ctx-token training windows actually are and how many documents
    straddle a window boundary — the two numbers that price a packing
    configuration (tail-window waste = wasted FLOPs per epoch;
    boundary documents = sequences whose attention span a cross-doc
    seam, the cost sample-packing papers weigh against padding).

    Columns: shard, n_docs, fill_tokens (token mass packed),
    n_windows (windows the shard slices into), capacity_tokens
    (n_windows * ctx), waste_tokens (capacity - fill: the tail
    window's padding), fill_ratio (exact-integer IEEE division;
    NULL for an all-empty shard), boundary_docs (docs with
    n_windows > 1).

    Cross-engine determinism: every column is an integer aggregate of
    pl7's integer plan (fill_ratio is one int/int double division).
    Scale shape: inherits pl7's per-shard independence — one window
    partitioned by shard, then a |shards|-key map-combined groupBy;
    no global order anywhere. Not in the driver registry (50-entry
    cap); DuckDB parity in tests/test_offline_oracles.py."""
    plan = pl7_sequence_pack_plan(spark, sf_dir, ctx, shards)
    agg = plan.groupBy("shard").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("bpe_tokens").cast("bigint").alias("fill_tokens"),
        (F.max("window_end") + 1).cast("bigint").alias("n_windows"),
        F.sum(F.when(F.col("n_windows") > 1, 1).otherwise(0)).cast("bigint").alias("boundary_docs"),
    )
    capacity = (F.col("n_windows") * ctx).cast("bigint")
    return agg.select(
        "shard",
        "n_docs",
        "fill_tokens",
        "n_windows",
        capacity.alias("capacity_tokens"),
        (capacity - F.col("fill_tokens")).alias("waste_tokens"),
        F.when(capacity == 0, F.lit(None).cast("double"))
        .otherwise(F.col("fill_tokens").cast("double") / capacity.cast("double"))
        .alias("fill_ratio"),
        "boundary_docs",
    )


def pl20_sql(ctx: int = PACK_CTX, shards: int = PACK_SHARDS) -> str:
    """pl20's DuckDB twin: replays pl7's cumsum spelling (the
    floor-of-double-quotient rule, NOT `//`) and aggregates the same
    integer columns."""
    return f"""
WITH toks AS (
    SELECT doc_id,
           cast(list_sum(list_transform(str_split(text, ' '),
                t -> cast(ceil(length(t) / 4.0) AS BIGINT))) AS BIGINT) AS bpe_tokens
    FROM documents
),
t AS (SELECT doc_id, cast(doc_id % {shards} AS INTEGER) AS shard, bpe_tokens FROM toks),
c AS (
    SELECT doc_id, shard, bpe_tokens,
           cast(sum(bpe_tokens) OVER (PARTITION BY shard ORDER BY doc_id) AS BIGINT) AS cum_end
    FROM t
),
plan AS (
    SELECT shard, bpe_tokens,
           cast(floor((cum_end - 1) / {ctx}.0) AS BIGINT) AS window_end,
           cast(floor((cum_end - 1) / {ctx}.0) AS BIGINT)
             - cast(floor((cum_end - bpe_tokens) / {ctx}.0) AS BIGINT) + 1 AS n_windows
    FROM c
),
agg AS (
    SELECT shard,
           cast(count(*) AS BIGINT) AS n_docs,
           cast(sum(bpe_tokens) AS BIGINT) AS fill_tokens,
           cast(max(window_end) + 1 AS BIGINT) AS n_windows,
           cast(sum(CASE WHEN n_windows > 1 THEN 1 ELSE 0 END) AS BIGINT) AS boundary_docs
    FROM plan GROUP BY shard
)
SELECT shard, n_docs, fill_tokens, n_windows,
       cast(n_windows * {ctx} AS BIGINT) AS capacity_tokens,
       cast(n_windows * {ctx} AS BIGINT) - fill_tokens AS waste_tokens,
       CASE WHEN n_windows = 0 THEN NULL
            ELSE cast(fill_tokens AS DOUBLE) / cast(n_windows * {ctx} AS DOUBLE) END AS fill_ratio,
       boundary_docs
FROM agg
"""


PL20_SQL = pl20_sql()


# --- pl21: fair source interleave ----------------------------------------


def pl21_fair_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic FAIR INTERLEAVE of sources into one global
    dataloader order: document i of a source with n docs sits at
    fractional position (2i - 1) / (2n) — the stride-balanced merge
    (the datasets-library `interleave_datasets` / Pile-style mixing
    rule), so every batch-sized window of the global order carries
    each source in proportion to its share, instead of pl9's
    uniform-random order where source runs of unbounded length can
    occur. Within a source, documents keep pl9's hash order (seeded
    md5 — reshuffleable per epoch), so interleave composes with the
    epoch permutation rather than replacing it.

    Cross-engine determinism: positions are exact small-integer
    ratios ((2i-1)/(2n) as one int/int IEEE division — i, n <= corpus
    size, both exact in double far past any real corpus), and the
    global order breaks remaining ties by (source, doc_id) — total
    and engine-independent.

    Scale shape: one hash-rank window per source (partitioned by
    source — the pl7 per-shard independence argument), and the GLOBAL
    rank is a CLOSED FORM, not a global-order window (which would
    funnel the corpus through one task — the pl17 two-phase rule):
    for doc i of source s, the number of source-s' docs strictly
    ahead of it is #{j : (2j-1)·n_s < (2i-1)·n_s'} =
    floor(((2i-1)·n_s' + n_s - 1) / (2·n_s)) — pure int64 arithmetic
    (SQL DIV; valid while the product (2i-1)·n_s' stays under 2^63,
    i.e. per-source sizes to ~2.1e9 docs — past that, promote the
    operands to decimal(38,0)) against the broadcast count relation —
    plus the tie (equal fractional position) exactly when
    n_s | (2i-1)·n_s' with an odd quotient, charged to the
    lexicographically earlier source. The DuckDB twin spells the same
    order as the naive global window (the twin is the semantics, the
    closed form its scale-honest realization — pl17's documented
    pattern), so any error in the rank arithmetic is a hash mismatch.
    Not in the driver registry (50-entry cap); DuckDB parity in
    tests/test_offline_oracles.py."""
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents", fan_out=True).select("doc_id", "source")
    # pl9's seeded hash order WITHIN each source
    h = F.md5(F.concat(F.lit("pl21:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("source").orderBy(h, "doc_id")
    per = d.select(
        "doc_id",
        "source",
        F.row_number().over(w).cast("bigint").alias("src_rank"),
        F.count("*").over(Window.partitionBy("source")).cast("bigint").alias("n_src"),
    )
    counts = per.groupBy(F.col("source").alias("osrc")).agg(
        F.max("n_src").cast("bigint").alias("n_o")
    )
    a = (2 * F.col("src_rank") - 1) * F.col("n_o")  # (2i-1) * n_s'
    b = F.col("n_src")                              # n_s
    # floor((a+b-1) / (2b)) in EXACT integer arithmetic (x - x%y is
    # divisible by y, so the closing division is exact), capped at
    # n_o — positions past the other source's last doc count all of it
    x = a + b - 1
    y = 2 * b
    joined = per.crossJoin(F.broadcast(counts)).withColumn("_fd_x", x).withColumn("_fd_y", y)
    # true 64-bit integer division (SQL DIV). The former
    # (x - x % y) / y route goes through a double and is only exact to
    # 2^53, so (2i-1)*n_other silently mis-floors once source sizes
    # pass ~6.7e7 docs; DIV keeps the whole chain in int64. The
    # remaining bound is the int64 PRODUCT (2i-1)*n_other < 2^63,
    # i.e. per-source sizes up to ~2.1e9 docs — documented above.
    fd = F.expr("_fd_x DIV _fd_y")
    ahead_other = F.least(fd, F.col("n_o"))
    # tie: (2j-1)*n_s == (2i-1)*n_s' for some j in 1..n_o — i.e.
    # a = (odd)*b (a % 2b == b) with that j inside the other source
    # (a <= (2*n_o - 1)*b) — charged to the lexicographically earlier
    # source, matching the twin's (pos, source, doc_id) order
    tie_exists = (a % y == b) & (a <= (2 * F.col("n_o") - 1) * b)
    tie_ahead = F.when(
        tie_exists & (F.col("osrc") < F.col("source")), F.lit(1)
    ).otherwise(F.lit(0))
    contrib = F.when(F.col("osrc") == F.col("source"), F.col("src_rank") - 1).otherwise(
        ahead_other + tie_ahead
    )
    ranked = joined.groupBy("doc_id", "source", "src_rank", "n_src").agg(
        (F.sum(contrib) + 1).cast("bigint").alias("global_rank")
    )
    pos = (2 * F.col("src_rank") - 1).cast("double") / (2 * F.col("n_src")).cast("double")
    return ranked.select("doc_id", "source", "src_rank", pos.alias("pos"), "global_rank")


PL21_SQL = """
WITH per AS (
    SELECT doc_id, source,
           cast(row_number() OVER (PARTITION BY source
                ORDER BY md5('pl21:' || cast(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS src_rank,
           cast(count(*) OVER (PARTITION BY source) AS BIGINT) AS n_src
    FROM documents
)
SELECT doc_id, source, src_rank,
       cast(2 * src_rank - 1 AS DOUBLE) / cast(2 * n_src AS DOUBLE) AS pos,
       cast(row_number() OVER (
            ORDER BY cast(2 * src_rank - 1 AS DOUBLE) / cast(2 * n_src AS DOUBLE),
                     source, doc_id) AS BIGINT) AS global_rank
FROM per
"""


# --- pl22: systematic PPS sample -----------------------------------------

PL22_TARGET = 100  # sampling points (expected/exact sample token share)


def pl22_pps_sample(
    spark: SparkSession, sf_dir: str, n_target: int = PL22_TARGET
) -> DataFrame:
    """Systematic PROBABILITY-PROPORTIONAL-TO-SIZE sample of the
    corpus by token mass (classic survey-sampling PPS with a
    systematic ladder, Madow 1949): lay n_target equally-spaced
    points over the doc_id-ordered cumulative token line and keep
    every document whose token interval contains a point. Selection
    probability is exactly n * n_target / total per doc (capped by
    multi-hits for docs heavier than the stride), the total hit count
    is EXACTLY n_target, and — unlike pl2's per-doc hash coin — the
    sample's token mass is deterministic to within one stride, which
    is what a token-budgeted subcorpus build needs.

    Cross-engine determinism: hits = (n_target * cum_end) // total -
    (n_target * start) // total is pure integer arithmetic (all
    nonnegative, so DuckDB's truncating // equals Spark's DIV); no
    rng, no floats anywhere. Scale shape: the cumulative line is the
    pl17 two-phase prefix sum (prefix_starts_over — per-bucket
    offsets window over a bounded relation, never a global window);
    the single-row total broadcasts. Overflow: n_target * total must
    fit int64 — at 100 TB (total ~ 1e14 tokens) keep n_target <= ~9e4
    or promote the product to decimal(38,0) (documented, ANSI fails
    loud). Not in the driver registry (50-entry cap); DuckDB parity
    in tests/test_offline_oracles.py."""
    d = load_table(spark, sf_dir, "documents", fan_out=True)
    t = d.select("doc_id", F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n"))
    starts = prefix_starts_over(t)
    total = starts.agg(F.sum("n").cast("bigint").alias("total"))
    hits = F.expr(f"({n_target} * (start + n)) DIV total - ({n_target} * start) DIV total")
    return (
        starts.crossJoin(F.broadcast(total))
        .select("doc_id", "n", "start", hits.cast("bigint").alias("n_hits"))
        .where(F.col("n_hits") > 0)
    )


def pl22_sql(n_target: int = PL22_TARGET) -> str:
    """DuckDB twin: the naive global-window cumsum spelling of the
    same integer ladder (the pl17/pl21 semantics-vs-realization
    pattern)."""
    return f"""
WITH t AS (
    SELECT doc_id, cast(len(str_split(text, ' ')) AS BIGINT) AS n
    FROM documents),
c AS (
    SELECT doc_id, n,
           cast(sum(n) OVER (ORDER BY doc_id) AS BIGINT) - n AS start
    FROM t),
tot AS (SELECT cast(sum(n) AS BIGINT) AS total FROM t)
SELECT doc_id, n, start,
       cast(({n_target} * (start + n)) // total - ({n_target} * start) // total AS BIGINT) AS n_hits
FROM c CROSS JOIN tot
WHERE ({n_target} * (start + n)) // total - ({n_target} * start) // total > 0
"""


PL22_SQL = pl22_sql()


# --- pl23: weighted sampling without replacement (exponential race) ------

PL23_TARGET = 200  # sample size


def pl23_weighted_sample(
    spark: SparkSession, sf_dir: str, n_target: int = PL23_TARGET
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, probability proportional
    to token mass — the third member of the sampling triad (pl2's
    per-doc hash coin = Bernoulli; pl22's Madow ladder = systematic
    PPS with fixed total; pl23 = the classic reservoir form):
    Efraimidis & Spirakis 2006 ("Weighted random sampling with a
    reservoir"), in the equivalent exponential-race spelling (a.k.a.
    Gumbel top-k): draw u_i uniform, race key e_i = -ln(u_i)/w_i,
    keep the n_target SMALLEST keys. P(i in sample) follows the
    without-replacement PPS law exactly, and the sample is stable
    under data repartitioning because u_i is the doc's own hash.

    Cross-engine determinism: u_i = (h52 + 1)/(2^52 + 1) in (0, 1]
    from the md5 primitive (exact integer -> one IEEE division);
    -ln(u) is libm, so it is BLUNTED through decimal(18,6) before use
    (tx10's ln idiom — last-ulp libm differences vanish at the 1e-6
    quantum); the race key is then one IEEE division of that exact
    decimal by the exact integer weight, and ties (including docs
    with equal blunted keys) break on doc_id.

    Scale shape: the candidate relation is one projection over one
    scan; the global smallest-n is `orderBy().limit(n)` —
    TakeOrderedAndProject's per-task n-row heaps, NEVER a global sort
    or an unpartitioned rank window over the corpus — and the rank
    window runs over ONLY the n survivors (k2's top-k discipline).
    The twin deliberately spells the naive global window (the
    semantics); this plan is its scale-honest realization. Not in
    the driver registry (50-entry cap); DuckDB parity in
    tests/test_offline_oracles.py."""
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents", fan_out=True)
    w_tok = F.size(F.split(F.col("text"), " ")).cast("bigint")
    h52 = hash_uniform("pl23", F.col("doc_id").cast("string")) * F.lit(4503599627370496.0)
    u = (h52 + F.lit(1.0)) / F.lit(4503599627370497.0)
    e6 = (-F.log(u)).cast("decimal(18,6)")
    key = e6.cast("double") / w_tok.cast("double")
    cand = d.select(
        "doc_id", w_tok.alias("w_tokens"), key.alias("race_key")
    )
    order = [F.col("race_key").asc(), F.col("doc_id")]
    wr = Window.orderBy(*order)
    return (
        cand.orderBy(*order)
        .limit(n_target)
        .select(
            "doc_id", "w_tokens", "race_key",
            F.row_number().over(wr).cast("bigint").alias("rank"),
        )
    )


def pl23_sql(n_target: int = PL23_TARGET) -> str:
    return f"""
WITH cand AS (
    SELECT doc_id,
           cast(len(str_split(text, ' ')) AS BIGINT) AS w_tokens,
           cast(-ln((cast(cast(('0x' || substr(md5('pl23:' || cast(doc_id AS VARCHAR)), 1, 13)) AS BIGINT)
                          % 4503599627370496 AS DOUBLE) + 1.0) / 4503599627370497.0)
                AS DECIMAL(18,6)) AS e6
    FROM documents
)
SELECT doc_id, w_tokens, race_key, rank FROM (
    SELECT doc_id, w_tokens,
           cast(e6 AS DOUBLE) / cast(w_tokens AS DOUBLE) AS race_key,
           cast(row_number() OVER (
               ORDER BY cast(e6 AS DOUBLE) / cast(w_tokens AS DOUBLE), doc_id
           ) AS BIGINT) AS rank
    FROM cand
) WHERE rank <= {n_target}
"""


PL23_SQL = pl23_sql()


# --- pl24: DoReMi one-step domain reweighting ---------------------------

PL24_ETA_MILLI = 1000  # exponentiated-gradient step size eta = 1.0
PL24_SMOOTH_MILLI = 10  # uniform-smoothing mass c = 0.01
PL24_EXCESS_CAP_MILLI = 19000  # e^19 * 1e6 * 1000 * |sources| stays < 2^63


def pl24_doremi_reweight(
    spark: SparkSession,
    sf_dir: str,
    eta_milli: int = PL24_ETA_MILLI,
    c_milli: int = PL24_SMOOTH_MILLI,
) -> DataFrame:
    """One exponentiated-gradient step of DoReMi domain reweighting
    (Xie et al. 2023, arXiv:2305.10429): each training source's
    mixture weight is multiplied by exp(eta * excess_loss) — excess =
    max(0, domain loss - reference loss), the Group-DRO update — then
    renormalized and smoothed toward uniform with mass c. Domains the
    proxy LM finds HARDER than the corpus baseline are upweighted;
    at-or-below-baseline domains keep factor exactly 1. The per-doc
    loss is tx19's session-cached unigram cost relation (the CCNet
    cost in exact milli-nats per token), so pl24's "proxy model" is
    frozen IDENTICAL to the model tx10/tx19 report — no second,
    subtly different LM (the _unigram_scored discipline). Reference
    loss = the corpus-wide token-weighted mean of the same costs.

    Cross-engine determinism: domain loss is token-weighted in exact
    integer arithmetic (sum(cost_milli * n_tokens) DIV sum(n_tokens),
    all bigint); excess is an exact bigint difference clamped to
    [0, 19000] milli-nats; the one transcendental, exp, is computed
    on an exact-integer-derived double and immediately blunted
    through decimal(18,6) (tx10's ln idiom) into integer micro-units,
    so the score products and their normalizing sum are exact bigints
    and `alpha` is three IEEE ops on exact integers with the
    identical expression tree both engines. int64 headroom:
    cost_milli*n_tokens <= 2e4 * 1e4 per doc and ~2e17 per 100 TB
    domain; score <= 1000 * e^19 * 1e6 ~ 1.8e17, summed over O(10^2)
    sources < 2^63 (the excess cap exists exactly for this bound).

    Scale shape: rides the session-cached tx19_doc_costs relation
    (zero extra LM scans); one doc_id equi-join against the 2-column
    (doc_id, source) projection — the same join shape tx19 itself
    runs for lang; then a map-side-combined groupBy on `source` (a
    dims-sized key), two single-row broadcast crossJoins, |sources|
    rows out. Not in the driver registry (50-entry cap); DuckDB
    parity in tests/test_offline_oracles.py."""
    from maggy_spark.functions.text import tx19_doc_costs

    costs = tx19_doc_costs(spark, sf_dir)
    src = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    per = (
        costs.join(src, "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
            F.sum(F.col("cost_milli") * F.col("n_tokens")).cast("bigint").alias("cost_tok"),
        )
        # `per` feeds FOUR plan positions (ref's broadcast, enriched,
        # tots' broadcast, the output select); unpinned, Catalyst
        # replays the doc-scale costs⋈source join + groupBy once per
        # position (r15, VERDICT r14 item 5 — the dd13 ≥2-consumer
        # rule). Lazy localCheckpoint: |sources| rows, pinned by the
        # first broadcast build, every later position reads the blocks.
        .localCheckpoint(eager=False)
    )
    ref = per.agg(
        F.sum("cost_tok").cast("bigint").alias("ref_cost"),
        F.sum("n_tokens").cast("bigint").alias("ref_tokens"),
    )
    cap = F.lit(PL24_EXCESS_CAP_MILLI).cast("bigint")
    enriched = (
        per.crossJoin(F.broadcast(ref))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.expr("cost_tok div n_tokens").cast("bigint").alias("loss_milli"),
            F.expr("ref_cost div ref_tokens").cast("bigint").alias("ref_milli"),
            "ref_tokens",
        )
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "loss_milli",
            F.least(
                F.greatest(F.lit(0).cast("bigint"), F.col("loss_milli") - F.col("ref_milli")),
                cap,
            ).alias("excess_milli"),
            F.expr("(n_tokens * 1000) div ref_tokens").cast("bigint").alias("prior_milli"),
        )
        .select(
            "*",
            (
                F.exp(
                    (F.lit(eta_milli) * F.col("excess_milli")).cast("double")
                    / F.lit(1000000.0)
                ).cast("decimal(18,6)")
                * 1000000
            )
            .cast("bigint")
            .alias("factor_micro"),
        )
        .select("*", (F.col("prior_milli") * F.col("factor_micro")).cast("bigint").alias("score"))
    )
    tots = enriched.agg(
        F.sum("score").cast("bigint").alias("tot_score"),
        F.count("*").cast("bigint").alias("k"),
    )
    hi = (1000 - c_milli) / 1000.0
    lo = c_milli / 1000.0
    alpha = (
        F.lit(hi) * (F.col("score").cast("double") / F.col("tot_score").cast("double"))
        + F.lit(lo) / F.col("k").cast("double")
    )
    return enriched.crossJoin(F.broadcast(tots)).select(
        "source",
        "n_docs",
        "n_tokens",
        "loss_milli",
        "excess_milli",
        "prior_milli",
        "factor_micro",
        "score",
        alpha.alias("alpha"),
    )


def pl24_sql(
    vocab_size: int | None = None,
    eta_milli: int = PL24_ETA_MILLI,
    c_milli: int = PL24_SMOOTH_MILLI,
) -> str:
    """DuckDB twin: the tx19 LM prefix (identical spelling) feeding
    the exact-integer DoReMi step; `alpha` spells the same three-op
    IEEE tree the Spark side builds."""
    from maggy_spark.functions.text import UNIGRAM_VOCAB

    v = UNIGRAM_VOCAB if vocab_size is None else vocab_size
    hi = (1000 - c_milli) / 1000.0
    lo = c_milli / 1000.0
    return f"""
WITH ex AS (SELECT doc_id, unnest(str_split(text, ' ')) AS tok FROM documents),
counts AS (SELECT tok, cast(count(*) AS BIGINT) AS cnt FROM ex GROUP BY tok),
tot AS (SELECT cast(sum(cnt) AS BIGINT) AS total FROM counts),
vocab AS (
    SELECT tok, cast(ln(cast(cnt AS DOUBLE) / cast(total AS DOUBLE)) AS DECIMAL(18,6)) AS lp
    FROM (SELECT tok, cnt FROM counts ORDER BY cnt DESC, tok ASC LIMIT {v})
    CROSS JOIN tot
),
scored AS (
    SELECT e.doc_id,
           coalesce(v.lp, cast(ln(0.5 / cast(t.total AS DOUBLE)) AS DECIMAL(18,6))) AS lp2
    FROM ex e LEFT JOIN vocab v USING (tok) CROSS JOIN tot t
),
per_doc AS (
    SELECT doc_id, cast(count(*) AS BIGINT) AS n_tokens,
           cast(sum(cast(-lp2 * 1000000 AS BIGINT)) AS BIGINT) AS cost_micro
    FROM scored GROUP BY doc_id
),
docs AS (
    SELECT d.doc_id, d.source, p.n_tokens,
           cast(p.cost_micro // (p.n_tokens * 1000) AS BIGINT) AS cost_milli
    FROM per_doc p JOIN documents d USING (doc_id)
),
per AS (
    SELECT source,
           cast(count(*) AS BIGINT) AS n_docs,
           cast(sum(n_tokens) AS BIGINT) AS n_tokens,
           cast(sum(cost_milli * n_tokens) AS BIGINT) AS cost_tok
    FROM docs GROUP BY source
),
ref AS (
    SELECT cast(sum(cost_tok) AS BIGINT) AS ref_cost,
           cast(sum(n_tokens) AS BIGINT) AS ref_tokens
    FROM per
),
enr AS (
    SELECT source, n_docs, n_tokens,
           cast(cost_tok // n_tokens AS BIGINT) AS loss_milli,
           cast(ref_cost // ref_tokens AS BIGINT) AS ref_milli,
           ref_tokens
    FROM per CROSS JOIN ref
),
enr2 AS (
    SELECT source, n_docs, n_tokens, loss_milli,
           least(greatest(cast(0 AS BIGINT), loss_milli - ref_milli),
                 cast({PL24_EXCESS_CAP_MILLI} AS BIGINT)) AS excess_milli,
           cast((n_tokens * 1000) // ref_tokens AS BIGINT) AS prior_milli
    FROM enr
),
enr3 AS (
    SELECT *, cast(cast(exp(cast({eta_milli} * excess_milli AS DOUBLE) / 1000000.0)
                        AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS factor_micro
    FROM enr2
),
enr4 AS (SELECT *, cast(prior_milli * factor_micro AS BIGINT) AS score FROM enr3),
tots AS (
    SELECT cast(sum(score) AS BIGINT) AS tot_score, cast(count(*) AS BIGINT) AS k FROM enr4
)
SELECT source, n_docs, n_tokens, loss_milli, excess_milli, prior_milli, factor_micro, score,
       {hi!r} * (cast(score AS DOUBLE) / cast(tot_score AS DOUBLE))
           + {lo!r} / cast(k AS DOUBLE) AS alpha
FROM enr4 CROSS JOIN tots
"""


PL24_SQL = pl24_sql()
