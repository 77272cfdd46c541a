"""Text analysis over the `documents` table: token counting, quality
scoring, language-ID heuristic, document fingerprinting.

All pure column expressions (split/filter/aggregate/md5) — JVM-side,
whole-stage-codegen friendly, no Python in the hot path. Ratios are
double divisions of identical integer operands, so Spark and DuckDB
agree bitwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from maggy_spark.plans.fixtures import load_table, session_cached as _session_cached

STOPWORDS = ["a", "the"]
# tiny per-language stopword lists for the n-gram/stopword heuristic
LANG_MARKERS = {
    "en": ["the", "a", "value", "fast"],
    "de": ["der", "die", "und", "nicht"],
    "fr": ["le", "la", "et", "est"],
    "es": ["el", "la", "que", "de"],
}


def _tokens():
    return F.split(F.col("text"), " ")


def bpe_token_estimate(toks) -> "F.Column":
    """ceil(len/4) sub-token budget per whitespace token — ONE shared
    expression for every consumer of the proxy token count (tx1's
    per-doc relation, pl13's ledger), so the budget formula cannot
    drift between the published stats and the corpus-build audit."""
    return F.aggregate(
        toks, F.lit(0).cast("bigint"), lambda acc, t: acc + F.ceil(F.length(t) / 4.0).cast("bigint")
    )


def tx1_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace tokenization + char/token counts + mean token length.

    The BPE-ish sub-token estimate counts 4-char chunks (ceil(len/4))
    per token — a deterministic proxy for byte-pair token budgeting.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = _tokens()
    n_toks = F.size(toks).cast("bigint")
    n_chars = F.length("text").cast("bigint")
    bpe = bpe_token_estimate(toks)
    return d.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_toks.alias("n_tokens"),
        (n_chars.cast("double") / n_toks.cast("double")).alias("chars_per_token"),
        bpe.alias("bpe_tokens"),
    )


TX1_SQL = """
SELECT doc_id,
       cast(length(text) AS BIGINT) AS n_chars,
       cast(len(str_split(text, ' ')) AS BIGINT) AS n_tokens,
       cast(length(text) AS DOUBLE) / cast(len(str_split(text, ' ')) AS DOUBLE) AS chars_per_token,
       cast(list_sum(list_transform(str_split(text, ' '), t -> cast(ceil(length(t) / 4.0) AS BIGINT))) AS BIGINT) AS bpe_tokens
FROM documents
"""


def tx2_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality heuristics: vocabulary richness (distinct/total tokens),
    stopword ratio, mean word length — the usual pre-training corpus
    filters, each an exact integer ratio."""
    d = load_table(spark, sf_dir, "documents")
    toks = _tokens()
    n_toks = F.size(toks).cast("bigint")
    n_distinct = F.size(F.array_distinct(toks)).cast("bigint")
    sw = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(sw, t))).cast("bigint")
    return d.select(
        "doc_id",
        n_toks.alias("n_tokens"),
        (n_distinct.cast("double") / n_toks.cast("double")).alias("vocab_richness"),
        (n_stop.cast("double") / n_toks.cast("double")).alias("stopword_ratio"),
        ((F.length("text") - n_toks + 1).cast("double") / n_toks.cast("double")).alias("mean_word_len"),
        (n_distinct >= 10).alias("passes_richness_filter"),
    )


TX2_SQL = """
WITH t AS (
    SELECT doc_id, text, str_split(text, ' ') AS toks FROM documents
)
SELECT doc_id,
       cast(len(toks) AS BIGINT) AS n_tokens,
       cast(len(list_distinct(toks)) AS DOUBLE) / cast(len(toks) AS DOUBLE) AS vocab_richness,
       cast(len(list_filter(toks, x -> list_contains(['a','the'], x))) AS DOUBLE)
           / cast(len(toks) AS DOUBLE) AS stopword_ratio,
       cast(length(text) - len(toks) + 1 AS DOUBLE) / cast(len(toks) AS DOUBLE) AS mean_word_len,
       (len(list_distinct(toks)) >= 10) AS passes_richness_filter
FROM t
"""


def tx3_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-hit language scoring with deterministic argmax
    (fixed tie-break order en > de > fr > es > unknown)."""
    d = load_table(spark, sf_dir, "documents", fan_out=True)
    toks = _tokens()
    scores = {}
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        scores[lang] = F.size(F.filter(toks, lambda t: F.array_contains(arr, t))).cast("bigint")
    pred = (
        F.when(
            (scores["en"] >= scores["de"]) & (scores["en"] >= scores["fr"]) & (scores["en"] >= scores["es"]) & (scores["en"] > 0),
            F.lit("en"),
        )
        .when((scores["de"] >= scores["fr"]) & (scores["de"] >= scores["es"]) & (scores["de"] > 0), F.lit("de"))
        .when((scores["fr"] >= scores["es"]) & (scores["fr"] > 0), F.lit("fr"))
        .when(scores["es"] > 0, F.lit("es"))
        .otherwise(F.lit("unknown"))
    )
    return d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        scores["en"].alias("score_en"),
        scores["de"].alias("score_de"),
        scores["fr"].alias("score_fr"),
        scores["es"].alias("score_es"),
        pred.alias("predicted_lang"),
    )


_SCORE = "len(list_filter(str_split(text,' '), x -> list_contains({words}, x)))"
TX3_SQL = f"""
WITH s AS (
    SELECT doc_id, lang,
           cast({_SCORE.format(words="['the','a','value','fast']")} AS BIGINT) AS score_en,
           cast({_SCORE.format(words="['der','die','und','nicht']")} AS BIGINT) AS score_de,
           cast({_SCORE.format(words="['le','la','et','est']")} AS BIGINT) AS score_fr,
           cast({_SCORE.format(words="['el','la','que','de']")} AS BIGINT) AS score_es
    FROM documents
)
SELECT doc_id, lang AS labeled_lang, score_en, score_de, score_fr, score_es,
       CASE WHEN score_en >= score_de AND score_en >= score_fr AND score_en >= score_es AND score_en > 0 THEN 'en'
            WHEN score_de >= score_fr AND score_de >= score_es AND score_de > 0 THEN 'de'
            WHEN score_fr >= score_es AND score_fr > 0 THEN 'fr'
            WHEN score_es > 0 THEN 'es'
            ELSE 'unknown' END AS predicted_lang
FROM s
"""


def tx4_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprints: md5 of the normalized text (lowercase,
    collapsed whitespace), a 64-bit-prefix hex fingerprint, and a
    shard bucket — the partitioning key a 100 TB dedup would bucket
    its corpus by."""
    d = load_table(spark, sf_dir, "documents", fan_out=True)
    norm = F.lower(F.regexp_replace(F.col("text"), " +", " "))
    h = F.md5(norm)
    return d.select(
        "doc_id",
        h.alias("fingerprint"),
        F.substring(h, 1, 16).alias("fingerprint64"),
        (F.conv(F.substring(h, 1, 4), 16, 10).cast("bigint") % 256).cast("int").alias("shard_bucket"),
    )


TX4_SQL = """
WITH h AS (
    SELECT doc_id, md5(lower(regexp_replace(text, ' +', ' ', 'g'))) AS fingerprint
    FROM documents
)
SELECT doc_id, fingerprint,
       substr(fingerprint, 1, 16) AS fingerprint64,
       cast(cast(('0x' || substr(fingerprint, 1, 4)) AS INTEGER) % 256 AS INTEGER) AS shard_bucket
FROM h
"""


def tx5_ngram_stats(spark: SparkSession, sf_dir: str, top_k: int = 50) -> DataFrame:
    """Corpus bigram statistics: global top-k bigrams by document
    frequency, with total occurrences — the vocabulary/contamination
    profile a corpus audit starts from. Explode -> two-level
    aggregate; the top-k is `orderBy().limit(k)`, which Catalyst
    plans as TakeOrderedAndProject: each task keeps a k-row heap and
    only k rows per partition reach the driver-side merge — a
    billion-bigram vocabulary at 100 TB never funnels through one
    task. Rank is then a row_number over ONLY the k surviving rows
    (bounded input, no global-window scale hazard)."""
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents", fan_out=True)
    w = F.split(F.col("text"), " ")
    grams = F.when(
        F.size(w) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - 1),
            lambda i: F.concat_ws(" ", F.element_at(w, i), F.element_at(w, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    ex = d.select("doc_id", F.explode(grams).alias("bigram"))
    stats = ex.groupBy("bigram").agg(
        F.count("*").alias("n_occurrences"),
        F.countDistinct("doc_id").alias("doc_freq"),
    )
    order = [F.col("doc_freq").desc(), F.col("n_occurrences").desc(), F.col("bigram")]
    topk = stats.orderBy(*order).limit(top_k)
    wrank = Window.orderBy(*order)
    return topk.select(
        "bigram", "n_occurrences", "doc_freq", F.row_number().over(wrank).cast("bigint").alias("rank")
    )


TX5_SQL = """
WITH ex AS (
    SELECT doc_id, unnest(CASE WHEN len(w) >= 2
        THEN list_transform(generate_series(1, len(w) - 1), i -> w[i] || ' ' || w[i+1])
        ELSE [] END) AS bigram
    FROM (SELECT doc_id, str_split(text, ' ') AS w FROM documents)
),
stats AS (
    SELECT bigram, count(*) AS n_occurrences, count(DISTINCT doc_id) AS doc_freq
    FROM ex GROUP BY bigram
)
SELECT bigram, n_occurrences, doc_freq, rank FROM (
    SELECT bigram, n_occurrences, doc_freq,
           row_number() OVER (ORDER BY doc_freq DESC, n_occurrences DESC, bigram) AS rank
    FROM stats
) WHERE rank <= 50
"""


TOKEN_REGEX = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def tx6_regex_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish regex tokenization: letter runs, digit runs, and
    individual punctuation as separate tokens — the pre-tokenizer
    shape BPE vocabularies are trained over. Verified identical
    between Java regex (Spark) and RE2 (DuckDB) for this pattern.
    """
    d = load_table(spark, sf_dir, "documents", fan_out=True)
    toks = F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_REGEX), 0)
    return d.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_regex_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_distinct_tokens"),
    )


TX6_SQL = f"""
SELECT doc_id,
       cast(len(regexp_extract_all(lower(text), '{TOKEN_REGEX}')) AS BIGINT) AS n_regex_tokens,
       cast(len(list_distinct(regexp_extract_all(lower(text), '{TOKEN_REGEX}'))) AS BIGINT) AS n_distinct_tokens
FROM documents
"""


def tx7_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition-quality signals per document: fraction
    of the document made of its single most frequent word / bigram,
    and the type-token (distinct/total) ratio. High top-fraction or
    low type-token marks boilerplate and degenerate generations — the
    filters a pretraining corpus pass applies after tx2's surface
    stats.

    Scale shape: ONE scan of the text column — unigrams and bigrams
    explode together as (order, gram) structs, so the 100-TB corpus is
    read and tokenized once (the naive per-order composition scans it
    per n-gram order). All aggregations are keyed by doc_id (+ gram /
    order) — doc-local keys, uniform (no skew), partial aggregation
    before each shuffle; no UDFs, no windows, no joins (the per-order
    stats pivot back with conditional aggregates). n_words is
    recovered as the unigram occurrence total and the bigram total is
    exactly n_words-1, so no separate length pass is needed. Not in
    the driver registry (50-entry cap); DuckDB parity enforced in
    tests/test_offline_oracles.py.
    """
    d = load_table(spark, sf_dir, "documents", fan_out=True)
    w = F.split(F.col("text"), " ")
    grams2 = F.when(
        F.size(w) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - 1),
            lambda i: F.concat_ws(" ", F.element_at(w, i), F.element_at(w, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    tagged = F.concat(
        F.transform(w, lambda x: F.struct(F.lit(1).alias("ord"), x.alias("gram"))),
        F.transform(grams2, lambda x: F.struct(F.lit(2).alias("ord"), x.alias("gram"))),
    )
    ex = d.select("doc_id", F.explode(tagged).alias("t")).select(
        "doc_id", F.col("t.ord").alias("ord"), F.col("t.gram").alias("gram")
    )
    per_gram = ex.groupBy("doc_id", "ord", "gram").agg(F.count("*").alias("c"))
    per_ord = per_gram.groupBy("doc_id", "ord").agg(
        F.max("c").alias("max_c"),
        F.count("*").alias("n_distinct"),
        F.sum("c").alias("total"),
    )
    out = per_ord.groupBy("doc_id").agg(
        F.max(F.when(F.col("ord") == 1, F.col("total"))).alias("n_words"),
        F.max(F.when(F.col("ord") == 1, F.col("max_c"))).alias("_max_uni"),
        F.max(F.when(F.col("ord") == 1, F.col("n_distinct"))).alias("_distinct_uni"),
        F.max(F.when(F.col("ord") == 2, F.col("max_c"))).alias("_max_bi"),
        F.max(F.when(F.col("ord") == 2, F.col("total"))).alias("_total_bi"),
    )
    return out.select(
        "doc_id",
        F.col("n_words").cast("bigint").alias("n_words"),
        (F.col("_max_uni").cast("double") / F.col("n_words")).alias("top_word_frac"),
        (F.col("_distinct_uni").cast("double") / F.col("n_words")).alias("type_token_ratio"),
        F.coalesce(
            F.col("_max_bi").cast("double") / F.col("_total_bi"), F.lit(0.0)
        ).alias("top_bigram_frac"),
    )


TX7_SQL = """
WITH base AS (
    SELECT doc_id, str_split(text, ' ') AS w FROM documents
),
ex_u AS (SELECT doc_id, unnest(w) AS gram FROM base),
uni AS (
    SELECT doc_id, max(c) AS max_uni, count(*) AS distinct_uni
    FROM (SELECT doc_id, gram, count(*) AS c FROM ex_u GROUP BY doc_id, gram)
    GROUP BY doc_id
),
ex_b AS (
    SELECT doc_id, unnest(CASE WHEN len(w) >= 2
        THEN list_transform(generate_series(1, len(w) - 1), i -> w[i] || ' ' || w[i+1])
        ELSE [] END) AS gram
    FROM base
),
bi AS (
    SELECT doc_id, max(c) AS max_bi
    FROM (SELECT doc_id, gram, count(*) AS c FROM ex_b GROUP BY doc_id, gram)
    GROUP BY doc_id
)
SELECT b.doc_id,
       cast(len(b.w) AS BIGINT) AS n_words,
       cast(u.max_uni AS DOUBLE) / len(b.w) AS top_word_frac,
       cast(u.distinct_uni AS DOUBLE) / len(b.w) AS type_token_ratio,
       coalesce(cast(bi.max_bi AS DOUBLE) / (len(b.w) - 1), 0.0) AS top_bigram_frac
FROM base b
JOIN uni u ON b.doc_id = u.doc_id
LEFT JOIN bi ON b.doc_id = bi.doc_id
"""


# -- TX8: corpus token-distribution (Zipf) profile ----------------------


def _token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(tok, cnt) corpus unigram counts — session-cached and shared by
    tx8 (Zipf profile) and tx10 (unigram LM): the one explode+groupBy
    over the corpus that every token-distribution operator starts
    from (the _shingled pattern). Without the materialization each
    consumer subtree re-scans and re-explodes the corpus (tx10's plan
    had FOUR FileScans: counts->vocab, counts->total, the OOV floor's
    total, and the scoring pass)."""
    return _session_cached(
        spark,
        (sf_dir, "token_counts"),
        lambda: (
            load_table(spark, sf_dir, "documents", fan_out=True)
            .select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
            .groupBy("tok")
            .agg(F.count("*").alias("cnt"))
        ),
    )


def tx8_token_zipf(spark: SparkSession, sf_dir: str, top_k: int = 10) -> DataFrame:
    """Corpus-level token-distribution health stats: total and
    distinct token counts, hapax (frequency-1) fraction of the
    vocabulary, and the occurrence mass captured by the `top_k` most
    frequent tokens — the Zipf-profile dashboard a data pipeline
    watches across crawl snapshots (a collapsing head or vanishing
    hapax tail signals template spam or tokenizer drift).

    Scale shape: one explode + one groupBy on the token (uniform
    key); the head mass rides orderBy().limit(k) — Catalyst plans
    TakeOrderedAndProject (per-task k-row heaps, no single-partition
    funnel; same plan family as tx5/k2, pinned there). Ties at the
    k-th rank break by token text so the mass is engine-independent.
    Output is ONE row. Not in the driver registry (50-entry cap);
    DuckDB parity in tests/test_offline_oracles.py.
    """
    counts = _token_counts(spark, sf_dir).select("tok", F.col("cnt").alias("n"))
    tot = counts.agg(
        F.sum("n").alias("total_tokens"),
        F.count("*").alias("distinct_tokens"),
        F.sum(F.when(F.col("n") == 1, 1).otherwise(0)).alias("hapax_tokens"),
    )
    topk = (
        counts.orderBy(F.desc("n"), F.asc("tok"))
        .limit(top_k)
        .agg(F.sum("n").alias("topk_n"))
    )
    return tot.crossJoin(topk).select(
        "total_tokens",
        "distinct_tokens",
        "hapax_tokens",
        (F.col("hapax_tokens").cast("double") / F.col("distinct_tokens").cast("double")).alias(
            "hapax_frac"
        ),
        (F.col("topk_n").cast("double") / F.col("total_tokens").cast("double")).alias(
            "top_mass_frac"
        ),
    )


def tx8_sql(top_k: int = 10) -> str:
    """DuckDB twin, parameterized like dd11_sql/dd13_sql/tx10_sql so
    a non-default top_k compares like with like (round-7 ADVICE)."""
    return f"""
WITH tok AS (SELECT unnest(str_split(text, ' ')) AS tok FROM documents),
counts AS (SELECT tok, count(*) AS n FROM tok GROUP BY tok),
tot AS (
    SELECT cast(sum(n) AS BIGINT) AS total_tokens,
           count(*) AS distinct_tokens,
           cast(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax_tokens
    FROM counts
),
topk AS (
    SELECT cast(sum(n) AS BIGINT) AS topk_n
    FROM (SELECT n FROM counts ORDER BY n DESC, tok ASC LIMIT {top_k})
)
SELECT total_tokens, distinct_tokens, hapax_tokens,
       cast(hapax_tokens AS DOUBLE) / cast(distinct_tokens AS DOUBLE) AS hapax_frac,
       cast(topk_n AS DOUBLE) / cast(total_tokens AS DOUBLE) AS top_mass_frac
FROM tot CROSS JOIN topk
"""


TX8_SQL = tx8_sql()  # default-argument twin for the offline oracle table


OPERATORS = [
    # tx1_token_count rotated OUT round 14 (pre-declared in COVERAGE.md
    # r13): its token count is a literal sub-expression of tx16's
    # histogram input and of the gate-green tx2/tx10 staging; the slot
    # went to tx16_length_quantiles. Parity continues in
    # tests/test_offline_oracles.py at the gate's sf0.01.
    # tx5_ngram_stats rotated OUT round 13 (pre-declared in VERDICT r12
    # item 1): its shingle explode + count shape is the first stage of
    # the gate-green dd7/dd8 banded pipelines and of tx10's unigram
    # model; the slot went to tx19_ccnet_bucket (corpus-derived
    # thresholds — a plan shape the gate did not yet cover). Parity
    # continues in tests/test_offline_oracles.py at the gate's sf0.01.
    # tx6_regex_tokens rotated OUT of the registry round 7 (its regex-token
    # shape is subsumed by tx1/tx5); parity continues in
    # tests/test_offline_oracles.py at sf0.01.
    ("tx2_quality_score", tx2_quality_score, TX2_SQL),
    ("tx3_lang_id", tx3_lang_id, TX3_SQL),
    # tx4_fingerprint rotated OUT round 11 (pre-declared in COVERAGE.md
    # r10): its fingerprint expression is a literal sub-expression of
    # the gate-green dd1/dd5 fingerprint family. Parity continues in
    # tests/test_offline_oracles.py at the gate's sf0.01.
]


# --- tx9: Gopher-rule quality filter ------------------------------------

GOPHER_MIN_WORDS = 10
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_WORD_LEN = 2.0
GOPHER_MAX_WORD_LEN = 10.0
GOPHER_MIN_STOPWORDS = 2
GOPHER_MAX_TOP_TOKEN_FRAC = 0.2


def _top_token_count(toks) -> "F.Column":
    """Occurrence count of the single most frequent token in an array
    column, as BIGINT: sort the array, then one run-length fold
    (aggregate) tracking (prev, current run, best run). O(n log n)
    per row and linear in memory — safe for 10^4-token web docs where
    a distinct-x-count nested scan is quadratic. Empty arrays yield
    0. Stays inside whole-stage codegen (no explode, no shuffle)."""
    big = lambda c: c.cast("bigint")  # noqa: E731

    def _step(acc, x):
        # x == NULL prev -> condition NULL -> otherwise(1): first run
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("bigint"))
        return F.struct(
            x.alias("prev"), run.alias("run"), F.greatest(acc["best"], run).alias("best")
        )

    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        big(F.lit(0)).alias("run"),
        big(F.lit(0)).alias("best"),
    )
    return F.aggregate(F.array_sort(toks), init, _step, lambda acc: acc["best"])


def tx9_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style rule-based quality filter (Rae et al. 2021,
    arXiv:2112.11446 §A1.1): per-document booleans for the word-count
    band, mean-word-length band, minimum distinct stopwords, and a
    repetition cap (mass of the single most frequent token), plus the
    conjunctive ``keep``. tx2 emits the continuous scores; tx9 is the
    DECISION relation a pipeline materializes and audits — each rule
    gets its own column so drop reasons are countable (feeds pl4's
    funnel pattern). Symbol/bullet/ellipsis rules are omitted: the
    synthetic corpus is bare words (no punctuation to count).

    Thresholds are scaled to the corpus (10-word minimum vs Gopher's
    50) but keep the published structure. Scale shape: pure column
    expressions riding the scan — the repetition rule is
    array_sort + a single run-length aggregate (O(n log n) per row;
    the earlier distinct-x-count nested HOF was per-row quadratic and
    would bite on real 10^3-10^4-token web docs), no explode, no
    shuffle, no UDF.
    """
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", *gopher_decision_columns())


def gopher_decision_columns() -> list:
    """The tx9 decision columns as pure expressions over a `text`
    column — shared by the batch operator above and the streaming
    ingest gate (streaming/documents_stream.quality_gate_stream), so
    the two paths cannot drift."""
    toks = _tokens()
    n = F.size(toks).cast("bigint")
    mean_len = (F.length("text") - n + 1).cast("double") / n.cast("double")
    sw = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.array_intersect(toks, sw)).cast("bigint")
    top_cnt = _top_token_count(toks)
    top_frac = top_cnt.cast("double") / n.cast("double")
    p_wc = (n >= GOPHER_MIN_WORDS) & (n <= GOPHER_MAX_WORDS)
    p_wl = (mean_len >= GOPHER_MIN_WORD_LEN) & (mean_len <= GOPHER_MAX_WORD_LEN)
    p_sw = n_stop >= GOPHER_MIN_STOPWORDS
    p_rep = top_frac <= GOPHER_MAX_TOP_TOKEN_FRAC
    return [
        n.alias("n_tokens"),
        mean_len.alias("mean_word_len"),
        n_stop.alias("n_stop_distinct"),
        top_frac.alias("top_token_frac"),
        p_wc.alias("passes_word_count"),
        p_wl.alias("passes_word_len"),
        p_sw.alias("passes_stopword"),
        p_rep.alias("passes_repetition"),
        (p_wc & p_wl & p_sw & p_rep).alias("keep"),
    ]


_SW_LIST = "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"
TX9_SQL = f"""
WITH t AS (
    SELECT doc_id, text, str_split(text, ' ') AS toks FROM documents
),
m AS (
    SELECT doc_id,
           cast(len(toks) AS BIGINT) AS n_tokens,
           cast(length(text) - len(toks) + 1 AS DOUBLE) / cast(len(toks) AS DOUBLE) AS mean_word_len,
           cast(len(list_intersect(toks, {_SW_LIST})) AS BIGINT) AS n_stop_distinct,
           cast(list_max(list_transform(list_distinct(toks),
                         t2 -> len(list_filter(toks, x -> x = t2)))) AS BIGINT) AS top_cnt
    FROM t
)
SELECT doc_id, n_tokens, mean_word_len, n_stop_distinct,
       cast(top_cnt AS DOUBLE) / cast(n_tokens AS DOUBLE) AS top_token_frac,
       (n_tokens >= {GOPHER_MIN_WORDS} AND n_tokens <= {GOPHER_MAX_WORDS}) AS passes_word_count,
       (mean_word_len >= {GOPHER_MIN_WORD_LEN} AND mean_word_len <= {GOPHER_MAX_WORD_LEN}) AS passes_word_len,
       (n_stop_distinct >= {GOPHER_MIN_STOPWORDS}) AS passes_stopword,
       (cast(top_cnt AS DOUBLE) / cast(n_tokens AS DOUBLE) <= {GOPHER_MAX_TOP_TOKEN_FRAC}) AS passes_repetition,
       (n_tokens >= {GOPHER_MIN_WORDS} AND n_tokens <= {GOPHER_MAX_WORDS}
        AND mean_word_len >= {GOPHER_MIN_WORD_LEN} AND mean_word_len <= {GOPHER_MAX_WORD_LEN}
        AND n_stop_distinct >= {GOPHER_MIN_STOPWORDS}
        AND cast(top_cnt AS DOUBLE) / cast(n_tokens AS DOUBLE) <= {GOPHER_MAX_TOP_TOKEN_FRAC}) AS keep
FROM m
"""


# --- tx10: unigram-LM perplexity proxy ----------------------------------

UNIGRAM_VOCAB = 4096


def _unigram_model(
    spark: SparkSession, sf_dir: str, vocab_size: int = UNIGRAM_VOCAB
) -> tuple[DataFrame, DataFrame]:
    """The unigram LM's two static relations — `vocab` = (tok,
    lp decimal(18,6)) over the ``vocab_size`` most frequent tokens
    (ties by token text) and `tot` = the single-row corpus token
    total — factored out so the batch scorer (_unigram_scored) and
    the ingest router (streaming ccnet_route_stream) freeze the
    IDENTICAL model instead of re-deriving two subtly different
    ones. Rides the session-cached corpus unigram counts (shared
    with tx8): one materialized explode+groupBy instead of three
    independent corpus re-scans for vocab/total/OOV-floor."""
    counts = _token_counts(spark, sf_dir)
    tot = counts.agg(F.sum("cnt").cast("bigint").alias("total"))
    vocab = (
        counts.orderBy(F.desc("cnt"), F.asc("tok"))
        .limit(vocab_size)
        .crossJoin(F.broadcast(tot))
        .select(
            "tok",
            F.log(F.col("cnt").cast("double") / F.col("total").cast("double"))
            .cast("decimal(18,6)")
            .alias("lp"),
        )
    )
    return vocab, tot


def _unigram_scored(
    spark: SparkSession, sf_dir: str, vocab_size: int = UNIGRAM_VOCAB
) -> DataFrame:
    """Per-token unigram-LM scored relation (doc_id, lp2, oov) —
    tx10's scoring pass factored out (the length_quantiles_over
    discipline) so tx19's CCNet bucketing consumes the IDENTICAL
    token log-probs tx10 reports instead of re-deriving a second,
    subtly different model. lp2 is the decimal(18,6)-blunted token
    log-prob (vocab hit or the 0.5/total OOV floor); oov flags the
    floor rows. Both consumers aggregate per doc_id downstream."""
    d = load_table(spark, sf_dir, "documents", fan_out=True)
    ex = d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok"))
    vocab, tot = _unigram_model(spark, sf_dir, vocab_size)
    floor_lp = F.log(F.lit(0.5) / F.col("total").cast("double")).cast("decimal(18,6)")
    return (
        ex.join(F.broadcast(vocab), "tok", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            F.coalesce(F.col("lp"), floor_lp).alias("lp2"),
            F.when(F.col("lp").isNull(), 1).otherwise(0).alias("oov"),
        )
    )


def tx10_unigram_logprob(spark: SparkSession, sf_dir: str, vocab_size: int = UNIGRAM_VOCAB) -> DataFrame:
    """Per-document mean unigram log-probability under the corpus's
    own unigram LM — the language-model quality filter of CCNet
    (Wenzek et al. 2019, arXiv:1911.00359) with the KenLM swapped for
    the distributable order-1 model: rare-token word salad scores
    low, template spam scores high, and both tails get cut. The
    vocabulary is capped at the ``vocab_size`` most frequent tokens
    (ties broken by token text); out-of-vocabulary tokens take a
    floor probability of 0.5/total, the standard small-count backoff.

    Cross-engine determinism: each token's log-prob is rounded into
    decimal(18,6) BEFORE aggregation, so the per-doc sum is an exact
    decimal sum — order-free across partitions — and only the final
    division returns to double (ev2's decimal-routing pattern;
    float sums are partition-order-dependent otherwise).

    Scale shape: two passes over the exploded tokens. Pass 1 builds
    the model (groupBy token — uniform-ish key; the Zipf head is
    collapsed by partial aggregation before the shuffle); the capped
    vocab relation is tiny BY CONSTRUCTION, so pass 2 scores via a
    broadcast join — the Zipf-skewed token key never drives a
    shuffle, and the per-doc rollup shuffles one decimal + two longs
    per doc after map-side combine.
    """
    scored = _unigram_scored(spark, sf_dir, vocab_size)
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.sum("oov").cast("bigint").alias("n_oov"),
        (F.sum("lp2").cast("double") / F.count("*").cast("double")).alias("avg_logprob"),
    )


def tx10_sql(vocab_size: int = UNIGRAM_VOCAB) -> str:
    """DuckDB twin, parameterized like dd11_sql/dd13_sql."""
    return f"""
WITH ex AS (SELECT doc_id, unnest(str_split(text, ' ')) AS tok FROM documents),
counts AS (SELECT tok, cast(count(*) AS BIGINT) AS cnt FROM ex GROUP BY tok),
tot AS (SELECT cast(sum(cnt) AS BIGINT) AS total FROM counts),
vocab AS (
    SELECT tok, cast(ln(cast(cnt AS DOUBLE) / cast(total AS DOUBLE)) AS DECIMAL(18,6)) AS lp
    FROM (SELECT tok, cnt FROM counts ORDER BY cnt DESC, tok ASC LIMIT {vocab_size})
    CROSS JOIN tot
),
scored AS (
    SELECT e.doc_id,
           coalesce(v.lp, cast(ln(0.5 / cast(t.total AS DOUBLE)) AS DECIMAL(18,6))) AS lp2,
           CASE WHEN v.lp IS NULL THEN 1 ELSE 0 END AS oov
    FROM ex e LEFT JOIN vocab v USING (tok) CROSS JOIN tot t
)
SELECT doc_id,
       cast(count(*) AS BIGINT) AS n_tokens,
       cast(sum(oov) AS BIGINT) AS n_oov,
       cast(sum(lp2) AS DOUBLE) / cast(count(*) AS DOUBLE) AS avg_logprob
FROM scored GROUP BY doc_id
"""


TX10_SQL = tx10_sql()

# Registered round 7 in the slot freed by the tx6 rotation (tx6's shape is
# subsumed by tx1/tx5; tx10 is the CCNet-style perplexity filter a real
# pipeline runs on every document). Rotation documented in COVERAGE.md.
OPERATORS.append(("tx10_unigram_logprob", tx10_unigram_logprob, TX10_SQL))


# --- tx11: per-source token-distribution drift --------------------------


def kl_term(cnt_st, tot_s, cnt_ct, tot_c):
    """Per-token KL contribution p_s·ln(p_s/p_c) from four exact
    integer columns, rounded into decimal(38,18) so the per-source
    sum is order-free across partitions (any fixed-point rounding
    makes addition associative) without zeroing the Zipf tail the
    way the original decimal(18,6) floor did — see tx11's docstring
    for the cross-engine cast-parity analysis."""
    p_s = cnt_st.cast("double") / tot_s.cast("double")
    p_c = cnt_ct.cast("double") / tot_c.cast("double")
    return (p_s * F.log(p_s / p_c)).cast("decimal(38,18)")


def tx11_source_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source KL divergence of the token distribution against the
    whole corpus — the mix-drift monitor a pipeline runs across crawl
    snapshots and ingestion sources: a source whose KL jumps is
    emitting template spam, a new language, or a scraper bug, and the
    per-source rows feed the same dashboards as tx8's corpus profile.

    KL(P_s || P_corpus) is well-defined here because every token of a
    source is by construction also in the corpus (P_corpus > 0
    wherever P_s > 0). Cross-engine determinism: each token's
    contribution p_s·ln(p_s/p_c) is a pure function of four exact
    integers, rounded into decimal(38,18) BEFORE the per-source sum
    (tx10's pattern, widened from decimal(18,6) round 8) so the sum
    is order-free across partitions AND the Zipf tail survives: at a
    1e9-token source a hapax's contribution is ~1e-8·ln(·) ~ 1e-7,
    which a 1e-6 rounding floor zeroed term-by-term; 18 fractional
    digits keeps ~1e-11 of relative tail mass (pinned by the
    heavy-tail property test in tests/test_functions.py). The
    decimal(38,18) parity trick: Spark's double→decimal cast rounds
    the double's SHORTEST decimal repr while DuckDB's rounds the
    exact binary expansion — they disagree beyond ~17 significant
    digits, so the SQL twin routes through
    cast(cast(x AS VARCHAR) AS DECIMAL(38,18)) (DuckDB's
    double→varchar prints the shortest repr), making both engines
    round the identical decimal string.

    Scale shape: one explode + one groupBy on (source, token) — the
    composite key spreads the Zipf head across sources; the corpus
    marginals come from windows over that pre-aggregated relation
    (per-token partition holds at most |sources| rows, per-source
    partition at most |vocab| rows — both bounded, never corpus-sized;
    dd12's window-over-postings pattern). The final rollup emits one
    row per source. Not in the driver registry (50-entry cap); DuckDB
    parity in tests/test_offline_oracles.py.
    """
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents", fan_out=True)
    ts = (
        d.select("source", F.explode(F.split(F.col("text"), " ")).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count("*").alias("cnt_st"))
    )
    tot_s = F.sum("cnt_st").over(Window.partitionBy("source"))
    cnt_ct = F.sum("cnt_st").over(Window.partitionBy("tok"))
    tagged = ts.select(
        "source",
        "tok",
        "cnt_st",
        tot_s.alias("tot_s"),
        cnt_ct.alias("cnt_ct"),
    )
    # the scalar corpus total comes from the session-cached unigram
    # counts (shared with tx8/tx10) — not a second corpus scan
    tot_c = _token_counts(spark, sf_dir).agg(F.sum("cnt").cast("bigint").alias("tot_c"))
    term = kl_term(F.col("cnt_st"), F.col("tot_s"), F.col("cnt_ct"), F.col("tot_c"))
    return (
        tagged.crossJoin(F.broadcast(tot_c))
        .select("source", "cnt_st", term.alias("term"))
        .groupBy("source")
        .agg(
            F.sum("cnt_st").cast("bigint").alias("n_tokens"),
            F.count("*").cast("bigint").alias("n_distinct_tokens"),
            # round(·,12) before the double cast: an 18-digit decimal
            # sum has no unique nearest-double agreement across
            # engines (Spark HALF_UPs the downscale, DuckDB
            # truncates) — at 12 fractional digits the decimal→double
            # conversion is exact-integer/exact-power and both
            # engines produce the identical bit pattern
            F.round(F.sum("term"), 12).cast("decimal(38,12)").cast("double").alias("kl_vs_corpus"),
        )
    )


TX11_SQL = """
WITH ex AS (SELECT source, unnest(str_split(text, ' ')) AS tok FROM documents),
ts AS (SELECT source, tok, cast(count(*) AS BIGINT) AS cnt_st FROM ex GROUP BY source, tok),
tagged AS (
    SELECT source, tok, cnt_st,
           cast(sum(cnt_st) OVER (PARTITION BY source) AS BIGINT) AS tot_s,
           cast(sum(cnt_st) OVER (PARTITION BY tok) AS BIGINT) AS cnt_ct
    FROM ts
),
tot AS (SELECT cast(count(*) AS BIGINT) AS tot_c FROM ex)
SELECT source,
       cast(sum(cnt_st) AS BIGINT) AS n_tokens,
       cast(count(*) AS BIGINT) AS n_distinct_tokens,
       cast(cast(round(sum(cast(cast((cast(cnt_st AS DOUBLE) / cast(tot_s AS DOUBLE))
                     * ln((cast(cnt_st AS DOUBLE) / cast(tot_s AS DOUBLE))
                          / (cast(cnt_ct AS DOUBLE) / cast(tot_c AS DOUBLE)))
                AS VARCHAR) AS DECIMAL(38,18))), 12) AS DECIMAL(38,12)) AS DOUBLE) AS kl_vs_corpus
FROM tagged CROSS JOIN tot
GROUP BY source
"""


# -- tx12: PII scan / redaction plan --------------------------------------
#
# Patterns are deliberately RE2-safe (character classes + bounded
# quantifiers, no backreferences, no lookaround) so the Java regex
# engine (Spark) and RE2 (DuckDB) count the identical non-overlapping
# matches — the cross-engine contract the unit tests pin on crafted
# payloads, since the synthetic corpus itself is PII-free word soup
# (the offline oracle still verifies the all-zero relation end to end).

PII_PATTERNS = {
    "emails": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4s": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phones": r"\+?\d[\d -]{7,}\d",
    "long_digit_runs": r"\d{9,}",
}
PII_REDACT_DENSITY = 0.01  # matches per token above which a doc is flagged

# Deterministic PII-bearing probe documents UNIONed into the tx12
# relation on BOTH engines: the synthetic corpus is PII-free word
# soup, so without these the gate row would hard-verify only the
# all-zeros relation (the vacuity argument that keeps dd15 offline —
# here it strengthens a row that IS gated). Negative doc_ids cannot
# collide with the corpus's non-negative BIGINT ids; texts are the
# crafted payloads whose per-pattern counts the three-engine unit
# test pins. Single-space tokenization only (the density denominator
# splits on ' ' in both engines).
PII_PROBE_DOCS: list[tuple[int, str]] = [
    (-1, "contact a.b-c_d%x+1@mail-host.co.uk or admin@x.io today"),
    (-2, "server 10.0.0.1 peered with 192.168.255.254; not 1234.5.6.7 though"),
    (-3, "call +1 555-123-4567 or 5551234567 x 555 123 4567"),
    (-4, "ids 123456789 and 98765432109876 but not 12345678"),
    (-5, "mixed: bob@a.de at 8.8.8.8 phoned +49 170 1234567, ref 4000000001"),
    (-6, "no pii here at all, just words and the number 42"),
]


def tx12_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document PII scan — the C4/RefinedWeb-style safety-filter
    step between raw crawl and training corpus: count email / IPv4 /
    phone-shaped / long-digit-run matches per document and flag docs
    whose match density exceeds the redaction threshold. The output
    is the REDACTION PLAN (counts + flag), not mutated text: a
    production pass re-reads flagged docs and rewrites spans, so the
    decision relation is what gets audited and versioned.

    Scale shape: four regexp_count expressions riding the one corpus
    scan (JVM-side, codegen) plus one tokenize for the density
    denominator — no shuffle at all; the relation is one row per doc
    with no wide columns. Driver-gate row since round 8 (rotated in
    with tx13 for a2/mm3 — COVERAGE.md); the crafted-payload PII
    regex parity test also pins each pattern across engines.

    Since round 9 the relation UNIONs ``PII_PROBE_DOCS`` (negative
    doc_ids, deterministic PII payloads) on both engines, so the gate
    row hard-verifies non-zero counts even though the fixture corpus
    is PII-free (VERDICT r8 task 7).
    """
    d = load_table(spark, sf_dir, "documents", fan_out=True)
    probes = spark.createDataFrame(PII_PROBE_DOCS, "doc_id bigint, text string")
    feed = d.select("doc_id", "text").unionByName(probes)
    return feed.select("doc_id", *pii_decision_columns())


def pii_decision_columns() -> list:
    """The tx12 decision columns as one shared expression list — the
    batch operator and `streaming.pii_gate_stream` both select
    exactly these (gopher_decision_columns pattern), so the ingest
    gate and the batch audit cannot drift."""
    n_toks = F.size(_tokens()).cast("bigint")
    counts = {k: F.regexp_count(F.col("text"), F.lit(p)).cast("bigint") for k, p in PII_PATTERNS.items()}
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    density = total.cast("double") / n_toks.cast("double")
    return [
        *[c.alias(f"n_{k}") for k, c in counts.items()],
        total.alias("n_pii_total"),
        density.alias("pii_density"),
        (density > PII_REDACT_DENSITY).alias("needs_redaction"),
    ]


def _pii_count_sql(pattern: str) -> str:
    # DuckDB has no regexp_count; len(regexp_extract_all) counts the
    # same non-overlapping leftmost matches RE2 emits. Standard SQL
    # string literals keep backslashes LITERAL — doubling them would
    # silently corrupt every \d/\b class (a corruption the PII-free
    # fixture corpus cannot surface, which is why the crafted-payload
    # test replays this generated SQL, not just the pattern)
    esc = pattern.replace("'", "''")
    return f"cast(len(regexp_extract_all(text, '{esc}')) AS BIGINT)"


TX12_SQL = f"""
SELECT doc_id,
       {_pii_count_sql(PII_PATTERNS["emails"])} AS n_emails,
       {_pii_count_sql(PII_PATTERNS["ipv4s"])} AS n_ipv4s,
       {_pii_count_sql(PII_PATTERNS["phones"])} AS n_phones,
       {_pii_count_sql(PII_PATTERNS["long_digit_runs"])} AS n_long_digit_runs,
       ({_pii_count_sql(PII_PATTERNS["emails"])} + {_pii_count_sql(PII_PATTERNS["ipv4s"])}
        + {_pii_count_sql(PII_PATTERNS["phones"])} + {_pii_count_sql(PII_PATTERNS["long_digit_runs"])}) AS n_pii_total,
       cast(({_pii_count_sql(PII_PATTERNS["emails"])} + {_pii_count_sql(PII_PATTERNS["ipv4s"])}
        + {_pii_count_sql(PII_PATTERNS["phones"])} + {_pii_count_sql(PII_PATTERNS["long_digit_runs"])}) AS DOUBLE)
           / cast(len(str_split(text, ' ')) AS DOUBLE) AS pii_density,
       cast(({_pii_count_sql(PII_PATTERNS["emails"])} + {_pii_count_sql(PII_PATTERNS["ipv4s"])}
        + {_pii_count_sql(PII_PATTERNS["phones"])} + {_pii_count_sql(PII_PATTERNS["long_digit_runs"])}) AS DOUBLE)
           / cast(len(str_split(text, ' ')) AS DOUBLE) > {PII_REDACT_DENSITY} AS needs_redaction
FROM (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT * FROM (VALUES {", ".join(f"(cast({i} AS BIGINT), '{t}')" for i, t in PII_PROBE_DOCS)}) probes(doc_id, text)
)
"""

# Rotated INTO the driver registry late round 8 (the PII redaction
# plan is the compliance-audited decision relation of a production
# corpus build, with a streaming twin at ingest); the slot came from
# a2_direction_normalize, whose single-expression negation is a
# literal sub-expression of the gate-green a3_get_xy's y column —
# a2 keeps parity in the offline suite.
OPERATORS.append(("tx12_pii_scan", tx12_pii_scan, TX12_SQL))


# --- tx13: BPE merge-pair statistics + distributed trainer --------------

BPE_TOP_K = 40


def tx13_bpe_pair_stats(spark: SparkSession, sf_dir: str, top_k: int = BPE_TOP_K) -> DataFrame:
    """The statistics the FIRST byte-pair-encoding merge is chosen
    from (Sennrich et al. 2016, arXiv:1508.07909): adjacent
    character-pair frequencies over the corpus, weighted by word
    frequency — ranked merge candidates for tokenizer training, the
    step every from-scratch LLM data pipeline runs before anything
    is tokenized.

    Scale shape: rides the session-cached ``(tok, cnt)`` unigram
    relation (shared with tx8/tx10/tx11) — the corpus's billions of
    token OCCURRENCES collapse to |vocab| rows BEFORE any character
    work, the classic BPE trick; pair extraction is then a per-word
    O(len) array explode over vocab rows only, and the pair groupBy
    partial-aggregates map-side into at most |charset|² keys. The
    final ranking window runs on that charset²-bounded relation, so
    the single-partition row_number is a constant-size sort at any
    corpus scale.
    """
    counts = _token_counts(spark, sf_dir).where(F.length("tok") >= 2)
    tok = F.col("tok")
    pair_structs = F.transform(
        F.sequence(F.lit(1), F.length(tok) - 1),
        lambda i: F.struct(
            tok.substr(i, F.lit(1)).alias("left_sym"),
            tok.substr(i + F.lit(1), F.lit(1)).alias("right_sym"),
        ),
    )
    agg = (
        counts.select(F.explode(pair_structs).alias("p"), "cnt")
        .groupBy(F.col("p.left_sym").alias("left_sym"), F.col("p.right_sym").alias("right_sym"))
        .agg(F.sum("cnt").cast("bigint").alias("pair_count"))
    )
    # literal partition key: physically identical (the charset²-bounded
    # relation still sorts in one task — a constant-size sort by the
    # argument above), but declares the intent so WindowExec stops
    # emitting its unpartitioned-window warning on every gate run
    w = Window.partitionBy(F.lit(0)).orderBy(
        F.desc("pair_count"), F.asc("left_sym"), F.asc("right_sym")
    )
    return (
        agg.select("*", F.row_number().over(w).cast("bigint").alias("rank"))
        .where(F.col("rank") <= top_k)
    )


def tx13_sql(top_k: int = BPE_TOP_K) -> str:
    """DuckDB twin, parameterized like tx8_sql/k3_sql so a
    non-default ``top_k`` parity run compares like with like."""
    return f"""
WITH words AS (
  SELECT tok, cast(count(*) AS BIGINT) AS cnt
  FROM (SELECT unnest(str_split(text, ' ')) AS tok FROM documents)
  WHERE length(tok) >= 2
  GROUP BY tok
),
pairs AS (
  SELECT substr(tok, i, 1) AS left_sym, substr(tok, i + 1, 1) AS right_sym, cnt
  FROM words, unnest(generate_series(1, length(tok) - 1)) AS t(i)
),
agg AS (
  SELECT left_sym, right_sym, cast(sum(cnt) AS BIGINT) AS pair_count
  FROM pairs GROUP BY left_sym, right_sym
),
ranked AS (
  SELECT *, cast(row_number() OVER (ORDER BY pair_count DESC, left_sym, right_sym) AS BIGINT) AS rank
  FROM agg
)
SELECT left_sym, right_sym, pair_count, rank FROM ranked WHERE rank <= {top_k}
"""


TX13_SQL = tx13_sql()

# Rotated INTO the driver registry late round 8 (tokenizer-training
# statistics are a first-class production pass); the slot came from
# mm3_metadata_stats, a 3-row rollup of the gate-green mm1 relation —
# the same derives-entirely argument that rotated mm2 out. mm3 keeps
# parity in the offline suite.
OPERATORS.append(("tx13_bpe_pair_stats", tx13_bpe_pair_stats, TX13_SQL))


def bpe_train(spark: SparkSession, sf_dir: str, n_merges: int = 20) -> list:
    """Distributed BPE tokenizer training: ``n_merges`` rounds of
    (count adjacent symbol pairs over the word-frequency table,
    pick the most frequent pair, merge its occurrences left-to-right
    non-overlapping in every word). Returns the learned merge list
    ``[(left, right, pair_count), ...]`` in merge order — the
    artifact a tokenizer ships. Ties break lexicographically, so the
    sequence is deterministic; ``tests/test_functions.py`` pins it
    against an independent pure-Python BPE on the same corpus.

    Scale shape: the corpus is scanned ONCE (the shared unigram
    cache); every round after that touches only the |vocab|-row
    symbol table — pair counting partial-aggregates into a
    vocab²-bounded (in practice tiny) key space, and only the single
    winning pair is collected per round. The per-word merge is a
    JVM-side ``F.aggregate`` fold (no Python in the loop), and the
    symbol table is ``localCheckpoint``-ed each round so the logical
    plan stays constant-size across rounds (the star_components
    pattern — without it Catalyst re-derives ``n_merges`` nested
    folds).
    """
    # Checkpoint durability mirrors star_components (CLUSTER.md): by
    # default rounds pin executor-local blocks (fastest; lost with an
    # executor); set the session conf ``spark.maggy.checkpointDir``
    # and rounds go through RELIABLE df.checkpoint() against that
    # directory instead — same loop, durable round state.
    checkpoint_dir = spark.conf.get("spark.maggy.checkpointDir", None)
    prev_ckpt_dir = None
    if checkpoint_dir:
        # setCheckpointDir is SparkContext-global: preserve and restore
        # any directory the app had configured (star_components dance).
        # If NONE was configured, ours stays set after return — Spark
        # cannot unset a checkpoint dir (documented, ADVICE r11).
        opt = spark.sparkContext._jsc.sc().getCheckpointDir()
        prev_ckpt_dir = opt.get() if opt.isDefined() else None
        spark.sparkContext.setCheckpointDir(checkpoint_dir)
        ckpt = lambda df: df.checkpoint(eager=True)  # noqa: E731
    else:
        # LAZY local checkpoint (r14 optimization, star_components
        # pattern): each round's top-pair collect() is an unavoidable
        # action and it materializes the lazy checkpoint as a side
        # effect — one Spark job per merge round instead of two, and
        # the FINAL round's fold (whose vocab no collect ever reads)
        # is never computed at all. The reliable path stays eager: a
        # non-eager reliable checkpoint recomputes its lineage to
        # write the files.
        ckpt = lambda df: df.localCheckpoint(eager=False)  # noqa: E731
    try:
        return _bpe_train_rounds(spark, sf_dir, n_merges, ckpt)
    finally:
        if checkpoint_dir and prev_ckpt_dir is not None:
            spark.sparkContext.setCheckpointDir(prev_ckpt_dir)


def _bpe_train_rounds(spark: SparkSession, sf_dir: str, n_merges: int, ckpt) -> list:
    vocab = ckpt(
        _token_counts(spark, sf_dir)
        .where(F.length("tok") >= 2)
        # the empty pattern is Spark's one char-split spelling with no
        # trailing "" (zero-width regexes keep it at any limit)
        .select(F.split(F.col("tok"), "").alias("symbols"), "cnt")
    )
    merges = []
    for _ in range(n_merges):
        pair_structs = F.transform(
            F.sequence(F.lit(1), F.size("symbols") - 1),
            lambda i: F.struct(
                F.element_at("symbols", i).alias("l"),
                F.element_at("symbols", i + F.lit(1)).alias("r"),
            ),
        )
        top = (
            vocab.where(F.size("symbols") >= 2)
            .select(F.explode(pair_structs).alias("p"), "cnt")
            .groupBy("p.l", "p.r")
            .agg(F.sum("cnt").alias("c"))
            .orderBy(F.desc("c"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        left, right, cnt = top[0]["l"], top[0]["r"], int(top[0]["c"])
        merges.append((left, right, cnt))
        merged_sym = F.lit(left + right)
        fold = F.aggregate(
            F.col("symbols"),
            F.expr("CAST(array() AS array<string>)"),
            lambda acc, s: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.lit(left))
                & (s == F.lit(right)),
                F.concat(F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(merged_sym)),
            ).otherwise(F.concat(acc, F.array(s))),
        )
        vocab = ckpt(vocab.select(fold.alias("symbols"), "cnt"))
    return merges


BPE_JVM_FOLD_MAX = 48  # merges at or below this compile to JVM folds


def _rank_order_foldable(merges: list) -> bool:
    """True when every merge's sides are available BEFORE it runs —
    single characters, or the output of an EARLIER merge. This is the
    invariant every ``bpe_train``-learned list satisfies by
    construction (a symbol must exist to be counted in a pair), and
    it is exactly the condition under which applying merges ONCE each
    in rank order equals the rank-priority loop: merging (l, r) -> lr
    only creates adjacencies INVOLVING lr, and any merge consuming lr
    has a later rank, so no lower-rank pair can (re)appear after its
    turn. That argument needs each output string to have a UNIQUE
    producing rank: if two merges yield the same string (('a','bc')
    at an early rank, ('ab','c') later — reachable from bpe_train,
    since ('ab','c') can still be counted after 'abc' exists), a
    consumer ranked between them re-fires in the priority loop when
    the LATER producer re-creates the symbol, after the single pass
    has already moved past it — so duplicate outputs also fall back.
    An arbitrary user list may violate either condition (e.g. rank 0
    consumes rank 3's output) — those fall back to the priority-loop
    seam."""
    made: set = set()
    for left, right, *_ in merges:
        if (len(left) > 1 and left not in made) or (len(right) > 1 and right not in made):
            return False
        out = left + right
        if out in made:
            return False
        made.add(out)
    return True


def _bpe_encode_jvm(spark: SparkSession, sf_dir: str, merges: list) -> DataFrame:
    """JVM-side encoder with GLOBAL vocabulary collapse: encode each
    DISTINCT word once (one ``F.aggregate`` fold per merge in rank
    order — ``_rank_order_foldable`` proves the rank-order/priority
    equivalence), then join the |vocab|-row word→tokens map back onto
    the exploded (doc, pos, word) occurrences and reassemble each
    doc's token sequence by position. This is the python seam's
    batch-local memo made corpus-global and JVM-only: the expensive
    merge folds run |distinct words| times total (not once per
    occurrence — a first cut that folded every occurrence inline
    measured 35 s at sf1 vs ~4 s for this shape), no Python workers,
    no Arrow transfer, and wall time is load-stable (the VERDICT r9
    item-3 variance fix).

    Scale shape: one explode + two shuffles over skinny
    (doc_id, pos, tokens) rows — the reassembly sort is per-doc
    (bounded by doc length) via collect_list + array_sort, never a
    global order. The word-key join inherits the Zipf skew of word
    frequency, which AQE's skew-join handles; the encoded-vocab build
    side partial-aggregates to |vocab| rows before its exchange."""

    def fold_merge(syms, left: str, right: str):
        merged = F.lit(left + right)
        lcol, rcol = F.lit(left), F.lit(right)

        def step(acc, s):
            return F.when(
                (F.size(acc) > 0) & (F.element_at(acc, -1) == lcol) & (s == rcol),
                F.concat(F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(merged)),
            ).otherwise(F.concat(acc, F.array(s)))

        return F.aggregate(syms, F.expr("CAST(array() AS array<string>)"), step)

    def encode_word(w):
        syms = F.split(w, "")
        for left, right, *_ in merges:
            syms = fold_merge(syms, left, right)
        return syms

    d = load_table(spark, sf_dir, "documents", fan_out=True)
    words = F.filter(F.split(F.col("text"), " "), lambda w: w != F.lit(""))
    occ = d.select("doc_id", F.posexplode(words).alias("pos", "word"))
    # the encoded vocab MUST be materialized: left unmaterialized,
    # Catalyst collapses the encode projection past the join and runs
    # the n_merges folds once per OCCURRENCE instead of once per
    # distinct word (measured 14 s -> 4 s at sf1) — the dd13
    # two-consumer lesson applied to projection pushdown
    import hashlib
    import json

    mkey = hashlib.md5(
        json.dumps([[left, right] for left, right, *_ in merges]).encode()
    ).hexdigest()
    vocab = _session_cached(
        spark,
        (sf_dir, "bpe_vocab", mkey),
        lambda: occ.select("word")
        .distinct()
        .select("word", encode_word(F.col("word")).alias("wtoks")),
    )
    joined = occ.join(vocab, "word").groupBy("doc_id").agg(
        F.array_sort(F.collect_list(F.struct("pos", "wtoks"))).alias("parts")
    )
    toks = F.flatten(F.col("parts.wtoks"))
    encoded = joined.select(
        "doc_id",
        F.size("parts").cast("bigint").alias("n_words"),
        F.size(toks).cast("bigint").alias("n_bpe_tokens"),
        toks.alias("tokens"),
    )
    # zero-word docs never reach the explode: restore them with the
    # python seam's (0, 0, []) row shape
    return (
        d.select("doc_id")
        .join(encoded, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_words", F.lit(0)).cast("bigint").alias("n_words"),
            F.coalesce("n_bpe_tokens", F.lit(0)).cast("bigint").alias("n_bpe_tokens"),
            F.coalesce("tokens", F.expr("CAST(array() AS array<string>)")).alias("tokens"),
        )
    )


def bpe_encode(
    spark: SparkSession, sf_dir: str, merges: list, force_python: bool = False
) -> DataFrame:
    """Apply a trained BPE merge list (``bpe_train`` output) to every
    document: whitespace pre-tokenize, split words to characters,
    then repeatedly merge the lowest-rank pair present (all
    occurrences, left-to-right non-overlapping) until no listed pair
    remains — the standard rank-priority BPE encoder. Returns
    ``(doc_id, n_words, n_bpe_tokens, tokens)``.

    Two physical strategies, same semantics (equivalence pinned by
    tests/test_functions.py's jvm-vs-python and crafted-compound
    cases):

    - **JVM folds** (default for lists ≤ BPE_JVM_FOLD_MAX satisfying
      ``_rank_order_foldable``): one ``F.aggregate`` per merge in
      rank order — whole-stage-codegen'd, no Python workers, flat
      wall time across decades. Shipped tokenizers exercising THIS
      engine are merge-list artifacts of ``bpe_train`` (tens of
      merges), so this is the production path.
    - **mapInPandas priority loop** (large or non-foldable lists, or
      ``force_python=True``): the merge-rank dict is closed over
      (tiny, serialized once per task); inside each batch a
      word→tokens memo bounds loop work by the batch's DISTINCT
      words, not token occurrences, so executors hold no corpus-sized
      state. This is the legitimate Python seam — a 50k-merge
      GPT-style list cannot nest 50k folds into a Catalyst plan.
    """
    import pandas as pd

    if not force_python and len(merges) <= BPE_JVM_FOLD_MAX and _rank_order_foldable(merges):
        return _bpe_encode_jvm(spark, sf_dir, merges)

    ranks = {(l, r): i for i, (l, r, _c) in enumerate(merges)}
    schema = "doc_id bigint, n_words bigint, n_bpe_tokens bigint, tokens array<string>"

    def _encode_word(word: str) -> list:
        syms = list(word)
        while len(syms) > 1:
            best_rank, best_pair = None, None
            for p in zip(syms, syms[1:]):
                rk = ranks.get(p)
                if rk is not None and (best_rank is None or rk < best_rank):
                    best_rank, best_pair = rk, p
            if best_pair is None:
                break
            left, right = best_pair
            out = []
            for s in syms:
                if out and out[-1] == left and s == right:
                    out[-1] = left + right
                else:
                    out.append(s)
            syms = out
        return syms

    def _batches(it):
        for pdf in it:
            memo: dict = {}
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                toks: list = []
                words = [w for w in text.split(" ") if w]
                for w in words:
                    enc = memo.get(w)
                    if enc is None:
                        enc = _encode_word(w)
                        memo[w] = enc
                    toks.extend(enc)
                rows.append((int(doc_id), len(words), len(toks), toks))
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_words", "n_bpe_tokens", "tokens"]
            )

    d = load_table(spark, sf_dir, "documents", fan_out=True)
    return d.select("doc_id", "text").mapInPandas(_batches, schema=schema)


# --- tx14: bigram LM quality score ---------------------------------------

BIGRAM_VOCAB = 8192


def _bigram_pairs(d: DataFrame) -> DataFrame:
    """(doc_id, w1, w2) — adjacent whitespace-token pairs, JVM-side
    (slice + zip_with, no Python): a doc with n tokens emits n-1
    rows; single-token docs emit none."""
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    pairs = F.zip_with(
        F.slice(toks, 1, n - 1),
        F.slice(toks, 2, n - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    return d.select("doc_id", F.explode(pairs).alias("p")).select(
        "doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )


def _bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(w1, w2, cnt) corpus bigram counts — session-cached like
    _token_counts: three model consumers (vocab cap, prefix counts,
    total mass) would otherwise each re-scan and re-explode the
    corpus."""
    return _session_cached(
        spark,
        (sf_dir, "bigram_counts"),
        lambda: (
            _bigram_pairs(load_table(spark, sf_dir, "documents", fan_out=True))
            .groupBy("w1", "w2")
            .agg(F.count("*").cast("bigint").alias("cnt"))
        ),
    )


def tx14_bigram_logprob(
    spark: SparkSession, sf_dir: str, vocab_size: int = BIGRAM_VOCAB
) -> DataFrame:
    """Per-document mean CONDITIONAL bigram log-probability under the
    corpus's own bigram LM — the order-2 upgrade of tx10's CCNet-style
    quality filter: p(w2|w1) = cnt(w1,w2) / cnt(w1,*) punishes
    word-salad transitions that unigram frequency can't see (every
    token common, every adjacency absurd), the signature of shuffled
    spam and MT garble. The model keeps the ``vocab_size`` most
    frequent bigram types (ties broken by pair text); out-of-model
    bigrams take the standard small-count floor 0.5/total_bigrams.

    Output: one row per document with >= 2 tokens — (doc_id,
    n_bigrams, n_oov, avg_logprob). Single-token docs have no
    transitions to score and are tx10's job.

    Cross-engine determinism: tx10's pattern verbatim — each
    transition's log-prob rounds into decimal(18,6) BEFORE the
    per-doc sum (order-free exact addition; conditional log-probs
    are O(10), so six decimals loses nothing), and only the final
    mean returns to double.

    Scale shape: pass 1 builds the model from the session-cached
    bigram counts (one explode+groupBy over the corpus; partial
    aggregation collapses the Zipf head map-side); the capped vocab
    joins the |w1|-bounded prefix relation with the VOCAB side
    broadcast, so model construction never shuffles on the skewed
    pair key. Pass 2 scores via a broadcast join on (w1, w2) and
    rolls up per doc after map-side combine — the corpus-sized
    relation crosses no shuffle wider than one decimal + two longs
    per doc.
    """
    d = load_table(spark, sf_dir, "documents", fan_out=True)
    ex = _bigram_pairs(d)
    bg = _bigram_counts(spark, sf_dir)
    tot = bg.agg(F.sum("cnt").cast("bigint").alias("total"))
    prefix = bg.groupBy("w1").agg(F.sum("cnt").cast("bigint").alias("pcnt"))
    top = bg.orderBy(F.desc("cnt"), F.asc("w1"), F.asc("w2")).limit(vocab_size)
    vocab = prefix.join(F.broadcast(top), "w1").select(
        "w1",
        "w2",
        F.log(F.col("cnt").cast("double") / F.col("pcnt").cast("double"))
        .cast("decimal(18,6)")
        .alias("lp"),
    )
    floor_lp = F.log(F.lit(0.5) / F.col("total").cast("double")).cast("decimal(18,6)")
    scored = (
        ex.join(F.broadcast(vocab), ["w1", "w2"], "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            F.coalesce(F.col("lp"), floor_lp).alias("lp2"),
            F.when(F.col("lp").isNull(), 1).otherwise(0).alias("oov"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.sum("oov").cast("bigint").alias("n_oov"),
        (F.sum("lp2").cast("double") / F.count("*").cast("double")).alias("avg_logprob"),
    )


def tx14_sql(vocab_size: int = BIGRAM_VOCAB) -> str:
    """DuckDB twin, parameterized like tx10_sql."""
    return f"""
WITH lists AS (SELECT doc_id, str_split(text, ' ') AS l FROM documents),
ex AS (
    SELECT doc_id, l[i] AS w1, l[i + 1] AS w2
    FROM (SELECT doc_id, l, unnest(range(1, len(l))) AS i FROM lists)
),
bg AS (SELECT w1, w2, cast(count(*) AS BIGINT) AS cnt FROM ex GROUP BY w1, w2),
tot AS (SELECT cast(sum(cnt) AS BIGINT) AS total FROM bg),
prefix AS (SELECT w1, cast(sum(cnt) AS BIGINT) AS pcnt FROM bg GROUP BY w1),
vocab AS (
    SELECT t.w1, t.w2,
           cast(ln(cast(t.cnt AS DOUBLE) / cast(p.pcnt AS DOUBLE)) AS DECIMAL(18,6)) AS lp
    FROM (SELECT w1, w2, cnt FROM bg ORDER BY cnt DESC, w1 ASC, w2 ASC LIMIT {vocab_size}) t
    JOIN prefix p USING (w1)
),
scored AS (
    SELECT e.doc_id,
           coalesce(v.lp, cast(ln(0.5 / cast(t.total AS DOUBLE)) AS DECIMAL(18,6))) AS lp2,
           CASE WHEN v.lp IS NULL THEN 1 ELSE 0 END AS oov
    FROM ex e LEFT JOIN vocab v USING (w1, w2) CROSS JOIN tot t
)
SELECT doc_id,
       cast(count(*) AS BIGINT) AS n_bigrams,
       cast(sum(oov) AS BIGINT) AS n_oov,
       cast(sum(lp2) AS DOUBLE) / cast(count(*) AS DOUBLE) AS avg_logprob
FROM scored GROUP BY doc_id
"""


TX14_SQL = tx14_sql()

# Rotated INTO the driver registry in round 9 (slot freed by
# g1_random_sample, whose hash-uniform sampler is a literal
# sub-expression of gate-green g13's trial factory): the order-2 LM
# quality filter is the highest-traffic text operator a CCNet-style
# corpus build runs per document, so it belongs under the sf0.01
# hard gate. See COVERAGE.md "Round-9 rotation".
OPERATORS.append(("tx14_bigram_logprob", tx14_bigram_logprob, TX14_SQL))


# --- tx15: DSIR importance score ------------------------------------------

DSIR_BUCKETS = 1024
DSIR_TARGET_MOD = 10


def _dsir_bucketed(spark: SparkSession, sf_dir: str, buckets: int) -> DataFrame:
    """(doc_id, b): every doc's hashed n-gram features (unigrams +
    word bigrams, DSIR's feature space) mapped to one of ``buckets``
    md5 buckets. Session-cached — it feeds the target counts, the
    raw counts, AND the scoring join-back (the dd13 two-consumer
    lesson); the md5 bucket is the repo's engine-exact hash
    (hash_uniform's 13-hex-digit prefix, here taken mod buckets —
    both operands nonnegative, so Spark % and DuckDB % agree)."""

    def _build() -> DataFrame:
        d = load_table(spark, sf_dir, "documents", fan_out=True)
        toks = F.split(F.col("text"), " ")
        n = F.size(toks)
        bigrams = F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
        ex = d.select("doc_id", F.explode(F.concat(toks, bigrams)).alias("feat"))
        b = F.conv(F.substring(F.md5("feat"), 1, 13), 16, 10).cast("bigint") % buckets
        return ex.select("doc_id", b.alias("b"))

    return _session_cached(spark, (sf_dir, "dsir_buckets", buckets), _build)


def _dsir_model(
    spark: SparkSession, sf_dir: str, buckets: int, target_mod: int
) -> DataFrame:
    """(b, llr): the per-bucket log-likelihood ratio model over the
    landed corpus — one row per OBSERVED bucket (≤ ``buckets`` by
    construction), add-1/2 smoothed, each log rounded into
    decimal(18,6) before the subtraction. Raw covers every bucket any
    corpus doc can hit (the target slice is a subset), so batch
    scoring joins totally; streams probing with UNSEEN content use
    ``dsir_unseen_llr`` as the lookup default."""
    half_b = 0.5 * buckets
    bucketed = _dsir_bucketed(spark, sf_dir, buckets)
    tgt = (
        bucketed.where(F.col("doc_id") % target_mod == 0)
        .groupBy("b")
        .agg(F.count("*").cast("bigint").alias("ct"))
    )
    raw = bucketed.groupBy("b").agg(F.count("*").cast("bigint").alias("cr"))
    tt = tgt.agg(F.sum("ct").cast("bigint").alias("tt"))
    tr = raw.agg(F.sum("cr").cast("bigint").alias("tr"))
    lt = F.log(
        (F.coalesce(F.col("ct"), F.lit(0)).cast("double") + F.lit(0.5))
        / (F.col("tt").cast("double") + F.lit(half_b))
    ).cast("decimal(18,6)")
    lr = F.log(
        (F.col("cr").cast("double") + F.lit(0.5))
        / (F.col("tr").cast("double") + F.lit(half_b))
    ).cast("decimal(18,6)")
    return (
        raw.join(tgt, "b", "left")
        .crossJoin(F.broadcast(tt))
        .crossJoin(F.broadcast(tr))
        .select("b", (lt - lr).alias("llr"))
    )


def dsir_unseen_llr(
    spark: SparkSession, sf_dir: str, buckets: int = DSIR_BUCKETS,
    target_mod: int = DSIR_TARGET_MOD,
):
    """The smoothed LLR of a bucket with ZERO observations on both
    sides — what an incoming stream document's genuinely-new feature
    scores. Computed Spark-side with the exact decimal rounding the
    model rows get, so a stream lookup default is bit-consistent with
    the model family. Returns a python Decimal."""
    half_b = 0.5 * buckets
    bucketed = _dsir_bucketed(spark, sf_dir, buckets)
    # ONE aggregate job for both totals (r14 job-count pass — the two
    # separate count() actions scanned the cached relation twice)
    counts = bucketed.agg(
        F.count("*").cast("bigint").alias("tr"),
        F.coalesce(
            F.sum(F.when(F.col("doc_id") % target_mod == 0, 1).otherwise(0)), F.lit(0)
        )
        .cast("bigint")
        .alias("tt"),
    ).collect()[0]
    tt, tr = int(counts["tt"]), int(counts["tr"])
    row = spark.range(1).select(
        (
            F.log(F.lit(0.5) / (F.lit(tt).cast("double") + F.lit(half_b))).cast(
                "decimal(18,6)"
            )
            - F.log(F.lit(0.5) / (F.lit(tr).cast("double") + F.lit(half_b))).cast(
                "decimal(18,6)"
            )
        ).alias("llr")
    ).collect()[0]
    return row.llr


def tx15_dsir_score(
    spark: SparkSession,
    sf_dir: str,
    buckets: int = DSIR_BUCKETS,
    target_mod: int = DSIR_TARGET_MOD,
) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR, Xie et al.
    2023, arXiv:2302.03169) scores: every document's mean hashed-
    n-gram log-likelihood ratio between a TARGET distribution (the
    curated quality seed set — here the deterministic
    ``doc_id % target_mod == 0`` slice, dd9's eval-slice convention)
    and the RAW corpus distribution. Selecting the top of this score
    is how a 100 TB crawl gets resampled toward a quality domain
    before training. Output: (doc_id, is_target, n_features,
    dsir_score).

    Model: hashed unigram+bigram features into ``buckets`` md5
    buckets (hashing caps model size independent of vocabulary —
    DSIR's trick, and what keeps the model broadcastable at ANY
    corpus size); bucket probabilities with add-1/2 smoothing; per-
    feature log-ratio rounded into decimal(18,6) BEFORE the per-doc
    sum (tx10's decimal routing — float sums are partition-order-
    dependent) and back to double only for the final mean.

    Scale shape: the bucketed feature relation is computed once
    (session-cached) and partial-aggregates into a ≤``buckets``-row
    model on both the target and raw sides, so the Zipf-skewed
    feature key never drives a shuffle at model size; scoring is a
    BROADCAST join of that bounded model onto the features; the
    per-doc rollup shuffles one decimal + one long per doc after
    map-side combine. In-sample property (pinned by tests): the
    target slice's mean score exceeds the rest's — the likelihood-
    ratio selector must prefer its own seed set.

    Reference parity note: the reference engine has no corpus
    operators; SURVEY §7.2-step-9 extension. Not in the driver
    registry (50-entry cap); DuckDB parity in
    tests/test_offline_oracles.py.
    """
    bucketed = _dsir_bucketed(spark, sf_dir, buckets)
    model = _dsir_model(spark, sf_dir, buckets, target_mod)
    return (
        bucketed.join(F.broadcast(model), "b")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_features"),
            (F.sum("llr").cast("double") / F.count("*").cast("double")).alias("dsir_score"),
        )
        .select(
            "doc_id",
            (F.col("doc_id") % target_mod == 0).alias("is_target"),
            "n_features",
            "dsir_score",
        )
    )


def tx15_sql(buckets: int = DSIR_BUCKETS, target_mod: int = DSIR_TARGET_MOD) -> str:
    """DuckDB twin, parameterized like tx10_sql."""
    half_b = 0.5 * buckets
    return f"""
WITH t AS (SELECT doc_id, str_split(text, ' ') AS toks FROM documents),
ex AS (
    SELECT doc_id,
           unnest(list_concat(
               toks,
               list_transform(range(1, greatest(len(toks) - 1, 0) + 1),
                              i -> toks[cast(i AS INTEGER)] || ' ' || toks[cast(i AS INTEGER) + 1])
           )) AS feat
    FROM t
),
bucketed AS (
    SELECT doc_id, cast(('0x' || substr(md5(feat), 1, 13)) AS BIGINT) % {buckets} AS b
    FROM ex
),
tgt AS (SELECT b, cast(count(*) AS BIGINT) AS ct FROM bucketed
        WHERE doc_id % {target_mod} = 0 GROUP BY b),
raw AS (SELECT b, cast(count(*) AS BIGINT) AS cr FROM bucketed GROUP BY b),
tt AS (SELECT cast(sum(ct) AS BIGINT) AS tt FROM tgt),
tr AS (SELECT cast(sum(cr) AS BIGINT) AS tr FROM raw),
model AS (
    SELECT raw.b,
           cast(ln((cast(coalesce(tgt.ct, 0) AS DOUBLE) + 0.5)
                   / (cast(tt.tt AS DOUBLE) + {half_b!r})) AS DECIMAL(18,6))
         - cast(ln((cast(raw.cr AS DOUBLE) + 0.5)
                   / (cast(tr.tr AS DOUBLE) + {half_b!r})) AS DECIMAL(18,6)) AS llr
    FROM raw LEFT JOIN tgt USING (b) CROSS JOIN tt CROSS JOIN tr
)
SELECT doc_id, doc_id % {target_mod} = 0 AS is_target,
       cast(count(*) AS BIGINT) AS n_features,
       cast(sum(llr) AS DOUBLE) / cast(count(*) AS DOUBLE) AS dsir_score
FROM bucketed JOIN model USING (b)
GROUP BY doc_id
"""


TX15_SQL = tx15_sql()

# Round-11 rotation (pre-declared in COVERAGE.md r10): the DSIR
# data-selection scorer joins the driver gate. Offline-green at
# sf0.001/0.01/0.1 and sf1 before registration.
OPERATORS.append(("tx15_dsir_score", tx15_dsir_score, TX15_SQL))


# --- tx16: exact length quantiles (order statistics over a histogram) ---

# Percentiles a length-filter calibration actually reads: the bulk of
# the distribution plus the long-document tail.
TX16_QS = (25, 50, 75, 90, 99)


def tx16_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT per-(lang, source) token-count percentiles — the relation
    a pipeline reads to calibrate its length filters (tx9's Gopher
    bounds, pl11's chunk width) per language and per crawl source
    instead of hard-coding one global cutoff.

    Exactness: `percentile_approx` and t-digests are the usual Spark
    answer, but approximate sketches cannot be oracle-checked and
    their error is exactly at the tail the calibration reads (p99).
    Token counts live on a BOUNDED integer domain (a document has
    tens-to-thousands of whitespace tokens regardless of corpus
    size), so the exact answer is computable from a histogram whose
    cardinality is |langs| x |sources| x |distinct lengths| —
    corpus-size-independent. The quantile rule is the inverted-CDF
    order statistic: p_q = smallest length whose cumulative count
    reaches ceil(q/100 * n). `100*cum >= q*total` keeps the
    comparison in exact integer arithmetic — no float rank, no
    cross-engine rounding surface (numpy's method='inverted_cdf'
    pins the convention in tests/test_functions.py).

    Scale shape: one map-side-combined groupBy builds the histogram
    (uniform bounded key), the cumulative window runs over that
    bounded relation (each (lang, source) partition is at most
    |distinct lengths| rows), and the final rollup returns one row
    per (lang, source). Nothing in the plan grows with document
    COUNT, only with the length domain. Not in the driver registry
    (50-entry cap); DuckDB parity in tests/test_offline_oracles.py.
    """
    d = load_table(spark, sf_dir, "documents")
    return length_quantiles_over(
        d.select("lang", "source", F.size(_tokens()).cast("bigint").alias("n_tokens"))
    )


def length_quantiles_over(
    lengths: DataFrame,
    group_cols: tuple[str, ...] = ("lang", "source"),
    value_col: str = "n_tokens",
    count_alias: str = "n_docs",
) -> DataFrame:
    """The order-statistics core over ANY grouped bounded-integer
    relation — factored out (pack_plan discipline) so property tests
    can drive random grouped multisets against numpy, and so other
    bounded-domain quantile relations (ev12's conversion-lag minutes)
    reuse the identical integer inverted-CDF rule instead of
    re-deriving it."""
    hist = lengths.groupBy(*group_cols, value_col).agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    w = Window.partitionBy(*group_cols).orderBy(value_col)
    wall = Window.partitionBy(*group_cols)
    cum = hist.select(
        *group_cols,
        value_col,
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(wall).alias("total"),
    )
    quantile_cols = [
        F.min(
            F.when(F.lit(100) * F.col("cum") >= F.lit(q) * F.col("total"), F.col(value_col))
        ).alias(f"p{q}")
        for q in TX16_QS
    ]
    return cum.groupBy(*group_cols).agg(
        F.max("total").alias(count_alias), *quantile_cols
    )


TX16_SQL = f"""
WITH hist AS (
    SELECT lang, source,
           cast(len(str_split(text, ' ')) AS BIGINT) AS n_tokens,
           cast(count(*) AS BIGINT) AS cnt
    FROM documents
    GROUP BY lang, source, len(str_split(text, ' '))
),
cum AS (
    SELECT lang, source, n_tokens,
           cast(sum(cnt) OVER (PARTITION BY lang, source ORDER BY n_tokens) AS BIGINT) AS cum,
           cast(sum(cnt) OVER (PARTITION BY lang, source) AS BIGINT) AS total
    FROM hist
)
SELECT lang, source, max(total) AS n_docs,
       {', '.join(f'min(CASE WHEN 100 * cum >= {q} * total THEN n_tokens END) AS p{q}' for q in TX16_QS)}
FROM cum
GROUP BY lang, source
"""

# rotated INTO the driver registry round 14 (pre-declared in
# COVERAGE.md r13) for tx1_token_count OUT — the gate gains the
# bounded-histogram integer inverted-CDF order statistic.
OPERATORS.append(("tx16_length_quantiles", tx16_length_quantiles, TX16_SQL))


# --- tx17: TF-IDF keyword extraction ------------------------------------

TX17_TOP_TERMS = 3


def tx17_tfidf_keywords(spark: SparkSession, sf_dir: str, top: int = TX17_TOP_TERMS) -> DataFrame:
    """Per-document top-``top`` TF-IDF keywords — the tagging/search
    relation a corpus pipeline publishes next to its quality scores
    (salient terms for retrieval filters, topic routing, and the
    "what is this cluster about" readout over ann10's clusters).
    Output: (doc_id, term, tf, score, rank).

    Cross-engine determinism: tf is an integer; idf = ln(N/df) is
    blunted through decimal(18,6) (the tx10/tx15 ln idiom — JVM
    StrictMath and libm can differ in the last ulp) and the score is
    the double product of the two exactly-agreed operands, so every
    row is engine-exact with NO float summation anywhere. Ranking
    ties break on the term string.

    Scale shape: (doc, term) tf via one explode + map-side-combined
    groupBy; df is a <= |vocab|-row relation joined back on term —
    the Zipf-skewed join key, left to AQE (auto-broadcast when the
    vocabulary fits, skew-split otherwise; the tx10 capped-vocab
    broadcast is the fallback discipline when |vocab| outgrows
    both). The per-doc top-k window partitions on doc_id (uniform).
    Not in the driver registry (50-entry cap); DuckDB parity in
    tests/test_offline_oracles.py.
    """
    from maggy_spark.plans.fixtures import corpus_count

    d = load_table(spark, sf_dir, "documents", fan_out=True)
    # session-memoized scalar (same value as d.count(); the memo saves
    # one whole job per invocation on repeat calls — r14 job-count pass)
    n_docs = corpus_count(spark, sf_dir, "documents")
    # tf feeds TWO consumers (the df aggregate and the score join):
    # unmaterialized, Catalyst replays the explode + groupBy — and the
    # whole corpus scan — once per consumer (the dd13 two-consumer
    # lesson; r14 optimization). Session-cached like every shared
    # derivation, so one explode pass serves both.
    from maggy_spark.plans.fixtures import session_cached

    tf = session_cached(
        spark,
        (sf_dir, "tx17_tf"),
        lambda: d.select("doc_id", F.explode(_tokens()).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("bigint").alias("tf")),
    )
    df_rel = tf.groupBy("term").agg(F.count("*").cast("bigint").alias("df"))
    idf = (
        F.log(F.lit(float(n_docs)) / F.col("df").cast("double"))
        .cast("decimal(18,6)")
        .cast("double")
    )
    scored = tf.join(df_rel, "term").select(
        "doc_id", "term", "tf", (F.col("tf").cast("double") * idf).alias("score")
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "term")
    return (
        scored.select(
            "doc_id", "term", "tf", "score",
            F.row_number().over(w).cast("bigint").alias("rank"),
        )
        .where(F.col("rank") <= top)
    )


def tx17_sql(top: int = TX17_TOP_TERMS) -> str:
    return f"""
WITH ex AS (
    SELECT doc_id, unnest(str_split(text, ' ')) AS term FROM documents
),
tf AS (
    SELECT doc_id, term, cast(count(*) AS BIGINT) AS tf
    FROM ex GROUP BY doc_id, term
),
dfr AS (SELECT term, cast(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
n AS (SELECT cast(count(*) AS DOUBLE) AS nd FROM documents),
scored AS (
    SELECT tf.doc_id, tf.term, tf.tf,
           cast(tf.tf AS DOUBLE)
               * cast(cast(ln(n.nd / cast(dfr.df AS DOUBLE)) AS DECIMAL(18,6)) AS DOUBLE)
               AS score
    FROM tf JOIN dfr USING (term) CROSS JOIN n
)
SELECT doc_id, term, tf, score, rank FROM (
    SELECT doc_id, term, tf, score,
           row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rank
    FROM scored
) WHERE rank <= {top}
"""


TX17_SQL = tx17_sql()


# --- tx18: language-ID acceptance evaluation ----------------------------


def tx18_langid_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language precision/recall/F1 of the tx3 language-ID
    heuristic against the corpus labels — the acceptance gate a
    pipeline runs before trusting lang-ID for routing (the ann14
    eval-relation pattern applied to the classifier family). Output
    per labeled language: (lang, n_docs, n_correct, n_predicted,
    recall, precision, f1). precision/f1 are NULL for a language the
    classifier never predicts (zh has no marker list, so its docs
    fall to 'unknown' — recall 0, precision undefined: the honest
    spelling, not a fake 0).

    Cross-engine determinism: every metric is a ratio/product of
    INTEGER counts computed identically on both engines — no sums of
    floats anywhere; the f1 guard (NULL unless p + r > 0) avoids the
    ANSI divide-by-zero on languages with zero recall and zero
    precision.

    Scale shape: two map-side-combined groupBys over tx3's per-doc
    relation (bounded |langs|+1 keys) and a <= |langs|-row join —
    nothing scales with corpus size past the one tx3 scan. Not in
    the driver registry (50-entry cap); DuckDB parity in
    tests/test_offline_oracles.py."""
    t = tx3_lang_id(spark, sf_dir).select("labeled_lang", "predicted_lang")
    per_label = t.groupBy("labeled_lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("predicted_lang") == F.col("labeled_lang"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_correct"),
    )
    per_pred = t.groupBy("predicted_lang").agg(
        F.count("*").cast("bigint").alias("n_predicted")
    )
    j = per_label.join(
        per_pred, per_label.labeled_lang == per_pred.predicted_lang, "left"
    ).select(
        F.col("labeled_lang").alias("lang"),
        "n_docs",
        "n_correct",
        F.coalesce("n_predicted", F.lit(0)).cast("bigint").alias("n_predicted"),
    )
    recall = F.col("n_correct").cast("double") / F.col("n_docs").cast("double")
    precision = F.when(
        F.col("n_predicted") > 0,
        F.col("n_correct").cast("double") / F.col("n_predicted").cast("double"),
    )
    p, r = precision, recall
    f1 = F.when((F.col("n_predicted") > 0) & (p + r > 0), 2 * p * r / (p + r))
    return j.select(
        "lang", "n_docs", "n_correct", "n_predicted",
        recall.alias("recall"), precision.alias("precision"), f1.alias("f1"),
    )


TX18_SQL = f"""
WITH t AS ({TX3_SQL.strip()}),
per_label AS (
    SELECT labeled_lang, cast(count(*) AS BIGINT) AS n_docs,
           cast(sum(CASE WHEN predicted_lang = labeled_lang THEN 1 ELSE 0 END) AS BIGINT)
               AS n_correct
    FROM t GROUP BY labeled_lang
),
per_pred AS (
    SELECT predicted_lang, cast(count(*) AS BIGINT) AS n_predicted
    FROM t GROUP BY predicted_lang
),
j AS (
    SELECT l.labeled_lang AS lang, l.n_docs, l.n_correct,
           cast(coalesce(p.n_predicted, 0) AS BIGINT) AS n_predicted
    FROM per_label l LEFT JOIN per_pred p ON l.labeled_lang = p.predicted_lang
)
SELECT lang, n_docs, n_correct, n_predicted,
       cast(n_correct AS DOUBLE) / cast(n_docs AS DOUBLE) AS recall,
       CASE WHEN n_predicted > 0
            THEN cast(n_correct AS DOUBLE) / cast(n_predicted AS DOUBLE) END AS precision,
       CASE WHEN n_predicted > 0
                 AND (CASE WHEN n_predicted > 0
                           THEN cast(n_correct AS DOUBLE) / cast(n_predicted AS DOUBLE) END
                      + cast(n_correct AS DOUBLE) / cast(n_docs AS DOUBLE)) > 0
            THEN 2 * (cast(n_correct AS DOUBLE) / cast(n_predicted AS DOUBLE))
                   * (cast(n_correct AS DOUBLE) / cast(n_docs AS DOUBLE))
                 / ((cast(n_correct AS DOUBLE) / cast(n_predicted AS DOUBLE))
                    + cast(n_correct AS DOUBLE) / cast(n_docs AS DOUBLE)) END AS f1
FROM j
"""


# --- tx19: CCNet perplexity bucketing (head / middle / tail) ------------


def tx19_ccnet_bucket(
    spark: SparkSession, sf_dir: str, vocab_size: int = UNIGRAM_VOCAB
) -> DataFrame:
    """CCNet's per-language perplexity bucketing (Wenzek et al. 2019,
    arXiv:1911.00359 §4.4): split each language's documents into
    equal thirds — 'head' (most LM-like), 'middle', 'tail' — by
    per-token LM cost, the step between tx10's raw score and the
    downstream choice of which slice to train on. tx10 emits the
    score; tx19 emits the DECISION relation (doc_id, lang, n_tokens,
    cost_milli, bucket) a pipeline filters on.

    Cross-engine determinism — no float anywhere in the rule: each
    token's decimal(18,6) log-prob (the _unigram_scored relation
    tx10 itself aggregates) scales to an EXACT integer of micro-nats
    (x1e6 of a scale-6 decimal), the per-doc mean cost is integer
    division into milli-nats (operands are non-negative: ln p <= 0,
    so truncation == floor in both engines), and the tertile
    thresholds are tx16's inverted-CDF order statistic kept in pure
    integers (`3*cum >= total`, `3*cum >= 2*total`). The bucket rule
    is defined ON cost_milli, so quantization is part of the
    contract, not a parity hazard.

    Scale shape: tx10's two passes (broadcast vocab join, map-side
    combined per-doc rollup), then a histogram groupBy on
    (lang, cost_milli) — a BOUNDED domain (per-token cost of a text
    document is a few tens of nats, so ~1e4 distinct milli-nat means
    x |langs| rows, corpus-size-independent like tx16) — a window
    over that bounded relation, and a broadcast |langs|-row
    threshold join back onto the per-doc relation. No corpus-scale
    sort: the usual ntile-per-lang spelling would sort every
    document inside skewed lang partitions; the histogram spelling
    never shuffles more than the bounded domain. Not in the driver
    registry (50-entry cap); DuckDB parity in
    tests/test_offline_oracles.py."""
    docs = tx19_doc_costs(spark, sf_dir, vocab_size)
    thr = tx19_thresholds(spark, sf_dir, vocab_size)
    bucket = (
        F.when(F.col("cost_milli") <= F.col("t33"), "head")
        .when(F.col("cost_milli") <= F.col("t67"), "middle")
        .otherwise("tail")
    )
    return docs.join(F.broadcast(thr), "lang").select(
        "doc_id", "lang", "n_tokens", "cost_milli", bucket.alias("bucket")
    )


def tx19_doc_costs(
    spark: SparkSession, sf_dir: str, vocab_size: int = UNIGRAM_VOCAB
) -> DataFrame:
    """The per-doc LM-cost relation (doc_id, lang, n_tokens,
    cost_milli) behind tx19. Session-cached: it feeds BOTH the
    tertile-threshold histogram and tx19's output join — without
    materialization Spark replans the whole two-pass LM scoring
    under each branch (plan audit showed two full scoring subtrees,
    no ReusedExchange). One narrow (4-col) per-doc relation, shared
    (the _token_counts pattern)."""

    def _build() -> DataFrame:
        scored = _unigram_scored(spark, sf_dir, vocab_size)
        per_doc = scored.groupBy("doc_id").agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.sum((-F.col("lp2") * 1000000).cast("bigint")).cast("bigint").alias("cost_micro"),
        )
        d = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
        return per_doc.join(d, "doc_id").select(
            "doc_id",
            "lang",
            "n_tokens",
            F.expr("cost_micro div (n_tokens * 1000)").cast("bigint").alias("cost_milli"),
        )

    return _session_cached(spark, (sf_dir, "tx19_doc_costs", vocab_size), _build)


def tx19_thresholds(
    spark: SparkSession, sf_dir: str, vocab_size: int = UNIGRAM_VOCAB
) -> DataFrame:
    """Per-language tertile thresholds (lang, t33, t67) over the
    tx19_doc_costs relation — the integer inverted-CDF rule on the
    bounded (lang, cost_milli) histogram. Factored out so the batch
    bucketer (tx19) and the ingest router (ccnet_route_stream)
    freeze the IDENTICAL cut points."""
    docs = tx19_doc_costs(spark, sf_dir, vocab_size)
    hist = docs.groupBy("lang", "cost_milli").agg(F.count("*").cast("bigint").alias("cnt"))
    w = Window.partitionBy("lang").orderBy("cost_milli")
    wall = Window.partitionBy("lang")
    cum = hist.select(
        "lang",
        "cost_milli",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(wall).alias("total"),
    )
    return cum.groupBy("lang").agg(
        F.min(F.when(3 * F.col("cum") >= F.col("total"), F.col("cost_milli"))).alias("t33"),
        F.min(F.when(3 * F.col("cum") >= 2 * F.col("total"), F.col("cost_milli"))).alias("t67"),
    )


def tx19_sql(vocab_size: int = UNIGRAM_VOCAB) -> str:
    """DuckDB twin, parameterized like tx10_sql (shared LM prefix)."""
    return f"""
WITH ex AS (SELECT doc_id, unnest(str_split(text, ' ')) AS tok FROM documents),
counts AS (SELECT tok, cast(count(*) AS BIGINT) AS cnt FROM ex GROUP BY tok),
tot AS (SELECT cast(sum(cnt) AS BIGINT) AS total FROM counts),
vocab AS (
    SELECT tok, cast(ln(cast(cnt AS DOUBLE) / cast(total AS DOUBLE)) AS DECIMAL(18,6)) AS lp
    FROM (SELECT tok, cnt FROM counts ORDER BY cnt DESC, tok ASC LIMIT {vocab_size})
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
    SELECT d.doc_id, d.lang, p.n_tokens,
           cast(p.cost_micro // (p.n_tokens * 1000) AS BIGINT) AS cost_milli
    FROM per_doc p JOIN documents d USING (doc_id)
),
hist AS (
    SELECT lang, cost_milli, cast(count(*) AS BIGINT) AS cnt
    FROM docs GROUP BY lang, cost_milli
),
cum AS (
    SELECT lang, cost_milli,
           cast(sum(cnt) OVER (PARTITION BY lang ORDER BY cost_milli) AS BIGINT) AS cum,
           cast(sum(cnt) OVER (PARTITION BY lang) AS BIGINT) AS total
    FROM hist
),
thr AS (
    SELECT lang,
           min(CASE WHEN 3 * cum >= total THEN cost_milli END) AS t33,
           min(CASE WHEN 3 * cum >= 2 * total THEN cost_milli END) AS t67
    FROM cum GROUP BY lang
)
SELECT d.doc_id, d.lang, d.n_tokens, d.cost_milli,
       CASE WHEN d.cost_milli <= t.t33 THEN 'head'
            WHEN d.cost_milli <= t.t67 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM docs d JOIN thr t USING (lang)
"""


TX19_SQL = tx19_sql()

# rotated INTO the driver registry round 13 (pre-declared in VERDICT r12
# item 1, in exchange for tx5_ngram_stats): the corpus-derived-threshold
# plan shape — per-language tertile cut points computed FROM the corpus
# (tx16's integer inverted-CDF rule on an exact milli-nat cost domain)
# and joined back to route every doc — which the gate did not yet cover.
OPERATORS.append(("tx19_ccnet_bucket", tx19_ccnet_bucket, TX19_SQL))


# --- tx20: tokenizer fertility / compression audit ------------------------


def tx20_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(lang, source) tokenizer acceptance stats: whitespace-token
    mass, the BPE-proxy sub-token mass (tx1/pl13's shared
    bpe_token_estimate), fertility = sub-tokens per word (THE
    tokenizer-quality metric of Rust et al. 2021, "How Good is Your
    Tokenizer?"), and chars-per-sub-token (compression). A corpus
    owner reads this table to catch languages the tokenizer
    fragments (fertility spikes) before burning FLOPs on them.

    Cross-engine determinism: all masses are exact integer sums
    (n_chars is the fixture's own bigint column); the two ratios are
    single int/int IEEE divisions — no float aggregation anywhere.
    Scale shape: one corpus scan with map-side combine into a
    |langs x sources|-key groupBy; no joins, no windows. Not in the
    driver registry (50-entry cap); DuckDB parity in
    tests/test_offline_oracles.py."""
    d = load_table(spark, sf_dir, "documents", fan_out=True)
    toks = F.split(F.col("text"), " ")
    agg = (
        d.select(
            "lang",
            "source",
            "n_chars",
            F.size(toks).cast("bigint").alias("ws"),
            bpe_token_estimate(toks).alias("bpe"),
        )
        .groupBy("lang", "source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("ws").cast("bigint").alias("ws_tokens"),
            F.sum("bpe").cast("bigint").alias("bpe_tokens"),
            F.sum("n_chars").cast("bigint").alias("n_chars"),
        )
    )
    return agg.select(
        "lang",
        "source",
        "n_docs",
        "ws_tokens",
        "bpe_tokens",
        "n_chars",
        (F.col("bpe_tokens").cast("double") / F.col("ws_tokens").cast("double")).alias("fertility"),
        (F.col("n_chars").cast("double") / F.col("bpe_tokens").cast("double")).alias(
            "chars_per_token"
        ),
    )


TX20_SQL = """
WITH per AS (
    SELECT lang, source, n_chars,
           cast(len(str_split(text, ' ')) AS BIGINT) AS ws,
           cast(list_sum(list_transform(str_split(text, ' '),
                t -> cast(ceil(length(t) / 4.0) AS BIGINT))) AS BIGINT) AS bpe
    FROM documents
),
agg AS (
    SELECT lang, source,
           cast(count(*) AS BIGINT) AS n_docs,
           cast(sum(ws) AS BIGINT) AS ws_tokens,
           cast(sum(bpe) AS BIGINT) AS bpe_tokens,
           cast(sum(n_chars) AS BIGINT) AS n_chars
    FROM per GROUP BY lang, source
)
SELECT lang, source, n_docs, ws_tokens, bpe_tokens, n_chars,
       cast(bpe_tokens AS DOUBLE) / cast(ws_tokens AS DOUBLE) AS fertility,
       cast(n_chars AS DOUBLE) / cast(bpe_tokens AS DOUBLE) AS chars_per_token
FROM agg
"""
