"""Text-analysis operators for training-data pipelines.

Language ID (stopword-hit heuristic), quality scoring (length /
uniqueness / stopword ratios), token counting (whitespace + BPE-ish
regex), and document fingerprinting (rolling polynomial hash).

All native column expressions — whole-stage codegen, no Python — and
all arithmetic defined so the DuckDB oracle reproduces values exactly
(integer counts; double ratios built from the same operand order;
rounded at the edge).

Scale notes: each operator is a single narrow projection (no shuffle
at all except the optional per-source rollups) — at 100 TB these run
at scan speed and pushdown keeps untouched columns out of I/O.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import P31, h32

# tiny deterministic English stopword list (shared with the oracle via
# literal IN-lists — keep sorted and short)
EN_STOPWORDS = ["a", "and", "in", "is", "of", "the", "to"]
CYR_RE = "[а-яё]"
FP_BASE = 131


def _tokens(text: Column) -> Column:
    return F.filter(F.split(text, " "), lambda t: t != "")


def token_counts(docs: DataFrame, text: str = "text") -> DataFrame:
    """(doc_id, n_ws_tokens, n_re_tokens, n_chars_nospace):
    whitespace tokens; BPE-ish regex tokens (letter runs / digit runs /
    single other non-space); non-space char count."""
    t = F.col(text)
    return docs.select(
        "doc_id",
        F.size(_tokens(t)).cast("long").alias("n_ws_tokens"),
        F.size(
            F.expr(
                f"regexp_extract_all({text}, '[a-zа-яё]+|[0-9]+|[^a-zа-яё0-9 ]', 0)"
            )
        ).cast("long").alias("n_re_tokens"),
        F.length(F.regexp_replace(t, " ", "")).cast("long").alias("n_chars_nospace"),
    )


def e4(col: Column) -> Column:
    """Exact fixed-point scaling: floor(x·10⁴ + 0.5) as BIGINT.
    Unlike round(x, 4) — whose half-way behavior differs between
    engines — floor on doubles is exact, so bit-identical inputs give
    identical integers in Spark and the DuckDB oracle."""
    return F.floor(col * 10000.0 + F.lit(0.5)).cast("long")


E4_SQL = "floor({x} * 10000.0 + 0.5)::BIGINT"


def lang_id(docs: DataFrame, text: str = "text") -> DataFrame:
    """(doc_id, pred_lang, en_stop_e4): n-gram-free heuristic —
    Cyrillic chars ⇒ 'ru'; else English-stopword hit ratio ≥ 0.03 ⇒
    'en'; else 'unk'. en_stop_e4 = stopword-token ratio ×10⁴."""
    toks = _tokens(F.col(text))
    n = F.size(toks)
    stops = F.size(F.filter(toks, lambda t: t.isin(EN_STOPWORDS)))
    ratio = F.when(n > 0, stops.cast("double") / n).otherwise(F.lit(0.0))
    has_cyr = F.length(F.regexp_extract(F.col(text), CYR_RE, 0)) > 0
    pred = (
        F.when(has_cyr, "ru")
        .when(ratio >= 0.03, "en")
        .otherwise("unk")
    )
    return docs.select(
        "doc_id", pred.alias("pred_lang"), e4(ratio).alias("en_stop_e4")
    )


def quality_score(docs: DataFrame, text: str = "text") -> DataFrame:
    """(doc_id, n_tokens, uniq_e4, stop_e4, quality_e4):
    quality = 0.4·min(1, n/100) + 0.3·uniq_ratio + 0.3·(1-stop_ratio);
    ratios and score emitted ×10⁴ fixed-point (see e4)."""
    toks = _tokens(F.col(text))
    n = F.size(toks).cast("long")
    uniq = F.size(F.array_distinct(toks))
    stops = F.size(F.filter(toks, lambda t: t.isin(EN_STOPWORDS)))
    uniq_ratio = uniq.cast("double") / n
    stop_ratio = stops.cast("double") / n
    quality = (
        0.4 * F.least(F.lit(1.0), n / F.lit(100.0))
        + 0.3 * uniq_ratio
        + 0.3 * (1.0 - stop_ratio)
    )
    return docs.filter(F.size(_tokens(F.col(text))) > 0).select(
        "doc_id",
        n.alias("n_tokens"),
        e4(uniq_ratio).alias("uniq_e4"),
        e4(stop_ratio).alias("stop_e4"),
        e4(quality).alias("quality_e4"),
    )


# Gopher-style repetition gate thresholds (Rae et al. 2021, §A1.1 —
# public paper; integer e4 comparisons so the gate is bit-identical in
# Spark and the DuckDB oracle, no float boundary)
REP_MIN_TOKENS = 20
REP_DUP_BIGRAM_MAX_E4 = 7000   # duplicate-bigram fraction ≤ 0.70
REP_TOP_TOKEN_MAX_E4 = 1500    # most-frequent-token fraction ≤ 0.15


def repetition_stats(docs: DataFrame, text: str = "text") -> DataFrame:
    """(doc_id, n_tokens, dup_bigram_e4, top_token_e4, top_bigram_e4,
    keep): Gopher-style repetition filters for training-data curation
    (Rae et al. 2021 §A1.1: duplicate n-gram fraction, top n-gram
    fraction) — the quality gate the reference corpus pipeline lacks
    entirely (closest analog: the POS stop-filter, LemmaService).

      dup_bigram = (n_bigrams - distinct_bigrams) / n_bigrams
      top_token  = count(most frequent token)  / n_tokens
      top_bigram = count(most frequent bigram) / n_bigrams
      keep       = n_tokens ≥ REP_MIN_TOKENS
                   ∧ dup_bigram_e4 ≤ REP_DUP_BIGRAM_MAX_E4
                   ∧ top_token_e4 ≤ REP_TOP_TOKEN_MAX_E4   (0/1 long)

    Plan shape: the bigram array and its distinct count are per-row
    array expressions (no shuffle); the two mode counts (top token /
    top bigram) are explode → partial-aggregated groupBy(doc_id, gram)
    → max per doc — map-side combine bounds the shuffle by the
    DISTINCT grams per doc, and doc_id keys never skew. The O(u·n)
    shuffle-free alternative (filter-count per distinct token inside
    the array) degrades quadratically on large docs; this one doesn't.
    Empty-token docs are dropped (same contract as quality_score)."""
    toks = _tokens(F.col(text))
    base = (
        docs.select("doc_id", toks.alias("ts"))
        .filter(F.size("ts") > 0)
    )
    # greatest(·,0): the 0-token rows are filtered above, but the
    # optimizer may evaluate the projection on pre-filter rows (slice
    # throws on negative length under ANSI) — clamp instead of relying
    # on operator order
    nm1 = F.greatest(F.size("ts") - 1, F.lit(0))
    # bigrams via aligned slices: [t0..tn-2] zip [t1..tn-1] (1 token →
    # both slices empty → no bigrams); concat, not concat_ws — inputs
    # are non-null by construction and the oracle uses `||`
    bigrams = F.zip_with(
        F.slice("ts", 1, nm1), F.slice("ts", 2, nm1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    # NOT persisted: the result is lazy — the three branches each prune
    # the scan to (doc_id, text) and re-tokenize; callers running this
    # repeatedly should cache `docs` themselves
    arr = base.select("doc_id", "ts", bigrams.alias("bg"))
    stats = arr.select(
        "doc_id",
        F.size("ts").cast("long").alias("n_tokens"),
        F.size("bg").cast("long").alias("nb"),
        F.size(F.array_distinct("bg")).cast("long").alias("db"),
    )
    top_tok = (
        arr.select("doc_id", F.explode("ts").alias("g"))
        .groupBy("doc_id", "g").count()
        .groupBy("doc_id").agg(F.max("count").alias("top_tok"))
    )
    top_bg = (
        arr.select("doc_id", F.explode("bg").alias("g"))
        .groupBy("doc_id", "g").count()
        .groupBy("doc_id").agg(F.max("count").alias("top_bg"))
    )
    nb = F.col("nb").cast("double")
    dup_e4 = F.when(
        F.col("nb") > 0, e4((F.col("nb") - F.col("db")) / nb)
    ).otherwise(F.lit(0).cast("long"))
    top_tok_e4 = e4(F.col("top_tok").cast("double") / F.col("n_tokens"))
    top_bg_e4 = F.when(
        F.col("nb") > 0,
        e4(F.coalesce(F.col("top_bg"), F.lit(0)).cast("double") / nb),
    ).otherwise(F.lit(0).cast("long"))
    return (
        stats.join(top_tok, "doc_id")
        .join(top_bg, "doc_id", "left")
        .select(
            "doc_id", "n_tokens",
            dup_e4.alias("dup_bigram_e4"),
            top_tok_e4.alias("top_token_e4"),
            top_bg_e4.alias("top_bigram_e4"),
        )
        .withColumn(
            "keep",
            F.when(
                (F.col("n_tokens") >= REP_MIN_TOKENS)
                & (F.col("dup_bigram_e4") <= REP_DUP_BIGRAM_MAX_E4)
                & (F.col("top_token_e4") <= REP_TOP_TOKEN_MAX_E4),
                F.lit(1),
            ).otherwise(F.lit(0)).cast("long"),
        )
    )


def fingerprints(docs: DataFrame, text: str = "text") -> DataFrame:
    """(doc_id, fp): order-sensitive rolling polynomial hash over the
    token stream — fp = fold(tokens, 0, (acc, t) -> (acc·131 +
    h32(t) % P) % P). Equal fp ⇒ identical token sequence (mod
    collisions); robust to formatting-only edits the way md5(text)
    is not."""
    toks = _tokens(F.col(text))
    hashes = F.transform(toks, lambda t: h32(t) % P31)
    fp = F.aggregate(
        hashes,
        F.lit(0).cast("long"),
        lambda acc, h: (acc * FP_BASE + h) % P31,
    )
    return docs.select("doc_id", fp.alias("fp"))
