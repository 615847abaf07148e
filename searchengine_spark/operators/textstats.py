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
