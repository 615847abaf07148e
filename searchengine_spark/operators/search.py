"""Relational BM25 / legacy search over the postings index.

The flagship read path (reference: GET /api/search,
services/ApiService.java:82-146) re-expressed as one declarative Spark
plan:

  query lemmatize (driver)                      ApiService.java:86
  → broadcast-join term_stats        (J1)       ApiService.java:121-123
  → high-DF prune df/N > 0.95        (F4)       ApiService.java:222-236
  → postings ⋈ broadcast(qterms)     (J2)       ApiService.java:127
  → k-of-n conjunctive division      (J3)       ApiService.java:238-266
  → score: BM25 (north rule) or legacy sum/max (A3)
                                                ApiService.java:130-142
  → orderBy(score desc, url asc).limit(offset+k)  (R2/R3)
                                                SearchResponse.java:25-50

Physical shape: the query side is always tiny → broadcast joins; the
only shuffles are the per-doc aggregation and the final top-k, which
Spark plans as TakeOrderedAndProject (distributed heap — the north
rule's "top-k heap scoring" on the relational path). Rarest-first term
ordering (R1, ApiService.java:205-220) matters for the WAND kernel
(index.wand); a hash-join + count division is order-insensitive.

All scoring is native column math (whole-stage codegen) — no Python in
the hot path; only query lemmatization (driver, ≤ a few tokens) and the
post-top-k snippet UDF touch Python.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import textproc
from .postings import BM25_B, BM25_K1, MAX_REL_FREQ, IndexTables

# offset pagination materializes offset+k rows driver-side (reference
# semantics, SearchResponse.java:42-50) — bound it
MAX_OFFSET = 10_000


def lemmatize_query(query: str) -> list[str]:
    """Driver-side query analysis — same kernel as the corpus UDFs.
    Duplicate lemmas collapse (the reference's per-page lemma set
    semantics); order preserved for rarest-first processing."""
    seen: dict[str, None] = {}
    for lemma in textproc.tokenize_lemmatize(query):
        seen.setdefault(lemma)
    return list(seen)


def bm25_term_score(
    tf=None,
    df=None,
    doclen=None,
    n_docs=None,
    avgdl=None,
    k1: float = BM25_K1,
    b: float = BM25_B,
):
    """Okapi BM25 per-(doc,term) contribution as a native Column.

    idf = ln(1 + (N - df + 0.5)/(df + 0.5))   (non-negative variant)
    w   = idf * tf*(k1+1) / (tf + k1*(1 - b + b*doclen/avgdl))
    """
    tf = F.col("tf") if tf is None else tf
    df = F.col("df") if df is None else df
    doclen = F.col("doclen") if doclen is None else doclen
    n_docs = F.col("n_docs") if n_docs is None else n_docs
    avgdl = F.col("avgdl") if avgdl is None else avgdl
    idf = F.log(F.lit(1.0) + (n_docs - df + F.lit(0.5)) / (df + F.lit(0.5)))
    tf_d = tf.cast("double")
    norm = tf_d + F.lit(k1) * (F.lit(1.0) - F.lit(b) + F.lit(b) * doclen / avgdl)
    return idf * tf_d * F.lit(1.0 + k1) / norm


def bm25_score_py(tf: int, df: int, doclen: int, n_docs: int, avgdl: float,
                  k1: float = BM25_K1, b: float = BM25_B) -> float:
    """Same formula in plain Python — shared by the oracle and the
    block-max annotation kernel. Keep in lockstep with bm25_term_score."""
    idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
    norm = tf + k1 * (1.0 - b + b * doclen / avgdl)
    return idf * tf * (1.0 + k1) / norm


def corpus_constants(doc_stats: DataFrame) -> tuple[int, float]:
    """(N, avgdl) — two scalars; cache doc_stats upstream for repeated
    queries. avgdl = sum(doclen)/N computed from the EXACT integer sum
    (not F.avg, whose float accumulation is partition-order dependent):
    the same value bit-for-bit on every run and in every recomputation
    path (oracle sum()/n, refresh_and_repack), so block-max scores are
    reproducible."""
    row = doc_stats.agg(
        F.count(F.lit(1)).alias("n"), F.sum("doclen").alias("s")
    ).collect()[0]
    n = int(row["n"])
    return n, (float(row["s"]) / n if n else 0.0)


def surviving_terms(
    spark,
    term_stats: DataFrame,
    lemmas: list[str],
    n_docs: int,
    max_rel_freq: float = MAX_REL_FREQ,
) -> DataFrame:
    """J1 + F4: query lemmas ⋈ term_stats, high-DF lemmas pruned.

    Float-division intent (the reference's integer division at
    ApiService.java:228 truncates — documented bug, fixed here).
    A lemma absent from term_stats yields no row → conjunctive search
    correctly returns nothing for unknown terms.
    """
    if not lemmas:
        return term_stats.limit(0)
    q = spark.createDataFrame([(t,) for t in lemmas], "term string")
    return (
        term_stats.join(F.broadcast(q), "term")
        .filter(F.col("df") / F.lit(float(n_docs)) <= max_rel_freq)
    )


def _search_candidates(
    spark,
    index: IndexTables,
    query: str,
    site: str | None = None,
    mode: str = "bm25",
    conjunctive: bool = True,
    constants: tuple[int, float] | None = None,
    boosts: dict[str, float] | None = None,
    lemmas: list[str] | None = None,
) -> DataFrame:
    """Scored + conjunctively-filtered candidates (url, doc_id, score)
    with NO ordering — the shared frame under both search() (which adds
    the top-k heap) and match_count() (which only counts: pinning a
    global sort into a count plan is wasted work that becomes a real
    bottleneck at scale). Returns an empty LocalRelation frame for the
    empty/pruned/unknown-term cases.

    `boosts` {lemma: weight>0}: per-term query boosts (Lucene term^w) —
    each boosted term's BM25 contribution scales by its weight before
    the per-doc sum. bm25 mode only (legacy sum/max is a tf ratio).
    Parse user "term^2.5" syntax with parse_boosted_query.

    `lemmas`: pre-analyzed query lemmas, overriding lemmatize_query —
    machine-expanded term lists (synonym expansion, more-like-this)
    must not re-lemmatize."""
    if boosts:
        if mode != "bm25":
            raise ValueError("boosts are bm25-mode only")
        if any(w <= 0 for w in boosts.values()):
            raise ValueError(f"boost weights must be > 0: {boosts}")
    if lemmas is None:
        lemmas = lemmatize_query(query)
    # Site filter restricts CANDIDATES only; corpus statistics (N,
    # avgdl, df) stay global — filtered retrieval must not change term
    # weights. (The reference's per-site lemma table differs; this is
    # the documented modern semantics, shared with the oracle.)
    doc_stats = index.doc_stats
    n_docs, avgdl = constants or corpus_constants(doc_stats)
    if site is not None:
        doc_stats = doc_stats.filter(F.col("site") == site)
    if n_docs == 0 or not lemmas:
        return _empty_results(spark)

    # collect the surviving terms (≤ a few rows) so the literal term
    # list can be PUSHED INTO the postings parquet scan — row-group
    # pruning via term min/max stats (postings are written term-sorted,
    # postings.write_index) instead of a full scan feeding the join
    qrows = surviving_terms(spark, index.term_stats, lemmas, n_docs).collect()
    n_terms = len(qrows)
    if n_terms == 0:
        return _empty_results(spark)
    qterms = spark.createDataFrame(qrows)
    term_list = [r["term"] for r in qrows]

    # project to the classic (term, doc_id, tf) shape: a MATERIALIZED
    # postings table carries doclen/ttf/tlen in-row for the segment
    # pack (explode_term_counts), and the unprojected join against
    # doc_stats would make `doclen` ambiguous
    matched = index.postings.select("term", "doc_id", "tf").filter(
        F.col("term").isin(term_list)
    ).join(F.broadcast(qterms), "term")
    # site filter / doclen come from doc_stats; inner join also drops
    # postings of docs outside the site filter
    matched = matched.join(doc_stats.select("doc_id", "url", "doclen"), "doc_id")

    if mode == "bm25":
        contrib = bm25_term_score(
            n_docs=F.lit(float(n_docs)), avgdl=F.lit(avgdl)
        )
        if boosts:
            # literal CASE over ≤ a few query terms — stays inside
            # whole-stage codegen, no extra join
            weight = F.lit(1.0)
            for t, bw in sorted(boosts.items()):
                weight = F.when(F.col("term") == t, F.lit(float(bw))) \
                    .otherwise(weight)
            contrib = contrib * weight
        contrib = contrib.alias("w")
        per_doc = matched.select("doc_id", "url", "term", contrib).groupBy(
            "doc_id", "url"
        )
        agg = per_doc.agg(
            F.sum("w").alias("score"), F.count(F.lit(1)).alias("n_hit")
        )
    elif mode == "legacy":
        # reference scoring: sum(rank)/max(rank), ApiService.java:130-142
        agg = matched.groupBy("doc_id", "url").agg(
            (F.sum("tf").cast("double") / F.max("tf")).alias("score"),
            F.count(F.lit(1)).alias("n_hit"),
        )
    else:
        raise ValueError(f"unknown mode: {mode}")

    if conjunctive:
        # k-of-n relational division (J3): postings are unique per
        # (term, doc) so count == distinct-count
        agg = agg.filter(F.col("n_hit") == n_terms)
    return agg.select("url", "doc_id", "score")


def parse_boosted_query(query: str) -> tuple[str, dict[str, float]]:
    """Lucene `term^2.5` boost syntax → (query with carets stripped,
    {lemma: weight}). The weight applies to every lemma the boosted
    token analyzes to; a lemma boosted twice keeps the larger weight.
    Unboosted tokens pass through untouched."""
    import re

    boosts: dict[str, float] = {}
    plain: list[str] = []
    for tok in query.split():
        m = re.fullmatch(r"(.+)\^(\d+(?:\.\d+)?)", tok)
        if m:
            w = float(m.group(2))
            if w <= 0:
                # every other boost entry point (wand kernels,
                # service.search) rejects non-positive weights; a
                # silent pass-through here would leave the literal
                # "term^0" token in the rebuilt query string
                raise ValueError(f"non-positive boost: {tok!r}")
            for lem in lemmatize_query(m.group(1)):
                boosts[lem] = max(w, boosts.get(lem, 0.0))
            plain.append(m.group(1))
        else:
            plain.append(tok)
    return " ".join(plain), boosts


def search(
    spark,
    index: IndexTables,
    query: str,
    k: int = 20,
    offset: int = 0,
    site: str | None = None,
    mode: str = "bm25",
    conjunctive: bool = True,
    constants: tuple[int, float] | None = None,
    boosts: dict[str, float] | None = None,
    after: tuple[float, int] | None = None,
) -> DataFrame:
    """Top-k search → DataFrame(url, doc_id, score) ordered by
    (score desc, url asc), sliced [offset, offset+k).
    `boosts` {lemma: weight}: per-term query boosts (see
    _search_candidates / parse_boosted_query).
    `after` = (score, doc_id): cursor pagination — the top-k rows
    strictly after the cursor in the total order; replaces `offset`
    (which materializes offset+k rows and is bounded by MAX_OFFSET —
    the docstring's named deep-pagination fix IS this cursor). Scores
    are reproduced deterministically by the same plan, so a cursor
    taken from this path's previous page filters exactly; don't mix
    with packed-path cursors (last-ulp float differences)."""
    if k < 0 or offset < 0:
        raise ValueError(f"k and offset must be >= 0 (got k={k}, offset={offset})")
    if offset > MAX_OFFSET:
        # the offset slice materializes offset+k rows on the driver —
        # deep pagination: use `after` (score cursor) instead
        raise ValueError(f"offset {offset} > MAX_OFFSET {MAX_OFFSET}")
    if after is not None and offset:
        raise ValueError("search_after replaces offset — pass one")
    cand = _search_candidates(
        spark, index, query, site=site, mode=mode, conjunctive=conjunctive,
        constants=constants, boosts=boosts,
    )
    if after is not None:
        cs, cd = float(after[0]), int(after[1])
        cand = cand.filter(
            (F.col("score") < F.lit(cs))
            | ((F.col("score") == F.lit(cs)) & (F.col("doc_id") > F.lit(cd)))
        )
    # deterministic total order: (score desc, doc_id asc) — the same
    # tie-break the packed/WAND path and the oracle use (rank-identity)
    out = cand.orderBy(F.desc("score"), F.asc("doc_id"))
    rows_needed = offset + k
    out = out.limit(rows_needed)  # TakeOrderedAndProject: distributed top-k heap
    if offset:
        # offset is a driver-side slice of the top (offset+k) rows —
        # same as the reference's list slice (SearchResponse.java:42-50)
        sliced = out.collect()[offset:]
        return spark.createDataFrame(sliced, out.schema) if sliced else _empty_results(spark)
    return out


def search_with_snippets(
    spark,
    index: IndexTables,
    docs_text: DataFrame,
    query: str,
    k: int = 20,
    offset: int = 0,
    site: str | None = None,
    mode: str = "bm25",
    radius: int = 3,
    constants: tuple[int, float] | None = None,
) -> DataFrame:
    """Full reference search response (ApiService.java:82-146 +
    SnippetMapper.java:13-142): top-k + highlighted snippet per hit.

    `docs_text` is any frame with (doc_id, text) — e.g. prepare_docs
    output. The snippet pandas UDF runs on ≤ k rows only (the top-k
    frame is broadcast into the corpus join, so the scan that fetches
    text for the winners is a broadcast-semi join, never a shuffle of
    the corpus)."""
    from ..functions.udfs import snippet_udf

    winners = search(
        spark, index, query, k=k, offset=offset, site=site, mode=mode,
        constants=constants,
    )
    lemmas = lemmatize_query(query)
    snip = snippet_udf(lemmas, radius)
    return (
        docs_text.select("doc_id", "text")
        .join(F.broadcast(winners), "doc_id")
        .select(
            "url", "doc_id", "score", snip(F.col("text")).alias("snippet")
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
    )


def expand_synonyms(
    lemmas: list[str],
    synonyms: dict[str, list[str]],
    weight: float = 0.5,
) -> tuple[list[str], dict[str, float]]:
    """Query-time synonym expansion (the classic OR-expansion-with-
    discount): each query lemma pulls in its synonym lemmas at reduced
    weight → (expanded lemma list, {lemma: boost}). Originals keep
    weight 1.0 and always win over a synonym mapping of themselves;
    a lemma synonym to two originals keeps one discounted slot.
    `synonyms` keys and values are LEMMAS (run the dictionary through
    the analyzer offline). Retrieval over the expansion is DISJUNCTIVE
    by construction — a conjunctive query would demand every synonym,
    which is the opposite of expansion; use the boolean engine
    ((a OR syn_a) AND (b OR syn_b)) when AND semantics must survive."""
    if not (0.0 < weight <= 1.0):
        raise ValueError(f"synonym weight must be in (0, 1] (got {weight})")
    out = list(lemmas)
    boosts: dict[str, float] = {t: 1.0 for t in lemmas}
    for t in lemmas:
        for s in synonyms.get(t, ()):
            if s not in boosts:
                out.append(s)
                boosts[s] = weight
    return out, boosts


def search_with_synonyms(
    spark,
    index: IndexTables,
    query: str,
    synonyms: dict[str, list[str]],
    weight: float = 0.5,
    k: int = 20,
    offset: int = 0,
    constants: tuple[int, float] | None = None,
) -> DataFrame:
    """Synonym-expanded disjunctive BM25 search → DataFrame(url,
    doc_id, score): the query's lemmas plus their synonyms, synonym
    contributions discounted by `weight` (expand_synonyms), scored by
    the ordinary boosted candidate frame. Relational spec twin of the
    packed path (search_packed_fused(lemmas=…, boosts=…) with
    conjunctive=False serves the same expansion from the segments;
    contract q_synonym_search is the DuckDB oracle)."""
    if k < 0 or offset < 0:
        raise ValueError(f"k and offset must be >= 0 (got k={k}, offset={offset})")
    if offset > MAX_OFFSET:
        raise ValueError(f"offset {offset} > MAX_OFFSET {MAX_OFFSET}")
    lemmas, boosts = expand_synonyms(
        lemmatize_query(query), synonyms, weight
    )
    cand = _search_candidates(
        spark, index, query, conjunctive=False, constants=constants,
        boosts=boosts, lemmas=lemmas,
    )
    out = (
        cand.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(offset + k)
    )
    if offset:
        sliced = out.collect()[offset:]
        return (
            spark.createDataFrame(sliced, out.schema)
            if sliced else _empty_results(spark)
        )
    return out


def search_collapsed(
    spark,
    index: IndexTables,
    query: str,
    n_per_site: int,
    k: int = 20,
    offset: int = 0,
    mode: str = "bm25",
    conjunctive: bool = True,
    constants: tuple[int, float] | None = None,
) -> DataFrame:
    """Per-site result diversification ("host collapsing"): the ranked
    result list keeps at most `n_per_site` hits per site, then the top
    k of what survives → DataFrame(url, doc_id, score, site) ordered
    by (score desc, doc_id asc), sliced [offset, offset+k).

    This is the RELATIONAL form — the executable spec the DuckDB
    oracle replays (contract q_search_collapsed) and the rank-identity
    twin of the packed path (index.wand search_packed collapse_n=…,
    which serves it from compressed segments with per-task memory
    bounded by k·n). Shape here: one extra shuffle partitioning the
    scored candidates by site for the row_number cap (the window's
    state is a running counter, not a buffer), then the usual
    TakeOrderedAndProject top-k. NOTE the cap must run over ALL scored
    candidates — a raw-score global top-(k·n) pre-cut would be WRONG
    (one site can fill any raw prefix; a post-collapse winner may sit
    arbitrarily deep in raw rank), which is exactly why the packed
    kernel caps per-shard before its k·n cut rather than after."""
    from pyspark.sql import Window

    if n_per_site < 1:
        raise ValueError(f"n_per_site must be >= 1 (got {n_per_site})")
    if k < 0 or offset < 0:
        raise ValueError(f"k and offset must be >= 0 (got k={k}, offset={offset})")
    if offset > MAX_OFFSET:
        raise ValueError(f"offset {offset} > MAX_OFFSET {MAX_OFFSET}")
    cand = _search_candidates(
        spark, index, query, mode=mode, conjunctive=conjunctive,
        constants=constants,
    )
    w = Window.partitionBy("site").orderBy(F.desc("score"), F.asc("doc_id"))
    out = (
        cand.join(index.doc_stats.select("doc_id", "site"), "doc_id")
        .withColumn("site_rank", F.row_number().over(w))
        .filter(F.col("site_rank") <= n_per_site)
        .select("url", "doc_id", "score", "site")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(offset + k)
    )
    if offset:
        sliced = out.collect()[offset:]
        return (
            spark.createDataFrame(sliced, out.schema)
            if sliced
            else empty_df(spark, "url string, doc_id long, score double, "
                                 "site string")
        )
    return out


def search_facets(
    spark,
    index: IndexTables,
    query: str,
    top: int = 10,
    conjunctive: bool = True,
    constants: tuple[int, float] | None = None,
) -> DataFrame:
    """Per-site facet counts of the match set ("N results from site
    X") → DataFrame(site, n) ordered (n desc, site asc), top `top`.
    Relational spec twin of index.wand.facet_counts_packed (rank
    identity pinned by tests/test_facets.py); one groupBy(site)
    shuffle over the match set with map-side combine, then a
    TakeOrderedAndProject — no sort of the full facet table."""
    cand = _search_candidates(
        spark, index, query, conjunctive=conjunctive, constants=constants,
    )
    return (
        cand.join(index.doc_stats.select("doc_id", "site"), "doc_id")
        .groupBy("site")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("site"))
        .limit(top)
    )


def match_count(spark, index: IndexTables, query: str,
                site: str | None = None,
                constants: tuple[int, float] | None = None) -> int:
    """A5: total matches before pagination (reference:
    ApiService.java:104-113). Counts the pre-sort candidate frame —
    the plan contains no Sort/TakeOrdered (counting needs no order)."""
    return _search_candidates(
        spark, index, query, site=site, constants=constants
    ).count()


def empty_df(spark, cols: str) -> DataFrame:
    """Zero-row frame as a LocalRelation (pure SQL) — avoids the RDD
    parallelize path createDataFrame([]) takes (~2 s cold), so empty
    query results (stop-only / pruned / absent terms) return in
    milliseconds. `cols` = 'name type, ...'."""
    select = ", ".join(
        f"CAST(NULL AS {t}) AS {n}"
        for n, t in (c.strip().rsplit(" ", 1) for c in cols.split(","))
    )
    return spark.sql(f"SELECT {select} WHERE 1=0")


def _empty_results(spark) -> DataFrame:
    return empty_df(spark, "url string, doc_id long, score double")
