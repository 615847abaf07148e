"""Inverted-index build: docs → postings + term/doc statistics.

Reference pipeline analog: crawl tree → per-page TF map → lemma
dictionary → website_index rows (mapper/LemmaMapper.java:15-43,
mapper/WebsiteIndexMapper.java:34-72, services/IndexingService.java:345-441),
re-expressed as three declarative aggregations Catalyst can optimize:

  postings(term, doc_id, tf)   = explode(lemmas) → groupBy(doc_id, term)
  term_stats(term, df, cf)     = postings → groupBy(term)
  doc_stats(doc_id, url, site, doclen)

Scale notes (100 TB / 10^12 docs):
  * groupBy(doc_id, term) keys are never skewed (doc_id spreads hot
    terms), and Catalyst's partial (map-side) aggregation combines
    within-partition duplicates before the shuffle — the per-doc TF
    map of the reference, for free;
  * groupBy(term) for term_stats IS skewed ('data' ≈ 98% DF) — partial
    aggregation bounds it: each map task emits ≤1 row per term, so the
    hot reducer receives ≤ n_map_tasks rows, not df rows;
  * doc-space sharding for the packed index happens downstream
    (index.segments) — a single global shard function keeps all terms'
    doc spaces aligned so query-time intersection is shard-local;
  * `html` never flows past extraction (column pruning keeps blob I/O
    out of every downstream shuffle).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.udfs import extract_text_udf, tokenize_lemmatize_udf

MAX_REL_FREQ = 0.95  # reference: application.yaml:7 (max-relative-frequency)
BM25_K1 = 1.2
BM25_B = 0.75


@dataclass
class IndexTables:
    """The relational index: reference tables page/lemma/website_index
    re-expressed columnar (entity/Page.java, entity/Lemma.java,
    entity/Index.java)."""

    postings: DataFrame  # term, doc_id, tf
    term_stats: DataFrame  # term, df, cf
    doc_stats: DataFrame  # doc_id, url, site, doclen


def filter_valid_pages(docs: DataFrame) -> DataFrame:
    """F2 + F5 (reference: WebsiteMapper.java:55-57 redirect drop;
    WebPage.java:109-111 valid-page guard): keep only fetch-succeeded
    pages with content. `code` is optional in the corpus schema (the
    BASELINE input_hint has no status column — pre-landed corpora are
    usually already 200-only); when present, only code==200 survives.
    Null html AND null text rows are dropped either way."""
    out = docs
    if "code" in docs.columns:
        out = out.filter(F.col("code") == 200)
    has_content = F.lit(False)
    if "html" in docs.columns:
        has_content = has_content | F.col("html").isNotNull()
    if "text" in docs.columns:
        has_content = has_content | F.col("text").isNotNull()
    return out.filter(has_content)


def prepare_docs(docs: DataFrame, use_html: bool = False) -> DataFrame:
    """Corpus → deduped (doc_id, url, site, text, lemmas).

    * URL canonicalization BEFORE dedup (reference F1:
      WebsiteMapper.java:94-130 ?#-strip + WebPage.java:143-167
      trailing-slash leniency): `?utm=...`/`#frag`/trailing-slash
      variants of the same page collapse to one doc — at 100 TB the
      raw-url dedup alone leaves systematic near-duplicates behind;
    * non-HTML file URLs rejected (isFile, WebsiteMapper.java:110-130);
    * dedup D2 (reference: WebPage.hasLink crawl-tree dedup) —
      dropDuplicates on the canonical url;
    * doc_id = xxhash64(canonical url): deterministic, cluster-stable
      64-bit id (no auto-increment at 10^12 scale);
    * site = url host (reference scopes the index per site.url).
    """
    from ..functions.urlnorm import canonical_url, is_file_url

    text_col = extract_text_udf(F.col("html")) if use_html else F.col("text")
    title_col = (
        title_from_html(F.col("html")) if use_html
        else F.lit(None).cast("string")
    )
    return (
        filter_valid_pages(docs)
        .filter(~is_file_url(F.col("url")))
        .withColumn("url", canonical_url(F.col("url")))
        .dropDuplicates(["url"])
        .select(
            F.xxhash64("url").alias("doc_id"),
            "url",
            F.regexp_extract("url", r"^[a-z]+://([^/]+)", 1).alias("site"),
            title_col.alias("title"),
            text_col.alias("text"),
        )
        .withColumn("lemmas", tokenize_lemmatize_udf(F.col("text")))
    )


def prepare_docs_native(
    docs: DataFrame,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    url_col: str | None = None,
    site_col: str | None = None,
) -> DataFrame:
    """Adapter for pre-cleaned corpora (e.g. the driver's `documents`
    table): whitespace tokenization as a NATIVE column expression —
    zero Python in the build, whole-stage codegen end-to-end. Use the
    UDF path (prepare_docs) only when lemmatization/HTML semantics are
    required."""
    did = F.col(doc_id_col).cast("long").alias("doc_id")
    url = (F.col(url_col) if url_col else F.col(doc_id_col).cast("string")).alias("url")
    site = (F.col(site_col) if site_col else F.lit(None).cast("string")).alias("site")
    lemmas = F.filter(F.split(F.col(text_col), " "), lambda t: t != "").alias("lemmas")
    return docs.select(did, url, site, lemmas)


def prepare_docs_counts(docs: DataFrame, use_html: bool = True) -> DataFrame:
    """Corpus → deduped (doc_id, url, site, term_counts) with the
    per-doc TF map computed in the UDF (see materialize_index).

    Dedup (D2) runs AFTER the UDF on purpose: dedup-first would
    shuffle the full html+text blobs (the whole corpus) through the
    exchange, while dedup-after shuffles only (doc_id, url, site,
    term_counts) — ~3× less bytes — and lets the UDF run map-side
    straight off the scan. Duplicate urls carry identical text, so
    which copy survives is irrelevant; doc_id = xxhash64(url) makes
    the dedup key a fixed-width long. URL canonicalization (?#-strip,
    trailing slash, file reject — see prepare_docs) runs before the
    UDF: it is pure column math on the scan, adds no shuffle, and
    makes doc_id the canonical identity."""
    from ..functions.udfs import (
        extract_text_udf,
        term_counts_fielded_udf,
        term_counts_udf,
    )
    from ..functions.urlnorm import canonical_url, is_file_url

    text_col = extract_text_udf(F.col("html")) if use_html else F.col("text")
    title_col = (
        title_from_html(F.col("html")) if use_html
        else F.lit(None).cast("string")
    )
    if use_html:
        # body TF map AND the title-field layer (packed BM25F) in ONE
        # UDF evaluation: ttfs comes back aligned with terms, so the
        # posting explode just zips a third array — no second analyzer
        # pass, no per-posting-row map lookup, and the field layer
        # rides the existing doc_id joins downstream (segments.py
        # build_segments in-row fast path)
        tc = term_counts_fielded_udf(text_col, title_col)
        counts_cols = [
            F.struct(
                F.col("tc.terms").alias("terms"),
                F.col("tc.tfs").alias("tfs"),
            ).alias("term_counts"),
            F.col("tc.ttfs").alias("ttfs"),
            F.col("tc.tlen").cast("long").alias("tlen"),
        ]
    else:
        tc = term_counts_udf(text_col)
        counts_cols = [
            F.struct(
                F.col("tc.terms").alias("terms"),
                F.col("tc.tfs").alias("tfs"),
            ).alias("term_counts")
        ]
    return (
        filter_valid_pages(docs)
        .filter(~is_file_url(F.col("url")))
        .withColumn("url", canonical_url(F.col("url")))
        .select(
            F.xxhash64("url").alias("doc_id"),
            "url",
            F.regexp_extract("url", r"^[a-z]+://([^/]+)", 1).alias("site"),
            title_col.alias("title"),
            tc.alias("tc"),
        )
        .select("doc_id", "url", "site", "title", *counts_cols)
        .dropDuplicates(["doc_id"])
    )


def title_from_html(html_col):
    """Page <title> for the serving response (reference SearchItem
    carries the page title, model/response/SearchItem + the jsoup
    doc.title() in IndexingService): first <title> element,
    whitespace-trimmed, binary html decoded as UTF-8. Pure column
    math on the scan — no UDF, no shuffle."""
    # NOT F.trim: Spark trim strips only ' ' (0x20), so a
    # "<title>\nFoo" keeps its newline — regexp-trim all whitespace
    return F.regexp_replace(
        F.regexp_extract(
            html_col.cast("string"), r"(?is)<title[^>]*>(.*?)</title>", 1
        ),
        r"^\s+|\s+$",
        "",
    )


def explode_term_counts(prepared: DataFrame) -> DataFrame:
    """(doc_id, term_counts struct<terms,tfs>) → (doc_id, term, tf,
    doclen[, ttf, tlen]).

    When the prepared frame carries the aligned title-field array
    (`ttfs`, see prepare_docs_counts / term_counts_fielded_udf), each
    posting row also gets its title-field tf (`ttf`, 0 when the term
    is not in the title) by riding the SAME arrays_zip explode — the
    packed BM25F field layer is a pure projection of the one
    extraction pass: no second title pass, no join, no per-row map.

    The per-DOC lengths (doclen = Σ tf; tlen = analyzed title length)
    ride every posting row too: they are known before the explode
    (native array sum / the extraction UDF), so carrying them in-row
    lets the segment pack consume postings with ZERO doc-side join —
    the alternative is a sort-merge join of the full posting stream
    against doc_stats on doc_id, a second corpus-scale shuffle inside
    the pack stage (measured ~40% of pack wall at 2.4M docs)."""
    fielded = "ttfs" in prepared.columns
    zip_cols = ["term_counts.terms", "term_counts.tfs"] + (
        ["ttfs"] if fielded else []
    )
    doc_cols = [doclen_from_counts(prepared).alias("doclen")] + (
        [F.coalesce(F.col("tlen"), F.lit(0)).cast("long").alias("tlen")]
        if fielded else []
    )
    return prepared.select(
        "doc_id",
        *doc_cols,
        F.explode(F.arrays_zip(*zip_cols)).alias("tc"),
    ).select(
        "doc_id",
        F.col("tc.terms").alias("term"),
        F.col("tc.tfs").alias("tf"),
        "doclen",
        *([F.col("tc.ttfs").alias("ttf"), F.col("tlen")] if fielded else []),
    )


def doclen_from_counts(prepared: DataFrame):
    """Σ tf per doc as a Column expression over the term_counts struct."""
    return F.aggregate(
        F.col("term_counts.tfs"), F.lit(0), lambda acc, x: acc + x
    ).cast("long")


def build_postings(prepared: DataFrame) -> DataFrame:
    """(doc_id, lemmas[]) → postings(term, doc_id, tf). A1."""
    return (
        prepared.select("doc_id", F.explode("lemmas").alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).cast("int").alias("tf"))
    )


def build_term_stats(postings: DataFrame) -> DataFrame:
    """postings → term_stats(term, df, cf). A2 (corrected DF intent:
    df = count of docs containing the term; the reference's batch path
    mis-computed this — WebPage.java:89-107 — its incremental path and
    its consumers define the intent)."""
    return postings.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),  # one row per (term, doc) ⇒ count = DF
        F.sum("tf").alias("cf"),
    )


def build_doc_stats(prepared: DataFrame) -> DataFrame:
    """doc_stats(doc_id, url, site, title, doclen); doclen = |lemma
    stream| (post stop-filter) — the BM25 length normalizer; title =
    serving metadata (reference SearchItem.title)."""
    title = (
        F.col("title") if "title" in prepared.columns
        else F.lit(None).cast("string")
    ).alias("title")
    return prepared.select(
        "doc_id", "url", "site", title,
        F.size("lemmas").cast("long").alias("doclen"),
    )


def build_index_prepared(prepared: DataFrame) -> IndexTables:
    postings = build_postings(prepared)
    return IndexTables(
        postings=postings,
        term_stats=build_term_stats(postings),
        doc_stats=build_doc_stats(prepared),
    )


def build_index(docs: DataFrame, use_html: bool = False) -> IndexTables:
    return build_index_prepared(prepare_docs(docs, use_html=use_html))


def materialize_index(
    spark, docs: DataFrame, base_path: str, use_html: bool = True,
    prepared: DataFrame | None = None,
) -> IndexTables:
    """Single-pass index materialization — the production build path.

    The lazy build_index() DAG re-runs the extract/tokenize UDFs for
    every downstream action (postings, term_stats and doc_stats are
    three separate writes ⇒ 3× the Python work). Here the token stream
    crosses the Python boundary exactly ONCE:

      1. prepared → postings parquet            (the only UDF pass)
      2. postings parquet → term_stats          (columnar re-scan)
      3. postings parquet → doclen ⟕ docs meta → doc_stats
         (docs meta = doc_id/url/site — column pruning removes the
         text/html columns AND the UDFs from this scan entirely)

    TF is computed INSIDE the UDF (per-doc Counter — the reference's
    per-page TF map, LemmaMapper.java:15-43): term frequency is
    doc-local, so the exploded-token groupBy(term, doc_id) shuffle of
    the lazy path (|tokens| rows ≈ 15× |postings|) never happens; the
    only wide op left is the salted layout repartition of the final
    postings.

    doclen = Σ tf per doc ≡ size(lemmas) (same post-stop-filter token
    count); docs with zero lemmas keep doclen = 0 via the left join.
    """
    from ..functions.udfs import term_counts_udf

    if prepared is None:
        prepared = prepare_docs_counts(docs, use_html=use_html)
    elif "term_counts" not in prepared.columns:
        keep = ["doc_id", "url", "site"] + (
            ["title"] if "title" in prepared.columns else []
        )
        prepared = prepared.select(
            *keep, term_counts_udf(F.col("text")).alias("term_counts")
        )
    (
        explode_term_counts(prepared)
        .repartition(F.col("term"), _salt_col())
        .sortWithinPartitions("term", "doc_id")
        .write.mode("overwrite")
        .parquet(f"{base_path}/postings")
    )
    postings = spark.read.parquet(f"{base_path}/postings")

    def _write_term_stats():
        build_term_stats(postings).write.mode("overwrite").parquet(
            f"{base_path}/term_stats"
        )

    def _write_doc_stats():
        # tlen (title token count, the BM25F length normalizer) falls
        # out of the SAME postings aggregation as doclen: title terms
        # are a subset of body postings (extracted text contains the
        # <title> text), so Σ ttf per doc ≡ the analyzed title length
        # — no second title pass, no html re-scan in this job. A doc
        # with zero postings has zero non-stop title lemmas too, so
        # the left-join fillna(0) is exact for tlen as well.
        aggs = [F.sum("tf").cast("long").alias("doclen")]
        if "ttf" in postings.columns:
            aggs.append(F.sum("ttf").cast("long").alias("tlen"))
        doclen = postings.groupBy("doc_id").agg(*aggs)
        title = (
            F.col("title") if "title" in prepared.columns
            else F.lit(None).cast("string")
        ).alias("title")
        # UDFs pruned out of this scan (title is native column math)
        meta = prepared.select("doc_id", "url", "site", title)
        fill = ["doclen"] + (["tlen"] if "ttf" in postings.columns else [])
        (
            meta.join(doclen, "doc_id", "left")
            .fillna(0, subset=fill)
            .repartition("doc_id")
            .sortWithinPartitions("doc_id")
            .write.mode("overwrite")
            .parquet(f"{base_path}/doc_stats")
        )

    # independent derived tables — submit as concurrent Spark jobs so
    # their fixed job/commit latencies overlap (FAIR-ish pipelining;
    # both read the just-written postings parquet)
    import concurrent.futures

    with concurrent.futures.ThreadPoolExecutor(max_workers=2) as ex:
        futs = [ex.submit(_write_term_stats), ex.submit(_write_doc_stats)]
        for f in futs:
            f.result()
    return read_index(spark, base_path)


def _salt_col(n_salts: int = 64):
    """Skew salt for the postings layout shuffle (north rule:
    "salted-hash-partitioned, skew-aware for stopword-heavy terms").
    A ~98%-DF stopword's postings ≈ the corpus size; partitioning by
    term alone serializes that term's sort+write on ONE task. Salting
    by hash(doc_id)%n spreads every hot term across n writers while
    sortWithinPartitions('term','doc_id') keeps each file term-sorted,
    so parquet min/max row-group pruning on term still works."""
    return F.pmod(F.hash("doc_id"), F.lit(n_salts))


def write_index(tables: IndexTables, base_path: str) -> None:
    """Persist the relational index. postings sorted within term so
    parquet min/max stats give term-range pruning on scan."""
    (
        tables.postings.repartition(F.col("term"), _salt_col())
        .sortWithinPartitions("term", "doc_id")
        .write.mode("overwrite")
        .parquet(f"{base_path}/postings")
    )
    tables.term_stats.write.mode("overwrite").parquet(f"{base_path}/term_stats")
    (
        tables.doc_stats.repartition("doc_id")
        .sortWithinPartitions("doc_id")
        .write.mode("overwrite")
        .parquet(f"{base_path}/doc_stats")
    )


def write_index_bucketed(
    tables: IndexTables, db: str = "searchidx", n_buckets: int = 32
) -> None:
    """Persist postings + doc_stats as tables BUCKETED by doc_id:
    the BM25 scoring join (postings ⋈ doc_stats on doc_id) then runs
    with NO exchange on either side — both scans are pre-partitioned
    by the join key. At 10^12 docs that join is the one unavoidable
    big-big join of the relational path; bucketing removes its shuffle
    entirely (tests/test_bucketed_join.py asserts the plan).

    Uses the session warehouse (saveAsTable) — bucketing metadata
    lives in the catalog, which plain .parquet() paths can't carry.
    """
    spark = tables.postings.sparkSession
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    (
        tables.postings.write.mode("overwrite")
        .bucketBy(n_buckets, "doc_id")
        .sortBy("doc_id")
        .saveAsTable(f"{db}.postings")
    )
    (
        tables.doc_stats.write.mode("overwrite")
        .bucketBy(n_buckets, "doc_id")
        .sortBy("doc_id")
        .saveAsTable(f"{db}.doc_stats")
    )


def read_index(spark, base_path: str) -> IndexTables:
    return IndexTables(
        postings=spark.read.parquet(f"{base_path}/postings"),
        term_stats=spark.read.parquet(f"{base_path}/term_stats"),
        doc_stats=spark.read.parquet(f"{base_path}/doc_stats"),
    )
