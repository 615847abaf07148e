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


def prepare_docs(docs: DataFrame, use_html: bool = False) -> DataFrame:
    """Corpus → deduped (doc_id, url, site, text, lemmas).

    * dedup D2 (reference: WebPage.hasLink crawl-tree dedup) —
      dropDuplicates on url;
    * doc_id = xxhash64(url): deterministic, cluster-stable 64-bit id
      (no auto-increment at 10^12 scale; reference used IDENTITY pks);
    * site = url host (reference scopes the index per site.url).
    """
    text_col = extract_text_udf(F.col("html")) if use_html else F.col("text")
    return (
        docs.dropDuplicates(["url"])
        .select(
            F.xxhash64("url").alias("doc_id"),
            "url",
            F.regexp_extract("url", r"^[a-z]+://([^/]+)", 1).alias("site"),
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
    """doc_stats(doc_id, url, site, doclen); doclen = |lemma stream|
    (post stop-filter) — the BM25 length normalizer."""
    return prepared.select(
        "doc_id", "url", "site", F.size("lemmas").cast("long").alias("doclen")
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


def write_index(tables: IndexTables, base_path: str) -> None:
    """Persist the relational index. postings sorted within term so
    parquet min/max stats give term-range pruning on scan."""
    (
        tables.postings.repartition("term")
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


def read_index(spark, base_path: str) -> IndexTables:
    return IndexTables(
        postings=spark.read.parquet(f"{base_path}/postings"),
        term_stats=spark.read.parquet(f"{base_path}/term_stats"),
        doc_stats=spark.read.parquet(f"{base_path}/doc_stats"),
    )
