"""Web link graph: anchor extraction, edge resolution, PageRank.

The reference engine ranks purely lexically (BM25-style relevance,
services/ApiService.java) — at web scale every production engine also
carries a QUERY-INDEPENDENT static rank computed from the hyperlink
graph (Brin & Page 1998). This module adds that layer Spark-first:

  * ``extract_links``  — (src, dst, anchor) from raw html, pure native
    columns (regexp_extract_all over the utf-8-cast binary, explode,
    relative-href resolution against the source site) — zero Python in
    the hot path, whole-stage codegen end to end;
  * ``resolve_edges``  — drop hrefs that point outside the corpus
    (dead links) with a left-semi join against the url set, dedup,
    drop self-loops;
  * ``pagerank``       — iterative PageRank with dangling-mass
    redistribution, computed in EXACT INTEGER arithmetic (rank mass
    scaled to ``scale`` and floor-divided at every step) so the result
    is bit-identical under any partitioning, any join order, any
    engine — no float-summation order sensitivity. This is what makes
    a full DuckDB oracle possible (``pagerank_oracle_sql`` unrolls the
    same recurrence as a WITH chain);
  * ``anchor_postings`` — inbound anchor-text term frequencies per
    target page (the classic "anchor text describes the target better
    than the target describes itself" signal; Brin & Page §2.2);
  * ``build_static_rank`` / ``write_static_rank`` — PageRank keyed by
    the index's doc identity, persisted where the warm service
    (service.SearchService.search(blend=w)) serves blended ranking;
  * ``anchor_term_counts`` / ``build_index_with_anchors`` /
    ``prepared_with_anchors`` — anchor-text VIRTUAL-DOCUMENT indexing:
    inbound anchor lemmas merged into the target's TF (tf' = tf +
    w·atf), feeding either the lazy IndexTables path or the
    production single-pass materialize/packed build unchanged.

Scale notes (10^12 docs): extraction is map-only. ``resolve_edges`` is
one shuffle keyed by dst url (hash-spread; no skew worse than the
in-degree distribution, and the semi-join build side is the corpus url
set, never collected). Each PageRank iteration is two shuffles (src-keyed
join, dst-keyed groupBy) over the edge list; the rank frame is |V| rows.
Lineage is cut with localCheckpoint every iteration (same contract as
dedup.connected_components) so iteration k never re-executes k-1. The
dangling mass is a one-row aggregate cross-joined back (Spark broadcasts
it) — nothing collects to the driver inside the loop. String node ids
are joined as-is here; a production deployment would dictionary-encode
urls to int64 once (postings already do this for doc ids) — the
recurrence is id-type-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# default damping 0.85 as the exact rational 85/100, and a mass scale
# large enough that floor-loss is negligible yet 100·scale < 2^63
PR_D_NUM = 85
PR_D_DEN = 100
PR_SCALE = 10**12

# ONE combined pattern matching well-formed anchor tags; href and
# anchor text are then extracted from each matched tag string. Two
# independent regexp_extract_all arrays (href-anywhere + anchor-tag)
# would MISALIGN on real-world html — any href outside a well-formed
# <a ...>text</a> (a <link href>, a nested-markup anchor) shifts every
# subsequent pair, crediting anchor text to the wrong target.
_A_TAG_RE = r'<a href="[^"]*"[^>]*>[^<]*</a>'
_HREF_RE = r'href="([^"]+)"'
_ANCHOR_TEXT_RE = r">([^<]*)</a>"
_SITE_RE = r"^(https?://[^/]+)"


def extract_links(
    docs: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(src, dst, anchor): one row per <a href> occurrence in each page.

    Relative hrefs (``/path``) resolve against the source page's
    scheme+host; absolute http(s) hrefs pass through; anything else
    (mailto:, javascript:, fragment-only) is dropped. Self-links are
    dropped. ``anchor`` is the tag's inner text — only WELL-FORMED
    ``<a href="...">text</a>`` tags match (no nested tags in the
    generated corpus; a production extractor would strip them first),
    and href/anchor come from the SAME matched tag string, so a stray
    href elsewhere in the page can never shift the pairing.

    One regexp pass over the utf-8 view of the binary html column +
    two per-tag extracts. Map-only — no shuffle, no Python.
    """
    html = F.col(html_col).cast("string")
    tag = F.explode(
        F.regexp_extract_all(html, F.lit(_A_TAG_RE), F.lit(0))
    ).alias("tag")
    site = F.regexp_extract(F.col("src"), _SITE_RE, 1)
    href = F.regexp_extract(F.col("tag"), _HREF_RE, 1)
    anchor = F.regexp_extract(F.col("tag"), _ANCHOR_TEXT_RE, 1)
    dst = (
        F.when(href.startswith("http://") | href.startswith("https://"), href)
        .when(href.startswith("/"), F.concat(site, href))
        .otherwise(F.lit(None).cast("string"))
    )
    return (
        docs.select(F.col(url_col).alias("src"), tag)
        .select("src", dst.alias("dst"), anchor.alias("anchor"))
        .filter(F.col("dst").isNotNull() & (F.col("dst") != F.col("src")))
    )


def resolve_edges(links: DataFrame, docs: DataFrame, url_col: str = "url") -> DataFrame:
    """(src, dst): distinct resolvable edges — dst must be a corpus url.

    One dst-keyed shuffle (left-semi against the url set) + distinct.
    The url set stays distributed; never broadcast (it is the corpus).
    """
    urls = docs.select(F.col(url_col).alias("dst"))
    return (
        links.select("src", "dst")
        .join(urls, "dst", "left_semi")
        .distinct()
    )


def anchor_postings(links: DataFrame) -> DataFrame:
    """(url, term, atf): inbound anchor-text term frequency per target.

    The target page is described by the words OTHER pages use to link
    to it. Tokenization = whitespace split of the anchor text (matching
    the contract tokenizer); one dst-keyed shuffle.
    """
    terms = F.filter(F.split(F.lower(F.col("anchor")), " "), lambda t: t != "")
    return (
        links.select(F.col("dst").alias("url"), F.explode(terms).alias("term"))
        .groupBy("url", "term")
        .agg(F.count(F.lit(1)).alias("atf"))
    )


def pagerank(
    edges: DataFrame,
    nodes: DataFrame,
    n_iter: int = 3,
    d_num: int = PR_D_NUM,
    d_den: int = PR_D_DEN,
    scale: int = PR_SCALE,
    node_col: str = "node",
) -> DataFrame:
    """(node, rank): PageRank after exactly ``n_iter`` iterations, in
    exact integer arithmetic.

    Recurrence (all operations BIGINT, DIV = floor division; every
    quantity below 100·scale < 2^63 so no overflow):

        r_0(v)   = scale DIV N
        out(u)   = # distinct out-edges of u        (from ``edges``)
        dang_t   = sum of r_t(u) over u with out(u) = 0
        c_t(v)   = sum over (u,v) in E of  r_t(u) DIV out(u)
        r_{t+1}(v) = ((d_den - d_num)·(scale DIV N)) DIV d_den
                   + (d_num·(c_t(v) + dang_t DIV N)) DIV d_den

    Because every step floors and every sum is over BIGINTs, the result
    is independent of partitioning and summation order — the property
    that lets a DuckDB oracle reproduce it bit-for-bit
    (``pagerank_oracle_sql``). Floor-loss strictly leaks mass (total
    rank ≤ scale), never creates it, so ranks stay bounded.

    ``edges`` must be distinct and self-loop-free (``resolve_edges``
    guarantees both). ``nodes`` is the full vertex set (one column
    ``node_col``) — vertices with no in-links still get teleport mass.
    N is one driver scalar (a count, same budget class as the manifest
    rows); the per-iteration dangling mass stays in-plan as a one-row
    cross-joined aggregate.
    """
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.select(
            F.col(node_col).alias("node"), F.lit(0).cast("long").alias("rank")
        )
    r0 = scale // n_nodes
    teleport = ((d_den - d_num) * r0) // d_den

    # materialize the loop-invariant frames ONCE: without this every
    # iteration's lazy plan re-reads and re-shuffles the full edge
    # list to rebuild out-degrees (n_iter× the edge scan). Same
    # pattern as GraphX: static graph structure persisted, only the
    # rank frame is rewritten per round.
    edges = edges.select("src", "dst").localCheckpoint()
    outdeg = (
        edges.groupBy("src")
        .agg(F.count(F.lit(1)).alias("out"))
        .localCheckpoint()
    )
    ranks = nodes.select(
        F.col(node_col).alias("node"), F.lit(r0).cast("long").alias("rank")
    )
    for _ in range(n_iter):
        with_out = ranks.join(
            outdeg, ranks["node"] == outdeg["src"], "left"
        ).select("node", "rank", "out")
        # one-row dangling-mass aggregate, cross-joined (broadcast) back
        dang = with_out.filter(F.col("out").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0)).cast("long").alias("dang")
        )
        contrib = (
            edges.join(
                with_out.filter(F.col("out").isNotNull()),
                edges["src"] == F.col("node"),
            )
            .select("dst", F.expr("rank DIV out").alias("share"))
            .groupBy("dst")
            .agg(F.sum("share").alias("c"))
        )
        ranks = (
            ranks.select("node")
            .join(contrib, F.col("node") == contrib["dst"], "left")
            .crossJoin(dang)
            .select(
                "node",
                (
                    F.lit(teleport)
                    + F.expr(
                        f"{d_num} * (coalesce(c, 0) + (dang DIV {n_nodes}))"
                        f" DIV {d_den}"
                    )
                ).cast("long").alias("rank"),
            )
            .localCheckpoint()  # cut lineage: iter k never re-runs k-1
        )
    return ranks


def hits(
    edges: DataFrame,
    nodes: DataFrame,
    n_iter: int = 2,
    node_col: str = "node",
) -> DataFrame:
    """(node, hub, auth): Kleinberg HITS after exactly ``n_iter``
    mutual-reinforcement rounds, in EXACT integer arithmetic.

    Un-normalized formulation: h_0 = 1 everywhere; each round sets
    a_t(v) = Σ_{(u,v)∈E} h_{t-1}(u) then h_t(u) = Σ_{(u,v)∈E} a_t(v).
    Without per-round normalization the scores are exact BIGINT
    alternating-path COUNTS — a_t counts length-(2t-1) alternating
    paths ending at v — so rankings equal the classically normalized
    HITS within each round (normalization is a positive scalar), and
    a DuckDB oracle (``hits_oracle_sql``) reproduces them
    bit-for-bit. Overflow bound: values ≤ N^(2·n_iter); callers need
    N^(2·n_iter) < 2^63 (N ≤ 55k at the default 2 rounds). At true
    web scale use ``hits_normalized`` — the per-round floor-div L1
    quantized variant (bit-equal to this form whenever every
    half-round sum stays under its ``scale``).

    Two shuffles per round over the edge list (dst-keyed then
    src-keyed aggregation); edges materialize once; each frame is
    checkpointed so round k never re-executes k-1 (same contract as
    ``pagerank``).
    """
    edges = edges.select("src", "dst").localCheckpoint()
    base = nodes.select(F.col(node_col).alias("node"))
    h = base.select("node", F.lit(1).cast("long").alias("h"))
    a = base.select("node", F.lit(0).cast("long").alias("a"))
    for _ in range(n_iter):
        a_raw = (
            edges.join(h, edges["src"] == h["node"])
            .groupBy("dst")
            .agg(F.sum("h").alias("a_raw"))
        )
        a = (
            base.join(a_raw, base["node"] == a_raw["dst"], "left")
            .select(
                "node",
                F.coalesce(F.col("a_raw"), F.lit(0)).cast("long").alias("a"),
            )
            .localCheckpoint()
        )
        h_raw = (
            edges.join(a, edges["dst"] == a["node"])
            .groupBy("src")
            .agg(F.sum("a").alias("h_raw"))
        )
        h = (
            base.join(h_raw, base["node"] == h_raw["src"], "left")
            .select(
                "node",
                F.coalesce(F.col("h_raw"), F.lit(0)).cast("long").alias("h"),
            )
            .localCheckpoint()
        )
    return h.join(a, "node").select(
        "node", F.col("h").alias("hub"), F.col("a").alias("auth")
    )


def hits_normalized(
    edges: DataFrame,
    nodes: DataFrame,
    n_iter: int = 2,
    node_col: str = "node",
    scale: int = 10**9,
) -> DataFrame:
    """Web-scale HITS (VERDICT r4 #7): the per-round floor-div L1
    quantized normalization the exact form's docstring names, removing
    its N^(2·n_iter) < 2^63 bound.

    Each half-round computes the raw BIGINT sums exactly like ``hits``,
    then quantizes: with S = Σ_v raw(v) (a one-row in-plan broadcast —
    nothing corpus-sized collects) and divisor d = S // scale + 1,

        value(v) = raw(v) // d   (< scale, since d > S/scale ≥ raw/scale)

    All arithmetic stays in BIGINT — d is chosen as a DIVISOR instead
    of computing floor(raw·scale/S), whose raw·scale intermediate
    would need 128-bit. Overflow bound after quantization: every value
    ≤ scale, so the next half-round's sums are ≤ |E|·scale — the
    caller needs |E| · scale < 2^63 (9.2e9 edges at the default
    scale=1e9; lower ``scale`` for denser graphs). S < scale ⇒ d = 1
    ⇒ the round is EXACTLY the un-normalized recurrence, so on graphs
    whose every half-round sum stays under ``scale`` this function is
    bit-equal to ``hits`` (pinned in tests).

    Quantization semantics: within one half-round, raw(v1) ≥ raw(v2)
    ⇒ value(v1) ≥ value(v2) (floor-div by a shared positive d is
    monotone) — quantization can only CREATE ties in that round, never
    invert an order; across rounds the recurrences diverge from the
    exact form by design (that is what keeps the integers bounded).
    Deterministic integer math end-to-end — the DuckDB WITH-chain
    (``hits_normalized_oracle_sql``) replays it bit-for-bit.

    Same plan shape as ``hits``: two keyed aggregations per round plus
    one scalar aggregate per half-round; frames checkpointed so round
    k never re-executes k-1."""
    if scale < 2:
        raise ValueError(f"scale must be >= 2 (got {scale})")
    edges = edges.select("src", "dst").localCheckpoint()
    base = nodes.select(F.col(node_col).alias("node"))
    h = base.select("node", F.lit(1).cast("long").alias("h"))
    a = base.select("node", F.lit(0).cast("long").alias("a"))

    def _quant(frame: DataFrame, col: str) -> DataFrame:
        s = frame.agg(
            F.coalesce(F.sum(col), F.lit(0)).cast("long").alias("s")
        )
        d = s.select(
            (F.expr(f"s div {int(scale)}") + F.lit(1)).alias("d")
        )
        return frame.crossJoin(F.broadcast(d)).select(
            "node", F.expr(f"{col} div d").cast("long").alias(col)
        )

    for _ in range(n_iter):
        a_raw = (
            edges.join(h, edges["src"] == h["node"])
            .groupBy("dst")
            .agg(F.sum("h").alias("a_raw"))
        )
        a = _quant(
            base.join(a_raw, base["node"] == a_raw["dst"], "left")
            .select(
                "node",
                F.coalesce(F.col("a_raw"), F.lit(0)).cast("long")
                .alias("a"),
            ),
            "a",
        ).localCheckpoint()
        h_raw = (
            edges.join(a, edges["dst"] == a["node"])
            .groupBy("src")
            .agg(F.sum("a").alias("h_raw"))
        )
        h = _quant(
            base.join(h_raw, base["node"] == h_raw["src"], "left")
            .select(
                "node",
                F.coalesce(F.col("h_raw"), F.lit(0)).cast("long")
                .alias("h"),
            ),
            "h",
        ).localCheckpoint()
    return h.join(a, "node").select(
        "node", F.col("h").alias("hub"), F.col("a").alias("auth")
    )


def hits_normalized_oracle_sql(
    edges_cte: str, nodes_cte: str, n_iter: int = 2, scale: int = 10**9
) -> str:
    """DuckDB WITH-chain unrolling the quantized ``hits_normalized``
    recurrence — bit-identical: both sides only sum BIGINTs and
    floor-divide by the same shared divisor (DuckDB ``//`` == Spark
    ``div`` on non-negative BIGINTs)."""
    parts = [
        f"WITH edges AS ({edges_cte})",
        f"nodes AS ({nodes_cte})",
        "h0 AS (SELECT node, 1::BIGINT AS h FROM nodes)",
    ]
    for t in range(1, n_iter + 1):
        parts += [
            f"a{t}raw AS (SELECT n.node,"
            f" coalesce(sum(x.h), 0)::BIGINT AS a"
            f" FROM nodes n LEFT JOIN (SELECT e.dst AS d, h.h"
            f" FROM edges e JOIN h{t - 1} h ON e.src = h.node) x"
            f" ON x.d = n.node GROUP BY n.node)",
            f"a{t}d AS (SELECT coalesce(sum(a), 0)::BIGINT // {scale}"
            f" + 1 AS d FROM a{t}raw)",
            f"a{t} AS (SELECT node, (a // d)::BIGINT AS a"
            f" FROM a{t}raw CROSS JOIN a{t}d)",
            f"h{t}raw AS (SELECT n.node,"
            f" coalesce(sum(x.a), 0)::BIGINT AS h"
            f" FROM nodes n LEFT JOIN (SELECT e.src AS s, a.a"
            f" FROM edges e JOIN a{t} a ON e.dst = a.node) x"
            f" ON x.s = n.node GROUP BY n.node)",
            f"h{t}d AS (SELECT coalesce(sum(h), 0)::BIGINT // {scale}"
            f" + 1 AS d FROM h{t}raw)",
            f"h{t} AS (SELECT node, (h // d)::BIGINT AS h"
            f" FROM h{t}raw CROSS JOIN h{t}d)",
        ]
    return (
        ",\n".join(parts)
        + f"\nSELECT h.node, h.h AS hub, a.a AS auth"
        f" FROM h{n_iter} h JOIN a{n_iter} a USING (node)"
    )


def hits_oracle_sql(
    edges_cte: str, nodes_cte: str, n_iter: int = 2
) -> str:
    """DuckDB WITH-chain unrolling the exact ``hits`` recurrence.
    Bit-identical because both sides only sum BIGINTs."""
    parts = [
        f"WITH edges AS ({edges_cte})",
        f"nodes AS ({nodes_cte})",
        "h0 AS (SELECT node, 1::BIGINT AS h FROM nodes)",
    ]
    for t in range(1, n_iter + 1):
        parts += [
            f"a{t} AS (SELECT n.node, coalesce(sum(x.h), 0)::BIGINT AS a"
            f" FROM nodes n LEFT JOIN (SELECT e.dst AS d, h.h"
            f" FROM edges e JOIN h{t - 1} h ON e.src = h.node) x"
            f" ON x.d = n.node GROUP BY n.node)",
            f"h{t} AS (SELECT n.node, coalesce(sum(x.a), 0)::BIGINT AS h"
            f" FROM nodes n LEFT JOIN (SELECT e.src AS s, a.a"
            f" FROM edges e JOIN a{t} a ON e.dst = a.node) x"
            f" ON x.s = n.node GROUP BY n.node)",
        ]
    return (
        ",\n".join(parts)
        + f"\nSELECT h.node, h.h AS hub, a.a AS auth"
        f" FROM h{n_iter} h JOIN a{n_iter} a USING (node)"
    )


def merge_anchor_tf(
    tf: DataFrame, atf: DataFrame, weight: int = 1
) -> DataFrame:
    """tf' = tf + weight·atf over (doc_id, term) — the postings-level
    form of the anchor VIRTUAL-DOCUMENT model (inbound anchor text
    appended ``weight`` times to the target doc before indexing;
    Brin & Page 1998 §2.2). Full-outer: an anchor can introduce a term
    the target never contains — that is the point of the signal.

    One shuffle on (doc_id, term) — both sides are already TF-shaped
    (one row per doc-term), never token-exploded.
    """
    t = tf.select("doc_id", "term", F.col("tf").cast("long").alias("otf"))
    a = atf.select(
        "doc_id", "term",
        (F.lit(weight) * F.col("atf")).cast("long").alias("wtf"),
    )
    return t.join(a, ["doc_id", "term"], "full_outer").select(
        "doc_id", "term",
        (F.coalesce(F.col("otf"), F.lit(0))
         + F.coalesce(F.col("wtf"), F.lit(0))).alias("tf"),
    )


def anchor_term_counts(docs: DataFrame) -> DataFrame:
    """(doc_id, term, atf): inbound anchor-text LEMMA frequencies per
    corpus target, analyzed by the same pipeline as document text
    (term_counts_udf: tokenize → lemmatize → stop-filter), keyed by
    the index identity (xxhash64 of the canonical url).

    Source docs dedup by canonical url BEFORE extraction so a
    duplicated page contributes its anchors once (the index keeps one
    copy of the page; duplicate urls carry identical html, so which
    survives is irrelevant — same argument as prepare_docs_counts).
    Anchors to urls outside the corpus are dropped (left-semi). Per
    target, anchor texts concatenate (order-free: the UDF only
    counts) into ONE analyzer call — the Python boundary sees one row
    per linked-to doc, not one per anchor.
    """
    from ..operators.postings import explode_term_counts

    return (
        explode_term_counts(_anchor_counts_per_target(docs))
        .select("doc_id", "term", F.col("tf").alias("atf"))
    )


def _anchor_counts_per_target(docs: DataFrame) -> DataFrame:
    """(doc_id, term_counts): per-target inbound anchor lemma counts
    (see anchor_term_counts for the semantics and scale shape)."""
    from ..functions.udfs import term_counts_udf
    from ..functions.urlnorm import canonical_url, is_file_url
    from ..operators.postings import filter_valid_pages

    base = (
        filter_valid_pages(docs)
        .filter(~is_file_url(F.col("url")))
        .withColumn("url", canonical_url(F.col("url")))
        .dropDuplicates(["url"])
    )
    links = (
        extract_links(base)
        .select(
            canonical_url(F.col("src")).alias("src"),
            canonical_url(F.col("dst")).alias("dst"),
            "anchor",
        )
        .filter(F.col("src") != F.col("dst"))
        .join(base.select(F.col("url").alias("dst")), "dst", "left_semi")
    )
    return (
        links.groupBy("dst")
        .agg(F.concat_ws(" ", F.collect_list("anchor")).alias("atext"))
        .select(
            F.xxhash64("dst").alias("doc_id"),
            term_counts_udf(F.col("atext")).alias("term_counts"),
        )
    )


def prepared_with_anchors(
    docs: DataFrame, weight: int = 1, use_html: bool = True
) -> DataFrame:
    """prepare_docs_counts frame with inbound anchor lemma counts
    merged into each doc's term_counts map (tf' = tf + w·atf) — the
    PRODUCTION ingredient: feed it to ``materialize_index`` /
    ``build_packed_resumable`` (``build_index.py --anchors W``) and
    the single-pass resumable packed build, WAND, and the service all
    serve the anchor signal with no downstream change.

    The merge is pure native column math (map_zip_with over the two
    TF maps) — no extra Python pass, one doc_id-keyed left join.
    """
    from ..operators.postings import prepare_docs_counts

    prepared = prepare_docs_counts(docs, use_html=use_html)
    ac = _anchor_counts_per_target(docs).select(
        "doc_id", F.col("term_counts").alias("ac")
    )
    empty_m = F.map_from_arrays(
        F.array().cast("array<string>"), F.array().cast("array<int>")
    )
    m_own = F.coalesce(
        F.map_from_arrays("term_counts.terms", "term_counts.tfs"), empty_m
    )
    m_anc = F.coalesce(F.map_from_arrays("ac.terms", "ac.tfs"), empty_m)
    merged = F.map_zip_with(
        m_own,
        m_anc,
        lambda k, a, b: (
            F.coalesce(a, F.lit(0)) + F.lit(weight) * F.coalesce(b, F.lit(0))
        ).cast("int"),
    )
    out = prepared.join(ac, "doc_id", "left")
    if "ttfs" in prepared.columns:
        # the title-field array is aligned with term_counts.terms
        # (term_counts_fielded_udf) — the merge reorders/extends the
        # terms array, so realign: anchor text contributes nothing to
        # the TITLE field (it is body-appended text), so anchor-only
        # terms get ttf 0. One per-doc map build — the anchor path
        # only; the plain build never runs this.
        tmap = F.map_from_arrays("term_counts.terms", "ttfs")
        out = out.withColumn(
            "ttfs",
            F.transform(
                F.map_keys(merged),
                lambda k: F.coalesce(F.element_at(tmap, k), F.lit(0)),
            ),
        )
    return (
        out.withColumn(
            "term_counts",
            F.struct(
                F.map_keys(merged).alias("terms"),
                F.map_values(merged).alias("tfs"),
            ),
        )
        .drop("ac")
    )


def build_index_with_anchors(
    docs: DataFrame, weight: int = 1, use_html: bool = True
):
    """IndexTables over the anchor-augmented corpus: every doc indexed
    as if the text of each inbound anchor were appended ``weight``
    times (tf' = tf + w·atf, doclen' = Σ tf', df/cf recomputed). The
    result is a plain IndexTables — packing, WAND, the service, the
    whole downstream engine serve the anchor signal unchanged.

    Exactly equivalent to ``build_index`` over a corpus whose text
    columns carry the appended anchor text (pinned by
    ``tests/test_anchor_index.py``), without ever materializing the
    augmented blobs: the merge runs at TF granularity.
    """
    from ..operators.postings import (
        IndexTables,
        build_term_stats,
        explode_term_counts,
        prepare_docs_counts,
    )

    prepared = prepare_docs_counts(docs, use_html=use_html)
    own = explode_term_counts(prepared)
    atf = anchor_term_counts(docs).join(
        prepared.select("doc_id"), "doc_id", "left_semi"
    )
    postings = merge_anchor_tf(own, atf, weight).select(
        "term", "doc_id", F.col("tf").cast("int").alias("tf")
    )
    dl = postings.groupBy("doc_id").agg(
        F.sum("tf").cast("long").alias("doclen")
    )
    # left join: a doc whose text AND anchors are all stop-filtered
    # has no postings but stays servable (doclen 0), matching
    # build_doc_stats over a prepared frame with empty lemmas
    doc_stats = (
        prepared.select("doc_id", "url", "site", "title")
        .join(dl, "doc_id", "left")
        .withColumn("doclen", F.coalesce(F.col("doclen"), F.lit(0).cast("long")))
    )
    return IndexTables(
        postings=postings,
        term_stats=build_term_stats(postings),
        doc_stats=doc_stats,
    )


def build_static_rank(docs: DataFrame, n_iter: int = 3) -> DataFrame:
    """(doc_id, rank): PageRank over the corpus link graph, keyed by
    the INDEX identity — xxhash64 of the canonical url, exactly the
    doc_id rule of ``postings.prepare_docs_counts`` — so the rank
    table joins against doc_stats / packed-kernel results directly.

    Endpoints pass through the same canonicalization the indexer
    applies (?#-strip, trailing slash, file reject): a href to
    ``/page3?utm=x`` must credit the same node the indexer stores.
    Canonicalization can re-create self-loops (``/page3?a`` →
    ``/page3``), so they are re-dropped after it. One extraction pass
    + one resolve shuffle + 2 shuffles per iteration (see
    ``pagerank``).
    """
    from ..functions.urlnorm import canonical_url, is_file_url
    from ..operators.postings import filter_valid_pages

    base = (
        filter_valid_pages(docs)
        .filter(~is_file_url(F.col("url")))
        .withColumn("url", canonical_url(F.col("url")))
    )
    links = (
        extract_links(base)
        .select(
            canonical_url(F.col("src")).alias("src"),
            canonical_url(F.col("dst")).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
    )
    edges = resolve_edges(links, base)
    nodes = base.select(F.col("url").alias("node")).distinct()
    return pagerank(edges, nodes, n_iter).select(
        F.xxhash64("node").alias("doc_id"), "rank"
    )


def write_static_rank(rank: DataFrame, base: str) -> None:
    """Persist the static-rank table at ``<base>/staticrank`` where
    ``service.SearchService`` probes for it (Hadoop-FS path, so URI
    index bases work)."""
    rank.write.mode("overwrite").parquet(f"{base}/staticrank")


def pagerank_oracle_sql(
    edges_cte: str,
    nodes_cte: str,
    n_iter: int = 3,
    d_num: int = PR_D_NUM,
    d_den: int = PR_D_DEN,
    scale: int = PR_SCALE,
) -> str:
    """DuckDB WITH-chain unrolling the exact recurrence of ``pagerank``.

    ``edges_cte`` / ``nodes_cte`` are SQL bodies producing (src, dst)
    and (node) respectively. Returns a full SELECT yielding
    (node, rank) after ``n_iter`` iterations — bit-identical to the
    Spark operator because both sides floor at the same points and sum
    only integers. DuckDB's ``//`` floors toward -inf like Spark's DIV
    for the non-negative quantities involved.
    """
    parts = [
        f"WITH edges AS ({edges_cte})",
        f"nodes AS ({nodes_cte})",
        "nn AS (SELECT count(*)::BIGINT AS n FROM nodes)",
        "outdeg AS (SELECT src, count(*)::BIGINT AS out FROM edges GROUP BY src)",
        f"r0 AS (SELECT node, ({scale} // n)::BIGINT AS rank FROM nodes, nn)",
    ]
    for t in range(n_iter):
        prev, cur = f"r{t}", f"r{t + 1}"
        parts += [
            f"dang{t} AS (SELECT coalesce(sum(r.rank), 0)::BIGINT AS dang"
            f" FROM {prev} r LEFT JOIN outdeg o ON r.node = o.src"
            f" WHERE o.src IS NULL)",
            f"c{t} AS (SELECT e.dst AS node, sum(r.rank // o.out)::BIGINT AS c"
            f" FROM edges e JOIN {prev} r ON e.src = r.node"
            f" JOIN outdeg o ON e.src = o.src GROUP BY e.dst)",
            f"{cur} AS (SELECT r.node,"
            f" ((({d_den} - {d_num}) * ({scale} // n)) // {d_den}"
            f" + ({d_num} * (coalesce(c.c, 0) + (d.dang // n))) // {d_den}"
            f")::BIGINT AS rank"
            f" FROM r{t} r LEFT JOIN c{t} c ON r.node = c.node,"
            f" dang{t} d, nn)",
        ]
    return ",\n".join(parts) + f"\nSELECT node, rank FROM r{n_iter}"
