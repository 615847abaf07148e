"""Anchor virtual-document indexing (linkgraph.build_index_with_anchors):
the TF-level merge must be EXACTLY equivalent to building a plain index
over a corpus whose text carries the inbound anchor text appended
weight times — postings, doc_stats, term_stats all equal — and an
anchor-only term must retrieve a target that never contains it."""

from __future__ import annotations

import re

import pytest

from searchengine_spark.functions.textproc import extract_text
from searchengine_spark.operators.linkgraph import build_index_with_anchors
from searchengine_spark.operators.postings import build_index
from searchengine_spark.operators.search import corpus_constants, search
from searchengine_spark.schemas import DOCS_SCHEMA
from searchengine_spark.sources.corpus import corpus_df, corpus_rows

N = 300
W = 2

_A_RE = re.compile(r'<a href="([^"]*)"[^>]*>([^<]*)</a>')
_SITE_RE = re.compile(r"^(https?://[^/]+)")


def _augmented_rows(rows: list[dict], w: int) -> list[tuple[str, str]]:
    """(url, text + w× inbound anchor text) over the unique-url doc set
    — the virtual-document spec the operator must reproduce at TF
    granularity."""
    uniq: dict[str, dict] = {}
    for r in rows:
        uniq.setdefault(r["url"], r)
    inbound: dict[str, list[str]] = {}
    for r in uniq.values():
        site = _SITE_RE.match(r["url"]).group(1)
        for href, anchor in _A_RE.findall(r["html"].decode("utf-8")):
            if href.startswith(("http://", "https://")):
                dst = href
            elif href.startswith("/"):
                dst = site + href
            else:
                continue
            if dst != r["url"] and dst in uniq:
                inbound.setdefault(dst, []).append(anchor)
    out = []
    for u, r in uniq.items():
        text = extract_text(r["html"])
        atext = " ".join(inbound.get(u, []))
        if atext:
            text = text + (" " + atext) * w
        out.append((u, text))
    return out


def test_anchor_index_equals_augmented_corpus_index(spark):
    got = build_index_with_anchors(corpus_df(spark, N), weight=W)
    aug = spark.createDataFrame(
        _augmented_rows(corpus_rows(N), W), "url string, text string"
    )
    want = build_index(aug, use_html=False)

    got_p = {(r["term"], r["doc_id"]): r["tf"] for r in got.postings.collect()}
    want_p = {(r["term"], r["doc_id"]): r["tf"] for r in want.postings.collect()}
    assert got_p == want_p
    # the anchors actually changed something vs the plain index
    plain = build_index(corpus_df(spark, N), use_html=True)
    plain_p = {
        (r["term"], r["doc_id"]): r["tf"] for r in plain.postings.collect()
    }
    assert got_p != plain_p

    got_d = {r["doc_id"]: (r["url"], r["site"], r["doclen"])
             for r in got.doc_stats.collect()}
    want_d = {r["doc_id"]: (r["url"], r["site"], r["doclen"])
              for r in want.doc_stats.collect()}
    assert got_d == want_d

    got_t = {r["term"]: (r["df"], r["cf"]) for r in got.term_stats.collect()}
    want_t = {r["term"]: (r["df"], r["cf"]) for r in want.term_stats.collect()}
    assert got_t == want_t


def _page(url: str, body: str) -> tuple:
    html = (
        "<html><head><title>t</title></head>"
        f"<body><p>{body}</p></body></html>"
    ).encode("utf-8")
    return (url, None, html, None, "ru")


def test_anchor_only_term_retrieves_target(spark):
    # doc1 links to doc2 with anchor 'зебра'; doc2 never contains it
    docs = spark.createDataFrame(
        [
            _page("https://a.example/1",
                  'слово поиск <a href="/2">зебра</a> слово'),
            _page("https://a.example/2", "быстрый поиск слово"),
            _page("https://a.example/3", "слово слово"),
        ],
        DOCS_SCHEMA,
    )
    # the anchor text is visible in the LINKING page, so the plain
    # index returns doc1 — but can never return the TARGET doc2
    plain = build_index(docs, use_html=True)
    plain_hits = {
        h["url"]
        for h in search(spark, plain, "зебра", k=5,
                        constants=corpus_constants(plain.doc_stats)).collect()
    }
    assert plain_hits == {"https://a.example/1"}

    idx = build_index_with_anchors(docs, weight=1)
    hits = {
        h["url"]
        for h in search(spark, idx, "зебра", k=5,
                        constants=corpus_constants(idx.doc_stats)).collect()
    }
    assert "https://a.example/2" in hits


def test_prepared_with_anchors_feeds_materialize(spark, tmp_path):
    # the production single-pass path (materialize_index over a
    # prepared_with_anchors frame) must land the same index the lazy
    # TF-level merge builds
    from searchengine_spark.operators.linkgraph import prepared_with_anchors
    from searchengine_spark.operators.postings import materialize_index

    docs = corpus_df(spark, N)
    got = materialize_index(
        spark, docs, str(tmp_path / "idx"),
        prepared=prepared_with_anchors(docs, weight=W),
    )
    want = build_index_with_anchors(docs, weight=W)
    assert {(r["term"], r["doc_id"]): r["tf"] for r in got.postings.collect()} \
        == {(r["term"], r["doc_id"]): r["tf"] for r in want.postings.collect()}
    assert {r["doc_id"]: r["doclen"] for r in got.doc_stats.collect()} \
        == {r["doc_id"]: r["doclen"] for r in want.doc_stats.collect()}
    assert {r["term"]: (r["df"], r["cf"]) for r in got.term_stats.collect()} \
        == {r["term"]: (r["df"], r["cf"]) for r in want.term_stats.collect()}


def test_no_links_degenerates_to_plain_index(spark):
    docs = spark.createDataFrame(
        [
            _page("https://a.example/1", "быстрый поиск"),
            _page("https://a.example/2", "слово запрос"),
        ],
        DOCS_SCHEMA,
    )
    got = build_index_with_anchors(docs, weight=3)
    want = build_index(docs, use_html=True)
    assert {tuple(r) for r in got.postings.collect()} == {
        tuple(r) for r in want.postings.collect()
    }
    assert sorted(
        (r["doc_id"], r["doclen"]) for r in got.doc_stats.collect()
    ) == sorted((r["doc_id"], r["doclen"]) for r in want.doc_stats.collect())
