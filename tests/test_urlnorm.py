"""URL canonicalization column functions (reference F1/Str10:
WebsiteMapper.java:94-130 parseHref/isFile, WebPage.java:143-167
lenient trailing slash, WebsiteIndexMapper.java:50-52 relativize)."""

from __future__ import annotations

from pyspark.sql import functions as F

from searchengine_spark.functions import urlnorm

CASES = [
    # url, canonical, site, rel_path, is_file
    ("https://a.com/x?q=1#f", "https://a.com/x", "https://a.com", "/x", False),
    ("https://a.com/x/", "https://a.com/x", "https://a.com", "/x", False),
    ("https://a.com/", "https://a.com", "https://a.com", "/", False),
    ("https://a.com", "https://a.com", "https://a.com", "/", False),
    ("https://a.com/x/y.html", "https://a.com/x/y.html", "https://a.com",
     "/x/y.html", False),
    ("https://a.com/x/y.pdf", "https://a.com/x/y.pdf", "https://a.com",
     "/x/y.pdf", True),
    # trailing slash must not mask the extension
    ("https://a.com/x/y.pdf/", "https://a.com/x/y.pdf", "https://a.com",
     "/x/y.pdf", True),
    ("https://a.com/v1.2/page", "https://a.com/v1.2/page", "https://a.com",
     "/v1.2/page", False),
    ("https://a.com/x.HTM", "https://a.com/x.HTM", "https://a.com",
     "/x.HTM", False),
]


def test_urlnorm_columns(spark):
    df = spark.createDataFrame([(u,) for u, *_ in CASES], "url string")
    rows = df.select(
        "url",
        urlnorm.canonical_url(F.col("url")).alias("canon"),
        urlnorm.site_of(F.col("url")).alias("site"),
        urlnorm.relative_path(F.col("url")).alias("rel"),
        urlnorm.is_file_url(F.col("url")).alias("is_file"),
    ).collect()
    got = {r["url"]: (r["canon"], r["site"], r["rel"], r["is_file"]) for r in rows}
    for url, canon, site, rel, is_file in CASES:
        assert got[url] == (canon, site, rel, is_file), url


def test_prepare_docs_dedups_canonical_variants(spark):
    rows = [
        ("https://a.com/x", "<html><body>one two</body></html>"),
        ("https://a.com/x/", "<html><body>one two</body></html>"),
        ("https://a.com/x?utm=1", "<html><body>one two</body></html>"),
        ("https://a.com/x#frag", "<html><body>one two</body></html>"),
        ("https://a.com/y", "<html><body>three</body></html>"),
        ("https://a.com/z.pdf", "<html><body>binary-ish</body></html>"),
    ]
    docs = spark.createDataFrame(
        [(u, bytearray(h.encode())) for u, h in rows], "url string, html binary"
    )
    from searchengine_spark.operators.postings import prepare_docs

    out = prepare_docs(docs, use_html=True).select("url").collect()
    urls = sorted(r["url"] for r in out)
    assert urls == ["https://a.com/x", "https://a.com/y"]


def test_filter_valid_pages_drops_redirects_and_empty(spark):
    """F2 redirect drop (WebsiteMapper.java:55-57) + F5 valid-page
    guard on a frame WITH a code column; code-less frames pass through
    except null-content rows."""
    from searchengine_spark.operators.postings import filter_valid_pages

    rows = [
        ("https://a.com/ok", 200, bytearray(b"<html>x</html>")),
        ("https://a.com/redir", 302, bytearray(b"")),
        ("https://a.com/err", 500, bytearray(b"<html>e</html>")),
        ("https://a.com/null", 200, None),
    ]
    docs = spark.createDataFrame(rows, "url string, code int, html binary")
    kept = sorted(r["url"] for r in filter_valid_pages(docs).collect())
    assert kept == ["https://a.com/ok"]

    # no code column: only the null-content row drops
    docs2 = docs.drop("code")
    kept2 = sorted(r["url"] for r in filter_valid_pages(docs2).collect())
    assert kept2 == ["https://a.com/err", "https://a.com/ok", "https://a.com/redir"]
