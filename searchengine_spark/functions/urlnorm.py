"""URL canonicalization column functions — native expressions only.

Reference semantics (crawl-side URL handling, rebuilt as corpus-dedup
normalization since crawl itself is out of scope):

  * strip `?query` and `#fragment` before treating two URLs as the
    same page (reference: mapper/WebsiteMapper.java:94-109 parseHref
    splits on '?'/'#' and keeps the left part);
  * lenient trailing-slash equality — `/a/b` and `/a/b/` are the same
    page (reference: mapper/assets/WebPage.java:143-167 hasLink
    compares with and without the trailing slash); canonical form
    drops the trailing slash except for the bare root;
  * non-HTML file rejection — URLs whose last path segment carries an
    extension other than htm/html are not pages (reference:
    mapper/WebsiteMapper.java:110-130 isFile regex
    `^.*[.](?!htm[l]?)[^/]+$`). The Java regex uses a negative
    lookahead; RE2 engines (DuckDB) have none, so the rebuild states
    the same intent lookahead-free: extract the extension and compare
    — identical on every URL whose extension doesn't merely *start*
    with "htm" (the lookahead's only divergence, e.g. ".htmx"; the
    corrected form treats those as files, which is the intent);
  * site = scheme+host prefix; site-relative path (`/` for the root)
    — reference: mapper/WebsiteIndexMapper.java:50-52,
    services/IndexingService.java:380 (Str10).

Everything is a pure Column expression (whole-stage codegen; usable in
both the build pipeline and ad-hoc SQL); the DuckDB oracle mirrors the
same regexes (all RE2-safe).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# scheme://host (no trailing slash); group 1 = scheme://host
_SITE_RE = r"^([a-z][a-z0-9+.-]*://[^/?#]+)"
# extension of the last path segment: a dot then no '/', '.', '?', '#'
_EXT_RE = r"\.([^/.?#]+)$"
HTML_EXTS = ("htm", "html")


def strip_query_fragment(url: Column) -> Column:
    """Drop everything from the first '?' or '#' on."""
    return F.regexp_replace(url, r"[?#].*$", "")


def canonical_url(url: Column) -> Column:
    """Canonical page identity: query/fragment stripped, ONE trailing
    slash removed (unless that slash is the root path or the URL ends
    at the host). `https://a.com/x/?q=1#f` ≡ `https://a.com/x`."""
    stripped = strip_query_fragment(url)
    # remove one trailing slash when preceded by a non-slash, non-colon
    # char — 'https://a.com/x/' → '.../x', 'https://a.com/' →
    # 'https://a.com' (host-root slash is also lenient-equal), while a
    # bare 'scheme://' is left alone
    return F.regexp_replace(stripped, r"([^/:])/$", r"$1")


def url_extension(url: Column) -> Column:
    """Lower-cased extension of the last path segment of the CANONICAL
    url ('' if none) — computed post-canonicalization so a trailing
    slash can't mask a file extension ('/x.pdf/' → 'pdf'), and on the
    PATH only so a dotted host ('a.com') never reads as an
    extension."""
    path = F.regexp_replace(canonical_url(url), _SITE_RE, "")
    return F.lower(F.regexp_extract(path, _EXT_RE, 1))


def is_file_url(url: Column) -> Column:
    """True when the URL points at a non-HTML file (reject from the
    corpus)."""
    ext = url_extension(url)
    return (ext != "") & ~ext.isin(*HTML_EXTS)


def site_of(url: Column) -> Column:
    """scheme://host prefix ('' when the URL has no scheme)."""
    return F.regexp_extract(url, _SITE_RE, 1)


def relative_path(url: Column) -> Column:
    """Site-relative path of the canonical URL; '/' for the root
    (Str10, reference mapper/WebsiteIndexMapper.java:50-52)."""
    path = F.regexp_replace(canonical_url(url), _SITE_RE, "")
    return F.when(path == "", F.lit("/")).otherwise(path)
