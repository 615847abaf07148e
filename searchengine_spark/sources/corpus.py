"""Deterministic synthetic Common-Crawl-style corpus (input_hint shape).

Generates ``docs(url string, warc_ts timestamp, html binary, text
string, lang string)`` — the exact input table shape from
BASELINE.json:15 — fully seeded (seed 42, per-row derived seeds) so the
same row ids produce the same bytes on any partitioning, any cluster
size, with no wall-clock dependence.

The HTML wraps the ground-truth ``text`` with inline tags, entities,
script blocks and whitespace noise ('\n', '\t', 2+ space runs, a
leading space) engineered so that
``textproc.extract_text(html) == text`` byte-identically — the per-row
invariant the tests assert (reference extraction semantics:
mapper/WebpageMapper.java:44-52).

Corpus properties engineered for test coverage:
  * zipf-ish term distribution; the OOV word 'data' appears in ~98% of
    docs → exceeds the 0.95 relative-DF pruning threshold (F4,
    reference services/ApiService.java:222-236) and creates the
    stopword-heavy posting-list skew the salting path must handle;
  * stop-POS function words (и/в/на/…) present → exercises the POS
    stop-filter (F3);
  * homograph surfaces (стекла/печь/rows) → multi-lemma expansion (A1);
  * a fraction of rows are verbatim full-row duplicates (exact dedup
    D2) and near-duplicates (minhash/simhash near-dedup).

Scales: driver-side ``corpus_rows`` for the oracle & tiny fixtures;
``corpus_df`` uses ``spark.range(n).mapInPandas`` so generation is
embarrassingly parallel at any SF.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd

from ..functions.lemma_dict import LEMMA_DICT, STOP_SURFACES

SEED = 42
N_SITES = 8
_BASE_TS = dt.datetime(2024, 1, 1, 0, 0, 0)

# word pools (deterministic order) ------------------------------------------
_RU_SURFACES = sorted(s for s in LEMMA_DICT if not s.isascii() and s not in STOP_SURFACES)
_EN_SURFACES = sorted(s for s in LEMMA_DICT if s.isascii())
_STOP = sorted(STOP_SURFACES)
# out-of-dictionary words (identity lemmas); 'data' is the engineered
# high-DF skew term
_OOV = [
    "data", "web", "crawl", "page", "engine", "rank", "score", "token",
    "block", "heap", "кэш", "шард", "топ-к", "бм25",
]


def _pool(lang: str) -> list[str]:
    if lang == "ru":
        return _RU_SURFACES + _STOP + _OOV
    return _EN_SURFACES + _STOP[:2] + _OOV


def _zipf_probs(n: int) -> np.ndarray:
    p = 1.0 / np.arange(1, n + 1, dtype=np.float64)
    return p / p.sum()


def _doc_words(
    rng: np.random.RandomState, lang: str, words_scale: int = 1
) -> list[str]:
    pool = _pool(lang)
    n = int(rng.randint(30, 121)) * words_scale
    idx = rng.choice(len(pool), size=n, p=_zipf_probs(len(pool)))
    words = [pool[i] for i in idx]
    # engineered ~98%-DF term (skew + F4 pruning target)
    if rng.rand() < 0.98:
        words[int(rng.randint(0, n))] = "data"
    return words


def _link_href(row_id: int, draw: int) -> str:
    """Deterministic anchor target from (row_id, one rng draw).

    Derived purely from the draw the old generator already consumed
    (``rng.randint(0, 999)``) so the rng sequence — and hence every
    other byte of every document — is unchanged. Targets point
    BACKWARD to smaller row ids, which always exist in a dense
    0..n-1 corpus regardless of corpus size:

      * same-site relative link ``/page{row_id - N_SITES*k}`` (site =
        id mod N_SITES, so an N_SITES-multiple stride stays on-site)
        — most links;
      * cross-site absolute link every 5th draw;
      * dead link ``/l{draw}`` when no smaller target exists (and for
        early rows) — real web graphs have unresolvable hrefs; the
        resolver drops them by anti-joining the corpus url set.
    """
    k = 1 + draw % 16
    tgt = row_id - N_SITES * k
    if tgt < 0:
        return f"/l{draw}"
    if draw % 5 == 0:
        t2 = row_id - k
        return f"https://site{t2 % N_SITES}.example/page{t2}"
    return f"/page{tgt}"


def _decorate_html(
    title: str, body_words: list[str], rng: np.random.RandomState, row_id: int = -1
) -> str:
    """Wrap text in HTML + whitespace noise that extract_text undoes."""
    parts: list[str] = []
    for w in body_words:
        r = rng.rand()
        if r < 0.05:
            parts.append(f"<b>{w}</b>")
        elif r < 0.08:
            parts.append(f"<em>{w}</em>")
        elif r < 0.10:
            draw = int(rng.randint(0, 999))
            parts.append(f'<a href="{_link_href(row_id, draw)}">{w}</a>')
        else:
            parts.append(w)
    seps = []
    for _ in range(len(parts) - 1):
        r = rng.rand()
        if r < 0.06:
            seps.append("  ")  # 2-space run → collapses to one
        elif r < 0.10:
            seps.append(" \n\t ")  # newline+tab noise → one space
        else:
            seps.append(" ")
    body = "".join(
        p + s for p, s in zip(parts, seps + [""])
    )
    script = "<script>var x = 1 < 2;</script>" if rng.rand() < 0.3 else ""
    # after tag/script/style strip: "{title}\n\n\t {body}" → whitespace
    # normalization → "{title} {body}" — exactly the ground-truth text
    # half the docs lead with a newline → one leading space after
    # normalization → exercises the strip-one-leading-space rule
    lead = "\n" if rng.rand() < 0.5 else ""
    return (
        f"<html><head><title>{lead}{title}</title><style>p {{}}</style></head>\n"
        f"<body>\n\t<p> {body}</p>{script}</body></html>"
    )


def _gen_one(row_id: int, words_scale: int = 1) -> dict:
    rng = np.random.RandomState((SEED * 1_000_003 + row_id) % (2**31 - 1))
    lang = "ru" if rng.rand() < 0.6 else "en"
    words = _doc_words(rng, lang, words_scale)
    title = " ".join(words[:3])
    body = " ".join(words)
    # NOTE on layout: title appears once in <title> (stripped with head
    # noise) and once in <p>; extracted text = "title body…" where body
    # repeats the title words — so text == title + ' ' + body
    text = title + " " + body
    html = _decorate_html(title, words, rng, row_id)
    site = int(row_id) % N_SITES
    return {
        "url": f"https://site{site}.example/page{int(row_id)}",
        "warc_ts": _BASE_TS + dt.timedelta(seconds=int(row_id)),
        "html": html.encode("utf-8"),
        "text": text,
        "lang": lang,
    }


def gen_rows(row_ids, words_scale: int = 1) -> list[dict]:
    """Deterministic rows for the given ids (any order, any subset).
    `words_scale` multiplies document length (heavier per-doc work for
    scaling benchmarks; default 1 = the test corpus).

    Duplication rules (id-local, so they work under any partitioning):
      * id % 37 == 1 and id >= 37: verbatim full-row duplicate of id-1
        (url included) → exact-dedup target D2;
      * id % 23 == 2 and id >= 23: near-duplicate of id-2 (own url,
        text with 2 words appended) → near-dedup target.
    """
    out = []
    for rid in row_ids:
        rid = int(rid)
        if rid % 37 == 1 and rid >= 37:
            out.append(_gen_one(rid - 1, words_scale))
        elif rid % 23 == 2 and rid >= 23:
            base = _gen_one(rid - 2, words_scale)
            text = base["text"] + " extra words"
            row = _gen_one(rid, words_scale)  # own url/ts/lang
            row["text"] = text
            # minimal html keeps the extract_text(html) == text invariant
            row["html"] = ("<html><body><p>" + text + "</p></body></html>").encode("utf-8")
            out.append(row)
        else:
            out.append(_gen_one(rid, words_scale))
    return out


def corpus_rows(n_docs: int) -> list[dict]:
    """Driver-side full corpus (oracle / tiny fixtures)."""
    return gen_rows(range(n_docs))


def corpus_df(spark, n_docs: int, n_partitions: int | None = None,
              words_scale: int = 1):
    """Distributed corpus DataFrame in the exact input_hint shape."""
    from ..schemas import DOCS_SCHEMA

    n_partitions = n_partitions or spark.sparkContext.defaultParallelism

    def gen(batches):
        for pdf in batches:
            rows = gen_rows(pdf["id"].to_numpy(), words_scale)
            yield pd.DataFrame(rows)

    return (
        spark.range(0, n_docs, numPartitions=n_partitions)
        .mapInPandas(gen, schema=DOCS_SCHEMA)
    )


def write_corpus(spark, n_docs: int, path: str,
                 words_scale: int = 1) -> None:
    corpus_df(spark, n_docs, words_scale=words_scale).write.mode(
        "overwrite"
    ).parquet(path)


# ---------------------------------------------------------------------------
# Zipf-vocabulary corpus (pruning-bench shape)
# ---------------------------------------------------------------------------

_ZIPF_CDF_CACHE: dict[int, np.ndarray] = {}


def _zipf_cdf(vocab: int) -> np.ndarray:
    cdf = _ZIPF_CDF_CACHE.get(vocab)
    if cdf is None:
        p = 1.0 / np.arange(1, vocab + 1, dtype=np.float64)
        cdf = np.cumsum(p / p.sum())
        _ZIPF_CDF_CACHE[vocab] = cdf
    return cdf


def zipf_corpus_df(spark, n_docs: int, vocab: int = 50_000,
                   min_len: int = 60, max_len: int = 180,
                   n_partitions: int | None = None):
    """Text-only corpus (input_hint shape, html=NULL) over a SYNTHETIC
    Zipf(s=1) vocabulary ``w00000..w{V-1}`` — the realistic dictionary
    shape the small webtext word pools cannot produce: genuinely rare
    terms (tail ranks, a handful of postings) next to many-block common
    lists (head ranks, 10^4-10^5 postings). This is the corpus the
    block-max pruning machinery exists for; the bench's pruning stage
    measures wand_blocks_decoded_pct over it (VERDICT r4 #5 — at the
    webtext dictionary every list is a couple of blocks and pruning is
    measured near-inert).

    Deterministic per row id (derived seeds, no wall clock); tokens are
    ``[a-z0-9]+`` so the analyzer keeps them whole as identity lemmas.
    Draws are one vectorized searchsorted over a cached cdf per doc —
    generation stays embarrassingly parallel."""
    from ..schemas import DOCS_SCHEMA

    n_partitions = n_partitions or spark.sparkContext.defaultParallelism

    def gen(batches):
        for pdf in batches:
            cdf = _zipf_cdf(vocab)
            rows = []
            for rid in pdf["id"].tolist():
                rng = np.random.RandomState(
                    (SEED * 1_000_003 + rid) % (2**31 - 1)
                )
                n = int(rng.randint(min_len, max_len + 1))
                ids = np.searchsorted(cdf, rng.rand(n))
                rows.append(
                    {
                        "url": (
                            f"https://zipf{rid % N_SITES}.example/"
                            f"page{rid}"
                        ),
                        "warc_ts": _BASE_TS + dt.timedelta(seconds=int(rid)),
                        "html": None,
                        "text": " ".join(f"w{i:05d}" for i in ids),
                        "lang": "en",
                    }
                )
            yield pd.DataFrame(rows)

    return (
        spark.range(0, n_docs, numPartitions=n_partitions)
        .mapInPandas(gen, schema=DOCS_SCHEMA)
    )
