"""Single-node pure-Python oracle for the full search semantics.

This is the executable specification the Spark engine is tested
against (SURVEY.md §5.2.1): extraction, tokenization+lemmatization
(shared kernels from searchengine_spark.functions.textproc — byte
identity by construction), TF/DF/doclen stats, high-DF pruning,
conjunctive intersection, BM25 (k1=1.2, b=0.75) and legacy sum/max
scoring, (score desc, url asc) tie-break, offset/limit pagination.

Reference trace it models: services/ApiService.java:82-146 with the
documented bug fixes (float-division pruning, true document frequency)
and BM25 in place of sum/max per BASELINE.json north_rule.
"""

from __future__ import annotations

from collections import Counter

from searchengine_spark.functions import textproc
from searchengine_spark.functions.docid import doc_id_for_url
from searchengine_spark.operators.search import bm25_score_py, lemmatize_query

MAX_REL_FREQ = 0.95


class Oracle:
    def __init__(self, rows: list[dict], use_html: bool = False):
        # dedup by url — duplicates are verbatim full rows, keep first
        docs: dict[str, dict] = {}
        for r in rows:
            docs.setdefault(r["url"], r)
        self.docs = docs
        self.lemmas: dict[str, list[str]] = {}
        self.tf: dict[str, Counter] = {}
        self.df: Counter = Counter()
        self.doclen: dict[str, int] = {}
        for url, r in docs.items():
            text = textproc.extract_text(r["html"]) if use_html else r["text"]
            lem = textproc.tokenize_lemmatize(text)
            self.lemmas[url] = lem
            c = Counter(lem)
            self.tf[url] = c
            self.doclen[url] = len(lem)
            for t in c:
                self.df[t] += 1
        self.n_docs = len(docs)
        self.avgdl = (
            sum(self.doclen.values()) / self.n_docs if self.n_docs else 0.0
        )

    def site(self, url: str) -> str:
        return url.split("://", 1)[1].split("/", 1)[0]

    def search(
        self,
        query: str,
        k: int = 20,
        offset: int = 0,
        site: str | None = None,
        mode: str = "bm25",
        conjunctive: bool = True,
    ) -> list[tuple[str, float]]:
        # Site filter restricts candidates only; corpus stats stay
        # global (same contract as the engine).
        urls = [u for u in self.docs if site is None or self.site(u) == site]
        n_docs, df, avgdl = self.n_docs, self.df, self.avgdl
        if n_docs == 0 or not urls:
            return []
        lemmas = lemmatize_query(query)
        terms = [t for t in lemmas if t in df and df[t] / n_docs <= MAX_REL_FREQ]
        if not terms:
            return []
        results = []
        for u in urls:
            tfs = [self.tf[u].get(t, 0) for t in terms]
            hit = [x for x in tfs if x > 0]
            if conjunctive and len(hit) != len(terms):
                continue
            if not hit:
                continue
            if mode == "bm25":
                score = sum(
                    bm25_score_py(tf, df[t], self.doclen[u], n_docs, avgdl)
                    for t, tf in zip(terms, tfs)
                    if tf > 0
                )
            else:
                score = sum(hit) / max(hit)
            results.append((u, score))
        # tie-break on doc_id = xxhash64(url) — identical to the engine
        results.sort(key=lambda r: (-r[1], doc_id_for_url(r[0])))
        return results[offset : offset + k]

    def match_count(self, query: str, site: str | None = None) -> int:
        return len(self.search(query, k=1 << 30, site=site))
