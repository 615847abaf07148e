"""More-like-this retrieval: find documents similar to a given page.

The reference has no document-similarity endpoint — a user wanting
"pages like this one" re-types salient words into /api/search
(services/ApiService.java:82-146). This module makes that loop a
first-class operator with the classic Lucene MoreLikeThis shape:

  1. TERM SELECTION — analyze the source document with the SAME
     tokenize/lemmatize pipeline as indexing, weight each term by
     tf·ln(N/df) (query-side TF-IDF), keep the top `max_terms`.
     Deterministic across engines: the weight is e4 fixed-point
     (floor(w·10⁴+0.5), the repo-wide cross-engine convention) and
     ties break on term ASC — the DuckDB oracle replays the identical
     ORDER BY (contract.q_more_like_this).
  2. RETRIEVAL — disjunctive BM25 over the selected terms with the
     source document excluded (it would trivially rank first),
     served from the packed index via the block-max WAND path
     (index/wand.search_packed_fused with `lemmas=` bypassing query
     analysis — the terms are already lemmas — and
     `excluded_doc_ids=[source]`).

Scale shape: selection is driver-side over ONE document's term counts
(bounded by |doc|, not corpus) against the warm df dictionary the
server already holds; retrieval is the ordinary ≤max_terms-term WAND
query — no corpus pass, no new shuffle. At 10^12 docs this is exactly
a user query with a machine-picked query string.
"""

from __future__ import annotations

import math


def select_mlt_terms(
    counts: dict[str, int],
    df_map: dict[str, int],
    n_docs: int,
    max_terms: int = 25,
) -> list[str]:
    """Top `max_terms` terms of one document by tf·idf.

    weight_e4 = floor((tf * ln(n_docs / df)) * 10000.0 + 0.5) —
    IEEE-double op-for-op identical to the Spark/DuckDB contract
    expressions, so engine and oracle select the same terms. Terms
    absent from the dictionary (df=0 — e.g. delta-landed text the
    stats don't know yet) are skipped; df == n_docs gives weight 0
    and sorts last naturally.
    """
    scored = []
    for term, tf in counts.items():
        df = df_map.get(term)
        if not df:
            continue
        w = math.floor((tf * math.log(n_docs / df)) * 10000.0 + 0.5)
        scored.append((-w, term))
    scored.sort()
    return [t for _, t in scored[:max_terms]]
