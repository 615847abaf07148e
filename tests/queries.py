"""The reference query set for rank-identity testing (FIXTURES.md §3).

Covers: single rare term; stopword-only (prunes to empty → zero
results, reference ApiService.java:124-126); multi-term conjunctive
with/without common terms; inflected forms (lemmatization); homographs
(multi-lemma); absent term; site filter; offset pagination; legacy
scoring mode.
"""

QUERIES = [
    # (query_id, query, site, offset, limit, mode, conjunctive)
    (1, "индекс", None, 0, 20, "bm25", True),
    (2, "поиска индексы", None, 0, 20, "bm25", True),  # inflected forms
    (3, "spark join", None, 0, 20, "bm25", True),
    (4, "быстрый поиск слова", None, 0, 20, "bm25", True),
    (5, "данные", None, 0, 20, "bm25", True),
    (6, "и в на", None, 0, 20, "bm25", True),  # stop-POS only → empty
    (7, "data", None, 0, 20, "bm25", True),  # >0.95 DF → pruned → empty
    (8, "nosuchwordxyz", None, 0, 20, "bm25", True),  # absent term
    (9, "стекла", None, 0, 20, "bm25", True),  # homograph multi-lemma
    (10, "запрос страница", "site3.example", 0, 20, "bm25", True),
    (11, "индекс", None, 5, 5, "bm25", True),  # offset pagination
    (12, "spark join", None, 0, 20, "legacy", True),
    (13, "быстрый поиск", None, 0, 20, "bm25", False),  # disjunctive
    (14, "merge sort hash", None, 0, 50, "bm25", True),
]
