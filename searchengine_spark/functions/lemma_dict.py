"""Deterministic lemmatization dictionary shared by engine and oracle.

Replaces the reference's RussianLuceneMorphology
(reference: mapper/LemmaMapper.java:19-36) with a fixed, shipped
surface-form → [(lemma, pos)] mapping so results are byte-identical
between the Spark pandas UDFs and the single-node pure-Python oracle.

Semantics preserved from the reference:
  * one surface word may map to SEVERAL lemmas; every lemma is emitted
    and counted (mapper/LemmaMapper.java:26-36);
  * lemma candidates whose POS tag is in STOP_POS (ПРЕДЛ/СОЮЗ/МЕЖД —
    prepositions, conjunctions, interjections) are dropped
    (mapper/LemmaMapper.java:13,78-80);
  * out-of-dictionary tokens lemmatize to themselves with a neutral POS
    (identity fallback — the reference throws them away only when the
    morphology lib rejects them; our dictionary is closed so identity
    is the documented generalization).

At cluster scale this dict ships as a broadcast variable inside the
tokenize UDF (a few MB even for a real morphology table).
"""

from __future__ import annotations

# POS tags that mark a lemma as a stopword (reference: LemmaMapper.java:13)
STOP_POS: frozenset[str] = frozenset({"ПРЕДЛ", "СОЮЗ", "МЕЖД"})

# lemma -> (pos, [surface forms])  — every surface maps back to lemma.
_PARADIGMS: dict[str, tuple[str, list[str]]] = {
    # --- Russian-like content words (nouns СУЩ, adjectives ПРИЛ, verbs ГЛ)
    "данные": ("СУЩ", ["данные", "данных", "данным", "данными"]),
    "индекс": ("СУЩ", ["индекс", "индекса", "индексы", "индексов", "индексу"]),
    "поиск": ("СУЩ", ["поиск", "поиска", "поиску", "поиском"]),
    "запрос": ("СУЩ", ["запрос", "запроса", "запросы", "запросов"]),
    "слово": ("СУЩ", ["слово", "слова", "словам", "словами"]),
    "страница": ("СУЩ", ["страница", "страницы", "страниц", "странице"]),
    "сайт": ("СУЩ", ["сайт", "сайта", "сайты", "сайтов"]),
    "текст": ("СУЩ", ["текст", "текста", "тексты", "текстов"]),
    "лемма": ("СУЩ", ["лемма", "леммы", "лемм", "леммами"]),
    "быстрый": ("ПРИЛ", ["быстрый", "быстрая", "быстрое", "быстрые", "быстро"]),
    "медленный": ("ПРИЛ", ["медленный", "медленная", "медленные", "медленно"]),
    "большой": ("ПРИЛ", ["большой", "большая", "большие", "больших"]),
    "строить": ("ГЛ", ["строить", "строит", "строят", "строил", "строила"]),
    "искать": ("ГЛ", ["искать", "ищет", "ищут", "искал", "искала"]),
    "считать": ("ГЛ", ["считать", "считает", "считают", "считал"]),
    # --- Russian function words (stop POS — filtered out)
    "и": ("СОЮЗ", ["и"]),
    "а-союз": ("СОЮЗ", ["а"]),
    "но": ("СОЮЗ", ["но"]),
    "в": ("ПРЕДЛ", ["в", "во"]),
    "на-предл": ("ПРЕДЛ", ["на"]),
    "с": ("ПРЕДЛ", ["с", "со"]),
    "ох": ("МЕЖД", ["ох", "ах", "эх"]),
    # --- Latin/engine-domain words (NOUN/VERB, not stop-filtered)
    "spark": ("NOUN", ["spark", "sparks"]),
    "join": ("NOUN", ["join", "joins", "joined", "joining"]),
    "index": ("NOUN", ["index", "indexes", "indices", "indexed"]),
    "query": ("NOUN", ["query", "queries", "queried"]),
    "shuffle": ("NOUN", ["shuffle", "shuffles", "shuffled"]),
    "partition": ("NOUN", ["partition", "partitions", "partitioned"]),
    "stream": ("NOUN", ["stream", "streams", "streaming", "streamed"]),
    "table": ("NOUN", ["table", "tables"]),
    "column": ("NOUN", ["column", "columns"]),
    "filter": ("NOUN", ["filter", "filters", "filtered"]),
    "merge": ("NOUN", ["merge", "merges", "merged", "merging"]),
    "sort": ("NOUN", ["sort", "sorts", "sorted", "sorting"]),
    "hash": ("NOUN", ["hash", "hashes", "hashed"]),
    "batch": ("NOUN", ["batch", "batches", "batched"]),
    "vector": ("NOUN", ["vector", "vectors", "vectorized"]),
}

# surfaces that map to MULTIPLE lemmas (multi-lemma expansion, A1) —
# e.g. Russian "стекла" = noun "стекло" (glass) or verb "стечь" (flow down).
_HOMOGRAPHS: dict[str, list[tuple[str, str]]] = {
    "стекла": [("стекло", "СУЩ"), ("стечь", "ГЛ")],
    "печь": [("печь", "СУЩ"), ("печь", "ГЛ")],
    "rows": [("row", "NOUN"), ("rows", "VERB")],
}


def build_dictionary() -> dict[str, list[tuple[str, str]]]:
    """surface -> list of (lemma, pos); deterministic order."""
    d: dict[str, list[tuple[str, str]]] = {}
    for lemma, (pos, surfaces) in sorted(_PARADIGMS.items()):
        # strip the disambiguating suffix used for duplicate dict keys
        canon = lemma.split("-")[0]
        for s in surfaces:
            d.setdefault(s, []).append((canon, pos))
    for s, pairs in sorted(_HOMOGRAPHS.items()):
        d.setdefault(s, []).extend(pairs)
    return d


def load_dictionary_file(path: str) -> dict[str, list[tuple[str, str]]]:
    """Load a morphology table: TSV lines ``surface<TAB>lemma<TAB>pos``
    (one candidate per line; repeated surfaces = multi-lemma
    expansion; '#' comments and blank lines ignored), preserving file
    order per surface.

    This is the PRODUCTION swap-in for the shipped test dictionary:
    export a real morphology table (e.g. a RussianLuceneMorphology
    dump — the reference's source, mapper/LemmaMapper.java:19) to this
    format and point SEARCHENGINE_LEMMA_DICT at it. On a real cluster
    also set spark.executorEnv.SEARCHENGINE_LEMMA_DICT (and ship the
    file via --files); in local mode workers inherit the driver env.
    Everything derived — the fused engine kernel (textproc), the
    pure-Python oracle (tests/oracle.py) and the generated oracle SQL
    (contract_pipeline) — rebuilds from the loaded table at import, so
    engine/oracle byte-identity is preserved under any dictionary."""
    d: dict[str, list[tuple[str, str]]] = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            surface, lemma, pos = line.split("\t")
            d.setdefault(surface, []).append((lemma, pos))
    return d


import os as _os  # noqa: E402

_DICT_PATH = _os.environ.get("SEARCHENGINE_LEMMA_DICT")
LEMMA_DICT: dict[str, list[tuple[str, str]]] = (
    load_dictionary_file(_DICT_PATH) if _DICT_PATH else build_dictionary()
)

# All stop surfaces (every lemma candidate has a stop POS) — useful for
# building test corpora with known stopword-heavy skew.
STOP_SURFACES: frozenset[str] = frozenset(
    s for s, pairs in LEMMA_DICT.items() if all(p in STOP_POS for _, p in pairs)
)
