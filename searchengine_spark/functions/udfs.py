"""Arrow-batched pandas UDFs wrapping the shared text kernels.

Every Python kernel in the engine crosses the JVM↔Python boundary as an
Arrow batch (pandas UDF) — never a row-at-a-time Python UDF
(input_hint: "vectorized pandas/Arrow UDFs (no per-row Python)").
The kernels themselves live in textproc.py so the oracle shares them
verbatim (byte-identity contract).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import textproc


@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """binary HTML → normalized text (reference: WebpageMapper.java:38-52)."""
    return html.map(textproc.extract_text)


@F.pandas_udf(T.ArrayType(T.StringType()))
def tokenize_lemmatize_udf(text: pd.Series) -> pd.Series:
    """text → flattened lemma array (reference: LemmaMapper.java:15-43)."""
    return text.map(textproc.tokenize_lemmatize)


@F.pandas_udf(T.ArrayType(T.StringType()))
def tokenize_udf(text: pd.Series) -> pd.Series:
    """text → surface token array (no lemmatization; Str2 only)."""
    return text.map(textproc.tokenize)


# two PARALLEL arrays, not array<struct>: Arrow serializes two plain
# list columns markedly faster than a list-of-struct column, and the
# consumer explodes arrays_zip just as cheaply — measured ~16% off the
# whole materialize_index wall at 240k docs
_TERM_COUNTS_TYPE = T.StructType(
    [
        T.StructField("terms", T.ArrayType(T.StringType())),
        T.StructField("tfs", T.ArrayType(T.IntegerType())),
    ]
)


@F.pandas_udf(_TERM_COUNTS_TYPE)
def term_counts_udf(text: pd.Series) -> pd.DataFrame:
    """text → per-doc TF map as parallel (terms, tfs) arrays — the
    reference's per-page TF map (LemmaMapper.java:15-43) computed where
    it is local: inside the document. Term frequency needs no
    cross-partition aggregation (each doc lives in one row), so
    counting here removes the entire exploded-token shuffle AND
    shrinks the Arrow return payload from one element per token to one
    per distinct term (~15×).

    Counting uses collections._count_elements (the C kernel behind
    Counter) on a plain dict — skips Counter's class dispatch, ~10%
    off the whole tokenize+count path (min-of-5 on 20k corpus docs);
    falls back to Counter if the private helper ever disappears."""
    try:
        from collections import _count_elements as _count
    except ImportError:  # pragma: no cover - CPython-private fallback
        from collections import Counter

        def _count(d, it):
            d.update(Counter(it))

    tl = textproc.tokenize_lemmatize
    terms, tfs = [], []
    for t in text:
        if t is None:
            terms.append([])
            tfs.append([])
            continue
        c: dict = {}
        _count(c, tl(t))
        terms.append(list(c.keys()))
        tfs.append(list(c.values()))
    return pd.DataFrame({"terms": terms, "tfs": tfs})


_TERM_COUNTS_FIELDED_TYPE = T.StructType(
    [
        T.StructField("terms", T.ArrayType(T.StringType())),
        T.StructField("tfs", T.ArrayType(T.IntegerType())),
        # title-field tf PER BODY TERM (aligned with `terms`; 0 when
        # the term is not in the title) + analyzed title length
        T.StructField("ttfs", T.ArrayType(T.IntegerType())),
        T.StructField("tlen", T.IntegerType()),
    ]
)


@F.pandas_udf(_TERM_COUNTS_FIELDED_TYPE)
def term_counts_fielded_udf(text: pd.Series, title: pd.Series) -> pd.DataFrame:
    """(text, title) → per-doc TF map PLUS the title-field layer, in
    ONE Python pass: body counts as in term_counts_udf, then the
    title analyzed with the same kernel and its counts aligned to the
    body terms array (`ttfs[i] = title tf of terms[i]`, a dict lookup
    per distinct term). Extracted text always contains the <title>
    text, so title terms ⊆ body terms and the alignment loses nothing;
    `tlen` is the FULL analyzed title length (Σ title counts) either
    way. Replaces a second term_counts_udf evaluation + a per-posting
    map_from_arrays/element_at projection after the explode — the
    title lookup runs once per distinct term per doc, in Python,
    instead of once per posting row in a generated-code map build."""
    try:
        from collections import _count_elements as _count
    except ImportError:  # pragma: no cover - CPython-private fallback
        from collections import Counter

        def _count(d, it):
            d.update(Counter(it))

    tl = textproc.tokenize_lemmatize
    terms, tfs, ttfs, tlens = [], [], [], []
    for t, ti in zip(text, title):
        if t is None:
            terms.append([])
            tfs.append([])
            ttfs.append([])
            tlens.append(0)
            continue
        c: dict = {}
        _count(c, tl(t))
        ct: dict = {}
        if ti:
            _count(ct, tl(ti))
        terms.append(list(c.keys()))
        tfs.append(list(c.values()))
        ttfs.append([ct.get(k, 0) for k in c])
        tlens.append(sum(ct.values()))
    return pd.DataFrame(
        {"terms": terms, "tfs": tfs, "ttfs": ttfs, "tlen": tlens}
    )


def snippet_udf(query_lemmas: list[str], radius: int = 3,
                mode: str = "word"):
    """Snippet pandas UDF specialized to one query (applied post-top-k
    only, so the closure-captured term list is tiny). mode="word" is
    the oracle-checked word-window default; mode="charwalk" is the
    reference-parity char-walk (textproc.make_snippet_charwalk)."""
    qs = list(query_lemmas)
    fn = (
        textproc.make_snippet_charwalk
        if mode == "charwalk"
        else textproc.make_snippet
    )

    @F.pandas_udf(T.StringType())
    def _snip(text: pd.Series) -> pd.Series:
        return text.map(lambda t: fn(t, qs, radius))

    return _snip
