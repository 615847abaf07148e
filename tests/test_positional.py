"""Positional packed index: phrase-from-index must equal the
corpus-scan phrase operator (operators/phrase.py) on the same lemma
stream, including across shard boundaries and with block-level lazy
position decode."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from searchengine_spark.index.positional import (
    build_positional_segments,
    phrase_search_packed,
    phrase_search_packed_terms,
    write_positional_segments,
)
from searchengine_spark.operators.phrase import phrase_match
from searchengine_spark.operators.postings import prepare_docs
from searchengine_spark.sources.corpus import corpus_df

N_SHARDS = 4


@pytest.fixture(scope="module")
def prepared(spark):
    df = prepare_docs(corpus_df(spark, 300), use_html=True).cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def pos_segments(spark, prepared, tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("possegs"))
    write_positional_segments(
        build_positional_segments(prepared, N_SHARDS), tmp
    )
    return spark.read.parquet(tmp)


def _lemma_text(prepared):
    return prepared.select(
        "doc_id", F.concat_ws(" ", "lemmas").alias("text")
    )


def _pick_phrase(prepared, length):
    """A lemma n-gram that actually occurs: from the longest doc."""
    row = prepared.orderBy(F.size("lemmas").desc(), "doc_id").first()
    return [str(t) for t in row["lemmas"][:length]]


def _as_dict(df):
    return {r["doc_id"]: r["phrase_tf"] for r in df.collect()}


@pytest.mark.parametrize("length", [1, 2, 3])
def test_packed_equals_scan(spark, prepared, pos_segments, length):
    phrase = _pick_phrase(prepared, length)
    packed = _as_dict(
        phrase_search_packed_terms(spark, pos_segments, phrase)
    )
    scan = _as_dict(phrase_match(_lemma_text(prepared), phrase))
    assert packed, f"phrase {phrase} should match at least its own doc"
    assert packed == scan


def test_packed_absent_and_empty(spark, pos_segments):
    assert (
        phrase_search_packed_terms(
            spark, pos_segments, ["zzz_not_a_term", "xxx"]
        ).count()
        == 0
    )
    assert phrase_search_packed_terms(spark, pos_segments, []).count() == 0


def test_packed_query_string_analyzer(spark, prepared, pos_segments):
    """The string entrypoint analyzes with the corpus analyzer; a
    single-word query's phrase_tf equals the term's TF."""
    phrase = _pick_phrase(prepared, 1)
    via_terms = _as_dict(
        phrase_search_packed_terms(spark, pos_segments, phrase)
    )
    via_string = _as_dict(
        phrase_search_packed(spark, pos_segments, phrase[0])
    )
    assert via_string == via_terms


def test_block_skip_decode(spark, prepared):
    """Tiny blocks force multi-block runs; results must not change
    (locks the block-offset arithmetic of the lazy position decode)."""
    segs = build_positional_segments(prepared, n_shards=2, block=4)
    phrase = _pick_phrase(prepared, 2)
    small = _as_dict(
        phrase_search_packed_terms(spark, segs, phrase, block=4)
    )
    scan = _as_dict(phrase_match(_lemma_text(prepared), phrase))
    assert small == scan


def test_positions_roundtrip_exact(spark):
    """Hand-built docs: exact positions, repeated words, overlap."""
    docs = spark.createDataFrame(
        [
            (1, ["a", "b", "a", "b", "a"]),
            (2, ["b", "a"]),
            (3, ["a", "a", "a"]),
        ],
        "doc_id long, lemmas array<string>",
    )
    segs = build_positional_segments(docs, n_shards=2, block=2)
    out = {
        r["doc_id"]: r["phrase_tf"]
        for r in phrase_search_packed_terms(
            spark, segs, ["a", "b"], block=2
        ).collect()
    }
    assert out == {1: 2}
    out2 = {
        r["doc_id"]: r["phrase_tf"]
        for r in phrase_search_packed_terms(
            spark, segs, ["a", "a"], block=2
        ).collect()
    }
    assert out2 == {3: 2}
