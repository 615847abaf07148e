"""Replicates the driver's correctness gate locally: run every
queries() entry at sf0.01 on Spark AND its oracle_sql() on DuckDB,
compare row count + column names + order-insensitive values."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return str(v)


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


NAMES = sorted(entry_mod.queries())


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    sqls = entry_mod.oracle_sql()
    sdf = q(spark, SF_DIR)
    srows = sdf.collect()
    scols = sdf.columns
    if name not in sqls:
        assert srows is not None  # rows-only check for non-SQL ops
        return
    res = duck.sql(sqls[name])
    drows = res.fetchall()
    dcols = [c for c in res.columns]
    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} vs {len(drows)}"
    a = _canon([[r[c] for c in scols] for r in srows], scols)
    b = _canon(drows, dcols)
    mism = [i for i, (x, y) in enumerate(zip(a, b)) if x != y][:5]
    assert a == b, f"{name}: value mismatch at {mism}: {[ (a[i], b[i]) for i in mism ]}"


def test_registry_priority_order():
    """queries()/oracle_sql() emit in _PRIORITY order without losing or
    inventing entries, and every name this round actually has a row slot
    in the first 50 positions if it is new/reworked (driver sweeps have
    been observed to truncate at ~50 rows)."""
    from searchengine_spark import contract

    from searchengine_spark import contract_pipeline

    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    # permutation vs the RAW registries: _ordered() loses nothing
    raw = set(contract._REG) | set(contract_pipeline._REG)
    assert set(q) == raw, set(q) ^ raw
    assert set(o) <= set(q)
    # every registered entry is explicitly placed (forces a conscious
    # ordering decision when a new operator lands), and no stale names
    assert set(q) == set(contract._PRIORITY), (
        set(q) ^ set(contract._PRIORITY)
    )
    head50 = list(q)[:50]
    # r5 rotation (VERDICT r4 #4): the 30 entries whose latest driver
    # row is r3 must sit in the first 50 sweep slots this round
    for name in [
        "q_dedup_ngram_jaccard", "q_dedup_embedding", "q_ann_cosine_topk",
        "q_ann_lsh_bucket", "q_token_counts", "q_lang_id",
        "q_quality_score", "q_fingerprint", "q_multimodal_features",
        "q_asof_join", "q_range_join", "q_events_hourly", "q_sessionize",
        "q_time_rollup", "q_rollup_source_lang", "q_clean_corpus",
        "q_training_mixture", "q_phrase_match", "q_proximity_match",
        "q_dedup_components", "q_decontaminate", "q_repetition_stats",
        "q_train_split", "q_stratified_sample", "q_pack_sequences",
        "q_mixture_sample", "q_ann_ivf", "q_kmv_distinct", "q_topk_rank",
        "q_search_snippets",
    ]:
        assert name in head50, f"{name} not in first 50 sweep slots"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["doc_id", "score"]
