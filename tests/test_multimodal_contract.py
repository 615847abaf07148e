"""Guards for the q_multimodal_features oracle (contract_pipeline):
the SQL byte-math assumes ASCII text (byte value == codepoint) and the
e4 kernel must follow numpy array_split chunking exactly."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pytest

from searchengine_spark.operators import multimodal

SF_DIR = "/root/testdata/sf0.001"


def _e4_ref(payload: bytes, d: int = multimodal.FEATURE_DIM) -> list[int]:
    """Independent reference: numpy array_split chunk means, e4."""
    b = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
    out = []
    for c in np.array_split(b, d):
        if len(c) == 0:
            out.append(0)
        else:
            out.append(math.floor(int(c.sum()) / len(c) / 255.0 * 10000.0 + 0.5))
    return out


@pytest.mark.parametrize(
    "payload",
    [b"", b"a", b"abc", b"abcdefgh", bytes(range(256)), b"hello world " * 40],
)
def test_e4_kernel_matches_array_split(spark, payload):
    df = spark.createDataFrame(
        [(1, "fake", bytearray(payload))], "doc_id long, kind string, payload binary"
    )
    row = multimodal.extract_features_e4(df).collect()[0]
    ref = _e4_ref(payload)
    got = [row[f"f{k}_e4"] for k in range(multimodal.FEATURE_DIM)]
    assert got == ref
    assert row["n_bytes"] == len(payload)
    assert row["payload_sha"] == hashlib.sha256(payload).hexdigest()[:16]
    assert row["decode_ok"] is True


def test_documents_text_is_ascii(spark):
    """Oracle precondition: byte value == unicode codepoint per char."""
    import duckdb

    n = duckdb.sql(
        f"SELECT sum(CASE WHEN octet_length(encode(text)) <> length(text)"
        f" THEN 1 ELSE 0 END) FROM '{SF_DIR}/documents.parquet'"
    ).fetchone()[0]
    assert n == 0
