"""Property tests: varbyte/delta roundtrip (SURVEY.md §5.2.4)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from searchengine_spark.index import varbyte as vb


@given(
    st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=300)
)
@settings(max_examples=200, deadline=None)
def test_varbyte_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert np.array_equal(vb.varbyte_decode(vb.varbyte_encode(arr)), arr)


@given(
    st.lists(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        max_size=300,
        unique=True,
    )
)
@settings(max_examples=200, deadline=None)
def test_delta_roundtrip_signed_ids(ids):
    arr = np.sort(np.array(ids, dtype=np.int64))
    assert np.array_equal(vb.delta_decode_ids(vb.delta_encode_ids(arr)), arr)


def test_boundaries():
    cases = [0, 1, 127, 128, 16383, 16384, 2**56 - 1, 2**56, 2**63, 2**64 - 1]
    arr = np.array(cases, dtype=np.uint64)
    assert np.array_equal(vb.varbyte_decode(vb.varbyte_encode(arr)), arr)


def test_empty():
    assert vb.varbyte_encode(np.empty(0, dtype=np.uint64)) == b""
    assert vb.varbyte_decode(b"").size == 0
    assert vb.delta_decode_ids(vb.delta_encode_ids(np.empty(0, dtype=np.int64))).size == 0


def test_compression_ratio_small_gaps():
    # dense sorted ids → 1-2 bytes/gap, ~4-8x smaller than raw int64
    ids = np.cumsum(np.random.RandomState(0).randint(1, 100, 10000)).astype(np.int64)
    packed = vb.delta_encode_ids(ids)
    assert len(packed) < ids.nbytes / 4
    assert np.array_equal(vb.delta_decode_ids(packed), ids)
