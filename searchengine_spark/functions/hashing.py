"""Deterministic cross-engine hashing primitives.

Every dedup/similarity operator needs hash values that are *identical*
in the Spark engine and the ANSI-SQL oracle (DuckDB), so all hashing
here is defined in terms of md5 (bit-identical everywhere) and exact
64-bit integer arithmetic — no engine-private hash functions in any
oracle-checked path. (The index build itself uses xxhash64 for doc_ids,
which only needs to be *cluster*-stable, not oracle-reproducible.)

    h32(s)      = int(md5(s)[:8 hex], 16)            ∈ [0, 2^32)
    minhash_k   = min over shingles of (a_k·(h32 % P) + b_k) % P
    P           = 2^31 - 1 (Mersenne prime)

Overflow safety: (h % P) < 2^31 and a_k < 2^31 ⇒ a·h < 2^62 < int64
max, so the arithmetic is exact in both engines' BIGINT.

Scale note (100 TB): md5-via-expression is JVM-side (whole-stage
codegen) in Spark — no Python in any of these kernels.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

P31 = 2_147_483_647  # 2^31 - 1
NUM_MINHASH = 16
LSH_BANDS = 4
LSH_ROWS = NUM_MINHASH // LSH_BANDS


def minhash_params(k: int) -> tuple[int, int]:
    """(a_k, b_k) for the k-th universal-hash permutation — fixed
    literals shared by engine and oracle."""
    a = (2_654_435_761 * (k + 1)) % P31
    if a == 0:
        a = 1
    b = (40_503 * (k + 1) + 7) % P31
    return a, b


def h32(col: Column) -> Column:
    """First 32 bits of md5(col) as BIGINT — Spark side.
    Oracle equivalent: ('0x' || substr(md5(x), 1, 8))::BIGINT."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def h32_sql(expr: str) -> str:
    """Same hash as DuckDB SQL text."""
    return f"('0x' || substr(md5({expr}), 1, 8))::BIGINT"


def h60(col: Column) -> Column:
    """First 60 bits of md5(col) as BIGINT — Spark side. Used where a
    32-bit keyspace would birthday-collide at corpus scale (boilerplate
    line sets: ~2^31 keys collide around 10^5 distinct lines, silently
    dropping unrelated content). 15 hex digits = 60 bits keeps the
    value exact in a signed 64-bit integer on both engines.
    Oracle equivalent: h60_sql."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def h60_sql(expr: str) -> str:
    """Same 60-bit hash as DuckDB SQL text."""
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"


# Character-level polynomial rolling hash (duplicate_spans): the
# window hash is fold(chars, 0, (acc, c) -> (acc·CHAR_BASE +
# codepoint(c)) % CHAR_MOD) — computable incrementally in O(len) per
# doc (vs md5 at every offset: O(window·len) bytes hashed).
# CHAR_MOD is the largest prime < 2^42: the vectorized numpy kernel
# accumulates acc + code·pw in uint64 (code < 0x110000 ≈ 2^20.1, pw <
# CHAR_MOD ⇒ products < 2^62.2), and the oracle's BIGINT fold computes
# acc·131 + c < 2^49 — both exact.
CHAR_BASE = 131  # same base as textstats.FP_BASE's token fold
CHAR_MOD = 4_398_046_511_093
