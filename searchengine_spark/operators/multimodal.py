"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the pipeline as `binary` columns with
a `kind` discriminator and a metadata struct; decode / feature-extract
run as Arrow-batched kernels over `mapInPandas`. The decode itself is
STUBBED (no image/audio libraries in this container — see
`_decode_payload`), but everything Spark-side is real and tested:
schema, batch shape, partitioning, and the deterministic fallback
featurizer, so swapping in a real decoder is a one-function change.

Scale notes (100 TB of media):
  * payloads never enter a shuffle — featurize immediately after scan,
    project the binary away, shuffle only the (small) feature rows;
  * mapInPandas streams Arrow batches: bound batch bytes with
    spark.sql.execution.arrow.maxRecordsPerBatch so a partition of
    large blobs never materializes at once;
  * feature extraction is embarrassingly parallel — zero-shuffle stage.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 8

FEATURES_SCHEMA = (
    "doc_id long, kind string, n_bytes long, payload_sha string, "
    "feature array<float>, decode_ok boolean"
)


def _decode_payload(payload: bytes, kind: str) -> np.ndarray:
    """Real decoders (PIL / torchaudio / av) are not available in this
    container. A production deployment implements this per `kind`;
    here any kind except 'fake' raises, and the caller records
    decode_ok=False and falls back to the deterministic featurizer."""
    if kind == "fake":
        # deterministic fake "decode": bytes → pseudo-signal
        arr = np.frombuffer(payload, dtype=np.uint8)
        return arr.astype(np.float32)
    raise NotImplementedError(f"no decoder for kind={kind!r} in this environment")


def _featurize(signal: np.ndarray) -> np.ndarray:
    """Fixed-width feature vector from a 1-D signal: FEATURE_DIM
    bucketed means, normalized to [0, 1] — deterministic, library-free."""
    if len(signal) == 0:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    chunks = np.array_split(signal, FEATURE_DIM)
    return np.array(
        [float(c.mean()) / 255.0 if len(c) else 0.0 for c in chunks],
        dtype=np.float32,
    )


def extract_features(
    assets: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    kind_col: str = "kind",
) -> DataFrame:
    """assets(doc_id, kind, payload binary) → per-asset features via a
    single mapInPandas pass (Arrow batches; binary column pruned out of
    the result)."""
    cols = [id_col, kind_col, payload_col]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for did, kind, payload in zip(
                pdf[id_col], pdf[kind_col], pdf[payload_col]
            ):
                payload = bytes(payload) if payload is not None else b""
                try:
                    sig = _decode_payload(payload, kind)
                    ok = True
                except NotImplementedError:
                    sig = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
                    ok = False
                out.append(
                    {
                        "doc_id": int(did),
                        "kind": kind,
                        "n_bytes": len(payload),
                        "payload_sha": hashlib.sha256(payload).hexdigest()[:16],
                        "feature": _featurize(sig),
                        "decode_ok": ok,
                    }
                )
            yield pd.DataFrame(out)

    return assets.select(*cols).mapInPandas(run, schema=FEATURES_SCHEMA)


FEATURES_E4_SCHEMA = (
    "doc_id long, kind string, n_bytes long, payload_sha string, "
    + ", ".join(f"f{i}_e4 long" for i in range(FEATURE_DIM))
    + ", decode_ok boolean"
)


def extract_features_e4(
    assets: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    kind_col: str = "kind",
) -> DataFrame:
    """Scalar-column variant of extract_features: each feature component
    emitted as an exact ×10⁴ fixed-point BIGINT (floor(x·10⁴+0.5)) so
    every output column is hashable/sortable by the driver canonicalizer
    and expressible in ANSI SQL for the DuckDB oracle.

    Component k is the mean byte value of chunk k of the payload under
    numpy array_split semantics (first n%D chunks get one extra byte),
    normalized by 255. Chunk sums are exact integer arithmetic; the only
    float ops are the two divisions and the 1e4 scale — identical
    literal structure to the oracle SQL (s/sz/255.0*10000.0+0.5)."""
    import math

    cols = [id_col, kind_col, payload_col]
    d = FEATURE_DIM

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for did, kind, payload in zip(
                pdf[id_col], pdf[kind_col], pdf[payload_col]
            ):
                payload = bytes(payload) if payload is not None else b""
                ok = kind == "fake"  # see _decode_payload
                b = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
                n = len(b)
                row = {
                    "doc_id": int(did),
                    "kind": kind,
                    "n_bytes": n,
                    "payload_sha": hashlib.sha256(payload).hexdigest()[:16],
                }
                q, r = divmod(n, d)
                pos = 0
                for k in range(d):
                    sz = q + (1 if k < r else 0)
                    if sz == 0:
                        row[f"f{k}_e4"] = 0
                    else:
                        s = int(b[pos : pos + sz].sum())
                        row[f"f{k}_e4"] = math.floor(
                            s / sz / 255.0 * 10000.0 + 0.5
                        )
                    pos += sz
                row["decode_ok"] = ok
                out.append(row)
            yield pd.DataFrame(out)

    return assets.select(*cols).mapInPandas(run, schema=FEATURES_E4_SCHEMA)


def docs_as_assets(docs: DataFrame, text: str = "text") -> DataFrame:
    """Adapter for testing the plumbing on the driver's `documents`
    table: treat utf-8 text bytes as the opaque payload."""
    return docs.select(
        "doc_id",
        F.lit("fake").alias("kind"),
        F.encode(F.col(text), "utf-8").alias("payload"),
    )
