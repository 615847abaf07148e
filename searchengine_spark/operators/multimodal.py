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


def docs_as_assets(docs: DataFrame, text: str = "text") -> DataFrame:
    """Adapter for testing the plumbing on the driver's `documents`
    table: treat utf-8 text bytes as the opaque payload."""
    return docs.select(
        "doc_id",
        F.lit("fake").alias("kind"),
        F.encode(F.col(text), "utf-8").alias("payload"),
    )
