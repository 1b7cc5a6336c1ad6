"""Multimodal-column plumbing: opaque payloads + typed metadata.

The reference stores every value as opaque bytes (``Box<[u8]>``,
reference src/storage/table.rs:27) and leaves interpretation to the
consumer (reference src/tests/integration_test.rs:247-249). This module
is that model made first-class for image/audio/video payloads at 100 TB:

- payloads are ``BinaryType`` columns with typed metadata alongside;
- decode / feature-extraction runs as Arrow-batched ``mapInPandas``
  (one Python process per partition, columnar transfer — never
  row-at-a-time UDFs);
- real codecs (PIL/opencv/ffmpeg) are NOT in this container, so the
  decode step is stubbed: :func:`decode_image` raises
  ``NotImplementedError`` by design, while :func:`frame_features`
  demonstrates the identical plumbing with a deterministic
  hash-per-frame "decoder" that an oracle can verify.

Scale notes: ``mapInPandas`` preserves partitioning (no shuffle); frame
explosion multiplies rows ~n_frames×, so callers should size
``spark.sql.files.maxPartitionBytes`` such that post-explosion batches
fit executor memory. Feature extraction is embarrassingly parallel.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import types as T

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_md5", T.StringType()),
        T.StructField("frame_len", T.LongType()),
    ]
)


def decode_image(payload: bytes) -> "object":
    """STUB — image decoding needs PIL/opencv, not present here.

    The Spark-side plumbing (binary column in, ``mapInPandas`` over
    Arrow batches, struct-typed features out) is what this module
    tests; swap this function for a real decoder on a cluster that
    has the codec libraries installed.
    """
    raise NotImplementedError(
        "image decode requires PIL/opencv (not in this container); "
        "use frame_features() for the plumbing-equivalent path"
    )


def frame_features(
    df: DataFrame,
    payload_col: str = "text",
    id_col: str = "doc_id",
    frame_chars: int = 64,
    every_k: int = 3,
) -> DataFrame:
    """Frame-sample an opaque payload column and fingerprint each frame.

    Models video frame-sampling: split each payload into fixed-size
    frames, keep every ``every_k``-th, emit a deterministic md5
    "feature" per kept frame. Runs as Arrow-batched ``mapInPandas`` —
    the exact shape a real decode/resize/embed stage would use.
    """

    def extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for batch in batches:
            ids: list[int] = []
            idxs: list[int] = []
            hashes: list[str] = []
            lens: list[int] = []
            for doc_id, payload in zip(batch[id_col], batch[payload_col]):
                if payload is None:
                    continue
                n_frames = -(-len(payload) // frame_chars)  # ceil div
                for i in range(0, n_frames, every_k):
                    frame = payload[i * frame_chars : (i + 1) * frame_chars]
                    ids.append(doc_id)
                    idxs.append(i)
                    hashes.append(hashlib.md5(frame.encode("utf-8")).hexdigest())
                    lens.append(len(frame))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame_md5": pd.Series(hashes, dtype="object"),
                    "frame_len": pd.Series(lens, dtype="int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(extract, FRAME_SCHEMA)
