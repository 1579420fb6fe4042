"""Multimodal columns: opaque binary payloads + typed metadata.

North-star extension (BASELINE.json): treat image/audio/video as opaque
``binary`` columns with typed metadata, and run decode / feature-extraction
as Arrow-batched pandas functions over ``mapInPandas``. The container has no
image/audio libraries, so the actual decode is STUBBED — gated behind an
import-try that raises ``NotImplementedError`` when a real codec is
requested, with a deterministic fake "decoder" that exercises the real
Spark-side plumbing: binary column handling, Arrow batch shapes, output
schema with array<float> features, and partition-parallel execution.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Typed metadata for an opaque payload column.
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("digest", T.StringType()),
    ]
)

DECODE_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("head_hex", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def attach_binary_payload(
    df: DataFrame, text_col: str = "text", media_type: str = "text/plain"
) -> DataFrame:
    """Simulate a multimodal table: encode ``text_col`` as the opaque binary
    payload and attach typed metadata (the pattern for real image/audio
    ingestion: payload stays opaque, metadata is queryable/prunable)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    meta = F.struct(
        F.lit(media_type).alias("media_type"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.md5(payload).alias("digest"),
    )
    return df.select(*df.columns, payload.alias("payload"), meta.alias("media_meta"))


def _decode_real(payload: bytes, media_type: str):
    """Real decode path — requires codec libraries absent from this
    container. Kept import-gated so the pipeline is honest about what runs."""
    if media_type.startswith("image/"):
        try:
            import PIL.Image  # noqa: F401
        except ImportError as e:  # pragma: no cover - no PIL in container
            raise NotImplementedError(
                "image decode requires Pillow; not available in this environment"
            ) from e
    raise NotImplementedError(f"no decoder registered for {media_type}")


def _fake_feature(payload: bytes, dim: int = 4) -> list[float]:
    """Deterministic stand-in for a decoded feature vector: byte-sum folds
    per stripe. Stable across runs/partitions — good for plumbing tests."""
    if not payload:
        return [0.0] * dim
    stripe = max(1, len(payload) // dim)
    return [
        float(sum(payload[i * stripe : (i + 1) * stripe]) % 997) for i in range(dim)
    ]


def decode_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    use_real_codec: bool = False,
) -> DataFrame:
    """Arrow-batched decode/feature-extract over ``mapInPandas``.

    The real-codec path raises ``NotImplementedError`` (no codec libs in
    this container); the default deterministic fake exercises identical
    plumbing: binary columns through Arrow, per-batch pandas processing,
    array<float> output schema. Runs partition-parallel; at 100 TB this is
    the shape for GPU/codec-bound per-record work (pair with
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` to bound batch memory).
    """

    def process(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            payloads = pdf[payload_col]
            if use_real_codec:
                # pragma: no cover — raises in this environment by design
                [_decode_real(p, "image/unknown") for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "head_hex": payloads.map(lambda b: bytes(b[:8]).hex()),
                    "feature": payloads.map(_fake_feature),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(process, DECODE_OUTPUT_SCHEMA)


FRAME_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_digest", T.StringType()),
    ]
)


def sample_frames(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    frame_bytes: int = 256,
    stride: int = 2,
) -> DataFrame:
    """Frame sampling over an opaque (video-like) payload: every
    ``stride``-th fixed-size frame is extracted and digested — the
    1-row-in → N-rows-out Arrow shape real video pipelines need
    (mapInPandas yields more rows than it consumes; Spark handles the
    fan-out batch-wise, no driver involvement, no exploded intermediate
    column).

    Deterministic by construction (byte-offset framing + md5), so a SQL
    oracle can replicate it exactly; a real codec would replace the
    framing with keyframe extraction behind the same schema.
    """

    def process(batches: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        step = frame_bytes * stride
        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            digs: list[str] = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                for k, off in enumerate(range(0, len(b) - frame_bytes + 1, step)):
                    ids.append(did)
                    idxs.append(k)
                    digs.append(hashlib.md5(b[off : off + frame_bytes]).hexdigest())
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_digest": digs}
            )

    return df.select(id_col, payload_col).mapInPandas(process, FRAME_OUTPUT_SCHEMA)


RESIZE_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("orig_bytes", T.LongType()),
        T.StructField("resized_bytes", T.LongType()),
        T.StructField("resized_digest", T.StringType()),
    ]
)


def resize_payload(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    factor: int = 4,
) -> DataFrame:
    """Resize/downsample stub: keep every ``factor``-th byte of the opaque
    payload (a real image resize is a decode → interpolate → re-encode with
    the same 1-row-in/1-row-out Arrow shape and a size-reduction contract).
    Deterministic byte selection, so a SQL oracle reproduces the digest
    exactly; emits original/resized sizes so the reduction ratio is
    auditable downstream."""

    def process(batches: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in batches:
            orig, small, digs = [], [], []
            for payload in pdf[payload_col]:
                b = bytes(payload)
                r = b[::factor]
                orig.append(len(b))
                small.append(len(r))
                digs.append(hashlib.md5(r).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "orig_bytes": orig,
                    "resized_bytes": small,
                    "resized_digest": digs,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(process, RESIZE_OUTPUT_SCHEMA)
