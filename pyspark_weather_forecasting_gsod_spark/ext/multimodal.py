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

import struct as _struct
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


def decode_bmp(payload: bytes) -> dict:
    """REAL stdlib-only BMP decoder: parse the BITMAPFILEHEADER +
    BITMAPINFOHEADER with ``struct``, walk the bottom-up pixel rows
    (4-byte row padding respected, and excluded from statistics), and
    return the image's dimensions plus the mean pixel-byte value.

    Supports the uncompressed 24-bit format (BI_RGB); anything else raises
    ``ValueError`` — a decoder that silently mis-reads is worse than one
    that refuses.
    """
    import struct

    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload (missing 'BM' magic)")
    _, file_size, _, _, data_offset = struct.unpack_from("<2sIHHI", payload, 0)
    (
        hdr_size, width, height, planes, bitcount,
        compression, _img_size, _xppm, _yppm, _clr_used, _clr_imp,
    ) = struct.unpack_from("<IiiHHIIiiII", payload, 14)
    if hdr_size < 40 or planes != 1:
        raise ValueError(f"unsupported BMP header (size={hdr_size})")
    if bitcount != 24 or compression != 0:
        raise ValueError(
            f"only uncompressed 24-bit BMP supported (bitcount={bitcount}, "
            f"compression={compression})"
        )
    n_rows = abs(height)
    row_bytes = width * 3
    stride = (row_bytes + 3) & ~3  # rows pad to 4-byte boundaries
    total = 0
    for r in range(n_rows):
        off = data_offset + r * stride
        row = payload[off : off + row_bytes]
        if len(row) != row_bytes:
            raise ValueError("BMP pixel data truncated")
        total += sum(row)
    n_pixel_bytes = n_rows * row_bytes
    return {
        "width": width,
        "height": n_rows,
        "n_pixels": width * n_rows,
        "mean_pixel": total / n_pixel_bytes if n_pixel_bytes else 0.0,
    }


def decode_wav(payload: bytes) -> dict:
    """REAL stdlib-only WAV decoder: walk the RIFF chunk list, parse the
    ``fmt `` chunk, and decode the ``data`` chunk's 16-bit PCM samples.
    Returns stream parameters plus the mean absolute amplitude. Non-PCM or
    non-16-bit content raises ``ValueError``."""
    import struct

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid, csize = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + csize]
        if len(body) != csize:
            # a silently-short slice would decode partial samples without
            # error (r06 review) — refuse, like decode_bmp does
            raise ValueError(f"WAV {cid!r} chunk truncated")
        if cid == b"fmt ":
            if csize < 16:
                raise ValueError("WAV fmt chunk truncated")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + csize + (csize & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, channels, sample_rate, _byte_rate, _block_align, bits = fmt
    if audio_fmt != 1 or bits != 16:
        raise ValueError(f"only PCM16 supported (fmt={audio_fmt}, bits={bits})")
    if channels == 0:
        # n_samples = n // channels below — a channels=0 fmt chunk passed
        # the PCM16 guard and surfaced as ZeroDivisionError, escaping the
        # _DECODE_ERRORS skip net (r08 review)
        raise ValueError("WAV fmt declares 0 channels")
    n = len(data) // 2
    samples = struct.unpack(f"<{n}h", data[: n * 2])
    return {
        "n_channels": channels,
        "sample_rate": sample_rate,
        "n_samples": n // channels,
        "mean_abs": sum(abs(s) for s in samples) / n if n else 0.0,
    }


def _decode_real(payload: bytes, media_type: str):
    """Real decode path. BMP and WAV decode with the stdlib parsers above;
    codec-library formats stay import-gated so the pipeline is honest about
    what runs in this container."""
    if media_type == "image/bmp":
        return decode_bmp(payload)
    if media_type == "audio/wav":
        return decode_wav(payload)
    if media_type.startswith("image/"):
        try:
            import PIL.Image  # noqa: F401
        except ImportError as e:  # pragma: no cover - no PIL in container
            raise NotImplementedError(
                "image decode requires Pillow; not available in this environment"
            ) from e
    raise NotImplementedError(f"no decoder registered for {media_type}")


def synthesize_bmp(digest: bytes, width: int = 16, height: int = 8) -> bytes:
    """Build a VALID uncompressed 24-bit BMP whose pixel bytes tile
    ``digest`` — a deterministic real-format fixture: ``decode_bmp`` (or any
    external viewer) reads it, and because the tiling visits every digest
    byte equally often, the decoded mean pixel equals ``mean(digest)``,
    which a SQL oracle can compute from ``md5(text)`` independently.
    PRECONDITION for that equality (r08 review): the row stride must need
    no padding and tile the digest a whole number of times — i.e.
    ``(width*3) % 4 == 0`` and ``(stride*height) % len(digest) == 0``
    (the default 16×8 over a 16-byte digest satisfies both); padded
    widths still produce a VALID decodable BMP, but padding bytes drop
    out of the decoded mean and the simple oracle identity no longer
    holds (the width=5 pytest computes the padded expectation
    explicitly)."""
    import struct

    row_bytes = width * 3
    stride = (row_bytes + 3) & ~3
    n = stride * height
    pix = bytes(digest[i % len(digest)] for i in range(n))
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, n, 2835, 2835, 0, 0)
    hdr = struct.pack("<2sIHHI", b"BM", 54 + n, 0, 0, 54)
    return hdr + info + pix


def synthesize_wav(
    digest: bytes, n_samples: int = 256, sample_rate: int = 8000
) -> bytes:
    """Build a VALID mono PCM16 WAV whose samples tile ``digest`` as
    little-endian int16 — same oracle property as ``synthesize_bmp``: the
    decoded mean |amplitude| equals the mean |int16| of the digest's 2-byte
    words, computable in SQL from the md5 hex — PROVIDED ``n_samples``
    is a multiple of the digest's word count (8 for md5; the default 256
    is), so the tiling is whole (r08 review)."""
    import struct

    words = len(digest) // 2
    vals = struct.unpack(f"<{words}h", digest[: words * 2])
    samples = struct.pack(f"<{n_samples}h", *(vals[i % words] for i in range(n_samples)))
    data_size = len(samples)
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + data_size)
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", data_size)
        + samples
    )


BMP_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("bmp_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_pixels", T.IntegerType()),
        T.StructField("mean_pixel", T.DoubleType()),
    ]
)

WAV_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("wav_bytes", T.LongType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("mean_abs", T.DoubleType()),
    ]
)


def _nonnull(df: DataFrame, id_col: str, value_col: str) -> DataFrame:
    """Shared pre-filter for every Arrow-batched wrapper: a single NULL
    payload/text row would otherwise crash the whole task 4 retries deep
    inside pandas (``bytes(None)``/``None.encode`` — r06 review). Rows
    with nothing to decode produce no feature row, the same contract as
    ``chunk_windows`` on NULL text."""
    return df.select(id_col, value_col).filter(F.col(value_col).isNotNull())


#: what 'skip' means operationally: every exception class a malformed
#: payload can surface from the scalar decoders. ValueError is the
#: decoders' own refusal; struct.error escapes any ``unpack`` a future
#: decoder edit leaves unguarded (r07 advice: catching ValueError alone
#: let one corrupt row fail the whole mapInPandas job despite the
#: documented skip contract).
_DECODE_ERRORS = (ValueError, _struct.error)


def _check_on_error(on_error: str) -> bool:
    """Validate the wrappers' shared ``on_error`` knob → True iff 'skip'.

    The strict scalar decoders (``decode_bmp``/``decode_wav``/``dhash_bmp``
    /``ahash_wav``) raise on malformed payloads by contract — correct for a
    single clip, but inside ``mapInPandas`` one bad clip in a corpus would
    fail the whole job after task retries (r06 advice). ``'skip'``
    (default) extends the ``_nonnull`` contract to undecodable payloads
    (``_DECODE_ERRORS``): the row produces no feature row, the job
    survives. ``'raise'`` restores fail-fast for callers who
    pre-validated their media."""
    if on_error not in ("skip", "raise"):
        raise ValueError("on_error must be 'skip' or 'raise'")
    return on_error == "skip"


def decode_bmp_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    on_error: str = "skip",
) -> DataFrame:
    """Arrow-batched REAL BMP decode over ``mapInPandas``: every payload
    crosses the actual header-parse + pixel-walk path (``decode_bmp``), not
    a fake. Same batch shape and partition parallelism as the stubbed
    ``decode_features``. Malformed payloads follow ``on_error`` — 'skip'
    (no feature row, job survives; the ``_nonnull`` contract) or
    'raise'."""
    skip = _check_on_error(on_error)

    def process(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = {k.name: [] for k in BMP_DECODE_SCHEMA.fields}
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                try:
                    d = decode_bmp(b)
                except _DECODE_ERRORS:
                    if skip:
                        continue
                    raise
                out["doc_id"].append(did)
                out["bmp_bytes"].append(len(b))
                out["width"].append(d["width"])
                out["height"].append(d["height"])
                out["n_pixels"].append(d["n_pixels"])
                out["mean_pixel"].append(d["mean_pixel"])
            yield pd.DataFrame(out)

    return _nonnull(df, id_col, payload_col).mapInPandas(process, BMP_DECODE_SCHEMA)


def decode_wav_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    on_error: str = "skip",
) -> DataFrame:
    """Arrow-batched REAL WAV decode over ``mapInPandas`` (RIFF chunk walk
    + PCM16 sample decode per payload). Malformed/truncated/non-PCM16
    payloads follow ``on_error`` — 'skip' (default) or 'raise'."""
    skip = _check_on_error(on_error)

    def process(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = {k.name: [] for k in WAV_DECODE_SCHEMA.fields}
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                try:
                    d = decode_wav(b)
                except _DECODE_ERRORS:
                    if skip:
                        continue
                    raise
                out["doc_id"].append(did)
                out["wav_bytes"].append(len(b))
                out["n_channels"].append(d["n_channels"])
                out["sample_rate"].append(d["sample_rate"])
                out["n_samples"].append(d["n_samples"])
                out["mean_abs"].append(d["mean_abs"])
            yield pd.DataFrame(out)

    return _nonnull(df, id_col, payload_col).mapInPandas(process, WAV_DECODE_SCHEMA)


def attach_media_payload(
    df: DataFrame,
    media_type: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Attach a REAL media payload (valid BMP or WAV file bytes) derived
    deterministically from ``md5(text_col)`` — the fixture generator for
    the real-decoder queries. Runs as an Arrow batch map; payloads are
    opaque binary downstream, exactly like ingested media."""
    import hashlib

    synth = {"image/bmp": synthesize_bmp, "audio/wav": synthesize_wav}[media_type]

    def process(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "payload": [
                        synth(hashlib.md5(t.encode("utf-8")).digest())
                        for t in pdf[text_col]
                    ],
                }
            )

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    return _nonnull(df, id_col, text_col).mapInPandas(process, schema)


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

    return _nonnull(df, id_col, payload_col).mapInPandas(process, DECODE_OUTPUT_SCHEMA)


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

    return _nonnull(df, id_col, payload_col).mapInPandas(process, FRAME_OUTPUT_SCHEMA)


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
    if factor < 1:
        # factor=0 is a slice-step crash inside every task; factor<0
        # reverses the full payload and silently breaks the size-reduction
        # contract (r08 review)
        raise ValueError("resize_payload: factor must be >= 1")

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

    return _nonnull(df, id_col, payload_col).mapInPandas(process, RESIZE_OUTPUT_SCHEMA)


def dhash_bmp(payload: bytes, hash_w: int = 8, hash_h: int = 8) -> int:
    """64-bit difference hash (dHash — the classic perceptual image
    fingerprint) computed from the REAL BMP decode: grayscale the pixels,
    block-average down to a (hash_w+1) × hash_h grid, set bit
    ``y*hash_w + x`` iff the cell is darker than its right neighbor.
    Integer arithmetic throughout (floor means), so the hash is exactly
    reproducible anywhere.

    Near-identical images differ in a few bits; unrelated images differ
    in ~32 — the gap ``hamming_neardup_pairs`` exploits."""
    import struct

    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload (missing 'BM' magic)")
    _, _, _, _, data_offset = struct.unpack_from("<2sIHHI", payload, 0)
    hdr_size, width, height, _planes, bitcount, compression = struct.unpack_from(
        "<IiiHHI", payload, 14
    )
    if bitcount != 24 or compression != 0:
        raise ValueError("dhash_bmp supports uncompressed 24-bit BMP only")
    n_rows = abs(height)
    if width <= 0 or n_rows == 0:
        # a 0×N image has no pixel differences to hash; pooling it would
        # divide by an empty cell (r07 advice: every malformed-payload
        # failure must be ValueError so on_error='skip' honors its contract)
        raise ValueError(f"dhash_bmp: empty image ({width}x{n_rows})")
    row_bytes = width * 3
    stride = (row_bytes + 3) & ~3
    # grayscale grid (bottom-up rows — orientation is consistent, which is
    # all a fingerprint needs)
    gray = []
    for r in range(n_rows):
        off = data_offset + r * stride
        row = payload[off : off + row_bytes]
        if len(row) != row_bytes:
            # decode_bmp refuses truncated pixel data; without this the
            # short row surfaced as IndexError below (r07 advice)
            raise ValueError("BMP pixel data truncated")
        gray.append([
            (row[3 * x] + row[3 * x + 1] + row[3 * x + 2]) // 3
            for x in range(width)
        ])
    gw, gh = hash_w + 1, hash_h
    pooled = []
    for cy in range(gh):
        y0, y1 = cy * n_rows // gh, max((cy + 1) * n_rows // gh, cy * n_rows // gh + 1)
        prow = []
        for cx in range(gw):
            x0, x1 = cx * width // gw, max((cx + 1) * width // gw, cx * width // gw + 1)
            cells = [gray[y][x] for y in range(y0, min(y1, n_rows)) for x in range(x0, min(x1, width))]
            prow.append(sum(cells) // len(cells))
        pooled.append(prow)
    h = 0
    for cy in range(gh):
        for cx in range(hash_w):
            if pooled[cy][cx] < pooled[cy][cx + 1]:
                h |= 1 << (cy * hash_w + cx)
    return h - (1 << 64) if h >= 1 << 63 else h  # two's-complement into int64


def bmp_dhash_features(
    mm: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    out_col: str = "dhash",
    on_error: str = "skip",
) -> DataFrame:
    """Per-image 64-bit dHash over Arrow batches (``mapInPandas``) — the
    map-only fingerprint pass of the image near-dup pipeline; payloads
    never leave the executor. Malformed payloads follow ``on_error`` —
    'skip' (default) or 'raise'."""
    import pandas as pd

    skip = _check_on_error(on_error)

    def process(batches: Iterator) -> Iterator:
        for pdf in batches:
            ids, hashes = [], []
            for did, p in zip(pdf[id_col], pdf[payload_col]):
                try:
                    h = dhash_bmp(bytes(p))
                except _DECODE_ERRORS:
                    if skip:
                        continue
                    raise
                ids.append(did)
                hashes.append(h)
            yield pd.DataFrame({id_col: ids, out_col: hashes})

    return _nonnull(mm, id_col, payload_col).mapInPandas(
        process, f"{id_col} long, {out_col} long"
    )


def ahash_wav(payload: bytes, hash_bits: int = 64) -> int:
    """64-bit audio energy fingerprint from the REAL WAV/PCM16 decode —
    the audio sibling of ``dhash_bmp``: split the sample stream into
    ``hash_bits + 1`` segments, take each segment's mean absolute
    amplitude (integer arithmetic — sum//len, bit-reproducible anywhere),
    and set bit ``i`` iff segment ``i`` is louder than segment ``i+1``.
    Re-encoded or lightly edited audio flips a few bits; unrelated audio
    differs in ~32 — the gap ``hamming_neardup_pairs`` exploits, so the
    SAME lossless Hamming band join dedups images and audio alike."""
    import struct

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid, csize = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + csize]
        if len(body) != csize:
            raise ValueError(f"WAV {cid!r} chunk truncated")
        if cid == b"fmt ":
            if csize < 16:
                raise ValueError("WAV fmt chunk truncated")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + csize + (csize & 1)
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, channels, _rate, _brate, _balign, bits = fmt
    # fingerprinting non-PCM16 bytes as int16 pairs yields deterministic
    # garbage, and interleaved stereo never matches its own mono downmix —
    # refuse, per this module's decoder contract (r06 review)
    if audio_fmt != 1 or bits != 16:
        raise ValueError(f"only PCM16 supported (fmt={audio_fmt}, bits={bits})")
    if channels != 1:
        raise ValueError(
            f"ahash_wav fingerprints mono streams only ({channels} channels)"
            " — downmix before hashing"
        )
    n = len(data) // 2
    samples = struct.unpack(f"<{n}h", data[: n * 2])
    segs = hash_bits + 1
    if n < segs:
        raise ValueError(f"need >= {segs} samples for a {hash_bits}-bit hash")
    energy = []
    for s in range(segs):
        lo, hi = s * n // segs, max((s + 1) * n // segs, s * n // segs + 1)
        chunk = samples[lo:hi]
        energy.append(sum(abs(x) for x in chunk) // len(chunk))
    h = 0
    for i in range(hash_bits):
        if energy[i] > energy[i + 1]:
            h |= 1 << i
    return h - (1 << 64) if h >= 1 << 63 else h


def wav_ahash_features(
    mm: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    out_col: str = "ahash",
    on_error: str = "skip",
) -> DataFrame:
    """Per-clip audio fingerprint over Arrow batches — map-only, payloads
    never leave the executor (mirrors ``bmp_dhash_features``). Stereo /
    non-PCM16 / truncated clips follow ``on_error`` — 'skip' (default)
    or 'raise'."""
    import pandas as pd

    skip = _check_on_error(on_error)

    def process(batches: Iterator) -> Iterator:
        for pdf in batches:
            ids, hashes = [], []
            for did, p in zip(pdf[id_col], pdf[payload_col]):
                try:
                    h = ahash_wav(bytes(p))
                except _DECODE_ERRORS:
                    if skip:
                        continue
                    raise
                ids.append(did)
                hashes.append(h)
            yield pd.DataFrame({id_col: ids, out_col: hashes})

    return _nonnull(mm, id_col, payload_col).mapInPandas(
        process, f"{id_col} long, {out_col} long"
    )
