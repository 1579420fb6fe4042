"""Multimodal-column plumbing (ext/multimodal.py)."""

import pytest
from pyspark.sql import Row

from pyspark_weather_forecasting_gsod_spark.ext.multimodal import (
    _decode_real,
    _fake_feature,
    attach_binary_payload,
    decode_features,
)


def _docs(spark):
    return spark.createDataFrame(
        [Row(doc_id=1, text="hello world"), Row(doc_id=2, text="bytes")]
    )


def test_attach_binary_payload_metadata(spark):
    out = attach_binary_payload(_docs(spark)).collect()
    by_id = {r.doc_id: r for r in out}
    assert bytes(by_id[1].payload) == b"hello world"
    assert by_id[1].media_meta.n_bytes == 11
    assert by_id[1].media_meta.media_type == "text/plain"
    assert len(by_id[1].media_meta.digest) == 32


def test_decode_features_via_map_in_pandas(spark):
    mm = attach_binary_payload(_docs(spark))
    out = {r.doc_id: r for r in decode_features(mm).collect()}
    assert out[1].n_bytes == 11
    assert out[1].head_hex == b"hello wo".hex()
    assert len(out[1].feature) == 4
    # deterministic across runs
    again = {r.doc_id: r for r in decode_features(mm).collect()}
    assert out[1].feature == again[1].feature


def test_fake_feature_deterministic_and_bounded():
    f = _fake_feature(b"abcdefgh")
    assert f == _fake_feature(b"abcdefgh")
    assert all(0.0 <= x < 997 for x in f)
    assert _fake_feature(b"") == [0.0, 0.0, 0.0, 0.0]


def test_real_codec_path_is_honestly_stubbed():
    # codec-library formats stay import-gated; BMP/WAV now decode for real
    with pytest.raises(NotImplementedError):
        _decode_real(b"\x89PNG", "image/png")
    with pytest.raises(NotImplementedError):
        _decode_real(b"\x00\x00\x00\x20ftyp", "video/mp4")


# ---------------------------------------------------------------------------
# REAL stdlib decoders (BMP struct parse, WAV RIFF walk): synthesized valid
# files decode to the exact statistics predicted from the source digest.
# ---------------------------------------------------------------------------
def test_decode_bmp_roundtrip_and_padding():
    from pyspark_weather_forecasting_gsod_spark.ext.multimodal import (
        decode_bmp,
        synthesize_bmp,
    )

    digest = bytes(range(16))
    bmp = synthesize_bmp(digest, width=16, height=8)
    d = decode_bmp(bmp)
    assert (d["width"], d["height"], d["n_pixels"]) == (16, 8, 128)
    # uniform tiling: mean pixel == mean of digest bytes
    assert abs(d["mean_pixel"] - sum(digest) / 16) < 1e-12
    # width 5 → 15-byte rows, 16-byte stride: decoder must EXCLUDE padding
    bmp5 = synthesize_bmp(digest, width=5, height=4)
    d5 = decode_bmp(bmp5)
    exp = []
    for r in range(4):
        row = [digest[(r * 16 + i) % 16] for i in range(15)]
        exp.extend(row)
    assert abs(d5["mean_pixel"] - sum(exp) / len(exp)) < 1e-12


def test_decode_bmp_refuses_garbage_and_unsupported():
    from pyspark_weather_forecasting_gsod_spark.ext.multimodal import decode_bmp

    with pytest.raises(ValueError, match="magic"):
        decode_bmp(b"\x00" * 64)
    with pytest.raises(ValueError):
        decode_bmp(b"BM" + b"\x00" * 10)  # truncated header


def test_decode_wav_roundtrip():
    import struct

    from pyspark_weather_forecasting_gsod_spark.ext.multimodal import (
        decode_wav,
        synthesize_wav,
    )

    digest = bytes(range(16))
    wav = synthesize_wav(digest, n_samples=256, sample_rate=8000)
    d = decode_wav(wav)
    assert (d["n_channels"], d["sample_rate"], d["n_samples"]) == (1, 8000, 256)
    vals = struct.unpack("<8h", digest)
    assert abs(d["mean_abs"] - sum(abs(v) for v in vals) / 8) < 1e-12
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"RIFX" + b"\x00" * 40)


def test_real_decode_via_arrow_batches(spark):
    import hashlib

    from pyspark_weather_forecasting_gsod_spark.ext.multimodal import (
        attach_media_payload,
        decode_bmp_features,
        decode_wav_features,
    )

    docs = _docs(spark)
    bmp = {r.doc_id: r for r in decode_bmp_features(
        attach_media_payload(docs, "image/bmp")).collect()}
    dg = hashlib.md5(b"hello world").digest()
    assert bmp[1].width == 16 and bmp[1].n_pixels == 128
    assert abs(bmp[1].mean_pixel - sum(dg) / 16) < 1e-9
    wav = {r.doc_id: r for r in decode_wav_features(
        attach_media_payload(docs, "audio/wav")).collect()}
    assert wav[1].sample_rate == 8000 and wav[1].n_samples == 256


def test_sample_frames_known_payload(spark):
    import hashlib

    from pyspark_weather_forecasting_gsod_spark.ext.multimodal import (
        attach_binary_payload,
        sample_frames,
    )

    text = "x" * 300 + "y" * 300 + "z" * 300  # 900 bytes -> frames at 0, 512
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    rows = sorted(
        (r["frame_idx"], r["frame_digest"])
        for r in sample_frames(attach_binary_payload(df)).collect()
    )
    b = text.encode()
    want = [
        (0, hashlib.md5(b[0:256]).hexdigest()),
        (1, hashlib.md5(b[512:768]).hexdigest()),
    ]
    assert rows == want


def test_wav_ahash_neardup_finds_perturbed_clips(spark):
    import hashlib

    from pyspark.sql import functions as F

    from pyspark_weather_forecasting_gsod_spark.ext.dedup import (
        hamming_neardup_pairs,
    )
    from pyspark_weather_forecasting_gsod_spark.ext.multimodal import (
        ahash_wav,
        synthesize_wav,
        wav_ahash_features,
    )

    def chained_wav(seed: bytes, n_samples=512):
        buf, block = b"", seed
        while len(buf) < n_samples * 2:
            buf += block
            block = hashlib.md5(block).digest()
        return synthesize_wav(buf[: n_samples * 2], n_samples=n_samples)

    rows = []
    for i in range(30):
        p = chained_wav(hashlib.md5(f"clip{i}".encode()).digest())
        rows.append((i, bytearray(p)))
        if i % 5 == 0:
            # perturb a few samples ("re-encode"): variant id = i + 1000
            v = bytearray(p)
            for off in range(44, 52):
                v[off] ^= 0x01
            rows.append((i + 1000, v))
    df = spark.createDataFrame(
        [(i, bytes(p)) for i, p in rows], "doc_id long, payload binary"
    )
    hashes = wav_ahash_features(df)
    pairs = hamming_neardup_pairs(hashes, "doc_id", "ahash", max_hamming=8).collect()
    planted = {(r["id_a"], r["id_b"]) for r in pairs if r["id_b"] - r["id_a"] == 1000}
    assert len(planted) == 6  # every i % 5 == 0 variant recovered
    others = [r for r in pairs if r["id_b"] - r["id_a"] != 1000]
    assert len(others) <= 2  # unrelated chained-digest clips stay far apart
    # deterministic across calls
    h1 = ahash_wav(bytes(rows[0][1]))
    assert h1 == ahash_wav(bytes(rows[0][1]))


def test_wrappers_skip_malformed_rows_and_raise_on_request(spark):
    """r06 advice: one bad clip in a corpus must not fail the whole job —
    the Arrow wrappers skip undecodable payloads by default (the
    ``_nonnull`` contract extended to decode errors), and on_error='raise'
    restores the strict fail-fast path."""
    from pyspark_weather_forecasting_gsod_spark.ext.multimodal import (
        attach_media_payload,
        bmp_dhash_features,
        decode_bmp_features,
        decode_wav_features,
        wav_ahash_features,
    )

    docs = _docs(spark)
    good_wav = attach_media_payload(docs, "audio/wav")
    good_bmp = attach_media_payload(docs, "image/bmp")
    junk = spark.createDataFrame(
        [Row(doc_id=99, payload=bytearray(b"not media at all"))]
    )
    mixed_wav = good_wav.select("doc_id", "payload").unionByName(junk)
    mixed_bmp = good_bmp.select("doc_id", "payload").unionByName(junk)

    # default skip: the good clips survive, the junk row vanishes
    got = {r.doc_id for r in decode_wav_features(mixed_wav).collect()}
    assert got == {1, 2}
    got = {r.doc_id for r in decode_bmp_features(mixed_bmp).collect()}
    assert got == {1, 2}
    got = {r.doc_id for r in wav_ahash_features(mixed_wav).collect()}
    assert got == {1, 2}
    got = {r.doc_id for r in bmp_dhash_features(mixed_bmp).collect()}
    assert got == {1, 2}

    # on_error='raise' restores fail-fast
    with pytest.raises(Exception, match="RIFF|WAVE"):
        decode_wav_features(mixed_wav, on_error="raise").collect()
    with pytest.raises(Exception, match="BMP"):
        bmp_dhash_features(mixed_bmp, on_error="raise").collect()
    with pytest.raises(ValueError, match="on_error"):
        wav_ahash_features(mixed_wav, on_error="bogus")


def test_skip_contract_covers_truncated_and_degenerate_payloads(spark):
    """r07 advice: 'skip' caught only ValueError, so payloads that pass
    the magic/length guards but die deeper in the parse (truncated pixel
    rows → IndexError in dhash, zero-width images → ZeroDivisionError,
    any future unguarded struct.unpack → struct.error) still failed the
    whole mapInPandas job. The scalar decoders now normalize every
    malformed-payload path to ValueError, the wrappers catch
    ``_DECODE_ERRORS``, and one corrupt row costs one skipped row."""
    import struct

    from pyspark_weather_forecasting_gsod_spark.ext.multimodal import (
        attach_media_payload,
        bmp_dhash_features,
        decode_bmp_features,
        dhash_bmp,
        synthesize_bmp,
    )

    good = synthesize_bmp(bytes(range(16)), width=16, height=8)
    truncated = good[:70]  # valid 54-byte headers, pixel data cut short
    info0 = struct.pack("<IiiHHIIiiII", 40, 0, 8, 1, 24, 0, 0, 0, 0, 0, 0)
    zerow = struct.pack("<2sIHHI", b"BM", 54, 0, 0, 54) + info0

    # scalar contract: both malformed shapes are ValueError, not
    # IndexError/ZeroDivisionError/struct.error
    with pytest.raises(ValueError, match="truncated"):
        dhash_bmp(truncated)
    with pytest.raises(ValueError, match="empty image"):
        dhash_bmp(zerow)

    docs = _docs(spark)
    mixed = (
        attach_media_payload(docs, "image/bmp")
        .select("doc_id", "payload")
        .unionByName(
            spark.createDataFrame(
                [
                    Row(doc_id=90, payload=bytearray(truncated)),
                    Row(doc_id=91, payload=bytearray(zerow)),
                ]
            )
        )
    )
    assert {r.doc_id for r in bmp_dhash_features(mixed).collect()} == {1, 2}
    got = {r.doc_id for r in decode_bmp_features(mixed).collect()}
    assert got == {1, 2, 91}  # decode_bmp reads a 0-width image as all-zero stats
    with pytest.raises(Exception, match="truncated|empty image"):
        bmp_dhash_features(mixed, on_error="raise").collect()

    # channels=0 WAV: passed the PCM16 guard and hit n // channels —
    # ZeroDivisionError escaped _DECODE_ERRORS (r08 review); now ValueError
    from pyspark_weather_forecasting_gsod_spark.ext.multimodal import (
        decode_wav,
        decode_wav_features,
    )

    fmt0 = struct.pack("<HHIIHH", 1, 0, 8000, 0, 0, 16)
    data = struct.pack("<4h", 1, 2, 3, 4)
    zeroch = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt0) + 8 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt0)) + fmt0
        + b"data" + struct.pack("<I", len(data)) + data
    )
    with pytest.raises(ValueError, match="0 channels"):
        decode_wav(zeroch)
    bad = spark.createDataFrame([Row(doc_id=95, payload=bytearray(zeroch))])
    assert decode_wav_features(bad).count() == 0  # skipped, not crashed


def test_resize_payload_validates_factor(spark):
    """r08 review: factor=0 was a slice-step crash inside every task;
    factor<0 silently violated the size-reduction contract."""
    from pyspark_weather_forecasting_gsod_spark.ext.multimodal import (
        attach_binary_payload,
        resize_payload,
    )

    mm = attach_binary_payload(_docs(spark))
    for bad in (0, -1):
        with pytest.raises(ValueError, match="factor"):
            resize_payload(mm, factor=bad)
    assert resize_payload(mm, factor=4).count() == 2
