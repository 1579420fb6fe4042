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
    with pytest.raises(NotImplementedError):
        _decode_real(b"\x89PNG", "image/png")
    with pytest.raises(NotImplementedError):
        _decode_real(b"RIFF", "audio/wav")


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
