"""Text-analysis extension operators (ext/text.py)."""

from pyspark.sql import Row

from pyspark_weather_forecasting_gsod_spark.ext.text import (
    bpe_ish_token_count,
    fingerprint_md5,
    language_id,
    quality_features,
    token_count,
)


def _docs(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=1, text="the quick brown fox"),
            Row(doc_id=2, text="  spaced   out   words  "),
            Row(doc_id=3, text="der hund und die katze ist da"),
        ]
    )


def test_token_count_whitespace(spark):
    out = {r.doc_id: r.n_tokens for r in token_count(_docs(spark)).collect()}
    assert out == {1: 4, 2: 3, 3: 7}


def test_bpe_ish_token_count(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="hello, world 42!")])
    row = bpe_ish_token_count(df).collect()[0]
    # hello , world 42 !  → 5 pieces
    assert row.n_bpe_tokens == 5


def test_quality_features(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="the cat and the hat")])
    r = quality_features(df).collect()[0]
    assert r.n_tokens == 5
    assert r.stopword_ratio == round(3 / 5, 6)  # the, and, the
    assert r.avg_token_len == round(15 / 5, 4)


def test_language_id_markers_and_und(spark):
    out = {r.doc_id: r.pred_lang for r in language_id(_docs(spark)).collect()}
    assert out[1] == "en"
    assert out[3] == "de"  # der/und/die/ist → 4 german markers
    assert out[2] == "und"  # no markers at all


def test_language_id_cjk(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="你好 world")])
    assert language_id(df).collect()[0].pred_lang == "zh"


def test_fingerprint_normalizes_whitespace_and_case(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="Hello   World"), Row(doc_id=2, text="hello world")]
    )
    fps = [r.fingerprint for r in fingerprint_md5(df).collect()]
    assert fps[0] == fps[1]
    assert len(fps[0]) == 32


def test_rolling_hash_fingerprint_math_and_edges(spark):
    from pyspark.sql import Row

    from pyspark_weather_forecasting_gsod_spark.ext.text import (
        ROLLING_HASH_BASE,
        ROLLING_HASH_MOD,
        rolling_hash_fingerprint,
    )

    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="hello world"),
            Row(doc_id=2, text="  Hello   WORLD  "),  # normalizes to the same
            Row(doc_id=3, text=""),
            Row(doc_id=4, text="hello worle"),  # 1-char difference
        ]
    )
    got = {r.doc_id: r.rhash for r in rolling_hash_fingerprint(df).collect()}

    def ref(s):
        h = 0
        for ch in s:
            h = (h * ROLLING_HASH_BASE + ord(ch)) % ROLLING_HASH_MOD
        return h

    assert got[1] == ref("hello world")
    assert got[2] == got[1]  # case/whitespace normalization folded in
    assert got[3] == 0  # empty text hashes to the fold seed
    assert got[4] != got[1]  # single-char change moves the hash


def test_pii_scrub_redacts_all_pattern_families(spark):
    from pyspark.sql import Row

    from pyspark_weather_forecasting_gsod_spark.ext.text import pii_counts, pii_scrub

    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="mail a.b+c@ex-ample.org now"),
            Row(doc_id=2, text="host 192.168.0.1 and ssn 123-45-6789"),
            Row(doc_id=3, text="call 555-123-4567 twice 555-123-4567"),
            Row(doc_id=4, text="clean text stays untouched"),
        ]
    )
    out = {r.doc_id: r.clean_text for r in pii_scrub(df).collect()}
    assert out[1] == "mail <EMAIL> now"
    assert out[2] == "host <IP> and ssn <ID>"
    assert out[3] == "call <PHONE> twice <PHONE>"
    assert out[4] == "clean text stays untouched"

    counts = {r.doc_id: (r.n_email, r.n_ip, r.n_ssn, r.n_phone) for r in pii_counts(df).collect()}
    assert counts[1] == (1, 0, 0, 0)
    assert counts[2] == (0, 1, 1, 0)
    assert counts[3] == (0, 0, 0, 2)


def test_repetition_signals_known_values(spark):
    from pyspark_weather_forecasting_gsod_spark.ext.text import repetition_signals

    df = spark.createDataFrame(
        [
            # 4 tokens, 2 distinct -> ttr 0.5; bigrams: "a b","b a","a b"
            # -> top bigram 2/3
            (1, "a b a b"),
            (2, "x y z w"),  # all distinct: ttr 1.0, all bigrams unique 1/3
            (3, "solo"),  # < 2 tokens: dropped
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in repetition_signals(df).collect()}
    assert set(rows) == {1, 2}
    assert rows[1]["n_tokens"] == 4
    assert abs(rows[1]["ttr"] - 0.5) < 1e-9
    assert abs(rows[1]["top_bigram_frac"] - round(2 / 3, 6)) < 1e-9
    assert abs(rows[2]["ttr"] - 1.0) < 1e-9
    assert abs(rows[2]["top_bigram_frac"] - round(1 / 3, 6)) < 1e-9
