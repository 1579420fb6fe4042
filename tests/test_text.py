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


def test_bigram_lm_nll_matches_hand_computation(spark):
    import math

    from pyspark_weather_forecasting_gsod_spark.ext.text import bigram_lm_nll

    # corpus: doc1 "a b a b", doc2 "a b c"
    # bigrams: d1: (a b)x2? no — positions: (a,b),(b,a),(a,b) = "a b"x2, "b a"x1
    #          d2: (a b), (b c)
    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in bigram_lm_nll(df, k_smooth=0.5).collect()}
    v = 3.0  # vocab {a, b, c}
    c_bg = {"a b": 3.0, "b a": 1.0, "b c": 1.0}
    c_ctx = {"a": 3.0, "b": 2.0}

    def logp(bg):
        prev = bg.split()[0]
        return math.log((c_bg[bg] + 0.5) / (c_ctx[prev] + 0.5 * v))

    nll1 = -(2 * logp("a b") + 1 * logp("b a")) / 3
    nll2 = -(1 * logp("a b") + 1 * logp("b c")) / 2
    assert abs(out[1]["nll"] - nll1) < 1e-12
    assert abs(out[2]["nll"] - nll2) < 1e-12
    assert out[1]["n_bigrams"] == 3 and out[2]["n_bigrams"] == 2
    assert abs(out[1]["ppl"] - math.exp(nll1)) < 1e-12


def test_bigram_lm_conditionals_are_normalized(spark):
    """Add-k smoothing with context counts from the same bigram table must
    yield sum_w p(w|prev) == 1 for every observed prev (over the full
    vocab), the property that makes NLL a proper LM score."""
    from pyspark.sql import functions as F

    from pyspark_weather_forecasting_gsod_spark.ext.text import bigram_lm_nll  # noqa: F401

    df = spark.createDataFrame(
        [(1, "a b a c"), (2, "b b a")], ["doc_id", "text"]
    )
    toks = df.select(F.explode(F.split(F.trim("text"), r"\s+")).alias("t"))
    vocab = [r["t"] for r in toks.distinct().collect()]
    bigrams = (
        df.select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(split(trim(text), '\\\\s+')) - 1), "
                    "i -> concat_ws(' ', element_at(split(trim(text), '\\\\s+'), i), "
                    "element_at(split(trim(text), '\\\\s+'), i + 1)))"
                )
            ).alias("bg")
        )
        .groupBy("bg")
        .count()
    )
    c_bg = {r["bg"]: r["count"] for r in bigrams.collect()}
    k, v = 0.5, float(len(vocab))
    prevs = {bg.split()[0] for bg in c_bg}
    for prev in prevs:
        c_ctx = sum(c for bg, c in c_bg.items() if bg.split()[0] == prev)
        total = sum(
            (c_bg.get(f"{prev} {w}", 0) + k) / (c_ctx + k * v) for w in vocab
        )
        assert abs(total - 1.0) < 1e-12


def test_bigram_lm_nll_keeps_short_docs(spark):
    """Documents with fewer than two tokens still get a row: n_bigrams=0,
    NULL nll/ppl — they must not silently vanish from the scored corpus."""
    from pyspark_weather_forecasting_gsod_spark.ext.text import bigram_lm_nll

    df = spark.createDataFrame(
        [(1, "a b a"), (2, "solo"), (3, "x y")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in bigram_lm_nll(df).collect()}
    assert set(out) == {1, 2, 3}
    assert out[2]["n_bigrams"] == 0
    assert out[2]["nll"] is None and out[2]["ppl"] is None
    assert out[1]["n_bigrams"] == 2 and out[3]["n_bigrams"] == 1


def test_chunk_windows_layout_and_coverage(spark):
    from pyspark_weather_forecasting_gsod_spark.ext.packing import chunk_windows

    t10 = " ".join(f"t{i}" for i in range(1, 11))
    rows = [
        (1, t10),          # 10 tokens, chunk 4 stride 3 -> starts 1,4,7
        (2, "a b"),        # shorter than chunk -> one short chunk
        (3, " ".join(f"u{i}" for i in range(1, 8))),  # n-chunk divisible: 7-4=3 -> starts 1,4
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = chunk_windows(df, chunk_size=4, stride=3)
    got = {
        (r["doc_id"], r["chunk_id"]): r for r in out.collect()
    }
    assert [got[(1, k)]["chunk_start"] for k in range(3)] == [1, 4, 7]
    assert got[(1, 2)]["chunk_text"] == "t7 t8 t9 t10"
    assert got[(1, 2)]["n_chunk_tokens"] == 4
    assert (1, 3) not in got  # no window past the one reaching the end
    assert got[(2, 0)]["chunk_text"] == "a b"
    assert got[(2, 0)]["n_chunk_tokens"] == 2
    assert (2, 1) not in got
    # exact boundary: last window ends exactly at the final token
    assert got[(3, 1)]["chunk_text"] == "u4 u5 u6 u7"
    assert (3, 2) not in got
    # losslessness: union of windows covers every token position
    for doc_id, text in rows:
        n = len(text.split())
        covered = set()
        for (d, _k), r in got.items():
            if d == doc_id:
                covered |= set(
                    range(r["chunk_start"], r["chunk_start"] + r["n_chunk_tokens"])
                )
        assert covered == set(range(1, n + 1))


def test_chunk_windows_rejects_bad_stride(spark):
    import pytest

    from pyspark_weather_forecasting_gsod_spark.ext.packing import chunk_windows

    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        chunk_windows(df, chunk_size=4, stride=5)
    with pytest.raises(ValueError):
        chunk_windows(df, chunk_size=4, stride=0)


def test_language_id_confusion_diagonal_dominates(spark):
    from pyspark.sql import functions as F

    from pyspark_weather_forecasting_gsod_spark.ext.text import (
        language_id_confusion,
    )
    from pyspark_weather_forecasting_gsod_spark.sources.io import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    cm = language_id_confusion(docs).collect()
    total = sum(r["n"] for r in cm)
    assert total == docs.count()  # every labeled doc lands in one cell
    diag = sum(r["n"] for r in cm if r["lang"] == r["pred_lang"])
    # measured on this synthetic corpus: ~0.40 agreement — the marker
    # heuristic beats the 5-class random floor 2x but is far from a real
    # classifier, which is exactly what this evaluation is FOR (the lang_id
    # oracle checks the heuristic's arithmetic, not its accuracy; this
    # matrix is the accuracy instrument)
    assert diag / total >= 0.35  # measured 0.396 at sf0.01
    # rows/columns are proper distributions
    from collections import defaultdict

    rec = defaultdict(float)
    for r in cm:
        rec[r["lang"]] += r["recall_of_lang"]
    assert all(abs(v - 1.0) < 1e-6 for v in rec.values())


def test_nb_classifier_beats_marker_heuristic(spark):
    """The in-engine NB classifier must reach the corpus's measured Bayes
    ceiling (~0.47 in-sample at sf0.01) and beat the marker heuristic
    (~0.40) — the r05 answer to the lang-ID quality-floor ask: a 0.6
    accuracy is unreachable on this corpus (all langs share one vocabulary
    with ~1.1-1.2x tilts; full-statistics unigram NB tops out at 0.47), so
    the engine ships the ceiling classifier plus the published confusion
    matrix instead of pretending markers could get there."""
    from pyspark.sql import functions as F

    from pyspark_weather_forecasting_gsod_spark.ext.text import (
        language_id,
        nb_classify,
    )
    from pyspark_weather_forecasting_gsod_spark.sources.io import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents").select(
        "doc_id", "lang", "text"
    )
    n = docs.count()
    nb = nb_classify(docs, docs, "doc_id", label_col="lang", out_col="pred")
    nb_acc = nb.filter(F.col("pred") == F.col("lang")).count() / n
    marker = language_id(docs)
    marker_acc = (
        marker.filter(F.col("pred_lang") == F.col("lang")).count() / n
    )
    assert nb_acc >= 0.44  # measured 0.47 at sf0.01
    assert nb_acc > marker_acc


def test_nb_classifier_scores_held_out_docs_with_unseen_words(spark):
    """Train and score sets may differ: a held-out doc whose words are
    partly ABSENT from the training vocabulary must still classify via
    the per-label unseen-word default (the coalesce path), and known
    vocabulary must dominate the decision."""
    from pyspark.sql import Row

    from pyspark_weather_forecasting_gsod_spark.ext.text import nb_classify

    train = spark.createDataFrame(
        [Row(doc_id=i, lang="aa" if i % 2 == 0 else "bb",
             text="alpha beta gamma " * 4 if i % 2 == 0 else "uno dos tres " * 4)
         for i in range(20)]
    )
    held_out = spark.createDataFrame(
        [
            Row(doc_id=100, lang="aa", text="alpha beta NEVERSEEN xx"),
            Row(doc_id=101, lang="bb", text="uno dos NEVERSEEN yy"),
            Row(doc_id=102, lang="aa", text="NEVERSEEN zz alpha"),
        ]
    )
    out = {
        r.doc_id: r.pred
        for r in nb_classify(
            train, held_out, "doc_id", label_col="lang", out_col="pred"
        ).collect()
    }
    assert out == {100: "aa", 101: "bb", 102: "aa"}


def test_nb_classifier_separable_corpus_is_exact(spark):
    """On a corpus whose languages use DISJOINT vocabularies, NB must be
    perfect — the sanity bound proving the ~0.47 above is the data's
    fault, not the classifier's."""
    from pyspark.sql import Row

    from pyspark_weather_forecasting_gsod_spark.ext.text import nb_classify

    rows = [
        Row(doc_id=i, lang="aa" if i % 2 == 0 else "bb",
            text=("alpha beta gamma " * 3 if i % 2 == 0
                  else "uno dos tres " * 3) + f"tail{i % 3}")
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows)
    out = nb_classify(docs, docs, "doc_id", label_col="lang", out_col="pred")
    assert out.filter("pred != lang").count() == 0


def test_dsir_ranks_target_like_docs(spark):
    """DSIR log-ratio must separate the two sublanguages: raw docs written
    in the target domain's vocabulary score a HIGHER log importance weight
    than raw docs from the other vocabulary; the Gumbel-top-k resample at
    k = n_target_like then recovers (almost) exactly the target-like set
    — here all of it, since the logratio gap dwarfs Gumbel noise."""
    from pyspark.sql import Row

    from pyspark_weather_forecasting_gsod_spark.ext.text import (
        dsir_logratio,
        dsir_select,
    )

    tgt_vocab = "alpha beta gamma delta epsilon "
    other_vocab = "uno dos tres cuatro cinco "
    target = spark.createDataFrame(
        [Row(doc_id=1000 + i, text=tgt_vocab * 4) for i in range(10)]
    )
    raw = spark.createDataFrame(
        [Row(doc_id=i, text=(tgt_vocab if i < 20 else other_vocab) * 4)
         for i in range(60)]
    )
    w = dsir_logratio(raw, target).collect()
    like = [r for r in w if r["doc_id"] < 20]
    unlike = [r for r in w if r["doc_id"] >= 20]
    assert len(w) == 60 and all(r["logratio"] is not None for r in w)
    assert min(r["logratio"] for r in like) > max(
        r["logratio"] for r in unlike
    )
    sel = dsir_select(raw, target, k_docs=20)
    assert sorted(r["doc_id"] for r in sel.collect()) == list(range(20))


def test_dsir_deterministic_and_without_replacement(spark):
    """Two runs of the resample return the identical set (md5 Gumbel, no
    RNG), and the sample never repeats a document."""
    from pyspark.sql import Row

    from pyspark_weather_forecasting_gsod_spark.ext.text import dsir_select

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"alpha beta w{i % 7} w{i % 5} gamma")
         for i in range(50)]
    )
    target = spark.createDataFrame(
        [Row(doc_id=100 + i, text="alpha beta gamma w1 w2") for i in range(5)]
    )
    a = sorted(r["doc_id"] for r in dsir_select(docs, target, 15).collect())
    b = sorted(r["doc_id"] for r in dsir_select(docs, target, 15).collect())
    assert a == b and len(set(a)) == 15


def test_dsir_empty_and_whitespace_docs_score_no_features(spark):
    """r06 review fix: split(trim('')) is [''], so empty/whitespace-only
    raw docs used to get ONE garbage ''-unigram feature and a real
    importance weight. They must take the documented (n_feats=0,
    logratio NULL) path and never win a dsir_select slot."""
    from pyspark.sql import Row

    from pyspark_weather_forecasting_gsod_spark.ext.text import (
        dsir_logratio,
        dsir_select,
    )

    target = spark.createDataFrame(
        [Row(doc_id=100 + i, text="alpha beta gamma ") for i in range(5)]
    )
    raw = spark.createDataFrame(
        [
            Row(doc_id=0, text=""),
            Row(doc_id=1, text="   \t  "),
            Row(doc_id=2, text=None),
            Row(doc_id=3, text="alpha beta gamma alpha"),
            Row(doc_id=4, text="uno dos tres"),
        ]
    )
    w = {r["doc_id"]: r for r in dsir_logratio(raw, target).collect()}
    assert len(w) == 5
    for junk in (0, 1, 2):
        assert w[junk]["n_feats"] == 0 and w[junk]["logratio"] is None
    assert w[3]["n_feats"] > 0 and w[3]["logratio"] is not None
    # the resample draws only from scorable docs, even when k exceeds them
    sel = sorted(r["doc_id"] for r in dsir_select(raw, target, 5).collect())
    assert sel == [3, 4]
