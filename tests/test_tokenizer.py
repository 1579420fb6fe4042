"""Engine-vs-reference parity for the distributed BPE tokenizer.

The driver gate holds ``bpe_tokenizer`` rows-only (iterative train loop,
no single-query SQL oracle); THIS file is the hard gate: a pure-Python
reference BPE (Sennrich et al. 2016 textbook algorithm, same deterministic
tie-break) trains on the SAME corpus and must produce the identical merge
sequence, and the engine's pure-JVM fold encoding must equal the
reference's greedy leftmost application document by document.
"""

from collections import Counter

from pyspark.sql import functions as F

from pyspark_weather_forecasting_gsod_spark.ext.tokenizer import (
    EOW,
    bpe_encode,
    bpe_train,
)


def _ref_apply(syms: list[str], a: str, b: str) -> list[str]:
    out: list[str] = []
    for x in syms:
        if out and out[-1] == a and x == b:
            out[-1] = a + b
        else:
            out.append(x)
    return out


def _ref_train(word_counts: dict[str, int], num_merges: int):
    words = {w: list(w) + [EOW] for w in word_counts}
    merges = []
    for _ in range(num_merges):
        pc: Counter = Counter()
        for w, c in word_counts.items():
            syms = words[w]
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        if not pc:
            break
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, cnt))
        for w in words:
            words[w] = _ref_apply(words[w], a, b)
    return merges


def _ref_encode(text: str, merges) -> list[str]:
    out: list[str] = []
    for w in text.strip().split():
        syms = list(w) + [EOW]
        for a, b, *_ in merges:
            syms = _ref_apply(syms, a, b)
        out.extend(syms)
    return out


def test_bpe_train_matches_reference_on_real_corpus(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = bpe_train(docs, num_merges=10)

    wc = Counter()
    for r in docs.select("text").collect():
        wc.update(r["text"].strip().split())
    want = _ref_train(dict(wc), 10)
    assert got == want
    # merge counts are monotone under ties only, but never increase order
    # violations: each learned pair must have been the argmax of its round
    assert all(c > 0 for _, _, c in got)


def test_bpe_encode_matches_reference_greedy_application(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(25)
    merges = bpe_train(docs, num_merges=6)
    enc = {
        r["doc_id"]: (r["bpe_tokens"], r["n_bpe_tokens"])
        for r in bpe_encode(docs, merges).select(
            "doc_id", "bpe_tokens", "n_bpe_tokens"
        ).collect()
    }
    for r in docs.select("doc_id", "text").collect():
        want = _ref_encode(r["text"], merges)
        toks, n = enc[r["doc_id"]]
        assert toks == want, f"doc {r['doc_id']}"
        assert n == len(want)


def test_bpe_encode_is_lossless_roundtrip(spark, sf_dir):
    """Concatenating subword tokens and splitting on the EOW marker must
    reproduce the original whitespace token stream — BPE is a bijective
    re-segmentation, not a lossy transform."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(10)
    merges = bpe_train(docs, num_merges=8)
    out = bpe_encode(docs, merges).select("text", "bpe_tokens").collect()
    for r in out:
        rebuilt = "".join(r["bpe_tokens"]).split(EOW)
        assert [w for w in rebuilt if w] == r["text"].strip().split()


def test_bpe_merges_reduce_token_count(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_chars = docs.select(
        F.sum(F.length(F.regexp_replace("text", r"\s+", ""))).alias("n")
    ).first()["n"]
    n_words = docs.select(
        F.sum(F.size(F.split(F.trim("text"), r"\s+"))).alias("n")
    ).first()["n"]
    merges = bpe_train(docs, num_merges=10)
    total = bpe_encode(docs, merges).agg(
        F.sum("n_bpe_tokens").alias("t")
    ).first()["t"]
    # strictly fewer tokens than unmerged char+EOW stream; never fewer
    # than one token per word (each word keeps >= 1 symbol)
    assert total < n_chars + n_words
    assert total >= n_words


def test_dict_encode_equals_fold_encode(spark, sf_dir):
    from pyspark_weather_forecasting_gsod_spark.ext.tokenizer import (
        bpe_encode,
        bpe_encode_by_dict,
        bpe_train,
    )
    from pyspark_weather_forecasting_gsod_spark.sources.io import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    merges = bpe_train(docs, num_merges=6)
    fold = {
        r["doc_id"]: list(r["bpe_tokens"])
        for r in bpe_encode(docs, merges).select("doc_id", "bpe_tokens").collect()
    }
    via_dict = {
        r["doc_id"]: list(r["bpe_tokens"])
        for r in bpe_encode_by_dict(docs, merges, "doc_id").collect()
    }
    assert fold == via_dict


def test_dict_encode_contract_parity_with_fold_encode(spark):
    """r06 review: bpe_encode_by_dict must preserve ALL input columns and
    agree with bpe_encode on NULL/empty/whitespace text, and a corpus word
    containing the EOW char (U+2581) must not smuggle a fake boundary."""
    from pyspark.sql import Row

    from pyspark_weather_forecasting_gsod_spark.ext.tokenizer import (
        bpe_encode,
        bpe_encode_by_dict,
        bpe_train,
    )

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="low low lower", label="a"),
            Row(doc_id=2, text="", label="b"),
            Row(doc_id=3, text="   ", label="c"),
            Row(doc_id=4, text=None, label="d"),
            Row(doc_id=5, text="foo▁bar low", label="e"),
        ]
    )
    merges = bpe_train(docs, num_merges=3)
    a = bpe_encode(docs, merges)
    b = bpe_encode_by_dict(docs, merges, "doc_id")
    assert set(a.columns) == set(b.columns)  # label survives both paths
    rows_a = {r.doc_id: (r.bpe_tokens, r.label) for r in a.collect()}
    rows_b = {r.doc_id: (r.bpe_tokens, r.label) for r in b.collect()}
    assert rows_a == rows_b
    assert rows_a[4][0] is None  # NULL text -> NULL tokens in BOTH
    assert rows_a[2][0] == [] and rows_a[3][0] == []
    # U+2581 acts as a separator: 'foo▁bar' contributes words foo and bar,
    # and no learned symbol ever contains a mid-word EOW
    toks5 = rows_a[5][0]
    joined = "".join(toks5)
    assert "foo▁" in joined and "bar▁" in joined  # two words, two EOWs
