"""LLM-training-pipeline extras declared in round 4.

The curation operations a 100-TB pipeline runs that the core suite did
not yet declare, grouped by phase:

* **audit** — ``contamination_check`` (GPT-3-appendix-C-style n-gram
  overlap vs a held-out benchmark slice), ``pmi_collocations``
  (multi-word-expression mining).
* **filter / rewrite** — ``dedup_strip_spans`` (Lee-et-al exact-substring
  REMOVAL with text rebuild), ``lm_bigram_nll`` (CCNet-style perplexity
  filter, model trained in-engine), ``embedding_outliers`` (z-score RMS
  gate), ``semantic_dedup`` (SemDeDup with measured miss rate),
  ``temperature_mix_sample`` (data-derived n^α language mixing).
* **transform / index** — ``embedding_quantize`` (int8 + error
  accounting), ``embedding_covariance`` / ``pca_project_check``
  (d²-partials covariance, driver-eigh PCA), ``bm25_topk`` (sparse
  retrieval), ``doc_chunk_windows`` (RAG context-window chunking),
  ``bpe_tokenizer`` (distributed BPE train + encode),
  ``cms_heavy_hitters`` (mergeable count-min frequency sketch).

All follow plans.queries hashing conventions (shared aliases, rounded
derived floats, BIGINT counts, tie-broken LIMITs); the rows-only ones
(`semantic_dedup`, `pca_project_check`, `bpe_tokenizer`) carry in-query
quality columns plus pytest parity/threshold gates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import _TOKS, _t, query

_BENCH_SOURCES = ("src0", "src1")  # held-out "benchmark" slice of documents


@query(
    "contamination_check",
    f"""
    WITH t AS (
        SELECT doc_id, source, {_TOKS} AS toks FROM documents
    ), spans AS (
        SELECT DISTINCT doc_id, source, span FROM (
            SELECT doc_id, source,
                   unnest(list_transform(range(1, len(toks) - 3),
                          i -> array_to_string(toks[i:i+4], ' '))) AS span
            FROM t WHERE len(toks) >= 5
        )
    ), bench AS (
        SELECT DISTINCT span FROM spans
        WHERE source IN ('src0', 'src1')
    ), per_doc AS (
        SELECT s.doc_id, s.source,
               CAST(COUNT(*) AS BIGINT) AS n_spans,
               CAST(COUNT(b.span) AS BIGINT) AS n_contaminated
        FROM spans s LEFT JOIN bench b ON s.span = b.span
        WHERE s.source NOT IN ('src0', 'src1')
        GROUP BY s.doc_id, s.source
    )
    SELECT doc_id, source, n_spans, n_contaminated,
           ROUND(n_contaminated / n_spans, 6) AS contamination_frac
    FROM per_doc
    """,
)
def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination audit: fraction of each training document's
    distinct word 5-grams that occur anywhere in the benchmark slice
    (sources src0/src1 stand in for an eval set).

    Scale shape: one explode pass builds (doc, span) pairs; the benchmark
    span dictionary is DISTINCT-reduced before the equi-join, so the join
    key cardinality is bounded by benchmark size (eval sets are tiny next
    to a 100-TB corpus → the bench side broadcasts); per-doc tallies are
    one hash aggregate. Never doc×doc, never a regex over the corpus.
    """
    toks = F.split(F.trim(F.col("text")), r"\s+")
    t = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", toks.alias("toks")
    )
    spans = (
        t.filter(F.size("toks") >= 5)
        .select(
            "doc_id",
            "source",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 4), "
                    "i -> array_join(slice(toks, i, 5), ' '))"
                )
            ).alias("span"),
        )
        .distinct()
    )
    bench = (
        spans.filter(F.col("source").isin(*_BENCH_SOURCES))
        .select("span")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    per_doc = (
        spans.filter(~F.col("source").isin(*_BENCH_SOURCES))
        .join(F.broadcast(bench), "span", "left")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.count("hit").alias("n_contaminated"),
        )
    )
    return per_doc.select(
        "doc_id",
        "source",
        "n_spans",
        "n_contaminated",
        F.round(F.col("n_contaminated") / F.col("n_spans"), 6).alias(
            "contamination_frac"
        ),
    )


@query(
    "embedding_quantize",
    """
    WITH arrs AS (
        SELECT vec_id, label,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS arr
        FROM embeddings
    ), scaled AS (
        SELECT vec_id, label, arr,
               127.0 / list_max(list_transform(arr, x -> abs(x))) AS scale
        FROM arrs
        WHERE list_max(list_transform(arr, x -> abs(x))) > 0
    ), elems AS (
        SELECT vec_id, label, scale, unnest(arr) AS v FROM scaled
    )
    SELECT vec_id,
           ANY_VALUE(label) AS label,
           ROUND(ANY_VALUE(scale), 6) AS scale_r,
           CAST(SUM(CAST(round(v * scale) AS BIGINT)) AS BIGINT) AS q_checksum,
           CAST(MAX(abs(CAST(round(v * scale) AS BIGINT))) AS BIGINT) AS q_max_abs,
           ROUND(SUM(abs(v - round(v * scale) / scale)) / COUNT(*), 8)
               AS mean_abs_err
    FROM elems
    GROUP BY vec_id
    """,
)
def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of the embedding column: per-vector
    scale = 127 / max|x|, q = round(x·scale), plus reconstruction-error
    accounting (mean |x - q/scale|) and an exact integer checksum the
    oracle can hash.

    Scale shape: every statistic is a per-row JVM array expression
    (transform/aggregate) — no explode, no shuffle, no Python; at 100 TB
    this is a pure map stage that codegen fuses into the parquet scan.
    q_max_abs ≤ 127 by construction (asserted in tests) — the int8 range
    claim, checked not assumed.
    """
    emb = _t(spark, sf_dir, "embeddings")
    arr = F.expr("transform(embedding, x -> CAST(x AS DOUBLE))")
    d = emb.select("vec_id", "label", arr.alias("arr"))
    max_abs = F.expr(
        "aggregate(arr, CAST(0.0 AS DOUBLE), (a, x) -> greatest(a, abs(x)))"
    )
    d = d.withColumn("max_abs", max_abs).filter(F.col("max_abs") > 0)
    d = d.withColumn("scale", F.lit(127.0) / F.col("max_abs"))
    q = F.expr("transform(arr, x -> CAST(round(x * scale) AS BIGINT))")
    d = d.withColumn("q", q)
    checksum = F.expr("aggregate(q, CAST(0 AS BIGINT), (a, x) -> a + x)")
    q_max_abs = F.expr(
        "aggregate(q, CAST(0 AS BIGINT), (a, x) -> greatest(a, abs(x)))"
    )
    abs_err_sum = F.expr(
        "aggregate(arrays_zip(arr, q), CAST(0.0 AS DOUBLE), "
        "(a, p) -> a + abs(p.arr - p.q / scale))"
    )
    return d.select(
        "vec_id",
        "label",
        F.round(F.col("scale"), 6).alias("scale_r"),
        checksum.alias("q_checksum"),
        q_max_abs.alias("q_max_abs"),
        F.round(abs_err_sum / F.size("arr"), 8).alias("mean_abs_err"),
    )


@query("semantic_dedup", None)  # KMeans-cell partition is seed/impl-specific
def semantic_dedup_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic deduplication over the embeddings table
    (ext/similarity.py::semantic_dedup): KMeans cells → within-cell BLAS
    cosine edges → connected components → min-id representative kept.

    Quality is measured in-query, not asserted in prose: every row carries
    (pair_recall_vs_exact, n_transitive_pairs) comparing the dedup's
    implied duplicate pairs (component-mates) against the exact blocked
    all-pairs companion at the same threshold. Recall < 1 is the SemDeDup
    approximation itself — cross-cell near-dups are invisible by
    construction, and isotropic random embeddings (this corpus) are its
    documented worst case; transitive pairs are component-mates linked
    through a chain rather than a direct ≥-threshold edge — inherent to
    ANY connected-component dedup, reported rather than hidden. The pytest
    gate pins both so a cell-assignment regression (recall → ~1/n_cells)
    fails loudly."""
    from ..ext.similarity import (
        cosine_allpairs_blocked,
        pair_recall_summary,
        semantic_dedup,
    )

    emb = _t(spark, sf_dir, "embeddings")
    out = semantic_dedup(emb, min_cosine=0.35, n_cells=16)  # checkpointed inside
    a = out.select(F.col("id").alias("doc_a"), F.col("component").alias("ca"))
    b = out.select(F.col("id").alias("doc_b"), F.col("component").alias("cb"))
    implied = (
        a.join(b, F.col("ca") == F.col("cb"))
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
    )
    exact = cosine_allpairs_blocked(emb, 0.35).select(
        F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b")
    )
    summary = pair_recall_summary(implied, exact, "doc_a", "doc_b").select(
        F.col("recall_vs_exact").alias("pair_recall_vs_exact"),
        F.col("n_false_positive").alias("n_transitive_pairs"),
    )
    return out.crossJoin(F.broadcast(summary))


_MIX_ALPHA = 0.7  # temperature-smoothing exponent (multilingual-LM style)
_MIX_TARGET = 0.5  # keep ~half the corpus overall
_BUCKET_SQL = (
    "list_reduce(list_transform("
    "string_split(substr(md5(CAST(doc_id AS VARCHAR)), 1, 8), ''), "
    "c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)), "
    "(a, b) -> a * 16 + b) % 1000000"
)


@query(
    "temperature_mix_sample",
    f"""
    WITH c AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_total
        FROM documents GROUP BY lang
    ), t AS (
        SELECT CAST(SUM(n_total) AS DOUBLE) AS n_docs,
               SUM(pow(CAST(n_total AS DOUBLE), {_MIX_ALPHA})) AS sum_w
        FROM c
    ), r AS (
        SELECT lang, n_total,
               ROUND(LEAST(1.0,
                     pow(CAST(n_total AS DOUBLE), {_MIX_ALPHA}) / t.sum_w
                     * (t.n_docs * {_MIX_TARGET}) / CAST(n_total AS DOUBLE)),
                     6) AS rate_r
        FROM c CROSS JOIN t
    ), b AS (
        SELECT doc_id, lang, {_BUCKET_SQL} AS bucket FROM documents
    ), k AS (
        SELECT b.lang, CAST(COUNT(*) AS BIGINT) AS n_kept
        FROM b JOIN r USING (lang)
        WHERE b.bucket < r.rate_r * 1000000
        GROUP BY b.lang
    )
    SELECT r.lang, r.n_total, r.rate_r,
           COALESCE(k.n_kept, CAST(0 AS BIGINT)) AS n_kept
    FROM r LEFT JOIN k USING (lang)
    """,
)
def temperature_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based language mixing (the multilingual-pretraining
    sampling rule): per-language keep-rates ∝ n^α / Σ n^α with α < 1, so
    high-resource languages are downweighted relative to their corpus
    share and low-resource ones upweighted, scaled to an overall target
    fraction and capped at 1. Rates are DERIVED FROM THE DATA in-engine
    (one tiny per-language aggregate, cross-joined back as a broadcast) —
    no driver-side collect — and the keep decision is the same
    engine-portable md5-bucket rule as ``domain_mix_sample``, so the whole
    pipeline is deterministic and oracle-hashable end to end.

    Scale shape: two aggregates over one scan (per-lang counts, then the
    1-row totals), a broadcast rate join, a map-side filter, and the
    per-lang summary agg. Nothing keyed by more than |languages| rows ever
    shuffles.
    """
    from ..operators.sampling import hash_bucket

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    c = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_total"))
    t = c.agg(
        F.sum("n_total").cast("double").alias("n_docs"),
        F.sum(F.pow(F.col("n_total").cast("double"), F.lit(_MIX_ALPHA))).alias(
            "sum_w"
        ),
    )
    r = c.crossJoin(F.broadcast(t)).select(
        "lang",
        "n_total",
        F.round(
            F.least(
                F.lit(1.0),
                F.pow(F.col("n_total").cast("double"), F.lit(_MIX_ALPHA))
                / F.col("sum_w")
                * (F.col("n_docs") * _MIX_TARGET)
                / F.col("n_total").cast("double"),
            ),
            6,
        ).alias("rate_r"),
    )
    kept = (
        docs.join(F.broadcast(r), "lang")
        .filter(
            hash_bucket(F.col("doc_id"), 1_000_000, hex_chars=8)
            < F.col("rate_r") * 1_000_000
        )
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    return r.join(kept, "lang", "left").select(
        "lang",
        "n_total",
        "rate_r",
        F.coalesce(F.col("n_kept"), F.lit(0).cast("long")).alias("n_kept"),
    )


_BM25_TERMS = ("spark", "vector", "stream")
_BM25_K1 = 1.2
_BM25_B = 0.75


@query(
    "bm25_topk",
    f"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
        FROM documents
    ), dl AS (
        SELECT doc_id, CAST(len(t) AS DOUBLE) AS dl FROM toks
    ), stats AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(dl) AS avgdl FROM dl
    ), terms AS (
        SELECT doc_id, unnest(t) AS term FROM toks
    ), tf AS (
        SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf
        FROM terms
        WHERE term IN ('spark', 'vector', 'stream')
        GROUP BY doc_id, term
    ), df AS (
        SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY term
    ), scored AS (
        SELECT tf.doc_id,
               SUM(
                   ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
                   * tf.tf * ({_BM25_K1} + 1.0)
                   / (tf.tf + {_BM25_K1} * (1.0 - {_BM25_B}
                      + {_BM25_B} * dl.dl / stats.avgdl))
               ) AS score,
               CAST(COUNT(*) AS BIGINT) AS n_terms_hit
        FROM tf
        JOIN df ON tf.term = df.term
        JOIN dl ON tf.doc_id = dl.doc_id
        CROSS JOIN stats
        GROUP BY tf.doc_id
    )
    SELECT doc_id, ROUND(score, 4) AS bm25, n_terms_hit
    FROM scored
    ORDER BY bm25 DESC, doc_id LIMIT 20
    """,
)
def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 scoring of the corpus against a fixed term set — the
    sparse-retrieval companion to the dense ``cosine_topk`` path
    (k1=1.2, b=0.75, idf = ln((N-df+0.5)/(df+0.5)+1)).

    Scale shape: the token explode is filtered to the query vocabulary
    BEFORE the tf aggregate, so the shuffled entity is (matching doc,
    term), not the full posting list; df and the (N, avgdl) scalars are
    1-row/`|vocab|`-row broadcast sides; top-k is TakeOrderedAndProject.
    A real search deployment would precompute df/dl offline — here both
    come from the same corpus scan, which AQE shares.
    """
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    docs = _t(spark, sf_dir, "documents").select("doc_id", toks.alias("t"))
    dl = docs.select("doc_id", F.size("t").cast("double").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    terms = docs.select("doc_id", F.explode("t").alias("term")).filter(
        F.col("term").isin(*_BM25_TERMS)
    )
    tf = terms.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("double").alias("tf")
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    denom = F.col("tf") + _BM25_K1 * (
        1.0 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl")
    )
    contrib = idf * F.col("tf") * (_BM25_K1 + 1.0) / denom
    scored = (
        tf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.sum(contrib).alias("score"),
            F.count(F.lit(1)).alias("n_terms_hit"),
        )
    )
    return (
        scored.select(
            "doc_id", F.round("score", 4).alias("bm25"), "n_terms_hit"
        )
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# r4b: exact-substring dedup rewrite, LM-perplexity quality scoring,
# count-min heavy hitters, embedding covariance + PCA.
# ---------------------------------------------------------------------------

_FOLD8 = (
    "list_reduce(list_transform("
    "string_split(substr(md5({x}), 1, 8), ''), "
    "c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)), "
    "(a, b) -> a * 16 + b)"
)


@query(
    "dedup_strip_spans",
    f"""
    WITH t AS (
        SELECT doc_id, {_TOKS} AS toks FROM documents
    ), tok AS (
        SELECT doc_id, CAST(k + 1 AS BIGINT) AS pos,
               toks[CAST(k AS INT) + 1] AS token
        FROM t, UNNEST(range(0, len(toks))) AS u(k)
    ), spans AS (
        SELECT doc_id, CAST(k + 1 AS BIGINT) AS start,
               array_to_string(toks[CAST(k AS INT) + 1:CAST(k AS INT) + 8], ' ')
                   AS span
        FROM t, UNNEST(range(0, len(toks) - 7)) AS u(k)
        WHERE len(toks) >= 8
    ), dup AS (
        SELECT span FROM (SELECT DISTINCT doc_id, span FROM spans)
        GROUP BY span HAVING COUNT(*) >= 2
    ), cov AS (
        SELECT DISTINCT s.doc_id, s.start + o AS pos
        FROM spans s JOIN dup d USING (span), UNNEST(range(0, 8)) AS u(o)
    ), kept AS (
        SELECT tok.doc_id, tok.pos, tok.token
        FROM tok LEFT JOIN cov
          ON tok.doc_id = cov.doc_id AND tok.pos = cov.pos
        WHERE cov.pos IS NULL
    ), reb AS (
        SELECT doc_id, string_agg(token, ' ' ORDER BY pos) AS clean_text,
               CAST(COUNT(*) AS BIGINT) AS n_kept
        FROM kept GROUP BY doc_id
    ), tot AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens
        FROM tok GROUP BY doc_id
    )
    SELECT t.doc_id, t.n_tokens,
           CAST(t.n_tokens - COALESCE(r.n_kept, 0) AS BIGINT) AS n_removed,
           md5(COALESCE(r.clean_text, '')) AS clean_md5
    FROM tot t LEFT JOIN reb r USING (doc_id)
    """,
)
def dedup_strip_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring deduplication REWRITE (Lee et al. 2022 semantics at
    8-token-span granularity): remove every token covered by a span that
    occurs in ≥2 documents and rebuild the text
    (ext/dedup.py::strip_duplicated_spans). Where ``dup_span_stats``
    measures the overlap, this ships the cleaned corpus; the oracle
    rebuilds every document independently and md5-compares the rewritten
    text byte-for-byte."""
    from ..ext.dedup import strip_duplicated_spans

    docs = _t(spark, sf_dir, "documents")
    out = strip_duplicated_spans(docs, n=8, min_docs=2)
    return out.select(
        "doc_id",
        "n_tokens",
        "n_removed",
        F.md5(F.col("clean_text").cast("binary")).alias("clean_md5"),
    )


@query(
    "lm_bigram_nll",
    f"""
    WITH t AS (
        SELECT doc_id, {_TOKS} AS toks FROM documents
    ), bg AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(toks)),
                      i -> toks[CAST(i AS INT)] || ' ' ||
                           toks[CAST(i AS INT) + 1])) AS bigram
        FROM t WHERE len(toks) >= 2
    ), doc_tf AS (
        SELECT doc_id, bigram, CAST(COUNT(*) AS DOUBLE) AS tf
        FROM bg GROUP BY doc_id, bigram
    ), model AS (
        SELECT bigram, SUM(tf) AS c_bg FROM doc_tf GROUP BY bigram
    ), ctx AS (
        SELECT split_part(bigram, ' ', 1) AS prev, SUM(c_bg) AS c_ctx
        FROM model GROUP BY prev
    ), v AS (
        SELECT CAST(COUNT(DISTINCT tk) AS DOUBLE) AS v
        FROM (SELECT unnest(toks) AS tk FROM t)
    ), sc AS (
        SELECT d.doc_id, d.tf,
               ln((m.c_bg + 0.5) / (c.c_ctx + 0.5 * v.v)) AS logp
        FROM doc_tf d
        JOIN model m USING (bigram)
        JOIN ctx c ON split_part(d.bigram, ' ', 1) = c.prev
        CROSS JOIN v
    ), agg AS (
        SELECT doc_id,
               CAST(SUM(tf) AS BIGINT) AS n_bigrams,
               -SUM(tf * logp) / SUM(tf) AS nll
        FROM sc GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(a.n_bigrams, 0) AS n_bigrams,
           ROUND(a.nll, 6) AS nll_r,
           ROUND(exp(a.nll), 4) AS ppl_r
    FROM documents d LEFT JOIN agg a USING (doc_id)
    """,
)
def lm_bigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical-LM quality scoring, trained and applied in one engine
    pass (ext/text.py::bigram_lm_nll): add-0.5-smoothed bigram model fit on
    the corpus, every document scored by mean NLL / perplexity under it —
    the CCNet-style perplexity filter with word-count-shaped cost. The
    oracle retrains the identical model in DuckDB and hash-compares every
    document's score."""
    from ..ext.text import bigram_lm_nll

    docs = _t(spark, sf_dir, "documents")
    out = bigram_lm_nll(docs, k_smooth=0.5)
    return out.select(
        "doc_id",
        "n_bigrams",
        F.round("nll", 6).alias("nll_r"),
        F.round("ppl", 4).alias("ppl_r"),
    )


_CMS_DEPTH = 3
_CMS_WIDTH = 16


def _cms_bucket_sql(key_sql: str) -> str:
    return (
        _FOLD8.format(x=f"CAST(r AS VARCHAR) || ':' || {key_sql}")
        + f" % {_CMS_WIDTH}"
    )


@query(
    "cms_heavy_hitters",
    f"""
    WITH tok AS (
        SELECT unnest({_TOKS}) AS token FROM documents
    ), cells AS (
        SELECT r, {_cms_bucket_sql('token')} AS bucket
        FROM tok, UNNEST(range(0, {_CMS_DEPTH})) AS u(r)
    ), cms AS (
        SELECT r, bucket, CAST(COUNT(*) AS BIGINT) AS cell_count
        FROM cells GROUP BY r, bucket
    ), exact AS (
        SELECT token, CAST(COUNT(*) AS BIGINT) AS exact_count
        FROM tok GROUP BY token
    ), probe AS (
        SELECT token, r, {_cms_bucket_sql('token')} AS bucket
        FROM exact, UNNEST(range(0, {_CMS_DEPTH})) AS u(r)
    ), est AS (
        SELECT p.token, MIN(c.cell_count) AS cms_count
        FROM probe p JOIN cms c USING (r, bucket)
        GROUP BY p.token
    )
    SELECT e.token, e.exact_count,
           CAST(s.cms_count AS BIGINT) AS cms_count,
           CAST(s.cms_count - e.exact_count AS BIGINT) AS overestimate
    FROM exact e JOIN est s USING (token)
    ORDER BY exact_count DESC, token LIMIT 20
    """,
)
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch heavy hitters over the corpus token stream
    (operators/sketches.py::cms_table/cms_estimate): the mergeable
    frequency sketch (depth 3 × width 16 — deliberately undersized so
    collisions are REAL on this 31-token vocabulary) probed for every
    distinct token, with the exact count and the overestimate (collision
    mass) side by side. Every cell is an exact deterministic sum with
    engine-portable md5 hashing, so the whole sketch pipeline — build,
    probe, error — is oracle-hashable, unlike the JVM-internal HLL/freq
    sketches (``hll_distinct_users``, ``freq_items_sketch``) which stay
    rows-only by design."""
    from ..operators.sketches import cms_estimate, cms_table

    toks = F.split(F.trim(F.col("text")), r"\s+")
    tok = (
        _t(spark, sf_dir, "documents")
        .select(F.explode(toks).alias("token"))
    )
    cms = cms_table(tok, "token", depth=_CMS_DEPTH, width=_CMS_WIDTH)
    exact = tok.groupBy("token").agg(F.count(F.lit(1)).alias("exact_count"))
    est = cms_estimate(
        cms, exact.select("token"), "token", depth=_CMS_DEPTH, width=_CMS_WIDTH
    )
    return (
        exact.join(est, "token")
        .select(
            "token",
            "exact_count",
            F.col("cms_count").cast("long").alias("cms_count"),
            (F.col("cms_count") - F.col("exact_count"))
            .cast("long")
            .alias("overestimate"),
        )
        .orderBy(F.col("exact_count").desc(), "token")
        .limit(20)
    )


@query(
    "embedding_covariance",
    """
    WITH e AS (
        SELECT vec_id, CAST(k AS INT) AS i,
               CAST(embedding[CAST(k AS INT) + 1] AS DOUBLE) AS x
        FROM embeddings, UNNEST(range(0, len(embedding))) AS t(k)
    ), p AS (
        SELECT a.i AS i, b.i AS j,
               SUM(a.x * b.x) AS sxy, SUM(a.x) AS si, SUM(b.x) AS sj,
               CAST(COUNT(*) AS BIGINT) AS n_vecs
        FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.i <= b.i
        GROUP BY a.i, b.i
    )
    SELECT i, j, n_vecs,
           ROUND(sxy / n_vecs - (si / n_vecs) * (sj / n_vecs), 6) + 0.0 AS cov_r
    FROM p
    """,
)
def embedding_covariance_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed covariance matrix of the embedding column
    (ext/similarity.py::embedding_covariance): per-partition BLAS
    outer-product partials via mapInPandas, reduced by a d²-key hash agg —
    the exchange carries |partitions|·d² scalars, never vectors, so the
    cost at 100 TB is one scan + a constant-size shuffle. The oracle
    recomputes every upper-triangle cell from first principles (pairwise
    self-join on vec_id) — the statistic PCA/whitening pipelines
    precompute offline, hash-checked cell by cell."""
    from ..ext.similarity import embedding_covariance

    emb = _t(spark, sf_dir, "embeddings")
    # `+ 0.0` canonicalizes IEEE -0.0 → +0.0 after rounding (tiny negative
    # covariances round to zero; both engines must agree on its sign)
    return embedding_covariance(emb).select(
        "i", "j", "n_vecs", (F.round("cov", 6) + F.lit(0.0)).alias("cov_r")
    )


@query("pca_project_check", None)  # eigensolver is impl-specific → rows-only
def pca_project_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA fit + projection (ext/similarity.py::pca_fit/pca_project): the
    d×d covariance (the ONLY thing collected — corpus-size-independent)
    is eigendecomposed on the driver with a deterministic sign convention,
    and the top-8 components ride back as array literals for a pure-JVM
    zero-shuffle projection. Output carries the in-query quality signal
    ``var_explained_r`` (Σ top-8 eigenvalues / total variance) so a
    regression in the fit is visible in the result, and pytest asserts
    orthonormality + per-component projected variance ≈ eigenvalue."""
    from ..ext.similarity import pca_fit, pca_project

    emb = _t(spark, sf_dir, "embeddings")
    mean, comps, evs, total_var = pca_fit(emb, k=8)
    var_explained = sum(evs) / total_var
    proj = pca_project(emb, mean, comps)
    return proj.select(
        "vec_id",
        "label",
        *[
            F.round(F.element_at("pc", i + 1), 6).alias(f"pc{i + 1}")
            for i in range(4)
        ],
        F.lit(round(var_explained, 6)).alias("var_explained_r"),
    )


_PMI_MIN_COUNT = 5


@query(
    "pmi_collocations",
    f"""
    WITH t AS (
        SELECT doc_id, {_TOKS} AS toks FROM documents
    ), bg AS (
        SELECT unnest(list_transform(range(1, len(toks)),
                      i -> [toks[CAST(i AS INT)], toks[CAST(i AS INT) + 1]]))
                   AS pair
        FROM t WHERE len(toks) >= 2
    ), bgc AS (
        SELECT pair[1] AS w1, pair[2] AS w2,
               CAST(COUNT(*) AS DOUBLE) AS c_ab
        FROM bg GROUP BY pair[1], pair[2]
    ), uni AS (
        SELECT tk, CAST(COUNT(*) AS DOUBLE) AS c
        FROM (SELECT unnest(toks) AS tk FROM t) GROUP BY tk
    ), tot AS (
        SELECT (SELECT SUM(c_ab) FROM bgc) AS nb,
               (SELECT SUM(c) FROM uni) AS nt
    )
    SELECT b.w1, b.w2, CAST(b.c_ab AS BIGINT) AS pair_count,
           ROUND(ln((b.c_ab / t.nb) / ((ua.c / t.nt) * (ub.c / t.nt))), 6)
               AS pmi_r
    FROM bgc b
    JOIN uni ua ON b.w1 = ua.tk
    JOIN uni ub ON b.w2 = ub.tk
    CROSS JOIN tot t
    WHERE b.c_ab >= {_PMI_MIN_COUNT}
    ORDER BY pmi_r DESC, w1, w2 LIMIT 15
    """,
)
def pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise-mutual-information collocation mining — the statistical
    test behind multi-word-expression detection and phrase-aware
    tokenization (PMI = ln(p(ab)/(p(a)p(b))) with a min-support floor so
    rare accidental pairs don't dominate).

    Scale shape: two hash aggregates (adjacent-pair counts, unigram
    counts), two equi-joins of the pair table against the (vocab-sized,
    broadcastable) unigram table, scalar totals as a broadcast cross
    join, TakeOrderedAndProject top-k. Word-count-shaped cost.
    """
    toks = F.split(F.trim(F.col("text")), r"\s+")
    t = _t(spark, sf_dir, "documents").select("doc_id", toks.alias("toks"))
    bg = t.filter(F.size("toks") >= 2).select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 1), "
                "i -> struct(element_at(toks, i) AS w1, "
                "element_at(toks, i + 1) AS w2))"
            )
        ).alias("p")
    )
    bgc = bg.groupBy(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")).agg(
        F.count(F.lit(1)).cast("double").alias("c_ab")
    )
    uni = t.select(F.explode("toks").alias("tk")).groupBy("tk").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    tot = bgc.agg(F.sum("c_ab").alias("nb")).crossJoin(
        uni.agg(F.sum("c").alias("nt"))
    )
    ua = uni.select(F.col("tk").alias("w1"), F.col("c").alias("c_a"))
    ub = uni.select(F.col("tk").alias("w2"), F.col("c").alias("c_b"))
    pmi = F.log(
        (F.col("c_ab") / F.col("nb"))
        / ((F.col("c_a") / F.col("nt")) * (F.col("c_b") / F.col("nt")))
    )
    return (
        bgc.filter(F.col("c_ab") >= _PMI_MIN_COUNT)
        # ua/ub are the FULL unigram vocabulary — unbounded on web text,
        # so no broadcast hint (r10 de-broadcast doctrine): AQE broadcasts
        # them when the aggregated table fits, shuffle-joins otherwise
        .join(ua, "w1")
        .join(ub, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            F.col("c_ab").cast("long").alias("pair_count"),
            F.round(pmi, 6).alias("pmi_r"),
        )
        .orderBy(F.col("pmi_r").desc(), "w1", "w2")
        .limit(15)
    )


@query("bpe_tokenizer", None)  # iterative train loop → rows-only (pytest
# holds the hard gate: exact merge-sequence + encoding parity vs a pure-
# Python reference BPE on the same corpus)
def bpe_tokenizer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer training + corpus encoding
    (ext/tokenizer.py): learn 10 merge rules from the corpus (one raw-text
    scan → word-frequency table, then a deterministic argmax-merge loop
    over that small table), encode every document with the learned rules
    as pure-JVM folds, and return the merge table with corpus-level
    encode stats attached (n_docs, total subword tokens, chars-per-token
    compression) so a regression in either phase shows in the output."""
    from ..ext.tokenizer import bpe_encode_by_dict, bpe_train, merges_as_df

    docs = _t(spark, sf_dir, "documents")
    merges = bpe_train(docs, num_merges=10)
    # dictionary encode: folds run once per DISTINCT word, not per
    # occurrence (interpreted HOF folds; measured 14.2s -> 2s at sf0.1)
    enc = bpe_encode_by_dict(docs, merges, id_col="doc_id")
    stats = enc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_bpe_tokens").alias("total_bpe_tokens"),
        F.round(
            F.sum(F.length(F.regexp_replace(F.col("text"), r"\s+", "")))
            / F.sum("n_bpe_tokens"),
            6,
        ).alias("chars_per_token"),
    )
    return merges_as_df(spark, merges).crossJoin(F.broadcast(stats))


@query(
    "embedding_outliers",
    """
    WITH e AS (
        SELECT vec_id, label, CAST(k AS INT) AS i,
               CAST(embedding[CAST(k AS INT) + 1] AS DOUBLE) AS x
        FROM embeddings, UNNEST(range(0, len(embedding))) AS t(k)
    ), st AS (
        SELECT i, AVG(x) AS mu, STDDEV_POP(x) AS sd FROM e GROUP BY i
    ), sc AS (
        SELECT e.vec_id, ANY_VALUE(e.label) AS label,
               SUM(CASE WHEN st.sd > 0
                        THEN ((e.x - st.mu) / st.sd) * ((e.x - st.mu) / st.sd)
                        ELSE 0 END) AS m2,
               CAST(SUM(CASE WHEN st.sd > 0 THEN 1 ELSE 0 END) AS DOUBLE)
                   AS n_used
        FROM e JOIN st USING (i)
        GROUP BY e.vec_id
    )
    SELECT vec_id, label, ROUND(sqrt(m2 / n_used), 6) AS zrms_r
    FROM sc
    ORDER BY zrms_r DESC, vec_id LIMIT 20
    """,
)
def embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension z-score outlier gate over the embedding corpus: each
    vector's RMS of dimension-wise z-scores against the corpus
    (population) per-dimension mean/std — the cheap embedding-space
    quality screen run before clustering or dedup (degenerate vectors and
    encoder failures surface at the top).

    Scale shape: the per-dimension stats are ONE posexplode hash agg to d
    rows, folded into (mu[], sd[]) array form and broadcast back as a
    1-row cross join; scoring is then a pure per-row zip_with/aggregate
    expression — map-only, no d×N-row shuffle ever reaches the score
    stage (the oracle computes the identical math the naive exploded
    way). Zero-variance dimensions are excluded on both engines.
    """
    emb = _t(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("i", "x")
    ).withColumn("x", F.col("x").cast("double"))
    st = e.groupBy("i").agg(
        F.avg("x").alias("mu"), F.stddev_pop("x").alias("sd")
    )
    packed = st.agg(
        F.expr(
            "transform(array_sort(collect_list(struct(i, mu, sd))), s -> s.mu)"
        ).alias("mus"),
        F.expr(
            "transform(array_sort(collect_list(struct(i, mu, sd))), s -> s.sd)"
        ).alias("sds"),
    )
    scored = emb.crossJoin(F.broadcast(packed)).select(
        "vec_id",
        "label",
        F.expr(
            "aggregate(zip_with(zip_with(embedding, mus, "
            "(x, m) -> CAST(x AS DOUBLE) - m), sds, "
            "(d, s) -> IF(s > 0, (d / s) * (d / s), 0D)), "
            "0D, (acc, v) -> acc + v)"
        ).alias("m2"),
        F.expr(
            "aggregate(sds, 0D, (acc, s) -> acc + IF(s > 0, 1D, 0D))"
        ).alias("n_used"),
    )
    return (
        scored.select(
            "vec_id",
            "label",
            F.round(F.sqrt(F.col("m2") / F.col("n_used")), 6).alias("zrms_r"),
        )
        .orderBy(F.col("zrms_r").desc(), "vec_id")
        .limit(20)
    )


_CHUNK = 32
_STRIDE = 24


@query(
    "doc_chunk_windows",
    f"""
    WITH t0 AS (
        -- list_filter '' + len>0 mirror the engine: empty/whitespace/NULL
        -- docs emit NO chunks (phantom ''-token chunks otherwise)
        SELECT doc_id, list_filter({_TOKS}, x -> x <> '') AS toks
        FROM documents
    ), t AS (
        SELECT doc_id, toks FROM t0 WHERE len(toks) > 0
    ), c AS (
        SELECT doc_id, CAST(k AS INT) AS chunk_id,
               CAST(1 + k * {_STRIDE} AS INT) AS chunk_start,
               toks[CAST(1 + k * {_STRIDE} AS INT)
                    : CAST(k * {_STRIDE} + {_CHUNK} AS INT)] AS ctoks
        FROM t, UNNEST(range(0,
             1 + CAST(ceil(greatest(0, len(toks) - {_CHUNK}) / {_STRIDE})
                 AS INT))) AS u(k)
    )
    SELECT doc_id, chunk_id, chunk_start,
           CAST(len(ctoks) AS INT) AS n_chunk_tokens,
           md5(array_to_string(ctoks, ' ')) AS chunk_md5
    FROM c
    """,
)
def doc_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-style context-window chunking (ext/packing.py::chunk_windows):
    every document split into overlapping 32-token windows advancing by 24
    (8-token overlap), the indexing-prep companion to ``sequence_packing``
    — packing concatenates short docs up to a budget, chunking splits long
    ones down to a context window. The oracle rebuilds every window
    independently and md5-compares the chunk text byte-for-byte.

    Scale shape: pure per-row 1→N fan-out (in-row transform + one
    explode), no shuffle, no Python — a map stage with predictable
    ~n_tokens/stride output amplification."""
    from ..ext.packing import chunk_windows

    docs = _t(spark, sf_dir, "documents")
    out = chunk_windows(docs, chunk_size=_CHUNK, stride=_STRIDE)
    return out.select(
        "doc_id",
        "chunk_id",
        "chunk_start",
        "n_chunk_tokens",
        F.md5(F.col("chunk_text").cast("binary")).alias("chunk_md5"),
    )


_DSIR_B = 1024
_DSIR_TGT = "src0"


def _dsir_ng_sql(rel: str) -> str:
    """Unigram+bigram stream of a tokenized relation (doc_id, toks)."""
    return f"""
        SELECT doc_id, unnest(toks) AS ng FROM {rel}
        UNION ALL
        SELECT doc_id,
               unnest(list_transform(range(1, len(toks)),
                      i -> toks[CAST(i AS INT)] || ' ' ||
                           toks[CAST(i AS INT) + 1])) AS ng
        FROM {rel} WHERE len(toks) >= 2
    """


@query(
    "dsir_select_docs",
    f"""
    WITH t AS (
        -- list_filter '' mirrors the engine's array_remove: an
        -- empty/whitespace doc must yield ZERO features, not one '' token
        SELECT doc_id, source,
               list_filter({_TOKS}, x -> x <> '') AS toks
        FROM documents
    ), raw_t AS (
        SELECT doc_id, toks FROM t WHERE source <> '{_DSIR_TGT}'
    ), tgt_t AS (
        SELECT doc_id, toks FROM t WHERE source = '{_DSIR_TGT}'
    ), raw_ng AS ({_dsir_ng_sql('raw_t')}
    ), tgt_ng AS ({_dsir_ng_sql('tgt_t')}
    ), raw_b AS (
        SELECT doc_id, {_FOLD8.format(x='ng')} % {_DSIR_B} AS bucket
        FROM raw_ng
    ), tgt_b AS (
        SELECT {_FOLD8.format(x='ng')} % {_DSIR_B} AS bucket FROM tgt_ng
    ), c_r AS (
        SELECT bucket, CAST(COUNT(*) AS DOUBLE) AS c_r
        FROM raw_b GROUP BY bucket
    ), c_t AS (
        SELECT bucket, CAST(COUNT(*) AS DOUBLE) AS c_t
        FROM tgt_b GROUP BY bucket
    ), tot AS (
        SELECT (SELECT SUM(c_r) FROM c_r) AS t_r,
               (SELECT SUM(c_t) FROM c_t) AS t_t
    ), lam AS (
        SELECT r.bucket,
               ln((COALESCE(ct.c_t, 0) + 0.5) / (tot.t_t + 0.5 * {_DSIR_B}))
             - ln((r.c_r + 0.5) / (tot.t_r + 0.5 * {_DSIR_B})) AS lam
        FROM c_r r LEFT JOIN c_t ct USING (bucket) CROSS JOIN tot
    ), doc_counts AS (
        SELECT doc_id, bucket, CAST(COUNT(*) AS DOUBLE) AS c_x
        FROM raw_b GROUP BY doc_id, bucket
    ), scored AS (
        SELECT doc_id,
               CAST(SUM(c_x) AS BIGINT) AS n_feats,
               SUM(c_x * lam) AS logratio
        FROM doc_counts JOIN lam USING (bucket) GROUP BY doc_id
    ), sel AS (
        SELECT doc_id, n_feats, logratio,
               logratio + (-ln(-ln(
                   (({_FOLD8.format(x="'dsir:' || doc_id")}) + 0.5)
                   / 4294967296.0))) AS score
        FROM scored
    )
    SELECT doc_id, n_feats,
           ROUND(logratio, 6) AS logratio_r,
           ROUND(score, 6) AS score_r
    FROM sel ORDER BY score DESC, doc_id LIMIT 100
    """,
)
def dsir_select_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (Xie et al. 2023, arXiv:2302.03169): treat one
    source as the target domain, score every other document by the hashed
    unigram+bigram bag-model log-ratio ``log p_tgt - log p_raw``
    (ext/text.py::dsir_logratio), then importance-RESAMPLE 100 winners via
    deterministic Gumbel-top-k (ext/text.py::dsir_select — the md5-uniform
    substitution that makes even the sampling step oracle-hashable). The
    oracle retrains both bucket models and replays the identical
    perturbation in DuckDB.

    Scale shape: two word-count-shaped hash aggregates for the models
    (≤1024 rows each — broadcast), one per-doc feature agg, one
    TakeOrderedAndProject top-k. No iteration, no Python, no collect."""
    from ..ext.text import dsir_select

    docs = _t(spark, sf_dir, "documents")
    raw = docs.filter(F.col("source") != _DSIR_TGT)
    tgt = docs.filter(F.col("source") == _DSIR_TGT)
    out = dsir_select(
        raw, tgt, k_docs=100, n_buckets=_DSIR_B, score_col="score"
    )
    return out.select(
        "doc_id",
        "n_feats",
        F.round("logratio", 6).alias("logratio_r"),
        F.round("score", 6).alias("score_r"),
    )


@query(
    "shuffle_shards_docs",
    f"""
    WITH s AS (
        SELECT doc_id,
               CAST(({_FOLD8.format(x="'ep0:' || doc_id")}) % 16 AS INT)
                   AS shard,
               md5('ep0:o:' || doc_id) AS ok
        FROM documents
    )
    SELECT doc_id, shard,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY shard ORDER BY ok, doc_id
           ) AS BIGINT) AS pos
    FROM s
    """,
)
def shuffle_shards_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic pre-training shuffle-and-shard
    (operators/sampling.py::shuffle_shards): every document assigned an
    md5 shard and a reproducible pseudo-random position WITHIN the shard —
    the global-sort-free training-order permutation ((shard, pos) is a
    total order; a new seed is a new epoch). The oracle replays the
    identical two digests and per-shard ranking, so the ORDER itself is
    hash-checked, not just membership.

    Scale shape: map-only assignment + a by-shard window — n_shards
    independent sorts, no single global ordering task, no RNG."""
    from ..operators.sampling import shuffle_shards

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    return shuffle_shards(docs, "doc_id", n_shards=16, seed="ep0").select(
        "doc_id", "shard", "pos"
    )
