"""Training-data pipeline queries, round 4 [EXT]: PII redaction,
corpus-level n-gram statistics, Gopher-style hard quality filters, and
embedding-norm validation (BASELINE.json north star — the sweeps a
large-scale LLM data pipeline runs besides dedup/similarity, which live
in queries/llm.py).

All per-row work is JVM-side Catalyst expressions (regexp, higher-order
array functions) — no Python UDFs — so whole-stage codegen applies and
the only shuffles are the final aggregations, whose keys are bounded
(bigram vocabulary, label domain). Every query is oracle-gated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from modevetl_spark.operators.text import (
    EN_STOPWORDS,
    distinct_stopword_count,
    mean_token_len,
    tokens,
    word_shingles,
)
from modevetl_spark.queries import prep
from modevetl_spark.queries._registry import make_registry
from modevetl_spark.sources.catalog import load

QUERIES, ORACLE, q = make_registry()

# Synthetic-but-deterministic PII suffix appended to each document so the
# redaction patterns have real matches at every scale factor (the fixture
# corpus itself is a clean word soup). Same expression on both engines.
_EMAIL_PAT = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_PAT = r"\d{3}-\d{4}"

_PII_ORACLE = f"""
WITH aug AS (
    SELECT doc_id,
           text || ' contact user' || CAST(doc_id AS VARCHAR)
                || '@example.com or phone 555-01'
                || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') AS body
    FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(body, '{_EMAIL_PAT}')) AS BIGINT)
           AS n_emails,
       CAST(len(regexp_extract_all(body, '{_PHONE_PAT}')) AS BIGINT)
           AS n_phones,
       md5(regexp_replace(regexp_replace(body, '{_EMAIL_PAT}', '<EMAIL>', 'g'),
                          '{_PHONE_PAT}', '<PHONE>', 'g')) AS redacted_md5
FROM aug
"""


@q("q_pii_redact", oracle_sql=_PII_ORACLE)
def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3+: PII scrubbing — regex email/phone redaction with match counts
    (the pre-training privacy pass). Documents are augmented with a
    deterministic synthetic contact line so the patterns exercise real
    matches; the oracle builds the identical augmentation. Row-local
    regexp work, shuffle-free; at 100 TB this is a pure map stage."""
    prep(spark)
    d = load(spark, sf_dir, "documents")
    body = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or phone 555-01"),
        F.lpad((F.col("doc_id") % 100).cast("string"), 2, "0"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(body, _EMAIL_PAT, "<EMAIL>"), _PHONE_PAT, "<PHONE>"
    )
    return d.select(
        "doc_id",
        F.regexp_count(body, F.lit(_EMAIL_PAT)).alias("n_emails"),
        F.regexp_count(body, F.lit(_PHONE_PAT)).alias("n_phones"),
        F.md5(redacted).alias("redacted_md5"),
    )


_NGRAM_TOPK_ORACLE = r"""
WITH toks AS (
    SELECT list_filter(regexp_split_to_array(lower(text), '\s+'),
                       x -> x <> '') AS t
    FROM documents
),
grams AS (
    SELECT unnest(list_transform(range(1, len(t)),
                                 i -> t[i] || ' ' || t[i + 1])) AS bigram
    FROM toks
    WHERE len(t) >= 2
)
SELECT bigram, COUNT(*) AS cnt
FROM grams
GROUP BY bigram
ORDER BY cnt DESC, bigram
LIMIT 20
"""


@q("q_ngram_topk", oracle_sql=_NGRAM_TOPK_ORACLE)
def ngram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3+: corpus-wide top-k frequent word bigrams (vocabulary/boilerplate
    inspection pass), deterministic tie-break (count desc, bigram asc).

    Scale shape: explode -> hash agg with map-side partials (shuffle
    carries only distinct bigrams), then a TakeOrderedAndProject for the
    global top-20 — no global sort."""
    prep(spark)
    d = load(spark, sf_dir, "documents")
    grams = d.select(
        F.explode(word_shingles(tokens("text"), 2)).alias("bigram")
    )
    cnt = grams.groupBy("bigram").agg(F.count(F.lit(1)).alias("cnt"))
    return cnt.orderBy(F.col("cnt").desc(), F.col("bigram")).limit(20)


_STOPLIST_SQL = "[" + ", ".join(f"'{w}'" for w in EN_STOPWORDS) + "]"

_QUALITY_FILTER_ORACLE = rf"""
WITH t AS (
    SELECT doc_id,
           list_filter(regexp_split_to_array(lower(text), '\s+'),
                       x -> x <> '') AS toks,
           lower(text) AS lo
    FROM documents
),
m AS (
    SELECT doc_id,
           len(toks) AS n_words,
           ROUND(CAST(COALESCE(list_sum(list_transform(toks, x -> length(x))),
                               0)
                      AS DOUBLE) / greatest(len(toks), 1), 6)
               AS mean_word_len,
           ROUND(CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-z]')))
                      AS DOUBLE) / greatest(len(toks), 1), 6)
               AS frac_alpha_words,
           CAST(len(list_distinct(list_filter(
               toks, x -> list_contains({_STOPLIST_SQL}, x)))) AS BIGINT)
               AS n_distinct_stopwords,
           ROUND(CAST(length(regexp_replace(lo, '[a-z0-9\s]', '', 'g'))
                      AS DOUBLE) / greatest(length(lo), 1), 6)
               AS symbol_ratio
    FROM t
)
SELECT doc_id, n_words, mean_word_len, frac_alpha_words,
       n_distinct_stopwords, symbol_ratio,
       (n_words BETWEEN 5 AND 100000
        AND mean_word_len BETWEEN 2 AND 12
        AND frac_alpha_words >= 0.7
        AND n_distinct_stopwords >= 2
        AND symbol_ratio <= 0.1) AS keep
FROM m
"""


@q("q_quality_filter", oracle_sql=_QUALITY_FILTER_ORACLE)
def quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3+: Gopher/C4-style HARD quality filters (word count bounds, mean
    word length, alphabetic-word fraction, ≥2 distinct stopwords, symbol
    ratio) plus the combined keep decision — the boolean complement of
    q_text_quality's soft score. Row-local, shuffle-free. Tokenless docs
    get mean_word_len 0 on both engines (the oracle COALESCEs DuckDB's
    NULL list_sum([]))."""
    prep(spark)
    d = load(spark, sf_dir, "documents")
    toks = tokens("text")
    n_words = F.size(toks)
    denom = F.greatest(n_words, F.lit(1))
    mean_wl = F.round(mean_token_len(toks), 6)
    frac_alpha = F.round(
        F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))).cast("double")
        / denom,
        6,
    )
    n_stop = distinct_stopword_count(toks)
    lo = F.lower(F.col("text"))
    symbol_ratio = F.round(
        F.length(F.regexp_replace(lo, r"[a-z0-9\s]", "")).cast("double")
        / F.greatest(F.length(lo), F.lit(1)),
        6,
    )
    m = d.select(
        "doc_id",
        n_words.alias("n_words"),
        mean_wl.alias("mean_word_len"),
        frac_alpha.alias("frac_alpha_words"),
        n_stop.alias("n_distinct_stopwords"),
        symbol_ratio.alias("symbol_ratio"),
    )
    keep = (
        F.col("n_words").between(5, 100000)
        & F.col("mean_word_len").between(2, 12)
        & (F.col("frac_alpha_words") >= 0.7)
        & (F.col("n_distinct_stopwords") >= 2)
        & (F.col("symbol_ratio") <= 0.1)
    )
    return m.withColumn("keep", keep)


_EMB_NORMS_ORACLE = """
WITH n AS (
    SELECT label,
           CASE
               WHEN embedding IS NULL THEN NULL
               WHEN len(embedding) = 0 THEN CAST(0.0 AS DOUBLE)
               WHEN len(list_filter(CAST(embedding AS DOUBLE[]),
                                    x -> x IS NULL)) > 0 THEN NULL
               ELSE ROUND(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                                CAST(embedding AS DOUBLE[]))), 6)
           END AS norm
    FROM embeddings
)
SELECT label,
       COUNT(*) AS n_vecs,
       MIN(norm) AS min_norm,
       MAX(norm) AS max_norm
FROM n
GROUP BY label
"""


@q("q_embedding_norms", oracle_sql=_EMB_NORMS_ORACLE)
def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4+: embedding sanity sweep — per-label L2-norm extrema (catches
    unnormalized or degenerate vectors before they poison an ANN index).
    min/max over per-row rounded norms are association-free, so the group
    aggregate is float-deterministic; the norm itself is a sequential
    higher-order-array fold, identical to DuckDB's list_dot_product.

    Degenerate-input contract mirrored in the oracle (COVERAGE.md N10 —
    DuckDB list_dot_product RAISES on NULL list elements and internal-
    errors on empty lists, where Spark's fold yields NULL and 0.0
    respectively): NULL/NULL-element vectors → NULL norm (skipped by
    MIN/MAX, counted by n_vecs), empty vector → 0.0 — exactly the
    engine's aggregate-fold semantics. Value-neutral on clean data."""
    prep(spark)
    e = load(spark, sf_dir, "embeddings")
    sq = F.aggregate(
        F.col("embedding"),
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    norm = F.round(F.sqrt(sq), 6)
    return (
        e.select("label", norm.alias("norm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.min("norm").alias("min_norm"),
            F.max("norm").alias("max_norm"),
        )
    )
