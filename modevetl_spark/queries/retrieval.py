"""Retrieval scoring operators ([EXT] — the search-side companions of
the L2/L3 pipeline family): BM25 term scoring and reciprocal-rank
fusion of two exact rankings. Both oracle-gated.

Float discipline: BM25 terms are per-row expressions whose transcendental
(one LN) feeds a 6-dp-rounded per-row output — never an order-sensitive
sum — with every mixed int/double step explicitly cast and shaped
identically in both engines (the q_text_tfidf grade). RRF is stronger:
ranks are integers and 1/(60+rank) is a single exact division, so the
fused score is bit-identical across engines with no transcendental at
all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from modevetl_spark.operators._util import spread
from modevetl_spark.operators.similarity import (
    CLEAN_EMB_SQL,
    cosine_pre,
    well_formed,
)
from modevetl_spark.operators.text import tokens
from modevetl_spark.queries import prep
from modevetl_spark.queries._registry import make_registry
from modevetl_spark.sources.catalog import load

QUERIES, ORACLE, q = make_registry()


# --- BM25 term scoring --------------------------------------------------

_BM25_ORACLE = """
WITH tf AS (
    SELECT doc_id,
           unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                              t -> t <> '')) AS tok
    FROM documents
),
tfc AS (SELECT doc_id, tok, COUNT(*) AS tf FROM tf GROUP BY 1, 2),
dl AS (SELECT doc_id, SUM(tf) AS dl FROM tfc GROUP BY doc_id),
stats AS (
    SELECT COUNT(*) AS n_docs,
           CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
    FROM dl
),
dfc AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM tfc GROUP BY tok)
SELECT doc_id, tok,
       ROUND(
           LN((CAST(s.n_docs - dfc.df AS DOUBLE) + CAST(0.5 AS DOUBLE))
              / (CAST(dfc.df AS DOUBLE) + CAST(0.5 AS DOUBLE))
              + CAST(1.0 AS DOUBLE))
           * (CAST(tfc.tf AS DOUBLE) * CAST(2.2 AS DOUBLE))
           / (CAST(tfc.tf AS DOUBLE)
              + CAST(1.2 AS DOUBLE)
                * (CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE)
                   + CAST(0.75 AS DOUBLE)
                     * (CAST(dl.dl AS DOUBLE) / s.avgdl))),
           6) AS bm25
FROM tfc
JOIN dfc USING (tok)
JOIN dl USING (doc_id)
CROSS JOIN stats s
WHERE doc_id < 100
QUALIFY ROW_NUMBER() OVER (
    PARTITION BY doc_id
    ORDER BY ROUND(
        LN((CAST(s.n_docs - dfc.df AS DOUBLE) + CAST(0.5 AS DOUBLE))
           / (CAST(dfc.df AS DOUBLE) + CAST(0.5 AS DOUBLE))
           + CAST(1.0 AS DOUBLE))
        * (CAST(tfc.tf AS DOUBLE) * CAST(2.2 AS DOUBLE))
        / (CAST(tfc.tf AS DOUBLE)
           + CAST(1.2 AS DOUBLE)
             * (CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE)
                + CAST(0.75 AS DOUBLE)
                  * (CAST(dl.dl AS DOUBLE) / s.avgdl))) , 6) DESC,
        tok
) <= 3
"""


@q("q_text_bm25", oracle_sql=_BM25_ORACLE)
def text_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3+: BM25 top-3 terms per document (k1=1.2, b=0.75) — the
    ranking-function upgrade of q_text_tfidf that length-normalizes term
    frequency, the scoring half of a lexical retrieval index.

    Plan shape (same skeleton as TF-IDF): explode → (doc,tok) hash agg
    with map-side combine is the only LOGICAL pass over the text; doc
    length (sum of tf), the one-row (n_docs, avgdl) stats, and the
    vocabulary DF table all derive from that TF relation and broadcast
    back onto it — corpus stats are thus over docs with ≥1 token (the
    fixture has none without). Catalyst inlines the TF subtree per
    consumer (column-pruned scans — fine at test scale); at 100 TB
    persist the TF relation once (one shuffle write) so the corpus
    tokenizes exactly once, same guidance as q_text_tfidf."""
    prep(spark)
    d = spread(load(spark, sf_dir, "documents"))
    tf = (
        d.select("doc_id", F.explode(tokens("text")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    df = tf.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
    idf = F.log(
        ((F.col("n_docs") - F.col("df")).cast("double") + F.lit(0.5))
        / (F.col("df").cast("double") + F.lit(0.5))
        + F.lit(1.0)
    )
    norm_len = (
        F.lit(1.0)
        - F.lit(0.75)
        + F.lit(0.75) * (F.col("dl").cast("double") / F.col("avgdl"))
    )
    score = F.round(
        idf
        * (F.col("tf").cast("double") * F.lit(2.2))
        / (F.col("tf").cast("double") + F.lit(1.2) * norm_len),
        6,
    )
    scored = (
        tf.where(F.col("doc_id") < 100)
        .join(F.broadcast(df), "tok")
        .join(F.broadcast(dl.where(F.col("doc_id") < 100)), "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", "tok", score.alias("bm25"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("bm25").desc(), "tok")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .drop("rn")
    )


# --- Reciprocal-rank fusion of two exact rankings -----------------------

_RRF_ORACLE = f"""
WITH clean AS (SELECT * FROM embeddings WHERE {CLEAN_EMB_SQL}),
qs AS (SELECT vec_id, embedding FROM clean WHERE vec_id < 20),
cos_rank AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (
               PARTITION BY q.vec_id
               ORDER BY ROUND(list_cosine_similarity(
                            CAST(q.embedding AS DOUBLE[]),
                            CAST(c.embedding AS DOUBLE[])), 6) DESC,
                        c.vec_id) AS r
    FROM qs q JOIN clean c ON c.vec_id <> q.vec_id
    QUALIFY r <= 10
),
l2_rank AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (
               PARTITION BY q.vec_id
               ORDER BY ROUND(list_distance(
                            CAST(q.embedding AS DOUBLE[]),
                            CAST(c.embedding AS DOUBLE[])), 6) ASC,
                        c.vec_id) AS r
    FROM qs q JOIN clean c ON c.vec_id <> q.vec_id
    QUALIFY r <= 10
),
fused AS (
    SELECT COALESCE(a.query_id, b.query_id) AS query_id,
           COALESCE(a.neighbor_id, b.neighbor_id) AS neighbor_id,
           COALESCE(CAST(1.0 AS DOUBLE) / (60 + a.r), CAST(0.0 AS DOUBLE))
           + COALESCE(CAST(1.0 AS DOUBLE) / (60 + b.r), CAST(0.0 AS DOUBLE))
               AS rrf
    FROM cos_rank a
    FULL JOIN l2_rank b
      ON a.query_id = b.query_id AND a.neighbor_id = b.neighbor_id
)
SELECT query_id, neighbor_id, ROUND(rrf, 9) AS rrf
FROM fused
QUALIFY ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY rrf DESC, neighbor_id) <= 5
"""


@q("q_sim_rrf_fusion", oracle_sql=_RRF_ORACLE)
def sim_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2+: reciprocal-rank fusion (RRF, k=60) of two retriever
    rankings — cosine similarity and euclidean distance top-10 — into a
    fused top-5 per query. The standard hybrid-search combiner: rank
    positions, not raw scores, so heterogeneous retrievers (lexical,
    dense, ANN) fuse without calibration.

    Determinism: ranks are integers and 1/(60+rank) is one exact IEEE
    division — the fused score is bit-identical in any engine, no
    transcendental, no order-sensitive sum (the two rankings themselves
    pin ties on rounded score then neighbor id, the q_sim_topk
    discipline).

    Plan shape: queries broadcast onto the corpus twice (two scoring
    lenses over one corpus scan each), per-query top-10 via window; the
    fusion full-join touches only 20·10-row rank lists. At 100 TB each
    lens swaps to its ANN variant (LSH/IVF, both present) — RRF itself
    only ever sees the tiny rank lists."""
    prep(spark)
    # shared degenerate-vector contract (emits rank-fused scores over
    # cosine; see operators/similarity.well_formed / CLEAN_EMB_SQL)
    e = well_formed(load(spark, sf_dir, "embeddings"), nrm_col="nrm")
    qs = e.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_vec"),
        F.col("nrm").alias("q_nrm"),
    )
    cs = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_vec"),
        F.col("nrm").alias("c_nrm"),
    )
    base = cs.crossJoin(F.broadcast(qs)).where(
        F.col("neighbor_id") != F.col("query_id")
    )
    l2 = F.sqrt(
        F.aggregate(
            F.zip_with(
                F.col("q_vec"),
                F.col("c_vec"),
                lambda x, y: (x.cast("double") - y.cast("double"))
                * (x.cast("double") - y.cast("double")),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    cos_scored = base.select(
        "query_id",
        "neighbor_id",
        F.round(
            cosine_pre(
                F.col("q_vec"), F.col("c_vec"), F.col("q_nrm"), F.col("c_nrm")
            ),
            6,
        ).alias("s"),
    )
    l2_scored = base.select(
        "query_id", "neighbor_id", F.round(l2, 6).alias("s")
    )
    w_cos = Window.partitionBy("query_id").orderBy(
        F.col("s").desc(), "neighbor_id"
    )
    w_l2 = Window.partitionBy("query_id").orderBy(
        F.col("s").asc(), "neighbor_id"
    )
    cos_rank = (
        cos_scored.withColumn("r", F.row_number().over(w_cos))
        .where(F.col("r") <= 10)
        .select("query_id", "neighbor_id", F.col("r").alias("r_cos"))
    )
    l2_rank = (
        l2_scored.withColumn("r", F.row_number().over(w_l2))
        .where(F.col("r") <= 10)
        .select("query_id", "neighbor_id", F.col("r").alias("r_l2"))
    )
    fused = (
        cos_rank.join(l2_rank, ["query_id", "neighbor_id"], "full")
        .select(
            "query_id",
            "neighbor_id",
            (
                F.coalesce(
                    F.lit(1.0) / (F.lit(60) + F.col("r_cos")), F.lit(0.0)
                )
                + F.coalesce(
                    F.lit(1.0) / (F.lit(60) + F.col("r_l2")), F.lit(0.0)
                )
            ).alias("rrf"),
        )
    )
    w_f = Window.partitionBy("query_id").orderBy(
        F.col("rrf").desc(), "neighbor_id"
    )
    return (
        fused.select("query_id", "neighbor_id", F.round("rrf", 9).alias("rrf"))
        .withColumn("rn", F.row_number().over(w_f))
        .where(F.col("rn") <= 5)
        .drop("rn")
    )
