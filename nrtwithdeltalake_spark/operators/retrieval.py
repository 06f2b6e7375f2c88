"""Corpus retrieval scoring (BM25) — the ranking half of a training-data
search/curation pipeline (north-star LLM ops; the reference has no text
surface, see SURVEY.md §2.2).

BM25 is the canonical composition test for a distributed engine: one
tokenization feeds per-(doc,term) TF rows (array-lambda counts — the
full token stream is never generated), a per-term DF aggregate, a
scalar corpus aggregate (N, avgdl), and a broadcast rejoin — the plan
family of `q_tfidf_topk`, plus a nonlinear per-pair saturation term.

Numeric policy (helpers.py extended): the only libm call (ln for IDF) is
rounded to 6 dp; every other per-row op is IEEE-deterministic. The final
per-document SUM over matched query terms would be double and therefore
visit-order-dependent, so each term's contribution is quantized to
integer micro-units (floor(score*1e6) as bigint) and summed exactly —
the same trick corpus.py uses for embedding centroids. The oracle
mirrors the expression tree operation-for-operation.

Scale (100 TB): per-term TF is computed inside the scan projection
(array lambdas over the token array), so nothing explodes and the
shuffle carries only matching (doc, term, tf) postings; DF and corpus
stats are tiny aggregates broadcast back (BroadcastHashJoin /
BroadcastNestedLoopJoin over one row); top-k resolves as
TakeOrderedAndProject, never a global sort. Measured at sf0.1: 3.5×
faster than the explode(split) formulation it replaced.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from ..sources.catalog import load_table
from .helpers import fan_out

# Query terms drawn from the synthetic corpus vocabulary (TESTDATA.md).
BM25_TERMS = ["table", "scan", "merge"]
_K1 = "1.2"
_B = "0.75"


def bm25_micro_scores(docs: DataFrame) -> DataFrame:
    """(doc_id, micro) — per-document BM25 for the fixed BM25_TERMS
    query, as exact integer micro-units (docs matching no term are
    absent). The scoring core shared by ``q_bm25_topk`` and
    ``q_retrieval_hybrid``."""
    # One tokenization per document; per-term TF computed inside the
    # scan projection instead of exploding every token: the plan never
    # generates the full token stream (|docs|·|doc| rows), only
    # ≤|terms| rows per doc with tf > 0 — the shuffle carries exactly
    # the postings that score. TF counts via size − size(array_remove):
    # array_remove is a NATIVE array expression (a JVM loop), where the
    # previous `size(filter(toks, x -> x = t))` evaluated an interpreted
    # lambda per token per term (~2.3M interpreted evals at sf0.1 —
    # measured 2.5 s → 1.4 s end-to-end for q_bm25_topk).
    toks = docs.select(
        "doc_id", F.split(F.col("text"), " ").alias("toks")
    ).select(
        "doc_id",
        F.size("toks").alias("dl"),
        F.explode(
            F.filter(
                F.array(
                    *[
                        F.struct(
                            F.lit(t).alias("token"),
                            F.expr(
                                f"size(toks) - size(array_remove(toks, '{t}'))"
                            ).alias("tf_cnt"),
                        )
                        for t in BM25_TERMS
                    ]
                ),
                lambda s: s["tf_cnt"] > 0,
            )
        ).alias("hit"),
    )
    tf = toks.select(
        "doc_id", "dl", F.col("hit.token").alias("token"), F.col("hit.tf_cnt").alias("tf_cnt")
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    stats = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split(F.col("text"), " "))).alias("sum_dl"),
    )
    scored = tf.join(F.broadcast(dfreq), "token").crossJoin(F.broadcast(stats))
    # Expression tree mirrored 1:1 in ORACLE_BM25_TOPK — do not reassociate.
    idf = F.round(
        F.log(
            (F.col("n_docs").cast("double") - F.col("df").cast("double") + F.lit(0.5))
            / (F.col("df").cast("double") + F.lit(0.5))
            + F.lit(1.0)
        ),
        6,
    )
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
    tf_d = F.col("tf_cnt").cast("double")
    contrib = idf * (
        (tf_d * F.lit(2.2))
        / (
            tf_d
            + F.lit(float(_K1))
            * (F.lit(1.0) - F.lit(float(_B)) + F.lit(float(_B)) * F.col("dl").cast("double") / avgdl)
        )
    )
    micro = F.floor(contrib * F.lit(1000000.0)).cast("bigint")
    return (
        scored.select("doc_id", micro.alias("micro"))
        .groupBy("doc_id")
        .agg(F.sum("micro").alias("micro"))
    )


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 documents by Okapi BM25 for a fixed 3-term query.

    Plan: split once → per-term TF via array-lambda counts (no token
    explode) → broadcast DF + corpus stats → quantized score → exact
    integer sum per doc → TakeOrderedAndProject(10).
    """
    # no fan_out (r14): TF counts collapse per doc inside the scan
    # projection and every aggregate below is partial-aggregatable; the
    # A/B measured the payload shuffle 1.4-1.6x slower (0.95 s -> 0.66 s).
    docs = load_table(spark, sf_dir, "documents")
    return (
        bm25_micro_scores(docs)
        .select(
            "doc_id",
            (F.col("micro").cast("double") / F.lit(1000000.0)).alias("bm25"),
        )
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(10)
    )


RRF_K = 60  # standard reciprocal-rank-fusion constant
RRF_POOL = 100  # candidates fused per system (the top-k lists, not the corpus)
HYBRID_TOP = 20
HYBRID_QUERY_VEC = 0  # vec_id of the semantic query vector (≡ doc_id 0)


def q_retrieval_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 lexical ranking fused with embedding-cosine
    semantic ranking by reciprocal-rank fusion — the standard RAG
    first-stage retriever (fuse two cheap top-k lists; neither system's
    score scale has to be calibrated against the other).

    Semantics (engine-exact): each system contributes its RRF_POOL best
    candidates (deterministic total order: score desc, doc_id asc); a
    fused score is ``Σ 1e9 div (60 + rank)`` in pure integer arithmetic
    — order-independent, no float fusion drift. Docs outside a system's
    pool contribute 0 from that system, exactly like production RRF
    over top-k lists. Plan: both rankings end in
    TakeOrderedAndProject(RRF_POOL) (never a global sort), the fusion
    is a full outer join of two 100-row sets, and the final top-20 is
    again TakeOrdered — at 100 TB everything after the two candidate
    generators is constant-sized. doc_id ≡ vec_id per FIXTURES.md."""
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    lex_pool = (
        bm25_micro_scores(docs)
        .filter(F.col("doc_id") != HYBRID_QUERY_VEC)
        .orderBy(F.desc("micro"), F.asc("doc_id"))
        .limit(RRF_POOL)
        .withColumn(
            "lex_rank",
            F.row_number().over(
                Window.orderBy(F.desc("micro"), F.asc("doc_id"))
            ),
        )
        .select("doc_id", "lex_rank")
    )
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr("transform(embedding, x -> cast(x as double))").alias("v"),
    )
    qv = emb.filter(F.col("vec_id") == HYBRID_QUERY_VEC).select(
        F.col("v").alias("qv")
    )
    dot = (
        "aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
        "cast(0.0 as double), (acc, v) -> acc + v)"
    )
    cos = F.round(
        F.expr(dot.format(a="qv", b="v"))
        / (
            F.sqrt(F.expr(dot.format(a="qv", b="qv")))
            * F.sqrt(F.expr(dot.format(a="v", b="v")))
        ),
        6,
    )
    sem_pool = (
        emb.filter(F.col("vec_id") != HYBRID_QUERY_VEC)
        .crossJoin(F.broadcast(qv))
        .select(F.col("vec_id").alias("doc_id"), cos.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("doc_id"))
        .limit(RRF_POOL)
        .withColumn(
            "sem_rank",
            F.row_number().over(
                Window.orderBy(F.desc("cosine"), F.asc("doc_id"))
            ),
        )
        .select("doc_id", "sem_rank")
    )
    fused = (
        lex_pool.join(sem_pool, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.coalesce(
                F.expr(f"1000000000 div ({RRF_K} + lex_rank)"), F.lit(0)
            ).alias("lex_rrf"),
            F.coalesce(
                F.expr(f"1000000000 div ({RRF_K} + sem_rank)"), F.lit(0)
            ).alias("sem_rrf"),
        )
        .select(
            "doc_id",
            (F.col("lex_rrf") + F.col("sem_rrf")).alias("rrf_micro"),
        )
    )
    return fused.orderBy(F.desc("rrf_micro"), F.asc("doc_id")).limit(
        HYBRID_TOP
    )


ORACLE_RETRIEVAL_HYBRID = f"""
WITH toks AS (
  SELECT doc_id,
         len(string_split(text, ' ')) AS dl,
         unnest(string_split(text, ' ')) AS token
  FROM documents
), tf AS (
  SELECT doc_id, token, dl, count(*) AS tf_cnt
  FROM toks WHERE token IN ('table', 'scan', 'merge')
  GROUP BY doc_id, token, dl
), dfreq AS (
  SELECT token, count(*) AS df FROM tf GROUP BY token
), stats AS (
  SELECT count(*) AS n_docs,
         sum(len(string_split(text, ' '))) AS sum_dl
  FROM documents
), scored AS (
  SELECT tf.doc_id,
         cast(floor(
           round(ln((cast(n_docs AS double) - cast(df AS double) + 0.5)
                    / (cast(df AS double) + 0.5) + 1.0), 6)
           * ((cast(tf_cnt AS double) * 2.2)
              / (cast(tf_cnt AS double)
                 + 1.2 * (1.0 - 0.75 + 0.75 * cast(dl AS double)
                          / (cast(sum_dl AS double) / cast(n_docs AS double)))))
           * 1000000.0) AS bigint) AS micro
  FROM tf JOIN dfreq USING (token) CROSS JOIN stats
), lex AS (
  SELECT doc_id, sum(micro) AS micro FROM scored
  WHERE doc_id != {HYBRID_QUERY_VEC} GROUP BY doc_id
), lex_pool AS (
  SELECT doc_id, row_number() OVER (ORDER BY micro DESC, doc_id ASC)
             AS lex_rank
  FROM lex ORDER BY micro DESC, doc_id ASC LIMIT {RRF_POOL}
), qv AS (
  SELECT embedding::DOUBLE[] AS qv FROM embeddings
  WHERE vec_id = {HYBRID_QUERY_VEC}
), sem AS (
  SELECT vec_id AS doc_id,
         round(list_dot_product(qv.qv, e.embedding::DOUBLE[])
               / (sqrt(list_dot_product(qv.qv, qv.qv))
                  * sqrt(list_dot_product(e.embedding::DOUBLE[],
                                          e.embedding::DOUBLE[]))), 6)
             AS cosine
  FROM embeddings e CROSS JOIN qv WHERE e.vec_id != {HYBRID_QUERY_VEC}
), sem_pool AS (
  SELECT doc_id, row_number() OVER (ORDER BY cosine DESC, doc_id ASC)
             AS sem_rank
  FROM sem ORDER BY cosine DESC, doc_id ASC LIMIT {RRF_POOL}
), fused AS (
  SELECT doc_id,
         coalesce(1000000000 // ({RRF_K} + l.lex_rank), 0)
         + coalesce(1000000000 // ({RRF_K} + s.sem_rank), 0) AS rrf_micro
  FROM lex_pool l FULL OUTER JOIN sem_pool s USING (doc_id)
)
SELECT doc_id, rrf_micro FROM fused
ORDER BY rrf_micro DESC, doc_id ASC LIMIT {HYBRID_TOP}
"""


ORACLE_BM25_TOPK = """
WITH toks AS (
  SELECT doc_id,
         len(string_split(text, ' ')) AS dl,
         unnest(string_split(text, ' ')) AS token
  FROM documents
), tf AS (
  SELECT doc_id, token, dl, count(*) AS tf_cnt
  FROM toks WHERE token IN ('table', 'scan', 'merge')
  GROUP BY doc_id, token, dl
), dfreq AS (
  SELECT token, count(*) AS df FROM tf GROUP BY token
), stats AS (
  SELECT count(*) AS n_docs,
         sum(len(string_split(text, ' '))) AS sum_dl
  FROM documents
), scored AS (
  SELECT tf.doc_id,
         cast(floor(
           round(ln((cast(n_docs AS double) - cast(df AS double) + 0.5)
                    / (cast(df AS double) + 0.5) + 1.0), 6)
           * ((cast(tf_cnt AS double) * 2.2)
              / (cast(tf_cnt AS double)
                 + 1.2 * (1.0 - 0.75 + 0.75 * cast(dl AS double)
                          / (cast(sum_dl AS double) / cast(n_docs AS double)))))
           * 1000000.0) AS bigint) AS micro
  FROM tf JOIN dfreq USING (token) CROSS JOIN stats
)
SELECT doc_id, cast(sum(micro) AS double) / 1000000.0 AS bm25
FROM scored GROUP BY doc_id
ORDER BY bm25 DESC, doc_id ASC
LIMIT 10
"""


QUERIES = {
    "q_bm25_topk": q_bm25_topk,
    "q_retrieval_hybrid": q_retrieval_hybrid,
}

ORACLES = {
    "q_bm25_topk": ORACLE_BM25_TOPK,
    "q_retrieval_hybrid": ORACLE_RETRIEVAL_HYBRID,
}
