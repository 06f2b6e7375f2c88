"""Generator / lateral-view operators: row-expanding transforms.

The reference never expands rows (its SQL surface is scans, joins and
aggregates — SURVEY.md §2.1), but any corpus pipeline lives on
token-level views of document tables, and the relational surface a user
expects includes LATERAL/UNNEST. Three shapes:

* ``q_explode_tokens`` — posexplode (ordinal-preserving UNNEST) of the
  whitespace tokenization; the canonical doc→token fan-out.
* ``q_regexp_extract_all`` — extract-all → explode: pattern mining over
  text without a UDF (regexp_extract_all is codegen'd JVM regex).
* ``q_tfidf_topk`` — per-document top-3 TF-IDF terms: the full
  token-fan-out → two-level aggregation → rejoin → per-key top-k
  pipeline, i.e. the plan shape of every "score terms against corpus
  statistics" job.

Scale notes (100 TB): explode is pipelined inside whole-stage codegen —
no shuffle is introduced by the fan-out itself; every aggregate below it
partial-aggregates map-side, so exchanges are sized by distinct-token
cardinality, not token occurrences. TF-IDF's document-frequency table is
tiny (distinct terms) and broadcasts back onto the term-frequency side.
Determinism: libm ln is rounded to 6 dp (helpers.py policy) and ranking
uses the rounded score with a total tie-break, so Spark and DuckDB rank
identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .helpers import fan_out

# Non-empty whitespace tokens (split on single spaces yields '' for runs).
# array_remove, not `filter(arr, t -> t <> '')`: the HOF lambda is
# evaluated interpreted per element, where array_remove is one native
# JVM loop inside codegen — r14 A/B: 0.99 s vs 1.08 s (HOF) vs 1.09 s
# (post-explode Filter) for q_tfidf_topk at sf0.1. Order-preserving and
# drops exactly the '' elements, so all three forms are equivalent
# (split never yields nulls).
_TOKENS = "array_remove(split(text, ' '), '')"


def q_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordinal-preserving token fan-out: posexplode of the tokenization,
    aggregated to (position, token) counts for the first three positions
    — "what words start documents". The generate step is pipelined (no
    exchange); the only shuffle carries the tiny (pos × token) group
    set thanks to map-side partial aggregation."""
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    toks = docs.select(
        F.posexplode(F.expr(_TOKENS)).alias("pos", "token")
    ).filter(F.col("pos") < 3)
    return (
        toks.groupBy("pos", "token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("pos", F.desc("n"), "token")
    )


ORACLE_EXPLODE_TOKENS = """
WITH toks AS (
  SELECT list_filter(string_split(text, ' '), t -> t <> '') AS t
  FROM documents
), pt AS (
  SELECT unnest(generate_series(1, len(t))) - 1 AS pos, t
  FROM toks
), flat AS (
  SELECT pos, t[pos + 1] AS token FROM pt WHERE pos < 3
)
SELECT pos, token, count(*) AS n
FROM flat GROUP BY pos, token
ORDER BY pos, n DESC, token
"""


def q_regexp_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pattern mining without a UDF: regexp_extract_all pulls every
    5+-letter word, explode flattens, and the count shuffles only the
    distinct-match set. The regex runs inside codegen on the JVM — the
    fast path the scale guidance demands for text scans."""
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    hits = docs.select(
        F.explode(
            F.expr(r"regexp_extract_all(text, '[a-z]{5,}', 0)")
        ).alias("word")
    )
    return (
        hits.groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "word")
        .limit(20)
    )


ORACLE_REGEXP_EXTRACT_ALL = """
WITH hits AS (
  SELECT unnest(regexp_extract_all(text, '[a-z]{5,}', 0)) AS word
  FROM documents
)
SELECT word, count(*) AS n
FROM hits GROUP BY word
ORDER BY n DESC, word
LIMIT 20
"""


def q_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 TF-IDF terms (docs sampled by id to bound the
    output; corpus statistics computed over ALL documents). Plan: one
    token fan-out feeds (a) term frequency per (doc, term) and (b)
    document frequency per term; (b) is distinct-term sized and
    broadcasts back onto (a); ranking is a per-doc window over ≤
    |terms-per-doc| rows. At 100 TB the only large exchange is the
    (doc, term) aggregation, carrying map-side-combined partials."""
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()  # scalar corpus constant (metadata-sized action)
    # TF branch: the doc sample filter sits BELOW the explode (codegen
    # filters rows before generating tokens); DF branch: per-doc
    # array_distinct dedups terms inside the scan projection, so document
    # frequency is a plain map-side-combined count — no countDistinct
    # two-level aggregate, and the exchange carries (term, partial count)
    # rows bounded by the vocabulary, not the token stream.
    # empty-token drop via native array_remove BEFORE the explode (the
    # r13 post-explode row Filter let empties flow through Generate and
    # drove the one driver-confirmed regression, 0.827→1.137 s; the
    # pre-explode HOF filter form pays an interpreted lambda per token).
    # See _TOKENS above for the three-way A/B.
    # no fan_out on either branch (r14): both feed partial-aggregatable
    # explode→groupBy plans, and the interleaved A/B measured the
    # round-robin payload shuffle costing 2.1x the parallelism it buys
    # at sf0.1 (1.10 s -> 0.52 s without). At 100 TB the scan
    # out-parallelizes the cluster and the gated fan_out is a no-op
    # either way (helpers.fan_out).
    tf = (
        docs.filter(F.col("doc_id") % 20 == 0)
        .select("doc_id", F.explode(F.expr(_TOKENS)).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = (
        docs
        .select(F.explode(F.array_distinct(F.expr(_TOKENS))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    idf = df_.select(
        "term",
        F.round(
            F.log((F.lit(float(n_docs)) + 1.0) / (F.col("df") + 1.0)), 6
        ).alias("idf"),
    )
    scored = (
        tf.join(F.broadcast(idf), "term")
        .select(
            "doc_id",
            "term",
            F.round(F.col("tf") * F.col("idf"), 6).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.asc("term")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .drop("rn")
        .orderBy("doc_id", F.desc("score"), "term")
    )


ORACLE_TFIDF_TOPK = """
WITH toks AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks
  WHERE doc_id % 20 = 0 GROUP BY doc_id, term
), idf AS (
  SELECT term,
         round(ln(((SELECT count(*) FROM documents) + 1.0)
                  / (count(DISTINCT doc_id) + 1.0)), 6) AS idf
  FROM toks GROUP BY term
), scored AS (
  SELECT tf.doc_id, tf.term, round(tf.tf * idf.idf, 6) AS score
  FROM tf JOIN idf USING (term)
  WHERE tf.doc_id % 20 = 0
), ranked AS (
  SELECT doc_id, term, score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, term ASC) AS rn
  FROM scored
)
SELECT doc_id, term, score FROM ranked WHERE rn <= 3
ORDER BY doc_id, score DESC, term
"""


QUERIES = {
    "q_explode_tokens": q_explode_tokens,
    "q_regexp_extract_all": q_regexp_extract_all,
    "q_tfidf_topk": q_tfidf_topk,
}

ORACLES = {
    "q_explode_tokens": ORACLE_EXPLODE_TOKENS,
    "q_regexp_extract_all": ORACLE_REGEXP_EXTRACT_ALL,
    "q_tfidf_topk": ORACLE_TFIDF_TOPK,
}
