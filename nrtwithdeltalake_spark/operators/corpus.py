"""Corpus-level analytics for LLM training-data pipelines (BASELINE.json
north star, beyond the per-document ops in textstats.py): n-gram
statistics, repetition signals, corpus composition, stratified sampling,
normalization, and distributed embedding aggregates.

Numeric policy for cross-row float aggregation (embedding centroids,
norm averages): element values are quantized to integers (floor(x*1e6))
or cast to exact decimal *before* the aggregate, so partial sums are
exact and the result is independent of partitioning/visit order — the
same policy helpers.py applies to money columns. Row-level double math
(dot products, ratios) is IEEE-deterministic and needs no treatment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .helpers import fan_out

# ---------------------------------------------------------------------------
# n-gram statistics
# ---------------------------------------------------------------------------

# bigrams of the whitespace tokenization, as a column expression (pure
# Catalyst: split → transform over an index sequence; no UDF)
# Bigrams over a PRE-TOKENIZED `__tk` array column (project
# F.split(text) first): an inlined split(text) in the HOF lambda body is
# re-evaluated per element — twice here — so the old form re-tokenized
# each doc ~2·len times (O(len²)/doc; pre-tokenizing measured >2x faster
# at sf0.1 under identical load).
_BIGRAMS = (
    "transform(sequence(1, size(__tk) - 1), "
    "i -> concat_ws(' ', __tk[i-1], __tk[i]))"
)


def q_ngram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-20 bigrams. explode → count is the canonical
    corpus-statistics plan: the map side pre-aggregates each partition's
    gram counts, so the shuffle carries one row per distinct gram per
    partition, not one per occurrence — at 100 TB the distinct-gram set,
    not the token count, sizes the exchange. Top-20 resolves as
    TakeOrderedAndProject (per-partition heaps), never a full sort."""
    # no fan_out (r14): plain scan→explode→agg — map-side partial
    # aggregation collapses to the distinct-gram domain before any
    # exchange, and the A/B measured the payload shuffle 1.3-1.4x
    # slower than the single-task tokenization it parallelizes.
    docs = load_table(spark, sf_dir, "documents")
    grams = docs.select(F.split("text", " ").alias("__tk")).select(
        F.explode(F.expr(_BIGRAMS)).alias("bigram")
    )
    return (
        grams.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(20)
    )


ORACLE_NGRAM_TOPK = """
WITH toks AS (
  SELECT string_split(text, ' ') AS t FROM documents
), idx AS (
  SELECT t, unnest(generate_series(1, len(t) - 1)) AS i FROM toks
), grams AS (
  SELECT t[i] || ' ' || t[i + 1] AS bigram FROM idx
)
SELECT bigram, count(*) AS n
FROM grams GROUP BY bigram
ORDER BY n DESC, bigram ASC
LIMIT 20
"""


def q_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition signal (Gopher-style filter feature): the
    fraction of bigram occurrences taken by the document's most frequent
    bigram. Two-level aggregation — (doc, gram) counts, then per-doc
    max/total — keeps everything partial-aggregatable; no window, no
    per-doc sort."""
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    per_gram = (
        docs.select("doc_id", F.split("text", " ").alias("__tk"))
        .select("doc_id", F.explode(F.expr(_BIGRAMS)).alias("bigram"))
        .groupBy("doc_id", "bigram")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return per_gram.groupBy("doc_id").agg(
        F.max("n").alias("top_bigram_n"),
        F.sum("n").cast("long").alias("n_bigrams"),
        F.round(F.max("n").cast("double") / F.sum("n"), 6).alias("rep_ratio"),
    )


ORACLE_REPETITION_RATIO = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), idx AS (
  SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i FROM toks
), grams AS (
  SELECT doc_id, t[i] || ' ' || t[i + 1] AS bigram FROM idx
), per_gram AS (
  SELECT doc_id, bigram, count(*) AS n FROM grams GROUP BY doc_id, bigram
)
SELECT doc_id, max(n) AS top_bigram_n,
       cast(sum(n) as bigint) AS n_bigrams,
       round(cast(max(n) as double) / sum(n), 6) AS rep_ratio
FROM per_gram GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# corpus composition
# ---------------------------------------------------------------------------


def q_source_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus composition: doc/char/token totals, language
    spread, and each source's share of the corpus. The share is a window
    over the *aggregated* frame (20 rows) — the expensive part stays a
    plain partial-aggregatable groupBy on the full table."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    agg = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.round(
            F.sum(F.size(F.split("text", " "))).cast("double")
            / F.count(F.lit(1)),
            4,
        ).alias("avg_tokens"),
        F.countDistinct("lang").alias("n_langs"),
    )
    return agg.select(
        "*",
        F.round(
            F.col("n_docs").cast("double")
            / F.sum("n_docs").over(Window.partitionBy()),
            6,
        ).alias("corpus_share"),
    )


ORACLE_SOURCE_STATS = """
WITH agg AS (
  SELECT source, count(*) AS n_docs,
         cast(sum(n_chars) as bigint) AS total_chars,
         round(cast(sum(len(string_split(text, ' '))) as double)
               / count(*), 4) AS avg_tokens,
         count(DISTINCT lang) AS n_langs
  FROM documents GROUP BY source
)
SELECT source, n_docs, total_chars, avg_tokens, n_langs,
       round(cast(n_docs as double) / sum(n_docs) OVER (), 6) AS corpus_share
FROM agg
"""


def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling: per-language keep rates
    (en 50%, others 20%) via md5 key-hash buckets — reproducible across
    runs, partitionings, and engines (df.sample is neither), the property
    a training-mix builder needs. Returns the kept rows."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 8),
            16,
            10,
        )
        .cast("long")
        % 10
    )
    keep = F.when(F.col("lang") == "en", bucket < 5).otherwise(bucket < 2)
    return (
        docs.select("doc_id", "lang", "source", bucket.alias("bucket"))
        .filter(keep)
    )


ORACLE_SAMPLE_STRATIFIED = """
WITH b AS (
  SELECT doc_id, lang, source,
         CAST(concat('0x', substr(md5(cast(doc_id as varchar)), 1, 8))
              AS BIGINT) % 10 AS bucket
  FROM documents
)
SELECT doc_id, lang, source, bucket
FROM b
WHERE CASE WHEN lang = 'en' THEN bucket < 5 ELSE bucket < 2 END
"""


def q_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization pass every text pipeline runs before hashing/dedup:
    lowercase, strip punctuation, collapse whitespace, trim. Pure
    JVM-side regex (single scan+project, zero shuffles at any scale)."""
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), r"[.,!?;:]", ""),
            r"\s+",
            " ",
        )
    )
    return docs.select(
        "doc_id",
        norm.alias("norm_text"),
        F.length(norm).cast("long").alias("n_chars_norm"),
    )


ORACLE_TEXT_NORMALIZE = r"""
SELECT doc_id,
       trim(regexp_replace(regexp_replace(lower(text), '[.,!?;:]', '', 'g'),
                           '\s+', ' ', 'g')) AS norm_text,
       cast(length(trim(regexp_replace(
            regexp_replace(lower(text), '[.,!?;:]', '', 'g'),
            '\s+', ' ', 'g'))) as bigint) AS n_chars_norm
FROM documents
"""


# ---------------------------------------------------------------------------
# distributed embedding aggregates
# ---------------------------------------------------------------------------


def q_embed_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean embedding — the training step of IVF/k-means-style
    indexes, as a genuinely distributed aggregate: posexplode to
    (label, dim, value), quantize each element to an integer
    (floor(x*1e6)) so partial sums are exact and order-independent, then
    a single partial-aggregatable groupBy(label, dim). 640 output rows
    regardless of corpus size; the shuffle carries one row per
    (label, dim) per map partition."""
    # no fan_out (r14): the canonical scan→explode→agg shape this
    # module's policy protects — A/B measured 2.7-3.1x faster without
    # the payload shuffle (0.52 s -> 0.20 s).
    emb = load_table(spark, sf_dir, "embeddings")
    flat = emb.select(
        "label", F.posexplode(F.col("embedding").cast("array<double>"))
    ).select(
        "label",
        (F.col("pos") + 1).cast("long").alias("dim"),
        F.floor(F.col("col") * 1_000_000).alias("q"),
    )
    # no final round: integer-sum → double divide is bit-identical in any
    # engine (|sum| < 2^53), while round() at a .5 midpoint differs
    # between Spark (BigDecimal half-up on the shortest repr) and exact-
    # binary implementations.
    return flat.groupBy("label", "dim").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("q").cast("double") / F.count(F.lit(1)) / 1_000_000).alias(
            "centroid"
        ),
    )


ORACLE_EMBED_CENTROIDS = """
WITH flat AS (
  SELECT label,
         unnest(generate_series(1, len(embedding))) AS dim,
         unnest(embedding::DOUBLE[]) AS val
  FROM embeddings
)
SELECT label, cast(dim as bigint) AS dim, count(*) AS n,
       cast(sum(cast(floor(val * 1000000) as bigint)) as double)
           / count(*) / 1000000 AS centroid
FROM flat GROUP BY label, dim
"""


def q_embed_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label L2-norm distribution (embedding QA: catches unnormalized
    or degenerate batches). Row-level norm is IEEE-deterministic
    (in-order fold + sqrt, rounded); the cross-row average goes through
    an exact decimal cast of the rounded norm, helpers.py policy."""
    emb = fan_out(load_table(spark, sf_dir, "embeddings"), spark)
    dot = F.aggregate(
        F.zip_with(
            F.col("embedding").cast("array<double>"),
            F.col("embedding").cast("array<double>"),
            lambda a, b: a * b,
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = F.round(F.sqrt(dot), 6)
    return (
        emb.select("label", norm.cast("decimal(18,6)").alias("norm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("norm").cast("double").alias("min_norm"),
            F.max("norm").cast("double").alias("max_norm"),
            F.round(
                F.sum("norm").cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_norm"),
        )
    )


ORACLE_EMBED_NORM_STATS = """
WITH norms AS (
  SELECT label,
         cast(round(sqrt(list_dot_product(embedding::DOUBLE[],
                                          embedding::DOUBLE[])), 6)
              as decimal(18,6)) AS norm
  FROM embeddings
)
SELECT label, count(*) AS n,
       cast(min(norm) as double) AS min_norm,
       cast(max(norm) as double) AS max_norm,
       round(cast(sum(norm) as double) / count(*), 6) AS avg_norm
FROM norms GROUP BY label
"""


def q_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis-Spirakis): rank documents by ln(u)/w where u is an
    md5-derived uniform in (0,1] and w = n_chars, take the top 100 —
    longer documents are proportionally likelier, yet the draw is
    reproducible across runs, engines and partitionings (the property
    ``sample()``/``rand()`` cannot give a 100 TB curation pipeline).

    Plan shape: scan → project (hash, one libm ln) →
    TakeOrderedAndProject(100) — no shuffle at all beyond the top-k
    reduction; at scale each partition ships only its local top-100.

    The key is quantized to 6 dp so the one libm call can't produce a
    cross-engine last-ulp rank flip (ties resolve by doc_id — total
    order, exact result either way)."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 8),
        16,
        10,
    ).cast("long")
    u = (h + F.lit(1)).cast("double") / F.lit(4294967296.0)
    lkey = F.round(F.log(u) / F.col("n_chars").cast("double"), 6)
    return (
        docs.select("doc_id", "source", "n_chars", lkey.alias("samp_key"))
        .orderBy(F.desc("samp_key"), F.asc("doc_id"))
        .limit(100)
    )


ORACLE_SAMPLE_WEIGHTED = """
SELECT doc_id, source, n_chars,
       round(ln((CAST(concat('0x', substr(md5(cast(doc_id AS varchar)), 1, 8))
                      AS BIGINT) + 1) / 4294967296.0)
             / cast(n_chars AS double), 6) AS samp_key
FROM documents
ORDER BY samp_key DESC, doc_id ASC
LIMIT 100
"""


QUERIES = {
    "q_ngram_topk": q_ngram_topk,
    "q_sample_weighted": q_sample_weighted,
    "q_repetition_ratio": q_repetition_ratio,
    "q_source_stats": q_source_stats,
    "q_sample_stratified": q_sample_stratified,
    "q_text_normalize": q_text_normalize,
    "q_embed_centroids": q_embed_centroids,
    "q_embed_norm_stats": q_embed_norm_stats,
}

ORACLES = {
    "q_ngram_topk": ORACLE_NGRAM_TOPK,
    "q_sample_weighted": ORACLE_SAMPLE_WEIGHTED,
    "q_repetition_ratio": ORACLE_REPETITION_RATIO,
    "q_source_stats": ORACLE_SOURCE_STATS,
    "q_sample_stratified": ORACLE_SAMPLE_STRATIFIED,
    "q_text_normalize": ORACLE_TEXT_NORMALIZE,
    "q_embed_centroids": ORACLE_EMBED_CENTROIDS,
    "q_embed_norm_stats": ORACLE_EMBED_NORM_STATS,
}
