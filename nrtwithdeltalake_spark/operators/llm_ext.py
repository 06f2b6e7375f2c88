"""Round-4 LLM-pipeline extensions: VARIANT semi-structured analytics,
training-sequence packing, and Luhn-verified PII detection.

These extend the north-star surface (SURVEY.md §2.2 'north-star LLM ops')
beyond the reference, which has no JSON/semi-structured, packing, or PII
capability at all (its only string work is driver-side split/concat,
``/root/reference/COPY_MSQL_TO_SILVER.py:115-117``).

Scale posture:
- ``q_json_variant`` parses each JSON document ONCE into Spark 4's binary
  VARIANT encoding, then does typed path extraction (``variant_get``) —
  the shredded-access pattern that replaces N ``get_json_object`` calls
  (N re-parses) per row at 100 TB. Pure codegen, zero Python.
- ``q_seq_packing`` assigns documents to fixed-token-budget training
  sequences. Packing is inherently sequential, so the stream is
  parallelized by (lang, hash-bucket): each bucket packs independently
  under one window cumsum — shuffle is one pass keyed by
  (lang, bucket), and bucket count scales with the cluster, not the
  corpus. Bucket assignment is md5-based — deterministic across runs,
  partitionings, and engines (same idiom as ``q_sample_deterministic``).
- ``q_pii_detect`` is a single scan+project regex pack plus an array
  lambda performing the Luhn checksum — all JVM-side expressions inside
  whole-stage codegen; no UDF, no shuffle before the tiny per-source
  aggregate. The corpus fixture contains no organic PII, so candidate
  spans are synthesized deterministically from ``doc_id`` (mirrored in
  the oracle) — the detector logic is what's under test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .helpers import fan_out

# --------------------------------------------------------------------------
# VARIANT semi-structured analytics
# --------------------------------------------------------------------------


def q_json_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse ``events.props`` once into a VARIANT, then do typed path
    extraction: present path ``$.k`` (long) and absent path ``$.missing``
    (null per row, via ``try_variant_get``). Aggregates per event_type so
    the result is small and hash-stable."""
    # fan_out: parse_json is per-row-heavy and the local fixture scan is
    # one task (single row group); the shuffle moves only (event_type,
    # props) and buys 32-way parallel parsing — measured 0.52 s → 0.40 s
    # at sf0.1. At 100 TB the scan parallelizes naturally (helpers.fan_out
    # docstring policy).
    ev = fan_out(
        load_table(spark, sf_dir, "events").select("event_type", "props"),
        spark,
    )
    v = F.parse_json("props")
    k = F.variant_get(v, "$.k", "long")
    missing = F.try_variant_get(v, "$.missing", "long")
    return (
        ev.select("event_type", k.alias("k"), missing.alias("m"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.count("m").alias("n_missing_path"),
        )
    )


ORACLE_JSON_VARIANT = """
SELECT event_type,
       count(*) AS n,
       CAST(sum(cast(json_extract_string(props, '$.k') as bigint))
            AS BIGINT) AS sum_k,
       min(cast(json_extract_string(props, '$.k') as bigint)) AS min_k,
       max(cast(json_extract_string(props, '$.k') as bigint)) AS max_k,
       count(cast(json_extract_string(props, '$.missing') as bigint))
           AS n_missing_path
FROM events
GROUP BY event_type
"""


# --------------------------------------------------------------------------
# Training-sequence packing
# --------------------------------------------------------------------------

_PACK_BUDGET = 512  # tokens per training sequence
_PACK_BUCKETS = 8  # independent packing streams per language


def seq_pack(
    docs: DataFrame, budget: int = _PACK_BUDGET, buckets: int = _PACK_BUCKETS
) -> DataFrame:
    """Pack a documents frame (``doc_id``, ``lang``, ``text``) into
    fixed-token-budget sequences; see ``q_seq_packing`` for semantics.
    Exposed separately so the packing law is property-testable against a
    pure-Python greedy recompute."""
    from pyspark.sql.window import Window

    tok = F.size(F.split("text", " ")).cast("long")
    bucket = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 8),
            16,
            10,
        )
        .cast("long")
        % buckets
    )
    w = (
        Window.partitionBy("lang", "bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    with_pack = docs.select(
        "lang", bucket.alias("bucket"), "doc_id", tok.alias("tokens")
    ).withColumn(
        "pack_id",
        F.floor(F.coalesce(F.sum("tokens").over(w), F.lit(0)) / budget),
    )
    return (
        with_pack.groupBy("lang", "bucket", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("tokens").alias("pack_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


def q_seq_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy contiguous packing of documents into fixed-token-budget
    training sequences, the step between dedup/filtering and the
    tokenizer in an LLM data pipeline.

    Semantics (deterministic, engine-portable): within each
    (lang, md5-bucket) stream ordered by doc_id, a document joins pack
    ``floor(tokens_before_it / budget)`` — contiguous fill where a pack
    closes once the running total crosses the budget. Output is the pack
    manifest: documents and token total per pack."""
    return seq_pack(load_table(spark, sf_dir, "documents"))


ORACLE_SEQ_PACKING = f"""
WITH toks AS (
  SELECT lang,
         CAST(concat('0x', substr(md5(cast(doc_id as varchar)), 1, 8))
              AS bigint) % {_PACK_BUCKETS} AS bucket,
         doc_id,
         cast(len(string_split(text, ' ')) as bigint) AS tokens
  FROM documents
), packed AS (
  SELECT lang, bucket, doc_id, tokens,
         CAST(floor(coalesce(sum(tokens) OVER (
             PARTITION BY lang, bucket ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) / {_PACK_BUDGET}) AS bigint) AS pack_id
  FROM toks
)
SELECT lang, bucket, pack_id,
       count(*) AS n_docs,
       CAST(sum(tokens) AS BIGINT) AS pack_tokens,
       min(doc_id) AS first_doc,
       max(doc_id) AS last_doc
FROM packed
GROUP BY lang, bucket, pack_id
"""


# --------------------------------------------------------------------------
# PII detection with Luhn verification
# --------------------------------------------------------------------------

_EMAIL_RX = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_IPV4_RX = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
_CARD_RX = r"\b\d{16}\b"

# Luhn checksum over a 16-digit string ``c``: from the right, double every
# second digit (folding >9 down by 9); valid iff the sum is ≡ 0 (mod 10).
# Spark side is built from column HOFs (aggregate over a sequence) rather
# than an F.expr string — SQL string literals process backslash escapes,
# which would mangle the regex patterns; DuckDB evaluates the identical
# expression tree via its list_* twins.


def _luhn_valid(c):
    """Column[bool]: Luhn checksum passes for 16-digit string column c."""
    rev = F.reverse(c)

    def term(i):
        d = F.ascii(F.substr(rev, i, F.lit(1))) - F.lit(48)
        doubled = d * F.lit(2)
        folded = F.when(doubled > 9, doubled - 9).otherwise(doubled)
        return F.when(i % 2 == 0, folded).otherwise(d)

    total = F.aggregate(
        F.sequence(F.lit(1), F.lit(16)), F.lit(0), lambda acc, i: acc + term(i)
    )
    return total % 10 == 0


_DUCK_LUHN = (
    "list_sum(list_transform(range(1, 17), i -> "
    "CASE WHEN i % 2 = 0 THEN "
    "  CASE WHEN 2 * (ascii(substr(reverse(c), i, 1)) - 48) > 9 "
    "       THEN 2 * (ascii(substr(reverse(c), i, 1)) - 48) - 9 "
    "       ELSE 2 * (ascii(substr(reverse(c), i, 1)) - 48) END "
    "ELSE ascii(substr(reverse(c), i, 1)) - 48 END)) % 10 = 0"
)

# Deterministic augmentation: the fixture corpus has no organic PII, so
# inject spans keyed on doc_id — identically on both engines — and let the
# detectors find them. Card digits come from doc_id so roughly 1 in 10
# candidates passes Luhn (the detector must tell them apart).
_SPARK_AUG = (
    "concat(text,"
    " CASE WHEN doc_id % 7 = 0 THEN"
    "   concat(' contact user', cast(doc_id as string), '@example.com')"
    "  ELSE '' END,"
    " CASE WHEN doc_id % 5 = 0 THEN"
    "   concat(' from 10.', cast(doc_id % 256 as string), '.0.1')"
    "  ELSE '' END,"
    " CASE WHEN doc_id % 3 = 0 THEN"
    "   concat(' card ', lpad(cast(doc_id * 6007 as string), 16, '5'))"
    "  ELSE '' END)"
)
_DUCK_AUG = (
    "concat(text,"
    " CASE WHEN doc_id % 7 = 0 THEN"
    "   concat(' contact user', cast(doc_id as varchar), '@example.com')"
    "  ELSE '' END,"
    " CASE WHEN doc_id % 5 = 0 THEN"
    "   concat(' from 10.', cast(doc_id % 256 as varchar), '.0.1')"
    "  ELSE '' END,"
    " CASE WHEN doc_id % 3 = 0 THEN"
    "   concat(' card ', lpad(cast(doc_id * 6007 as varchar), 16, '5'))"
    "  ELSE '' END)"
)


def q_pii_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source PII audit: email/IPv4 span counts plus 16-digit card
    candidates split into Luhn-valid and Luhn-invalid — the
    false-positive filter a real scrubber needs before redacting."""
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    aug = F.expr(_SPARK_AUG)
    cards = F.regexp_extract_all(aug, F.lit(_CARD_RX), F.lit(0))
    scanned = docs.select(
        "source",
        F.size(F.regexp_extract_all(aug, F.lit(_EMAIL_RX), F.lit(0)))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(aug, F.lit(_IPV4_RX), F.lit(0)))
        .cast("long")
        .alias("n_ips"),
        F.size(F.filter(cards, _luhn_valid)).cast("long").alias("n_valid_cards"),
        F.size(F.filter(cards, lambda c: ~_luhn_valid(c)))
        .cast("long")
        .alias("n_invalid_cards"),
    )
    return scanned.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_emails").alias("n_emails"),
        F.sum("n_ips").alias("n_ips"),
        F.sum("n_valid_cards").alias("n_valid_cards"),
        F.sum("n_invalid_cards").alias("n_invalid_cards"),
        F.sum(
            F.when(
                (F.col("n_emails") + F.col("n_ips") + F.col("n_valid_cards")) > 0, 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_docs_with_pii"),
    )


ORACLE_PII_DETECT = f"""
WITH scanned AS (
  SELECT source,
         cast(len(regexp_extract_all({_DUCK_AUG}, '{_EMAIL_RX}', 0)) as bigint)
             AS n_emails,
         cast(len(regexp_extract_all({_DUCK_AUG}, '{_IPV4_RX}', 0)) as bigint)
             AS n_ips,
         cast(len(list_filter(regexp_extract_all({_DUCK_AUG}, '{_CARD_RX}', 0),
              c -> {_DUCK_LUHN})) as bigint) AS n_valid_cards,
         cast(len(list_filter(regexp_extract_all({_DUCK_AUG}, '{_CARD_RX}', 0),
              c -> NOT ({_DUCK_LUHN}))) as bigint) AS n_invalid_cards
  FROM documents
)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(n_emails) AS BIGINT) AS n_emails,
       CAST(sum(n_ips) AS BIGINT) AS n_ips,
       CAST(sum(n_valid_cards) AS BIGINT) AS n_valid_cards,
       CAST(sum(n_invalid_cards) AS BIGINT) AS n_invalid_cards,
       cast(sum(CASE WHEN n_emails + n_ips + n_valid_cards > 0 THEN 1
                ELSE 0 END) as bigint) AS n_docs_with_pii
FROM scanned
GROUP BY source
"""


# --------------------------------------------------------------------------
# URL analytics (web-corpus provenance)
# --------------------------------------------------------------------------

# Deterministic synthetic URL per document (the fixture corpus carries no
# provenance URLs): host varies by doc_id across 3 TLDs and 50 site names,
# path/query carry the doc id. Mirrored 1:1 in the oracle.
_SPARK_URL = (
    "concat('https://www.site', cast(doc_id % 50 as string), '.',"
    " element_at(array('com','org','net'), cast(doc_id % 3 as int) + 1),"
    " '/docs/', cast(doc_id as string), '?lang=', lang, '&page=',"
    " cast(doc_id % 7 as string))"
)
_DUCK_URL = (
    "concat('https://www.site', cast(doc_id % 50 as varchar), '.',"
    " ['com','org','net'][(doc_id % 3) + 1],"
    " '/docs/', cast(doc_id as varchar), '?lang=', lang, '&page=',"
    " cast(doc_id % 7 as varchar))"
)


def q_url_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Web-corpus provenance analytics: ``parse_url`` host/path/query-param
    extraction, registrable-domain + TLD rollup — the source-mix audit a
    crawl-derived corpus runs before sampling. All codegen (`ParseUrl` is
    a JVM expression); one partial-aggregated shuffle on the TLD grain."""
    docs = load_table(spark, sf_dir, "documents")
    url = F.expr(_SPARK_URL)
    host = F.parse_url(url, F.lit("HOST"))
    tld = F.substring_index(host, ".", -1)
    domain = F.substring_index(host, ".", -2)
    page = F.parse_url(url, F.lit("QUERY"), F.lit("page")).cast("long")
    path = F.parse_url(url, F.lit("PATH"))
    return (
        docs.select(
            tld.alias("tld"),
            domain.alias("domain"),
            page.alias("page"),
            F.length(path).cast("long").alias("path_len"),
        )
        .groupBy("tld")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.countDistinct("domain").alias("n_domains"),
            F.sum("page").alias("sum_page"),
            F.sum("path_len").alias("sum_path_len"),
        )
    )


ORACLE_URL_STATS = f"""
WITH parsed AS (
  SELECT regexp_extract({_DUCK_URL}, 'https://([^/]+)/', 1) AS host,
         doc_id % 7 AS page,
         length(concat('/docs/', cast(doc_id as varchar))) AS path_len
  FROM documents
), parts AS (
  SELECT regexp_extract(host, '([^.]+)$', 1) AS tld,
         regexp_extract(host, '([^.]+[.][^.]+)$', 1) AS domain,
         page, path_len
  FROM parsed
)
SELECT tld,
       count(*) AS n_urls,
       count(DISTINCT domain) AS n_domains,
       CAST(sum(page) AS BIGINT) AS sum_page,
       cast(sum(path_len) as bigint) AS sum_path_len
FROM parts
GROUP BY tld
"""


# --------------------------------------------------------------------------
# URL-canonicalization dedup
# --------------------------------------------------------------------------

# Raw provenance URLs with realistic crawl noise (host casing, tracking
# params, trailing slash, fragments), synthesized deterministically per
# doc — canonical identity collapses to doc_id % 80, so real dup groups
# exist at every scale. Mirrored 1:1 in the oracle.
_SPARK_RAW_URL = (
    "concat(CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://WWW.Site'"
    " ELSE 'https://www.site' END,"
    " cast(doc_id % 40 as string), '.com/page/',"
    " cast(doc_id % 80 as string),"
    " CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END,"
    " CASE WHEN doc_id % 3 = 0 THEN '?utm_source=feed&utm_campaign=x'"
    " WHEN doc_id % 3 = 1 THEN '?ref=home' ELSE '' END,"
    " CASE WHEN doc_id % 7 = 0 THEN '#section-2' ELSE '' END)"
)
_DUCK_RAW_URL = (
    "concat(CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://WWW.Site'"
    " ELSE 'https://www.site' END,"
    " cast(doc_id % 40 as varchar), '.com/page/',"
    " cast(doc_id % 80 as varchar),"
    " CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END,"
    " CASE WHEN doc_id % 3 = 0 THEN '?utm_source=feed&utm_campaign=x'"
    " WHEN doc_id % 3 = 1 THEN '?ref=home' ELSE '' END,"
    " CASE WHEN doc_id % 7 = 0 THEN '#section-2' ELSE '' END)"
)

# canonicalization chain (identical regexes, applied in this order):
# lower → strip fragment → strip tracking-only query → strip the
# trailing slash (incl. one left dangling by the query strip)
_URL_CANON_STEPS = (
    ("#.*", ""),
    (r"\?(utm_|ref=).*", ""),
    ("/$", ""),
)


def q_dedup_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL dedup by canonicalization — the first dedup pass every
    web-crawl corpus runs (cheaper than any content hash: two fetches of
    the same page under tracking-param/casing/fragment noise collapse
    before text is even compared). Canonicalize (lowercase, strip
    fragment, strip tracking query, strip trailing slash), group, keep
    the lowest doc_id. Pure codegen string ops; one partial-aggregatable
    shuffle on the canonical key. At 100 TB group on
    ``xxhash64(canonical)`` and carry the url only for the survivor;
    production canonicalizers decompose via ``parse_url`` per-param —
    the regex chain here is the oracle-replayable core."""
    docs = load_table(spark, sf_dir, "documents")
    url = F.lower(F.expr(_SPARK_RAW_URL))
    for pat, rep in _URL_CANON_STEPS:
        url = F.regexp_replace(url, pat, rep)
    return (
        docs.select(url.alias("canonical_url"), "doc_id")
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("keep_doc"),
            (F.count(F.lit(1)) - 1).alias("n_dups"),
        )
    )


ORACLE_DEDUP_URL = f"""
WITH raw AS (
  SELECT doc_id, lower({_DUCK_RAW_URL}) AS u FROM documents
), canon AS (
  SELECT doc_id,
         regexp_replace(regexp_replace(regexp_replace(u,
             '#.*', ''), '\\?(utm_|ref=).*', ''), '/$', '')
             AS canonical_url
  FROM raw
)
SELECT canonical_url, count(*) AS n_docs, min(doc_id) AS keep_doc,
       count(*) - 1 AS n_dups
FROM canon GROUP BY canonical_url
"""


# --------------------------------------------------------------------------
# Deterministic train/val/test split
# --------------------------------------------------------------------------


def q_sample_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical 90/5/5 train/val/test split by content-independent key
    hash (md5(doc_id) bucket out of 100) — reproducible across runs,
    engines, partitionings, and corpus growth (a doc's split never
    changes when other docs arrive, unlike ``randomSplit``). Emits per
    (lang, split) counts + token totals so proportions are auditable;
    disjointness/stability are structural (a doc hashes to exactly one
    bucket)."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 8),
            16,
            10,
        )
        .cast("long")
        % 100
    )
    split = (
        F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
    )
    return (
        docs.select(
            "lang",
            split.alias("split"),
            F.size(F.split("text", " ")).cast("long").alias("toks"),
        )
        .groupBy("lang", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("toks").alias("n_tokens"),
        )
    )


ORACLE_SAMPLE_SPLIT = """
WITH b AS (
  SELECT lang,
         CAST(concat('0x', substr(md5(cast(doc_id as varchar)), 1, 8))
              AS bigint) % 100 AS bucket,
         cast(len(string_split(text, ' ')) as bigint) AS toks
  FROM documents
)
SELECT lang,
       CASE WHEN bucket < 90 THEN 'train'
            WHEN bucket < 95 THEN 'val'
            ELSE 'test' END AS split,
       count(*) AS n_docs,
       CAST(sum(toks) AS BIGINT) AS n_tokens
FROM b
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# End-to-end corpus pipeline (the LLM-side flagship)
# --------------------------------------------------------------------------


def q_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole cleaning pipeline as ONE declarative plan — quality
    filter → exact-dedup survivors → fixed-budget sequence packing —
    returning the training-shard manifest. Because every stage is a
    DataFrame transformation, Catalyst fuses them: the filter reaches
    the scan, dedup is one hash-agg on the content hash, and packing
    reuses its own window exchange; no intermediate materialization.
    This is the LLM-side counterpart of ``q_flagship``."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.size(F.split("text", " ")).cast("long")
    quality = docs.filter(
        (toks >= F.lit(20)) & (F.col("n_chars") >= 100) & (F.col("n_chars") <= 2000)
    )
    survivors = (
        quality.groupBy(F.md5(F.col("text").cast("binary")).alias("h"))
        .agg(
            F.min("doc_id").alias("doc_id"),
            # min, not first: identical texts may carry different langs
            # across copies and first() is partition-order-dependent
            F.min("lang").alias("lang"),
            F.first("text").alias("text"),  # identical within the group
        )
        .select("doc_id", "lang", "text")
    )
    return seq_pack(survivors)


ORACLE_CORPUS_PIPELINE = f"""
WITH quality AS (
  SELECT * FROM documents
  WHERE len(string_split(text, ' ')) >= 20
    AND n_chars BETWEEN 100 AND 2000
), survivors AS (
  SELECT min(doc_id) AS doc_id,
         min(lang) AS lang,   -- identical text => identical stats; any rep
         text
  FROM quality GROUP BY md5(text), text
), toks AS (
  SELECT lang,
         CAST(concat('0x', substr(md5(cast(doc_id as varchar)), 1, 8))
              AS bigint) % {_PACK_BUCKETS} AS bucket,
         doc_id,
         cast(len(string_split(text, ' ')) as bigint) AS tokens
  FROM survivors
), packed AS (
  SELECT lang, bucket, doc_id, tokens,
         CAST(floor(coalesce(sum(tokens) OVER (
             PARTITION BY lang, bucket ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) / {_PACK_BUDGET}) AS bigint) AS pack_id
  FROM toks
)
SELECT lang, bucket, pack_id,
       count(*) AS n_docs,
       CAST(sum(tokens) AS BIGINT) AS pack_tokens,
       min(doc_id) AS first_doc,
       max(doc_id) AS last_doc
FROM packed
GROUP BY lang, bucket, pack_id
"""


QUERIES = {
    "q_json_variant": q_json_variant,
    "q_corpus_pipeline": q_corpus_pipeline,
    "q_seq_packing": q_seq_packing,
    "q_pii_detect": q_pii_detect,
    "q_url_stats": q_url_stats,
    "q_dedup_url": q_dedup_url,
    "q_sample_split": q_sample_split,
}

ORACLES = {
    "q_json_variant": ORACLE_JSON_VARIANT,
    "q_corpus_pipeline": ORACLE_CORPUS_PIPELINE,
    "q_seq_packing": ORACLE_SEQ_PACKING,
    "q_pii_detect": ORACLE_PII_DETECT,
    "q_url_stats": ORACLE_URL_STATS,
    "q_dedup_url": ORACLE_DEDUP_URL,
    "q_sample_split": ORACLE_SAMPLE_SPLIT,
}
