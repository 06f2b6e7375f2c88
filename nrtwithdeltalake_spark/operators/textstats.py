"""Text-analysis operators for LLM data pipelines (BASELINE.json north star).

All hot-path expressions are built-in ``pyspark.sql.functions`` (JVM,
whole-stage codegen, no Python): at 100 TB these run as a single
scan+project over the documents table with zero shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .helpers import fan_out

# Stopword regexes per language for the n-gram/stopword language-ID
# heuristic. Alternation groups are anchored on word boundaries; both Java
# regex (Spark) and RE2 (DuckDB) support them identically.
_LANG_STOPWORDS = {
    "en": "the|a|of|and|is",
    "de": "der|die|das|und|ist",
    "fr": "le|la|les|et|est",
    "es": "el|los|las|y|es",
}


def _n_tokens(col: str = "text") -> F.Column:
    return F.size(F.split(F.col(col), " ")).cast("long")


def _stop_count(lang: str, col: str = "text") -> F.Column:
    pat = rf"\b({_LANG_STOPWORDS[lang]})\b"
    return F.size(F.regexp_extract_all(F.lower(F.col(col)), F.lit(pat), F.lit(1)))


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document stats: char/token counts, average token length,
    punctuation and stopword ratios — the standard quality-filter
    features."""
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    n_tok = _n_tokens()
    n_stop = _stop_count("en").cast("long")
    punct = (
        F.length("text") - F.length(F.regexp_replace("text", r"[.,!?;:]", ""))
    ).cast("long")
    return docs.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars_calc"),
        n_tok.alias("n_tokens"),
        F.round(
            (F.length("text") - (n_tok - 1)).cast("double") / n_tok, 4
        ).alias("avg_token_len"),
        punct.alias("n_punct"),
        n_stop.alias("n_stop"),
        F.round(n_stop.cast("double") / n_tok, 6).alias("stop_ratio"),
    )


ORACLE_TEXT_STATS = r"""
SELECT doc_id,
       cast(length(text) as bigint) AS n_chars_calc,
       cast(len(string_split(text, ' ')) as bigint) AS n_tokens,
       round(cast(length(text) - (len(string_split(text, ' ')) - 1) as double)
             / len(string_split(text, ' ')), 4) AS avg_token_len,
       cast(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))
            as bigint) AS n_punct,
       cast(len(regexp_extract_all(lower(text), '\b(the|a|of|and|is)\b', 1))
            as bigint) AS n_stop,
       round(cast(len(regexp_extract_all(lower(text), '\b(the|a|of|and|is)\b', 1))
                  as double) / len(string_split(text, ' ')), 6) AS stop_ratio
FROM documents
"""


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace and a BPE-ish pre-tokenizer
    regex (letter runs | digit runs | single non-alnum), the shape GPT-2's
    pre-tokenizer uses."""
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    bpe_pat = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
    return docs.select(
        "doc_id",
        _n_tokens().alias("n_ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(bpe_pat), F.lit(0)))
        .cast("long")
        .alias("n_bpe_tokens"),
    )


ORACLE_TOKEN_COUNT = r"""
SELECT doc_id,
       cast(len(string_split(text, ' ')) as bigint) AS n_ws_tokens,
       cast(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]', 0))
            as bigint) AS n_bpe_tokens
FROM documents
"""


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-profile language ID: score each language by stopword hits,
    argmax with a fixed precedence tiebreak (en > de > fr > es)."""
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    s = {lang: _stop_count(lang) for lang in _LANG_STOPWORDS}
    pred = (
        F.when(s["en"] >= F.greatest(s["de"], s["fr"], s["es"]), "en")
        .when(s["de"] >= F.greatest(s["fr"], s["es"]), "de")
        .when(s["fr"] >= s["es"], "fr")
        .otherwise("es")
    )
    return docs.select(
        "doc_id",
        "lang",
        pred.alias("pred_lang"),
        F.when(pred == F.col("lang"), 1).otherwise(0).cast("long").alias("is_match"),
    )


def _sql_stop(lang: str) -> str:
    return (
        f"len(regexp_extract_all(lower(text), '\\b({_LANG_STOPWORDS[lang]})\\b', 1))"
    )


ORACLE_LANG_ID = f"""
WITH scored AS (
  SELECT doc_id, lang,
         {_sql_stop('en')} AS s_en, {_sql_stop('de')} AS s_de,
         {_sql_stop('fr')} AS s_fr, {_sql_stop('es')} AS s_es
  FROM documents
)
SELECT doc_id, lang,
       CASE WHEN s_en >= greatest(s_de, s_fr, s_es) THEN 'en'
            WHEN s_de >= greatest(s_fr, s_es) THEN 'de'
            WHEN s_fr >= s_es THEN 'fr'
            ELSE 'es' END AS pred_lang,
       cast(CASE WHEN (CASE WHEN s_en >= greatest(s_de, s_fr, s_es) THEN 'en'
                            WHEN s_de >= greatest(s_fr, s_es) THEN 'de'
                            WHEN s_fr >= s_es THEN 'fr'
                            ELSE 'es' END) = lang THEN 1 ELSE 0 END as bigint)
           AS is_match
FROM scored
"""


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality score: length saturation + token-count saturation +
    stopword presence, the shape of C4/Gopher-style quality filters.
    Pure double arithmetic in a fixed evaluation order → IEEE-identical
    cross-engine."""
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    n_tok = _n_tokens()
    n_stop = _stop_count("en")
    len_score = F.least(F.length("text").cast("double") / 500.0, F.lit(1.0))
    tok_score = F.least(n_tok.cast("double") / 100.0, F.lit(1.0))
    stop_score = F.least(n_stop.cast("double") / 10.0, F.lit(1.0))
    score = 0.4 * len_score + 0.3 * tok_score + 0.3 * stop_score
    return docs.select(
        "doc_id",
        F.round(score, 6).alias("quality"),
        F.when(score >= 0.5, 1).otherwise(0).cast("long").alias("keep"),
    )


ORACLE_QUALITY = rf"""
WITH f AS (
  SELECT doc_id,
         0.4 * least(cast(length(text) as double) / 500.0, 1.0)
         + 0.3 * least(cast(len(string_split(text, ' ')) as double) / 100.0, 1.0)
         + 0.3 * least(cast({_sql_stop('en')} as double) / 10.0, 1.0) AS score
  FROM documents
)
SELECT doc_id, round(score, 6) AS quality,
       cast(CASE WHEN score >= 0.5 THEN 1 ELSE 0 END as bigint) AS keep
FROM f
"""


CHUNK_LEN = 256
CHUNK_STRIDE = 224  # 32-char overlap between consecutive chunks


def q_text_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-size chunking — the standard pre-embedding /
    context-window split for training-data pipelines. Pure Catalyst
    (sequence → transform → posexplode): chunk generation happens inside
    codegen on the executors, output rows ∝ total characters / stride,
    and the operator parallelizes with the scan — no Python in the path."""
    # no fan_out (r14): chunk generation is pipelined codegen over the
    # scan; A/B measured the payload shuffle 1.2-1.6x slower.
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            F.posexplode(
                F.expr(
                    f"transform(sequence(1, greatest(length(text), 1), "
                    f"{CHUNK_STRIDE}), i -> substring(text, i, {CHUNK_LEN}))"
                )
            ).alias("chunk_id", "chunk_text"),
        )
        .select(
            "doc_id",
            F.col("chunk_id").cast("long").alias("chunk_id"),
            "chunk_text",
            F.length("chunk_text").cast("long").alias("n_chars"),
        )
    )


ORACLE_TEXT_CHUNKS = f"""
WITH g AS (
  SELECT doc_id, text,
         unnest(generate_series(1, greatest(length(text), 1),
                {CHUNK_STRIDE})) AS i
  FROM documents
)
SELECT doc_id,
       cast((i - 1) // {CHUNK_STRIDE} as bigint) AS chunk_id,
       substring(text, i, {CHUNK_LEN}) AS chunk_text,
       cast(length(substring(text, i, {CHUNK_LEN})) as bigint) AS n_chars
FROM g
"""


# Simple alternation-free patterns that Java regex (Spark) and RE2
# (DuckDB) evaluate identically.
_EMAIL_PAT = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
_URL_PAT = "https?://[^ ]+"


def q_text_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style cleaning: redact emails and URLs, report how many of
    each were removed and the cleaned length. Single scan+project in
    codegen — the shape of every regex-scrub pass (PII, boilerplate,
    markup) over a 100 TB corpus."""
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    n_email = F.size(
        F.regexp_extract_all("text", F.lit(_EMAIL_PAT), F.lit(0))
    ).cast("long")
    n_url = F.size(
        F.regexp_extract_all("text", F.lit(_URL_PAT), F.lit(0))
    ).cast("long")
    clean = F.regexp_replace(
        F.regexp_replace("text", _EMAIL_PAT, "<EMAIL>"),
        _URL_PAT,
        "<URL>",
    )
    return docs.select(
        "doc_id",
        n_email.alias("n_emails"),
        n_url.alias("n_urls"),
        F.length(clean).cast("long").alias("clean_len"),
        F.md5(clean.cast("binary")).alias("clean_md5"),
    )


ORACLE_TEXT_SCRUB = f"""
SELECT doc_id,
       cast(len(regexp_extract_all(text, '{_EMAIL_PAT}', 0)) as bigint)
           AS n_emails,
       cast(len(regexp_extract_all(text, '{_URL_PAT}', 0)) as bigint)
           AS n_urls,
       cast(length(regexp_replace(regexp_replace(text, '{_EMAIL_PAT}',
                '<EMAIL>', 'g'), '{_URL_PAT}', '<URL>', 'g')) as bigint)
           AS clean_len,
       md5(regexp_replace(regexp_replace(text, '{_EMAIL_PAT}', '<EMAIL>',
                'g'), '{_URL_PAT}', '<URL>', 'g'))
           AS clean_md5
FROM documents
"""


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprinting: full-text MD5 plus a truncated prefix used
    as a shard/bucket key (hex MD5 is identical cross-engine)."""
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    fp = F.md5(F.col("text").cast("binary"))
    return docs.select(
        "doc_id",
        fp.alias("fp_md5"),
        F.substring(fp, 1, 8).alias("fp_prefix"),
    )


ORACLE_FINGERPRINT = """
SELECT doc_id, md5(text) AS fp_md5, substr(md5(text), 1, 8) AS fp_prefix
FROM documents
"""


def q_fingerprint_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-style rolling fingerprint: xxhash64 over 8-char shingles at
    stride 4; keeps the minimum hash as the document's robust fingerprint.
    Non-SQL-expressible (xxhash64 has no DuckDB twin) → rows-only check."""
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    shingle_hashes = F.expr(
        "transform(sequence(1, greatest(length(text) - 7, 1), 4), "
        "i -> xxhash64(substring(text, i, 8)))"
    )
    return docs.select(
        "doc_id",
        F.array_min(shingle_hashes).alias("fp_min"),
        F.size(shingle_hashes).cast("long").alias("n_shingles"),
    )


def q_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document zlib compression ratio — the strongest single
    cheap repetition/boilerplate signal in web-corpus filtering
    (near-duplicate boilerplate compresses far below prose; CCNet/
    RefinedWeb-style pipelines cut on exactly this). zlib is not
    expressible in SQL, so this is an Arrow-batched pandas UDF
    (vectorized transfer, ~independent of row width) and a declared
    rows-only query; tests/test_llm_ops.py recomputes the ratio in
    plain Python per row and asserts exact equality — a stronger check
    than the SQL oracle gives float queries. Level is pinned (6) so the
    byte stream, and therefore the ratio, is deterministic across runs
    and platforms (zlib's output is fully determined by input+level).

    Scale: stateless scan→project with one Python stage; no shuffle.
    The UDF ships ~batch_size texts per Arrow batch; compression is
    CPU-bound and embarrassingly parallel."""
    from pyspark.sql.functions import pandas_udf

    # no type hints: module-level `from __future__ import annotations`
    # stringizes them, breaking pandas_udf eval-type inference → SCALAR
    @pandas_udf("double")
    def zratio(texts):
        import zlib

        def ratio(t):
            if t is None:
                return None
            raw = t.encode("utf-8")
            if not raw:
                return None
            return len(zlib.compress(raw, 6)) / len(raw)

        return texts.map(ratio)

    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    base = docs.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.round(zratio(F.col("text")), 6).alias("zlib_ratio"),
    )
    return base.select(
        "*", (F.col("zlib_ratio") < 0.35).alias("high_repetition")
    ).orderBy("doc_id")


BPE_TOP_K = 20


def q_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The inner loop of BPE tokenizer vocabulary training: the corpus'
    most frequent adjacent character pairs (the next-merge candidates),
    weighted by word occurrence. Two in-codegen fan-outs (words, then
    the length-1 pair positions per word), ONE partial-aggregatable
    count shuffle on the pair key — the domain collapses map-side to
    the alphabet² (a few thousand pairs), so the final top-k sort is
    over kilobytes regardless of corpus size. At 100 TB, this is
    exactly the distributed pair-count step a real BPE trainer iterates
    (each merge updates counts incrementally; here surfaced as the
    declared first-iteration scan). Deterministic tie order:
    count desc, then pair asc."""
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    words = docs.select(
        F.explode(F.split("text", " ")).alias("w")
    ).filter(F.length("w") >= 2)
    pairs = words.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substr(w, i, 2))")
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(BPE_TOP_K)
    )


ORACLE_BPE_PAIRS = f"""
WITH words AS (
  SELECT unnest(string_split(text, ' ')) AS w FROM documents
), pairs AS (
  SELECT substr(w, cast(i as int), 2) AS pair
  FROM words, unnest(range(1, length(w))) AS t(i)
  WHERE length(w) >= 2
)
SELECT pair, count(*) AS n
FROM pairs GROUP BY pair
ORDER BY n DESC, pair ASC
LIMIT {BPE_TOP_K}
"""


QUERIES = {
    "q_text_stats": q_text_stats,
    "q_bpe_pairs": q_bpe_pairs,
    "q_compression_ratio": q_compression_ratio,
    "q_token_count": q_token_count,
    "q_lang_id": q_lang_id,
    "q_quality_score": q_quality_score,
    "q_doc_fingerprint": q_doc_fingerprint,
    "q_fingerprint_shingles": q_fingerprint_shingles,
    "q_text_chunks": q_text_chunks,
    "q_text_scrub": q_text_scrub,
}

ORACLES = {
    "q_text_stats": ORACLE_TEXT_STATS,
    "q_bpe_pairs": ORACLE_BPE_PAIRS,
    "q_token_count": ORACLE_TOKEN_COUNT,
    "q_lang_id": ORACLE_LANG_ID,
    "q_quality_score": ORACLE_QUALITY,
    "q_doc_fingerprint": ORACLE_FINGERPRINT,
    "q_text_chunks": ORACLE_TEXT_CHUNKS,
    "q_text_scrub": ORACLE_TEXT_SCRUB,
}
