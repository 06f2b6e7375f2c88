"""Statistical language-model quality operators for LLM data curation
(BASELINE.json north star; no counterpart in the reference, which ends at
relational loads — ``/root/reference/COPY_MSQL_TO_SILVER.py`` has no text
surface).

Three corpus-hygiene primitives every pretraining pipeline runs between
ingest and training, each as ONE declarative Catalyst plan over the
``documents`` table:

* ``q_lm_perplexity`` — the CCNet/KenLM-shaped quality signal: score each
  document by its average negative log-probability under a unigram LM
  trained on the corpus itself (garbage/boilerplate scores far from the
  corpus mode).
* ``q_corpus_mixture`` — data-mixture construction: per-source target
  weights + a global character budget turned into deterministic hash-
  bucket keep rates (the static-mixture step of Pile/DoReMi-style
  curation), with the realized sample audited per source.
* ``q_corpus_drift_kl`` — distribution-drift monitor: smoothed KL
  divergence of each source's token distribution against the whole
  corpus (the "did this crawl slice go weird" alarm).

Determinism contract (the repo-wide rule): every float that crosses the
engine boundary is produced by IEEE ops on exactly-representable integer
inputs and quantized tie-free (``floor(x·10^k + 0.5)``) — never
``round()``, whose HALF_UP-on-shortest-string semantics diverge from
DuckDB's binary rounding on .5 ties (see q_resample_interp). The one
libm call (``ln``) is quantized immediately after, the same precedent as
``q_sample_weighted``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..sources.catalog import load_table

# Alphabetic-run tokenizer — identical Java-regex/RE2 semantics, applied
# lowercased. Documents with no [a-z] run (e.g. zh) drop out of the
# token stream on both engines.
_TOK_PAT = "[a-z]+"


def _toks(docs: DataFrame, *extra: str) -> DataFrame:
    return docs.select(
        *extra,
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit(_TOK_PAT), 0)
        ).alias("tok"),
    )


def q_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM quality score per document: avg(-ln P(tok)) with the LM
    trained on the corpus itself (self-scoring, so no OOV smoothing is
    needed — every scored token has corpus support).

    Plan shape (scale posture): the token fan-out is one in-codegen
    generator; the vocab aggregate shuffles the VOCABULARY (map-side
    partial collapse — token occurrences never cross the wire); the
    trained vocab re-joins the token stream as a BROADCAST (vocabulary-
    sized, not corpus-sized; at 100 TB with an unbounded vocab the same
    plan falls back to a token-co-partitioned shuffle join under AQE);
    the per-doc aggregate is the only doc-grain shuffle, partial-
    aggregated to one row per doc map-side. Each token's -ln(p) is
    quantized to integer micro-nats BEFORE summing, so the per-doc sum
    is visit-order-independent and engine-exact (same device as
    q_bm25_topk). The trained vocab is persisted (vocabulary-sized) so
    the corpus-total branch derives from it instead of re-tokenizing
    the corpus — exactly two document scans at any scale (train pass +
    score pass), plan-guarded."""
    docs = load_table(spark, sf_dir, "documents")
    toks = _toks(docs)
    vocab = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    tot = vocab.agg(F.sum("cnt").alias("n"))
    q_micro = F.floor(
        -F.log(F.col("cnt").cast("double") / F.col("n").cast("double"))
        * F.lit(1e6)
        + F.lit(0.5)
    ).cast("long")
    scored = (
        toks.join(F.broadcast(vocab), "tok")
        .join(F.broadcast(tot))
        .select("doc_id", q_micro.alias("q"))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_toks"),
        (
            F.floor(
                F.sum("q").cast("double") / F.count(F.lit(1)).cast("double")
                + F.lit(0.5)
            )
            / F.lit(1e6)
        ).alias("avg_neg_logprob"),
    )


ORACLE_LM_PERPLEXITY = """
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS tok
  FROM documents
),
vocab AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
tot AS (SELECT cast(sum(cnt) as bigint) AS n FROM vocab),
scored AS (
  SELECT t.doc_id,
         cast(floor(-ln(cast(v.cnt as double) / cast(tot.n as double)) * 1e6
                    + 0.5) as bigint) AS q
  FROM toks t JOIN vocab v USING (tok) CROSS JOIN tot
)
SELECT doc_id, count(*) AS n_toks,
       floor(cast(sum(q) as double) / cast(count(*) as double) + 0.5) / 1e6
         AS avg_neg_logprob
FROM scored GROUP BY doc_id
"""

# Mixture parameters: a global character budget and integer per-source
# weights derived from the source id (src0..src19 -> weight 1..4). Integer
# weights keep every keep-rate computation in exact integer arithmetic.
_MIX_BUDGET_CHARS = 50_000


def q_corpus_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mixture sampling: distribute a global character
    budget over sources by weight, convert each source's share into a
    deterministic md5-bucket keep rate (basis points), apply it, and
    audit the realized sample — per source: weight, available chars,
    target chars, keep rate, kept docs, kept chars.

    Every rate is integer arithmetic (`div`, basis points), so the
    sample is bit-identical across runs, partitionings, and engines —
    the reproducibility a training-mix manifest requires (and
    ``df.sample``/``rand()`` cannot give). Plan shape: one partial-
    aggregatable per-source aggregate (|sources| rows), the 1-row total
    weight broadcast back, the keep-rate table broadcast onto the doc
    scan (docs shuffle ZERO times before the filter), then the kept-set
    re-aggregate — also source-bounded. At 100 TB only the two
    source-grain exchanges move data, both |sources|-sized."""
    docs = load_table(spark, sf_dir, "documents")
    w = (F.substring("source", 4, 10).cast("long") % 4 + 1).alias("w")
    avail = docs.groupBy("source").agg(
        F.first(w).alias("w"), F.sum("n_chars").alias("avail_chars")
    )
    tot_w = avail.agg(F.sum("w").alias("tot_w"))
    rates = (
        avail.join(F.broadcast(tot_w))
        .withColumn(
            "tgt_chars",
            F.expr(f"({_MIX_BUDGET_CHARS} * w) div tot_w"),
        )
        .withColumn(
            "keep_bp",
            F.least(F.lit(10000), F.expr("(tgt_chars * 10000) div avail_chars")),
        )
    )
    bucket = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 8),
            16,
            10,
        )
        .cast("long")
        % 10000
    )
    kept = (
        docs.select("source", "n_chars", bucket.alias("bucket"))
        .join(F.broadcast(rates.select("source", "keep_bp")), "source")
        .filter(F.col("bucket") < F.col("keep_bp"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_chars").alias("kept_chars"),
        )
    )
    return (
        rates.join(F.broadcast(kept), "source", "left")
        .select(
            "source",
            "w",
            "avail_chars",
            "tgt_chars",
            "keep_bp",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("kept_chars", F.lit(0)).alias("kept_chars"),
        )
    )


ORACLE_CORPUS_MIXTURE = f"""
WITH avail AS (
  SELECT source,
         cast(substr(source, 4, 10) as bigint) % 4 + 1 AS w,
         cast(sum(n_chars) as bigint) AS avail_chars
  FROM documents GROUP BY source
),
tot AS (SELECT cast(sum(w) as bigint) AS tot_w FROM avail),
rates AS (
  SELECT a.*,
         ({_MIX_BUDGET_CHARS} * w) // tot_w AS tgt_chars,
         least(10000, ((({_MIX_BUDGET_CHARS} * w) // tot_w) * 10000)
                       // avail_chars) AS keep_bp
  FROM avail a CROSS JOIN tot
),
kept AS (
  SELECT d.source, count(*) AS n_kept,
         cast(sum(d.n_chars) as bigint) AS kept_chars
  FROM documents d JOIN rates r USING (source)
  WHERE CAST(concat('0x', substr(md5(cast(d.doc_id as varchar)), 1, 8))
             AS BIGINT) % 10000 < r.keep_bp
  GROUP BY d.source
)
SELECT r.source, r.w, r.avail_chars, r.tgt_chars, r.keep_bp,
       coalesce(k.n_kept, 0) AS n_kept,
       coalesce(k.kept_chars, 0) AS kept_chars
FROM rates r LEFT JOIN kept k USING (source)
"""


def q_corpus_drift_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-drift monitor: per source, the add-one-smoothed KL
    divergence KL(P_source || P_corpus) over the corpus vocabulary —
    the scalar that flags a crawl slice whose token distribution walked
    away from the rest of the data.

    Smoothing puts every (source, vocab-token) pair in the sum, so the
    term domain is |sources| x |vocab| — generated by broadcasting the
    (tiny) per-source totals onto the vocab aggregate, never by
    expanding token OCCURRENCES. Each term p·ln(p/q) is quantized to
    integer nano-nats before the per-source sum (order-independent,
    engine-exact); p and q are IEEE divisions of exactly-representable
    integers. The corpus is tokenized ONCE: the (source, tok) count
    grain — |sources|×|vocab|-bounded — is persisted and every marginal
    (vocab counts, corpus totals, per-source totals) derives from it,
    so the plan has exactly one document scan and only vocabulary- /
    source-bounded exchanges (plan-guarded)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = _toks(docs, "source")
    src_tok = (
        toks.groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("c_st"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    vocab = src_tok.groupBy("tok").agg(F.sum("c_st").alias("c_t"))
    corpus_tot = vocab.agg(
        F.sum("c_t").alias("n"), F.count(F.lit(1)).alias("v")
    )
    src_tot = src_tok.groupBy("source").agg(F.sum("c_st").alias("n_s"))
    grid = (
        vocab.join(F.broadcast(corpus_tot))
        .join(F.broadcast(src_tot))
        .join(src_tok, ["source", "tok"], "left")
        .withColumn("c_st", F.coalesce("c_st", F.lit(0)))
    )
    p = (F.col("c_st") + 1).cast("double") / (F.col("n_s") + F.col("v")).cast(
        "double"
    )
    q = (F.col("c_t") + 1).cast("double") / (F.col("n") + F.col("v")).cast(
        "double"
    )
    term_nano = F.floor(p * F.log(p / q) * F.lit(1e9) + F.lit(0.5)).cast("long")
    return (
        grid.select("source", "n_s", term_nano.alias("t"))
        .groupBy("source")
        .agg(
            F.first("n_s").alias("n_toks"),
            (F.sum("t").cast("double") / F.lit(1e9)).alias("kl_nats"),
        )
    )


ORACLE_CORPUS_DRIFT_KL = """
WITH toks AS (
  SELECT source, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS tok
  FROM documents
),
vocab AS (SELECT tok, count(*) AS c_t FROM toks GROUP BY tok),
ctot AS (SELECT cast(sum(c_t) as bigint) AS n, count(*) AS v FROM vocab),
stot AS (SELECT source, count(*) AS n_s FROM toks GROUP BY source),
stok AS (SELECT source, tok, count(*) AS c_st FROM toks GROUP BY source, tok),
grid AS (
  SELECT s.source, s.n_s, v.tok, v.c_t, ctot.n, ctot.v AS vsz,
         coalesce(k.c_st, 0) AS c_st
  FROM vocab v CROSS JOIN ctot CROSS JOIN stot s
  LEFT JOIN stok k ON k.source = s.source AND k.tok = v.tok
),
terms AS (
  SELECT source, n_s,
         cast(floor(
           (cast(c_st + 1 as double) / cast(n_s + vsz as double))
           * ln((cast(c_st + 1 as double) / cast(n_s + vsz as double))
                / (cast(c_t + 1 as double) / cast(n + vsz as double)))
           * 1e9 + 0.5) as bigint) AS t
  FROM grid
)
SELECT source, cast(n_s as bigint) AS n_toks,
       cast(sum(t) as double) / 1e9 AS kl_nats
FROM terms GROUP BY source, n_s
"""


_COVERAGE_KS = (10, 100, 1000)


def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-design audit: what share of token OCCURRENCES do the
    top-k most frequent vocabulary entries cover, for k in {10, 100,
    1000}? (The curve that decides a vocab size / byte-fallback budget.)

    Scale shape: the vocab aggregate is the only corpus-sized work
    (vocabulary-bounded, map-side partial); the top-k cut resolves as
    TakeOrderedAndProject (each partition ships its local top max(k) —
    never a global sort), and the rank window + k-grid fan-out run over
    ≤max(k) rows, a constant. Coverage is exact integer basis points
    (never a float ratio), with a (cnt desc, tok) total order so the
    cut is deterministic under ties on both engines."""
    docs = load_table(spark, sf_dir, "documents")
    vocab = (
        _toks(docs)
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    tot = vocab.agg(F.sum("cnt").alias("n"), F.count(F.lit(1)).alias("n_vocab"))
    k_max = max(_COVERAGE_KS)
    top = vocab.orderBy(F.desc("cnt"), F.asc("tok")).limit(k_max)
    from pyspark.sql import Window

    rnk = F.row_number().over(
        Window.orderBy(F.desc("cnt"), F.asc("tok"))
    )  # ≤ k_max rows by construction — the single-partition window is
    # constant-bounded, not corpus-bounded
    ranked = top.select("cnt", rnk.alias("rnk"))
    ks = spark.createDataFrame([(k,) for k in _COVERAGE_KS], "k int")
    return (
        ranked.join(F.broadcast(ks), F.col("rnk") <= F.col("k"))
        .groupBy("k")
        .agg(F.sum("cnt").alias("covered_tokens"))
        .join(F.broadcast(tot))
        .select(
            "k",
            F.least(F.col("k").cast("long"), F.col("n_vocab")).alias("k_eff"),
            "covered_tokens",
            F.col("n").alias("total_tokens"),
            F.expr("(covered_tokens * 10000) div n").alias("coverage_bp"),
        )
    )


ORACLE_VOCAB_COVERAGE = f"""
WITH toks AS (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS tok
  FROM documents
),
vocab AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
tot AS (SELECT cast(sum(cnt) as bigint) AS n, count(*) AS n_vocab FROM vocab),
ranked AS (
  SELECT cnt, row_number() OVER (ORDER BY cnt DESC, tok ASC) AS rnk
  FROM vocab
),
ks AS (SELECT unnest([{", ".join(str(k) for k in _COVERAGE_KS)}]) AS k)
SELECT ks.k,
       least(cast(ks.k as bigint), tot.n_vocab) AS k_eff,
       cast(sum(r.cnt) as bigint) AS covered_tokens,
       tot.n AS total_tokens,
       (cast(sum(r.cnt) as bigint) * 10000) // tot.n AS coverage_bp
FROM ranked r JOIN ks ON r.rnk <= ks.k CROSS JOIN tot
GROUP BY ks.k, tot.n, tot.n_vocab
"""


# Jaccard threshold for the set-similarity join, as an exact rational so
# the acceptance test is integer arithmetic on both engines.
_SSJ_NUM, _SSJ_DEN = 9, 10


def q_set_join_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-similarity self-join with PREFIX FILTERING (the AllPairs /
    PPJoin family — Bayardo et al. WWW'07, Xiao et al. WWW'08): all
    document pairs whose token-set Jaccard ≥ 0.9, without the O(n²)
    pairwise scan the oracle runs.

    The filter: order every document's distinct tokens by GLOBAL
    frequency (rarest first — one vocabulary-bounded aggregate,
    broadcast back); two sets with J ≥ t must share at least one token
    within each side's first ``|x| − ceil(t·|x|) + 1`` tokens of that
    shared order (pigeonhole on the required overlap ``≥ ceil(t·|x|)``),
    so candidate generation explodes ONLY the short rare-token prefixes
    and hash-joins them — bucket sizes track rare-token frequencies,
    not corpus size. Candidates verify exactly via array_intersect; the
    accept test is pure integer arithmetic (``DEN·inter ≥ NUM·union``),
    bit-identical across engines. Output carries the integer
    intersection/union sizes, never a float ratio."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.array_distinct(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit(_TOK_PAT), 0)
        ).alias("tks"),
    ).filter(F.size("tks") >= 1)
    freq = (
        toks.select(F.explode("tks").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    ordered = (
        toks.select("doc_id", F.explode("tks").alias("tok"))
        .join(F.broadcast(freq), "tok")
        .groupBy("doc_id")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(df, tok))), "
                "x -> x.tok)"
            ).alias("otks")
        )
    )
    n = F.size("otks")
    plen = n - F.expr(
        f"({_SSJ_NUM} * size(otks) + {_SSJ_DEN} - 1) div {_SSJ_DEN}"
    ) + F.lit(1)
    prefixes = ordered.select(
        "doc_id",
        F.explode(F.slice("otks", 1, plen.cast("int"))).alias("tok"),
    )
    cand = (
        prefixes.alias("l")
        .join(
            prefixes.alias("r"),
            (F.col("l.tok") == F.col("r.tok"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("doc_a"),
            F.col("r.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    verified = (
        cand.join(
            toks.select(F.col("doc_id").alias("doc_a"), F.col("tks").alias("ta")),
            "doc_a",
        )
        .join(
            toks.select(F.col("doc_id").alias("doc_b"), F.col("tks").alias("tb")),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("ta", "tb")).alias("inter"),
            (F.size("ta") + F.size("tb")).alias("sz"),
        )
        .select(
            "doc_a",
            "doc_b",
            F.col("inter").cast("long").alias("n_common"),
            (F.col("sz") - F.col("inter")).cast("long").alias("n_union"),
        )
        .filter(
            F.col("n_common") * _SSJ_DEN >= F.col("n_union") * _SSJ_NUM
        )
    )
    return verified


ORACLE_SET_JOIN_PREFIX = f"""
WITH toks AS (
  SELECT doc_id,
         list_distinct(regexp_extract_all(lower(text), '[a-z]+')) AS tks
  FROM documents
  WHERE len(regexp_extract_all(lower(text), '[a-z]+')) >= 1
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       cast(len(list_intersect(a.tks, b.tks)) as bigint) AS n_common,
       cast(len(a.tks) + len(b.tks) - len(list_intersect(a.tks, b.tks))
            as bigint) AS n_union
FROM toks a JOIN toks b ON a.doc_id < b.doc_id
WHERE len(list_intersect(a.tks, b.tks)) * {_SSJ_DEN}
      >= (len(a.tks) + len(b.tks) - len(list_intersect(a.tks, b.tks)))
         * {_SSJ_NUM}
"""


DSIR_TOP_K = 100


def q_dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection (Xie et al., "Data Selection for
    Language Models via Importance Resampling", NeurIPS 2023), unigram
    variant: every document gets an importance weight
    Σ_tok ln(p_target(tok) / p_raw(tok)) — target = the English slice
    of the corpus, raw = the whole corpus, both add-one smoothed over
    the shared corpus vocabulary — and the top-K by weight are selected
    (deterministic: weight desc, doc_id asc). The published method
    samples by weight; the deterministic top-K form is the
    reproducible-audit variant of the same statistic.

    Scale posture: the same skeleton as q_lm_perplexity — vocabulary-
    bounded aggregates (token occurrences collapse map-side), one
    BROADCAST of the per-token log-ratio onto the token stream, one
    partial-aggregatable per-doc sum, and top-K via orderBy+limit
    (TakeOrderedAndProject: each partition keeps K, never a global
    sort). The rank window runs over K rows, not the corpus. Each
    token's log-ratio is quantized to integer micro-nats BEFORE the
    per-doc sum, so results are partitioning- and engine-exact."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = _toks(docs)
    raw = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt_r"))
    tgt = (
        _toks(docs.filter(F.col("lang") == "en"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt_t"))
    )
    vocab = (
        raw.join(tgt, "tok", "left")
        .select(
            "tok",
            "cnt_r",
            F.coalesce("cnt_t", F.lit(0)).alias("cnt_t"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    tot = vocab.agg(
        F.sum("cnt_r").alias("n_r"),
        F.sum("cnt_t").alias("n_t"),
        F.count(F.lit(1)).alias("v"),
    )
    q_micro = F.floor(
        (
            F.log(
                (F.col("cnt_t") + 1).cast("double")
                / (F.col("n_t") + F.col("v")).cast("double")
            )
            - F.log(
                (F.col("cnt_r") + 1).cast("double")
                / (F.col("n_r") + F.col("v")).cast("double")
            )
        )
        * F.lit(1e6)
        + F.lit(0.5)
    ).cast("long")
    ratios = vocab.join(F.broadcast(tot)).select("tok", q_micro.alias("q"))
    per_doc = (
        toks.join(F.broadcast(ratios), "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_toks"),
            F.sum("q").cast("long").alias("logratio_micro"),
        )
    )
    top = per_doc.orderBy(
        F.desc("logratio_micro"), F.asc("doc_id")
    ).limit(DSIR_TOP_K)
    w = Window.orderBy(F.desc("logratio_micro"), F.asc("doc_id"))
    return top.select(
        F.row_number().over(w).alias("rk"),
        "doc_id",
        "n_toks",
        "logratio_micro",
    )


ORACLE_DSIR_RESAMPLE = f"""
WITH toks AS (
  SELECT doc_id, lang,
         unnest(regexp_extract_all(lower(text), '[a-z]+')) AS tok
  FROM documents
),
raw AS (SELECT tok, count(*) AS cnt_r FROM toks GROUP BY tok),
tgt AS (SELECT tok, count(*) AS cnt_t FROM toks WHERE lang = 'en' GROUP BY tok),
vocab AS (
  SELECT r.tok, r.cnt_r, coalesce(t.cnt_t, 0) AS cnt_t
  FROM raw r LEFT JOIN tgt t USING (tok)
),
tot AS (
  SELECT cast(sum(cnt_r) as bigint) AS n_r,
         cast(sum(cnt_t) as bigint) AS n_t,
         count(*) AS v
  FROM vocab
),
ratios AS (
  SELECT tok,
         cast(floor((ln(cast(cnt_t + 1 as double) / cast(n_t + v as double))
                   - ln(cast(cnt_r + 1 as double) / cast(n_r + v as double)))
                   * 1e6 + 0.5) as bigint) AS q
  FROM vocab CROSS JOIN tot
),
per_doc AS (
  SELECT t.doc_id, count(*) AS n_toks,
         cast(sum(r.q) as bigint) AS logratio_micro
  FROM toks t JOIN ratios r USING (tok)
  GROUP BY t.doc_id
),
top AS (
  SELECT * FROM per_doc
  ORDER BY logratio_micro DESC, doc_id ASC LIMIT {DSIR_TOP_K}
)
SELECT cast(row_number() OVER (ORDER BY logratio_micro DESC, doc_id ASC)
            as bigint) AS rk,
       doc_id, n_toks, logratio_micro
FROM top
"""


def q_curriculum_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum construction: bucket the corpus into 4 training
    stages by a difficulty proxy (the q_lm_perplexity statistic — mean
    token rarity in micro-nats), easiest first. The scale device is the
    point: stages are assigned by comparing each doc against the three
    BROADCAST quartile boundaries (one 1-row percentile aggregate),
    never by ``ntile()`` — a global-order window would funnel the whole
    corpus through one partition, while boundary-compare is map-side
    and partial-aggregatable at any size. Emits per-stage counts and
    exact difficulty ranges as the curriculum audit."""
    docs = load_table(spark, sf_dir, "documents")
    toks = _toks(docs)
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    tot = vocab.agg(F.sum("cnt").alias("n"))
    q_micro = F.floor(
        -F.log(F.col("cnt").cast("double") / F.col("n").cast("double"))
        * F.lit(1e6)
        + F.lit(0.5)
    ).cast("long")
    per_doc = (
        toks.join(F.broadcast(vocab.join(F.broadcast(tot))), "tok")
        .select("doc_id", q_micro.alias("q"))
        .groupBy("doc_id")
        .agg(
            F.floor(
                F.sum("q").cast("double") / F.count(F.lit(1)).cast("double")
                + F.lit(0.5)
            )
            .cast("long")
            .alias("difficulty_micro")
        )
    )
    bounds = per_doc.agg(
        F.expr(
            "percentile(cast(difficulty_micro as double), array(0.25, 0.5, 0.75))"
        ).alias("b")
    ).select(
        F.col("b")[0].alias("b1"), F.col("b")[1].alias("b2"), F.col("b")[2].alias("b3")
    )
    staged = per_doc.join(F.broadcast(bounds)).select(
        "doc_id",
        "difficulty_micro",
        (
            F.lit(1)
            + (F.col("difficulty_micro") > F.col("b1")).cast("int")
            + (F.col("difficulty_micro") > F.col("b2")).cast("int")
            + (F.col("difficulty_micro") > F.col("b3")).cast("int")
        ).alias("stage"),
    )
    return (
        staged.groupBy("stage")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("difficulty_micro").alias("min_difficulty"),
            F.max("difficulty_micro").alias("max_difficulty"),
        )
        .orderBy("stage")
    )


ORACLE_CURRICULUM_STAGES = """
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS tok
  FROM documents
),
vocab AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
tot AS (SELECT cast(sum(cnt) as bigint) AS n FROM vocab),
per_doc AS (
  SELECT t.doc_id,
         cast(floor(sum(cast(floor(-ln(cast(v.cnt as double)
                                       / cast(tot.n as double)) * 1e6 + 0.5)
                             as bigint)) * 1.0 / count(*) + 0.5) as bigint)
           AS difficulty_micro
  FROM toks t JOIN vocab v USING (tok) CROSS JOIN tot
  GROUP BY t.doc_id
),
bounds AS (
  SELECT quantile_cont(cast(difficulty_micro as double), 0.25) AS b1,
         quantile_cont(cast(difficulty_micro as double), 0.5) AS b2,
         quantile_cont(cast(difficulty_micro as double), 0.75) AS b3
  FROM per_doc
),
staged AS (
  SELECT doc_id, difficulty_micro,
         1 + cast(difficulty_micro > b1 as int)
           + cast(difficulty_micro > b2 as int)
           + cast(difficulty_micro > b3 as int) AS stage
  FROM per_doc CROSS JOIN bounds
)
SELECT stage, count(*) AS n_docs,
       min(difficulty_micro) AS min_difficulty,
       max(difficulty_micro) AS max_difficulty
FROM staged GROUP BY stage ORDER BY stage
"""


QUERIES = {
    "q_lm_perplexity": q_lm_perplexity,
    "q_dsir_resample": q_dsir_resample,
    "q_curriculum_stages": q_curriculum_stages,
    "q_set_join_prefix": q_set_join_prefix,
    "q_corpus_mixture": q_corpus_mixture,
    "q_corpus_drift_kl": q_corpus_drift_kl,
    "q_vocab_coverage": q_vocab_coverage,
}

ORACLES = {
    "q_lm_perplexity": ORACLE_LM_PERPLEXITY,
    "q_dsir_resample": ORACLE_DSIR_RESAMPLE,
    "q_curriculum_stages": ORACLE_CURRICULUM_STAGES,
    "q_set_join_prefix": ORACLE_SET_JOIN_PREFIX,
    "q_corpus_mixture": ORACLE_CORPUS_MIXTURE,
    "q_corpus_drift_kl": ORACLE_CORPUS_DRIFT_KL,
    "q_vocab_coverage": ORACLE_VOCAB_COVERAGE,
}
