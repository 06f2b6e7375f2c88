"""Deduplication operators for LLM training-data pipelines.

Four escalating strategies, all expressed with built-in Spark array/hash
expressions (no Python in the row path) so they scale to 100 TB:

* exact        — content-hash groupBy (one shuffle on the hash).
* minhash+LSH  — shingle → minhash signature → banded bucket join →
                 candidate pairs → exact-Jaccard verify. The bucket join
                 shuffles only (band, hash) keys, never the O(n²) pair
                 space — the standard web-scale near-dup design
                 (Broder-style MinHash, banded as in Leskovec et al.).
* simhash      — 64-bit signature + pigeonhole banding (dist ≤ 3 ⇒ one of
                 4 16-bit chunks equal), hamming verify via bit_count(xor).
* n-gram Jaccard — exact token-set Jaccard within cheap blocking keys.

The exact/Jaccard variants have DuckDB oracles; minhash/simhash hinge on
xxhash64, which has no DuckDB twin → declared rows-only (per the driver
contract in ``__spark_entry__.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..sources.catalog import load_table
from .helpers import fan_out as _fan_out

# ---------------------------------------------------------------------------
# exact dedup (O6's not-matched-insert semantics applied to content identity)
# ---------------------------------------------------------------------------


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash: keep the lowest doc_id per distinct
    text. One hash-shuffle; at 100 TB, group on the md5 (fixed 32 bytes),
    not the text itself, to keep shuffle rows small."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.md5(F.col("text").cast("binary")).alias("content_md5"))
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


ORACLE_DEDUP_EXACT = """
SELECT md5(text) AS content_md5, min(doc_id) AS keep_id, count(*) AS n_copies
FROM documents GROUP BY md5(text)
"""


def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup with a QUALITY policy: per content hash keep the
    best surviving document — max(struct(n_chars, doc_id)), i.e.
    longest text, ties to the newest id. In a real corpus the ordering
    struct is the quality score (q_quality_score's output); the plan is
    the same partial-aggregatable argmax as q_agg_argmax, so choosing
    the survivor costs no more than counting the copies."""
    docs = load_table(spark, sf_dir, "documents")
    best = F.max(
        F.struct(F.col("n_chars").alias("nc"), F.col("doc_id").alias("id"))
    ).alias("best")
    return (
        docs.groupBy(F.md5(F.col("text").cast("binary")).alias("content_md5"))
        .agg(best, F.count(F.lit(1)).alias("n_copies"))
        .select(
            "content_md5",
            F.col("best.id").alias("best_id"),
            F.col("best.nc").alias("best_n_chars"),
            "n_copies",
        )
    )


ORACLE_DEDUP_KEEP_BEST = """
WITH ranked AS (
  SELECT md5(text) AS content_md5, doc_id, n_chars,
         row_number() OVER (PARTITION BY md5(text)
                            ORDER BY n_chars DESC, doc_id DESC) AS rn,
         count(*) OVER (PARTITION BY md5(text)) AS n_copies
  FROM documents
)
SELECT content_md5, doc_id AS best_id, n_chars AS best_n_chars, n_copies
FROM ranked WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# MinHash + LSH near-dedup
# ---------------------------------------------------------------------------

N_PERM = 16  # permutations (signature length)
N_BANDS = 8  # bands of r = N_PERM / N_BANDS = 2 rows
# 2^31 - 1: keeps a*h + b < 2^62 so ANSI-mode long arithmetic never
# overflows (Spark 4 defaults spark.sql.ansi.enabled=true and raises on
# wraparound)
_MERSENNE = (1 << 31) - 1
# Deterministic permutation parameters (odd multipliers), fixed seed —
# stability across runs is required for the driver's repeated checks.
_PERM_A = [2 * k + 1 for k in range(3, 3 + N_PERM)]
_PERM_B = [1000003 * (k + 1) for k in range(N_PERM)]


def _shingle_hashes(toks_col: str = "__tk", k: int = 3) -> F.Column:
    """Distinct xxhash64 of k-token shingles (word 3-grams) over a
    PRE-TOKENIZED array column (see ``_tokenized``). The tokens must be
    a materialized column, not ``split(text)`` inlined here: a
    higher-order-function lambda body is re-evaluated per element, so
    an inlined split re-tokenized the document once per shingle
    position — O(len²) per doc (measured 28% off the signature
    pipeline at sf0.1)."""
    return F.expr(
        f"array_distinct(transform(sequence(0, greatest(size({toks_col}) - {k}, 0)), "
        f"i -> xxhash64(concat_ws(' ', slice({toks_col}, i + 1, {k})))))"
    )


def _tokenized(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Project doc_id + the materialized token array feeding
    ``_shingle_hashes`` (one split per row, in codegen)."""
    return df.select("doc_id", F.split(text_col, " ").alias("__tk"))


def _mod_hashes(hashes_col: str) -> F.Column:
    """Base reduction pmod(h, p), materialized once per shingle array so
    the N_PERM signature transforms below don't each redo it."""
    return F.expr(f"transform({hashes_col}, h -> pmod(h, {_MERSENNE}L))")


def _minhash_sig(mod_hashes_col: str) -> F.Column:
    """MinHash signature over a pre-reduced (``_mod_hashes``) array:
    min over shingles of (a*h + b) mod p per permutation. a*h + b stays
    under 2^62, so ANSI-mode long arithmetic never overflows."""
    mins = ", ".join(
        f"array_min(transform({mod_hashes_col}, "
        f"h -> pmod({a}L * h + {b}L, {_MERSENNE}L)))"
        for a, b in zip(_PERM_A, _PERM_B)
    )
    return F.expr(f"array({mins})")


def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash/LSH near-duplicate pairs with exact-Jaccard verification.

    Plan: per-doc signature (scan, no shuffle) → explode N_BANDS band keys
    (xxhash64 of the band's signature slice) → self-join on (band, key) →
    distinct candidate pairs → join shingle sets back → exact Jaccard ≥ 0.5.
    At scale the only large shuffles are on band keys and pair ids; the
    quadratic blowup is confined to same-bucket collisions.
    """
    docs = _fan_out(load_table(spark, sf_dir, "documents"), spark)
    r = N_PERM // N_BANDS
    # persisted: consumed three times (band explode + both verify sides);
    # without it Spark recomputes the signature expressions per consumer
    sigs = (
        _tokenized(docs)
        .select("doc_id", _shingle_hashes().alias("shingles"))
        .withColumn("__hb", _mod_hashes("shingles"))
        .withColumn("sig", _minhash_sig("__hb"))
        .drop("__hb")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    bands = sigs.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, {N_BANDS - 1}), "
                f"b -> struct(b AS band, xxhash64(concat_ws(',', slice(sig, b * {r} + 1, {r}))) AS bkey))"
            )
        ).alias("bk"),
    ).select("doc_id", "bk.band", "bk.bkey")

    left = bands.alias("l")
    right = bands.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bkey") == F.col("r.bkey"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b")
        )
        .distinct()
    )

    sa = sigs.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    sb = sigs.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    verified = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
                / F.size(F.array_union("sh_a", "sh_b")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= 0.5)
        .select("doc_a", "doc_b", "jaccard")
    )
    return verified


# ---------------------------------------------------------------------------
# SimHash near-dedup
# ---------------------------------------------------------------------------


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash + pigeonhole banding: pairs at hamming distance ≤ 3.

    Signature: per bit b, sum ±1 over token hashes' bit b; bit set iff
    sum > 0. Candidate generation: dist ≤ 3 ⇒ at least one of 4 16-bit
    chunks identical (pigeonhole), so join on exploded chunks and verify
    with bit_count(xor) — never materializing O(n²) pairs.
    """
    docs = _fan_out(load_table(spark, sf_dir, "documents"), spark)
    # token-hash array materialized as a column BEFORE the 64-bit fold:
    # HOF lambda bodies re-evaluate per element, so an inlined
    # split+distinct+hash would re-tokenize and re-hash the document
    # once per bit (64x per doc). The fold is built as TWO 32-bit
    # halves OR'd together so `__hs` is referenced twice: CollapseProject
    # inlines a non-trivial alias referenced exactly ONCE back into the
    # consuming projection (the r13 single-fold form was silently
    # re-collapsed, resurrecting the 64x re-tokenization — ADVICE r13),
    # but leaves multi-referenced aliases materialized. Pinned by
    # tests/test_plans.py::test_simhash_token_hashes_not_inlined.
    _half_fold = """
            aggregate(
              transform(sequence({lo}, {hi}),
                b -> CASE WHEN aggregate(
                       __hs,
                       0L,
                       (acc, h) -> acc + CASE WHEN (shiftright(h, b) & 1L) = 1L THEN 1 ELSE -1 END
                     ) > 0 THEN shiftleft(1L, b) ELSE 0L END),
              0L, (acc, x) -> acc | x)
    """
    sim = docs.select(
        "doc_id",
        F.expr(
            "transform(array_distinct(split(text, ' ')), t -> xxhash64(t))"
        ).alias("__hs"),
    ).select(
        "doc_id",
        F.expr(
            f"{_half_fold.format(lo=0, hi=31)} | {_half_fold.format(lo=32, hi=63)}"
        ).alias("simhash"),
    )
    chunks = sim.persist(StorageLevel.MEMORY_AND_DISK).select(
        "doc_id",
        "simhash",
        F.explode(
            F.expr(
                "transform(sequence(0, 3), "
                "c -> struct(c AS chunk, shiftright(simhash, c * 16) & 65535L AS ckey))"
            )
        ).alias("ch"),
    ).select("doc_id", "simhash", "ch.chunk", "ch.ckey")

    l, r = chunks.alias("l"), chunks.alias("r")
    pairs = (
        l.join(
            r,
            (F.col("l.chunk") == F.col("r.chunk"))
            & (F.col("l.ckey") == F.col("r.ckey"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("doc_a"),
            F.col("r.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("l.simhash").bitwiseXOR(F.col("r.simhash"))
            ).cast("long").alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= 3)
    )
    return pairs


# ---------------------------------------------------------------------------
# exact n-gram Jaccard within blocking keys (oracle-backed)
# ---------------------------------------------------------------------------


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact token-set Jaccard for pairs sharing a cheap blocking key
    (source, token-count) — the verify stage of near-dedup, isolated so the
    DuckDB oracle can replay it. Blocking bounds the pair space; at scale
    the block key becomes (source, minhash-band)."""
    docs = _fan_out(load_table(spark, sf_dir, "documents"), spark)
    toks = docs.select(
        "doc_id",
        "source",
        F.array_sort(F.array_distinct(F.split("text", " "))).alias("toks"),
        F.size(F.split("text", " ")).alias("ntok"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    l, r = toks.alias("l"), toks.alias("r")
    return (
        l.join(
            r,
            (F.col("l.source") == F.col("r.source"))
            & (F.col("l.ntok") == F.col("r.ntok"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("doc_a"),
            F.col("r.doc_id").alias("doc_b"),
            F.round(
                F.size(F.array_intersect("l.toks", "r.toks")).cast("double")
                / F.size(F.array_union("l.toks", "r.toks")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.5)
    )


ORACLE_DEDUP_NGRAM = """
WITH t AS (
  SELECT doc_id, source,
         list_distinct(string_split(text, ' ')) AS toks,
         len(string_split(text, ' ')) AS ntok
  FROM documents
)
SELECT l.doc_id AS doc_a, r.doc_id AS doc_b,
       round(cast(len(list_intersect(l.toks, r.toks)) as double)
             / (len(l.toks) + len(r.toks) - len(list_intersect(l.toks, r.toks))),
             6) AS jaccard
FROM t l JOIN t r
  ON l.source = r.source AND l.ntok = r.ntok AND l.doc_id < r.doc_id
WHERE cast(len(list_intersect(l.toks, r.toks)) as double)
      / (len(l.toks) + len(r.toks) - len(list_intersect(l.toks, r.toks))) >= 0.5
"""


EVAL_MOD = 100  # doc_id % 100 == 0 → held-out eval set


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval decontamination: training docs sharing ≥1 word 4-gram
    with any eval-set doc (doc_id % 100 == 0 plays the benchmark set),
    with the shared-gram count. Same blocking shape as minhash banding —
    explode distinct grams, equi-join on the gram, aggregate pairs; the
    shuffle carries (gram, id), never document pairs, so contamination
    checks stay linear in corpus size at 100 TB (at that scale, hash the
    gram to 8 bytes first; kept as text here for the DuckDB oracle)."""
    docs = _fan_out(load_table(spark, sf_dir, "documents"), spark)
    grams = docs.select(
        "doc_id", F.split("text", " ").alias("__tk")
    ).select(
        "doc_id",
        F.explode(
            F.expr(
                "array_distinct(transform("
                "sequence(1, greatest(size(__tk) - 3, 1)), "
                "i -> concat_ws(' ', slice(__tk, i, 4))))"
            )
        ).alias("gram"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    ev = grams.filter(F.col("doc_id") % EVAL_MOD == 0).select(
        F.col("doc_id").alias("eval_doc"), "gram"
    )
    tr = grams.filter(F.col("doc_id") % EVAL_MOD != 0).select(
        F.col("doc_id").alias("train_doc"), "gram"
    )
    return (
        tr.join(ev, "gram")
        .groupBy("train_doc", "eval_doc")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


ORACLE_DECONTAMINATE = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), g AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
             generate_series(1, greatest(len(toks) - 3, 1)),
             i -> array_to_string(toks[i:i+3], ' ')))) AS gram
  FROM t
)
SELECT tr.doc_id AS train_doc, ev.doc_id AS eval_doc, count(*) AS n_shared
FROM g tr JOIN g ev ON tr.gram = ev.gram
WHERE ev.doc_id % 100 = 0 AND tr.doc_id % 100 <> 0
GROUP BY 1, 2
"""


def connected_components(
    edges: DataFrame, a: str = "a", b: str = "b", max_iter: int = 25
) -> DataFrame:
    """Distributed connected components by iterative min-label
    propagation — the clustering step that turns near-duplicate PAIRS
    into groups with one canonical survivor (GraphFrames-free).

    Each node starts labeled with the smallest id among itself and its
    direct neighbors; every iteration joins labels across edges and
    re-minimizes, so labels flood monotonically downhill and the loop
    converges in ≤ graph-diameter iterations (dedup clusters are
    shallow). Per iteration: one join + one groupBy — both shuffles on
    node id; ``localCheckpoint`` truncates the growing lineage so plans
    stay O(1) per round. Driver sees only the convergence counter."""
    both = edges.select(
        F.col(a).alias("src"), F.col(b).alias("dst")
    ).union(edges.select(F.col(b).alias("src"), F.col(a).alias("dst")))
    both = both.persist(StorageLevel.MEMORY_AND_DISK)
    labels = (
        both.groupBy("src")
        .agg(F.least(F.min("dst"), F.first("src")).alias("label"))
        .select(F.col("src").alias("node"), "label")
    ).localCheckpoint()
    for _ in range(max_iter):
        nbr = (
            both.join(labels, both.src == labels.node)
            .select(F.col("dst").alias("node"), "label")
        )
        new_labels = (
            labels.union(nbr)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        ).localCheckpoint()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        both.unpersist()
        # returning unconverged labels would silently split clusters
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(graph diameter too large — raise max_iter)"
        )
    both.unpersist()
    return labels


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters over the n-gram Jaccard pairs: every clustered
    doc labeled with its component's min doc_id (the canonical keeper).
    Deterministic → DuckDB-oracle-backed via a recursive reachability
    CTE."""
    pairs = q_dedup_ngram_jaccard(spark, sf_dir).select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    )
    return connected_components(pairs).select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )


# Reachability closure (recursive CTE; the UNION dedup terminates cycles),
# then min reachable id per node == the propagation fixpoint.
ORACLE_DEDUP_CLUSTERS = """
WITH RECURSIVE t AS (
  SELECT doc_id, source,
         list_distinct(string_split(text, ' ')) AS toks,
         len(string_split(text, ' ')) AS ntok
  FROM documents
), pairs AS (
  SELECT l.doc_id AS a, r.doc_id AS b
  FROM t l JOIN t r
    ON l.source = r.source AND l.ntok = r.ntok AND l.doc_id < r.doc_id
  WHERE cast(len(list_intersect(l.toks, r.toks)) as double)
        / (len(l.toks) + len(r.toks) - len(list_intersect(l.toks, r.toks))) >= 0.5
), edges AS (
  SELECT a AS src, b AS dst FROM pairs
  UNION SELECT b, a FROM pairs
), reach AS (
  SELECT src AS node, dst AS r FROM edges
  UNION
  SELECT src AS node, src AS r FROM edges
  UNION
  SELECT reach.node, edges.dst AS r
  FROM reach JOIN edges ON reach.r = edges.src
)
SELECT node AS doc_id, min(r) AS cluster_id
FROM reach GROUP BY node
"""


# ---------------------------------------------------------------------------
# Incremental dedup: batch vs an already-deduped corpus
# ---------------------------------------------------------------------------


def build_dedup_index(
    docs: DataFrame, sigs: DataFrame | None = None
) -> dict[str, DataFrame]:
    """Build the persistent dedup index for a corpus: the three small
    tables a continuously-ingesting pipeline keeps INSTEAD of re-reading
    corpus text — exact content hashes, minhash signatures, and LSH band
    buckets. At 100 TB the index is ~1% the corpus size (32-byte md5 +
    N_PERM longs + N_BANDS band keys per doc); after each batch, the
    novel docs' rows are appended (``VersionedTable.append`` /
    ``merge``), so dedup cost tracks batch size, never corpus size."""
    r = N_PERM // N_BANDS
    exact = docs.select(
        F.md5(F.col("text").cast("binary")).alias("content_md5"),
        F.col("doc_id").alias("corpus_id"),
    )
    # persisted: the signature computation (shingle + N_PERM permutation
    # mins — the expensive per-row work) is consumed by BOTH index
    # tables ("sigs" and the band explode below); without the persist a
    # same-session consumer like q_dedup_incremental recomputes the
    # corpus minhash twice. Pipelines that write the index to
    # VersionedTables pay one materialization either way. A caller that
    # already holds the (doc_id, sig) table — e.g. q_dedup_incremental's
    # shared corpus+batch signature pass — supplies it via ``sigs`` and
    # owns its persistence.
    if sigs is None:
        sigs = (
            _tokenized(docs)
            .select("doc_id", _shingle_hashes().alias("__sh"))
            .withColumn("__hb", _mod_hashes("__sh"))
            .select("doc_id", _minhash_sig("__hb").alias("sig"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
    bands = sigs.select(
        F.col("doc_id").alias("corpus_id"),
        F.explode(
            F.expr(
                f"transform(sequence(0, {N_BANDS - 1}), "
                f"b -> struct(b AS band, xxhash64(concat_ws(',', "
                f"slice(sig, b * {r} + 1, {r}))) AS bkey))"
            )
        ).alias("bk"),
    ).select("corpus_id", "bk.band", "bk.bkey")
    return {
        "exact": exact,
        "sigs": sigs.select(F.col("doc_id").alias("corpus_id"), "sig"),
        "bands": bands,
        # persisted-handle for long-lived callers: the streaming
        # foreachBatch loop calls this up to twice per micro-batch and
        # must unpersist after its appends, or persisted blocks
        # accumulate unboundedly (ADVICE r13). Batch queries may ignore
        # it — their session ends with the invocation.
        "_sig_cache": sigs,
    }


def incremental_dedup(
    batch: DataFrame,
    index: dict[str, DataFrame],
    threshold: float = 0.5,
    caches: list[DataFrame] | None = None,
    bsigs: DataFrame | None = None,
) -> DataFrame:
    """Classify each batch document against the corpus index:
    ``exact_dup`` (content hash already present), ``near_dup``
    (signature-estimated Jaccard ≥ threshold with some corpus doc found
    via LSH band collision), else ``novel``.

    Near-dup verification uses the SIGNATURE estimate
    (fraction of agreeing minhash positions — unbiased for Jaccard), not
    exact shingle intersection: the index stores N_PERM longs per corpus
    doc, never corpus text/shingles, which is what bounds index size and
    batch cost at scale. All joins key on (band, bkey) or content_md5 —
    shuffles carry batch-sized and collision-sized row sets only.
    Intra-batch duplicates are the existing ``q_dedup_*`` operators' job
    before this runs."""
    r = N_PERM // N_BANDS
    if bsigs is None:
        bsigs = (
            _tokenized(batch)
            .select("doc_id", _shingle_hashes().alias("__sh"))
            .withColumn("__hb", _mod_hashes("__sh"))
            .select("doc_id", _minhash_sig("__hb").alias("sig"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        if caches is not None:
            # hand the persisted batch-signature frame to long-lived
            # callers (streaming foreachBatch) for unpersisting after
            # their appends
            caches.append(bsigs)
    bbands = bsigs.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, {N_BANDS - 1}), "
                f"b -> struct(b AS band, xxhash64(concat_ws(',', "
                f"slice(sig, b * {r} + 1, {r}))) AS bkey))"
            )
        ).alias("bk"),
    ).select("doc_id", "bk.band", "bk.bkey")

    exact = (
        batch.select(
            "doc_id", F.md5(F.col("text").cast("binary")).alias("content_md5")
        )
        .join(index["exact"], "content_md5")
        .groupBy("doc_id")
        .agg(F.min("corpus_id").alias("exact_match"))
    )

    est = (
        F.size(
            F.filter(
                F.zip_with("sig", "csig", lambda x, y: x == y), lambda b: b
            )
        ).cast("double")
        / N_PERM
    )
    near = (
        bbands.join(index["bands"], ["band", "bkey"])
        .select("doc_id", "corpus_id")
        .distinct()
        .join(bsigs, "doc_id")
        .join(
            index["sigs"].select("corpus_id", F.col("sig").alias("csig")),
            "corpus_id",
        )
        .withColumn("est_jaccard", F.round(est, 6))
        .filter(F.col("est_jaccard") >= threshold)
        # best match per batch doc: highest estimate, ties to lowest id
        .groupBy("doc_id")
        .agg(
            F.max(
                F.struct(F.col("est_jaccard"), (-F.col("corpus_id")).alias("nid"))
            ).alias("best")
        )
        .select(
            "doc_id",
            (-F.col("best.nid")).alias("near_match"),
            F.col("best.est_jaccard"),
        )
    )

    return (
        batch.select("doc_id", "source")
        .join(exact, "doc_id", "left")
        .join(near, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            F.when(F.col("exact_match").isNotNull(), "exact_dup")
            .when(F.col("near_match").isNotNull(), "near_dup")
            .otherwise("novel")
            .alias("status"),
            F.coalesce("exact_match", "near_match").alias("match_id"),
            F.when(F.col("exact_match").isNotNull(), F.lit(1.0))
            .otherwise(F.col("est_jaccard"))
            .alias("similarity"),
        )
    )


def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible shape: docs with doc_id % 5 == 0 arrive as the new
    batch; the rest are the already-ingested corpus. Classification is
    deterministic (fixed permutations, md5), so the rows-only check is
    stable across runs."""
    # no fan_out (r14): the signature pass below is one pass over the
    # scan feeding hash-partitioned joins — the A/B measured the
    # round-robin payload shuffle 1.1-1.4x slower (1.30 s -> 0.94 s).
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    # ONE signature pass over the whole docs scan, persisted once, and
    # filtered into the corpus/batch halves — the r13 form ran two
    # separate tokenize→shingle→minhash pipelines (plus two persist
    # materializations) over disjoint subsets of the same scan.
    # Per-doc signature expressions are deterministic, so filtering
    # before or after signing is equivalent (r14 A/B: 1.41-1.51 s →
    # 1.15-1.25 s at sf0.1, rows identical). Same total signature work
    # at any scale — just one pass and one cache instead of two.
    all_sigs = (
        _tokenized(docs)
        .select("doc_id", _shingle_hashes().alias("__sh"))
        .withColumn("__hb", _mod_hashes("__sh"))
        .select("doc_id", _minhash_sig("__hb").alias("sig"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    index = build_dedup_index(
        corpus, sigs=all_sigs.filter(F.col("doc_id") % 5 != 0)
    )
    return incremental_dedup(
        batch, index, bsigs=all_sigs.filter(F.col("doc_id") % 5 == 0)
    )


# ---------------------------------------------------------------------------
# exact duplicated-substring spans (oracle-backed)
# ---------------------------------------------------------------------------

SUB_K = 24  # span length (chars)
SUB_STRIDE = 12  # span stride: K/2 overlap guarantees any K*1.5-char copy hits


def q_dedup_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-substring detection (the "exact substring dedup"
    signal of Lee et al.'s *Deduplicating Training Data Makes Language
    Models Better* — suffix-array semantics restated as strided k-gram
    matching): a 24-char span whose text occurs in ≥2 distinct documents
    is a duplicated span; per document, report the span count and the
    duplicated fraction in exact basis points.

    Plan shape: one strided in-codegen fan-out (``transform(sequence)``
    + explode — ~len/stride rows per doc, 2× overlap), one
    partial-aggregatable gram-grain aggregate, a gram-key join back
    (co-partitioned with the aggregate — same key, AQE reuses the
    exchange), one doc-grain aggregate. The shuffle carries (gram, doc)
    pairs, never doc×doc pairs. At 100 TB, shuffle ``xxhash64(gram)``
    (8 bytes) instead of the 24-char text — kept as text here so the
    DuckDB oracle can replay it — and the dup ratio is exact integer
    arithmetic (``n_dup * 10000 div n``), engine-identical."""
    docs = _fan_out(load_table(spark, sf_dir, "documents"), spark)
    grams = docs.filter(F.length("text") >= SUB_K).select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, (length(text) - {SUB_K}) div"
                f" {SUB_STRIDE}), i -> substring(text, i * {SUB_STRIDE} + 1,"
                f" {SUB_K}))"
            )
        ).alias("gram"),
    )
    gram_docs = grams.groupBy("gram").agg(
        F.countDistinct("doc_id").alias("nd")
    )
    return (
        grams.join(gram_docs, "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(F.when(F.col("nd") >= 2, 1).otherwise(0))
            .cast("long")
            .alias("n_dup_spans"),
        )
        .select(
            "doc_id",
            "n_spans",
            "n_dup_spans",
            F.expr("(n_dup_spans * 10000) div n_spans").alias("dup_bp"),
        )
    )


ORACLE_DEDUP_SUBSTRING = f"""
WITH g AS (
  SELECT doc_id, substr(text, cast(i * {SUB_STRIDE} + 1 as bigint), {SUB_K})
             AS gram
  FROM documents,
       unnest(range(0, (length(text) - {SUB_K}) // {SUB_STRIDE} + 1)) AS t(i)
  WHERE length(text) >= {SUB_K}
), gd AS (
  SELECT gram, count(DISTINCT doc_id) AS nd FROM g GROUP BY gram
), flags AS (
  SELECT g.doc_id, CASE WHEN gd.nd >= 2 THEN 1 ELSE 0 END AS dup
  FROM g JOIN gd USING (gram)
)
SELECT doc_id, count(*) AS n_spans,
       cast(sum(dup) as bigint) AS n_dup_spans,
       (cast(sum(dup) as bigint) * 10000) // count(*) AS dup_bp
FROM flags GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# entity resolution: block → verify → cluster → canonicalize (oracle-backed)
# ---------------------------------------------------------------------------

ER_EDIT_MAX = 8


def q_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full entity-resolution pipeline in one pass: noisy mentions →
    blocking → edit-distance verify → connected-component clustering →
    canonical record per cluster. Dirty mentions are synthesized
    deterministically from customer names (casing + format noise,
    mirrored 1:1 in the oracle) since the fixture carries no organic
    duplicates — the resolution machinery is what's under test, and the
    synthesis gives it a known ground truth (every cluster should be
    exactly one customer's mention set).

    Plan shape: blocking keys on the stable digit suffix turn the
    quadratic mention×mention comparison into per-block work
    (Σ|block|², same skeleton as q_fuzzy_join); clustering is the
    min-label propagation of ``connected_components`` (shuffles node
    ids, converges in diameter rounds); canonicalization is a
    coalesce against the cluster label. At 100 TB the block key is the
    dial: longer suffix → smaller blocks → less verify work, at the
    cost of recall against corruptions in the suffix itself (then:
    multi-pass blocking on independent keys, union the edges)."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    mid = F.col("c_custkey") * 4
    mentions = (
        cust.select(
            F.explode(
                F.array(
                    F.struct(
                        (mid + 0).alias("mention_id"),
                        F.col("c_name").alias("mention"),
                    ),
                    F.struct(
                        (mid + 1).alias("mention_id"),
                        F.lower("c_name").alias("mention"),
                    ),
                    F.struct(
                        (mid + 2).alias("mention_id"),
                        F.expr(
                            "replace(c_name, 'Customer#', 'Cust. #')"
                        ).alias("mention"),
                    ),
                )
            ).alias("m")
        )
        .select("m.mention_id", "m.mention")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    blocked = mentions.withColumn("blk", F.expr("right(mention, 9)"))
    a, b = blocked.alias("a"), blocked.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.mention_id") < F.col("b.mention_id")),
        )
        .filter(
            F.levenshtein(F.col("a.mention"), F.col("b.mention"))
            <= ER_EDIT_MAX
        )
        .select(
            F.col("a.mention_id").alias("pa"),
            F.col("b.mention_id").alias("pb"),
        )
    )
    labels = connected_components(pairs, a="pa", b="pb")
    return (
        mentions.join(
            labels, mentions.mention_id == labels.node, "left"
        )
        .select(
            "mention_id",
            "mention",
            F.coalesce(F.col("label"), F.col("mention_id")).alias(
                "cluster_id"
            ),
            (
                F.coalesce(F.col("label"), F.col("mention_id"))
                == F.col("mention_id")
            )
            .cast("long")
            .alias("is_canonical"),
        )
    )


ORACLE_ENTITY_RESOLUTION = f"""
WITH RECURSIVE mentions AS (
  SELECT c_custkey * 4 + 0 AS mention_id, c_name AS mention FROM customer
  UNION ALL
  SELECT c_custkey * 4 + 1, lower(c_name) FROM customer
  UNION ALL
  SELECT c_custkey * 4 + 2, replace(c_name, 'Customer#', 'Cust. #')
  FROM customer
), blocked AS (
  SELECT mention_id, mention, right(mention, 9) AS blk FROM mentions
), pairs AS (
  SELECT a.mention_id AS pa, b.mention_id AS pb
  FROM blocked a JOIN blocked b
    ON a.blk = b.blk AND a.mention_id < b.mention_id
  WHERE levenshtein(a.mention, b.mention) <= {ER_EDIT_MAX}
), edges AS (
  SELECT pa AS src, pb AS dst FROM pairs
  UNION SELECT pb, pa FROM pairs
), reach AS (
  SELECT src AS node, dst AS r FROM edges
  UNION
  SELECT src AS node, src AS r FROM edges
  UNION
  SELECT reach.node, edges.dst AS r
  FROM reach JOIN edges ON reach.r = edges.src
), labels AS (
  SELECT node, min(r) AS label FROM reach GROUP BY node
)
SELECT m.mention_id, m.mention,
       coalesce(l.label, m.mention_id) AS cluster_id,
       cast(coalesce(l.label, m.mention_id) = m.mention_id AS bigint)
           AS is_canonical
FROM mentions m LEFT JOIN labels l ON m.mention_id = l.node
"""


QUERIES = {
    "q_dedup_exact": q_dedup_exact,
    "q_dedup_keep_best": q_dedup_keep_best,
    "q_dedup_minhash": q_dedup_minhash,
    "q_dedup_simhash": q_dedup_simhash,
    "q_dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "q_dedup_clusters": q_dedup_clusters,
    "q_decontaminate": q_decontaminate,
    "q_dedup_incremental": q_dedup_incremental,
    "q_dedup_substring": q_dedup_substring,
    "q_entity_resolution": q_entity_resolution,
}

ORACLES = {
    "q_dedup_substring": ORACLE_DEDUP_SUBSTRING,
    "q_entity_resolution": ORACLE_ENTITY_RESOLUTION,
    "q_dedup_exact": ORACLE_DEDUP_EXACT,
    "q_dedup_keep_best": ORACLE_DEDUP_KEEP_BEST,
    "q_dedup_ngram_jaccard": ORACLE_DEDUP_NGRAM,
    "q_dedup_clusters": ORACLE_DEDUP_CLUSTERS,
    "q_decontaminate": ORACLE_DECONTAMINATE,
}
