"""Rows-only + semantic checks for the non-SQL-expressible LLM ops
(minhash/simhash/LSH-ANN/decode). Oracle-backed LLM ops are covered by
test_relational.py's parametrized oracle sweep via the registry."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from nrtwithdeltalake_spark.operators import dedup, multimodal, similarity


def test_minhash_deterministic_and_symmetric(spark, sf_dir):
    a = dedup.q_dedup_minhash(spark, sf_dir)
    rows1 = sorted((r.doc_a, r.doc_b, r.jaccard) for r in a.collect())
    rows2 = sorted(
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dedup.q_dedup_minhash(spark, sf_dir).collect()
    )
    assert rows1 == rows2  # deterministic across runs
    assert all(x < y for x, y, _ in rows1)  # canonical pair order
    assert all(0.5 <= j <= 1.0 for _, _, j in rows1)


def test_minhash_finds_planted_dup(spark, sf_dir):
    """A document joined with a near-identical copy must surface as a
    candidate pair: plant one by unioning a mutated copy of doc 0."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = docs.limit(20)
    clone = base.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tail")).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        base.unionByName(clone).write.mode("overwrite").parquet(
            f"{td}/documents.parquet"
        )
        for t in ["region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "embeddings"]:
            spark.read.parquet(f"{sf_dir}/{t}.parquet").write.mode(
                "overwrite"
            ).parquet(f"{td}/{t}.parquet")
        pairs = dedup.q_dedup_minhash(spark, td).collect()
        found = {(r.doc_a, r.doc_b) for r in pairs}
        planted = {(i, i + 1_000_000) for i in range(20)}
        # high-jaccard planted dups must be recalled (allow LSH to miss ≤ 2)
        assert len(planted & found) >= 18, f"recall too low: {len(planted & found)}/20"


def test_simhash_hamming_bounds(spark, sf_dir):
    rows = dedup.q_dedup_simhash(spark, sf_dir).collect()
    assert all(0 <= r.hamming <= 3 for r in rows)
    assert all(r.doc_a < r.doc_b for r in rows)


def test_ann_lsh_subset_of_bruteforce_space(spark, sf_dir):
    """ANN results must be real vectors with valid cosine, ≤ top_k per
    query, and recall ≥ 60% of the exact top-10 on this small fixture."""
    exact = similarity.q_sim_topk(spark, sf_dir).collect()
    approx = similarity.q_sim_ann_lsh(spark, sf_dir).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r.q_id, set()).add(r.neighbor_id)
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r.q_id, set()).add(r.neighbor_id)
        assert -1.0 <= r.cosine <= 1.0
    for q, exact_n in exact_sets.items():
        got = approx_sets.get(q, set())
        assert len(got) <= 10
        recall = len(exact_n & got) / len(exact_n)
        assert recall >= 0.6, f"q{q} recall {recall}"


def test_embedding_dedup_threshold(spark, sf_dir):
    rows = similarity.q_dedup_embedding(spark, sf_dir).collect()
    assert all(r.cosine >= 0.95 for r in rows)
    assert all(r.vec_a < r.vec_b for r in rows)


def test_multimodal_decode_shape(spark, sf_dir):
    df = multimodal.q_multimodal_decode(spark, sf_dir)
    rows = df.collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(rows) == n_docs
    assert all(8 <= r.width <= 32 and 8 <= r.height <= 32 for r in rows)
    assert all(r.channels == 3 and r.n_bytes > 0 for r in rows)
    # both real codecs exercised in-pipeline: even doc_ids BMP, odd PNG
    fmts = {r.doc_id: r.img_format for r in rows}
    assert all(
        f == ("bmp" if did % 2 == 0 else "png") for did, f in fmts.items()
    )
    assert all(0.0 <= r.mean_pixel <= 255.0 for r in rows)
    # deterministic: same payload → same decoded dimensions
    again = {r.doc_id: (r.width, r.height) for r in df.collect()}
    assert all(again[r.doc_id] == (r.width, r.height) for r in rows)


def test_ann_ivf_valid_and_scores_match_exact(spark, sf_dir):
    """IVF results: ≤ top_k per query, scores identical to brute-force for
    the same (query, neighbor) pair (IVF only restricts the candidate
    set — it never changes a score)."""
    exact = {
        (r.q_id, r.neighbor_id): r.cosine
        for r in similarity.q_sim_topk(spark, sf_dir).collect()
    }
    per_q = {}
    for r in similarity.q_sim_ann_ivf(spark, sf_dir).collect():
        per_q.setdefault(r.q_id, []).append(r)
        assert -1.0 <= r.cosine <= 1.0
        if (r.q_id, r.neighbor_id) in exact:
            assert exact[(r.q_id, r.neighbor_id)] == r.cosine
    for q, rows in per_q.items():
        assert len(rows) <= 10
        assert len({r.neighbor_id for r in rows}) == len(rows)


def test_frame_sample_cardinality_and_determinism(spark, sf_dir):
    """≤ 4 frames per doc, indices strided evenly, deterministic bytes."""
    df = multimodal.q_multimodal_frame_sample(spark, sf_dir)
    rows = df.collect()
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r)
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(per_doc) == n_docs
    for frames in per_doc.values():
        assert 1 <= len(frames) <= 4
        total = frames[0].n_frames_total
        assert all(f.n_frames_total == total for f in frames)
        assert all(0 <= f.frame_index < total for f in frames)
    again = {(r.doc_id, r.frame_index): r.frame_md5 for r in df.collect()}
    assert all(again[(r.doc_id, r.frame_index)] == r.frame_md5 for r in rows)


def test_quantize_roundtrip_error_bounded(spark, sf_dir):
    """Dequantized values must sit within scale/2 of the originals, and
    q8 must span [-127, 127]."""
    got = similarity.q_embed_quantize(spark, sf_dir).collect()
    orig = {
        r.vec_id: r.embedding
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    }
    for r in got:
        # q8 is array_join-serialized for the driver's pandas canonicalizer
        q8 = [int(x) for x in r.q8.split(",")]
        assert len(q8) == len(orig[r.vec_id])
        assert all(-127 <= q <= 127 for q in q8)
        for q, x in zip(q8, orig[r.vec_id]):
            assert abs(q * r.scale - x) <= r.scale / 2 + 1e-9


def test_dedup_clusters_consistent_with_pairs(spark, sf_dir):
    """Both endpoints of every near-dup pair share a cluster, and each
    cluster's id is its minimum member."""
    pairs = dedup.q_dedup_ngram_jaccard(spark, sf_dir).collect()
    labels = {
        r.doc_id: r.cluster_id
        for r in dedup.q_dedup_clusters(spark, sf_dir).collect()
    }
    for p in pairs:
        assert labels[p.doc_a] == labels[p.doc_b]
    by_cluster = {}
    for doc, c in labels.items():
        by_cluster.setdefault(c, []).append(doc)
    for c, members in by_cluster.items():
        assert c == min(members)


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 24), st.integers(0, 24)),
        min_size=1,
        max_size=40,
    )
)
def test_connected_components_matches_union_find(spark_global, edges):
    """Property: distributed min-label propagation ≡ driver union-find on
    random graphs (self-loops and duplicates included)."""
    uf = {}

    def find(x):
        while uf.setdefault(x, x) != x:
            uf[x] = uf[uf[x]]
            x = uf[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            uf[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in uf}

    df = spark_global.createDataFrame(edges, "a long, b long")
    got = {
        r.node: r.label
        for r in dedup.connected_components(df, max_iter=30).collect()
    }
    assert got == {n: r for n, r in want.items()}


def test_resize_produces_fixed_size_binary(spark, sf_dir):
    """Every thumb is a decodable 8x8 BMP of fixed byte size (54-byte
    header + 8 rows padded to 24 bytes = 246)."""
    from nrtwithdeltalake_spark.operators.imagecodec import decode_image
    from nrtwithdeltalake_spark.operators.multimodal import THUMB_H, THUMB_W

    rows = multimodal.q_multimodal_resize(spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(rows) == n_docs
    assert all(r.thumb_w == THUMB_W and r.thumb_h == THUMB_H for r in rows)
    for r in rows:
        img = decode_image(bytes(r.thumb))
        assert img.shape == (THUMB_H, THUMB_W, 3)
        assert r.n_bytes == len(r.thumb) == 246


def test_kmeans_monotone_deterministic(spark, sf_dir):
    """Distributed Lloyd k-means (IVF training step): inertia is
    non-increasing across iterations, exactly k centroids of full dim
    come back, every vector gets one cluster, and refitting reproduces
    bit-identical centroids (quantized exact partials + seeded init)."""
    from nrtwithdeltalake_spark.operators.kmeans import (
        assign_clusters,
        kmeans_fit,
    )
    from nrtwithdeltalake_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    cents, inertia = kmeans_fit(emb, k=4, iters=3)
    assert all(b <= a + 1e-9 for a, b in zip(inertia, inertia[1:])), inertia
    rows = cents.collect()
    assert len(rows) == 4 and all(len(r.cv) == 64 for r in rows)

    a = assign_clusters(emb, cents)
    assert a.count() == a.select("id").distinct().count() == emb.count()
    assert {r.cluster for r in a.select("cluster").distinct().collect()} <= set(
        range(4)
    )

    cents2, inertia2 = kmeans_fit(emb, k=4, iters=3)
    assert inertia == inertia2
    assert sorted((r.cluster, tuple(r.cv)) for r in rows) == sorted(
        (r.cluster, tuple(r.cv)) for r in cents2.collect()
    )


def test_multimodal_features_match_pure_python(spark, sf_dir):
    """The byte-statistics features are real numbers (not a stub):
    recompute size/mean/entropy in pure Python for every document and
    compare exactly (same rounding)."""
    import math

    from nrtwithdeltalake_spark.operators import multimodal
    from nrtwithdeltalake_spark.sources.catalog import load_table

    got = {
        r.doc_id: r
        for r in multimodal.q_multimodal_features(spark, sf_dir).collect()
    }
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    assert len(got) == len(docs)
    for d in docs:
        b = d.text.encode("utf-8")
        counts = {}
        for x in b:
            counts[x] = counts.get(x, 0) + 1
        n = max(len(b), 1)
        ent = -sum((c / n) * math.log2(c / n) for c in counts.values())
        r = got[d.doc_id]
        assert r.n_bytes == len(b)
        assert r.mean_byte == round(sum(b) / n if b else 0.0, 6)
        assert abs(r.byte_entropy - round(ent, 6)) <= 1e-9


def test_compression_ratio_matches_pure_python(spark, sf_dir):
    """The zlib ratio is a real computation, exactly reproducible:
    recompute compress(level=6) per document in plain Python and compare
    with the same rounding; the repetition flag must agree with the
    recomputed ratio too."""
    import zlib

    from nrtwithdeltalake_spark.operators import textstats
    from nrtwithdeltalake_spark.sources.catalog import load_table

    got = {
        r.doc_id: r
        for r in textstats.q_compression_ratio(spark, sf_dir).collect()
    }
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    assert len(got) == len(docs)
    for d in docs:
        raw = d.text.encode("utf-8")
        want = round(len(zlib.compress(raw, 6)) / len(raw), 6)
        r = got[d.doc_id]
        assert r.n_chars == len(d.text)
        assert r.zlib_ratio == want
        assert r.high_repetition == (want < 0.35)


def test_incremental_dedup_classification(spark, sf_dir):
    """q_dedup_incremental: exact_dups are text-identical to their match;
    near_dup estimates agree with a direct signature recompute over the
    full cross-pair space; novel docs truly have no qualifying match."""
    from nrtwithdeltalake_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = dedup.q_dedup_incremental(spark, sf_dir)
    rows = out.collect()
    assert {r.status for r in rows} <= {"exact_dup", "near_dup", "novel"}
    batch_ids = {r.doc_id for r in docs.filter(F.col("doc_id") % 5 == 0).collect()}
    assert {r.doc_id for r in rows} == batch_ids  # total over the batch

    texts = {r.doc_id: r.text for r in docs.collect()}
    # exact dups: identical text, match from the corpus side
    for r in rows:
        if r.status == "exact_dup":
            assert texts[r.doc_id] == texts[r.match_id]
            assert r.match_id % 5 != 0 and r.similarity == 1.0

    # near dups: recompute the signature-estimated jaccard directly
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    idx = dedup.build_dedup_index(corpus)
    bsig = {
        r.corpus_id: r.sig
        for r in dedup.build_dedup_index(batch)["sigs"].collect()
    }
    csig = {r.corpus_id: r.sig for r in idx["sigs"].collect()}
    for r in rows:
        if r.status == "near_dup":
            a, b = bsig[r.doc_id], csig[r.match_id]
            est = sum(x == y for x, y in zip(a, b)) / len(a)
            assert round(est, 6) == r.similarity >= 0.5

    # determinism: a second run yields the identical classification
    again = sorted(
        (r.doc_id, r.status, r.match_id)
        for r in dedup.q_dedup_incremental(spark, sf_dir).collect()
    )
    assert again == sorted((r.doc_id, r.status, r.match_id) for r in rows)


def test_incremental_dedup_loop_with_persisted_index(spark, sf_dir, tmp_path):
    """The production loop: the signature index lives in VersionedTables;
    each batch classifies against it and appends its NOVEL docs' rows, so
    a later batch's duplicate of an earlier batch's novel doc is caught —
    corpus text is never re-read."""
    from pyspark.sql import functions as FX

    from nrtwithdeltalake_spark.pipeline.tables import VersionedTable
    from nrtwithdeltalake_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    b1 = docs.filter(FX.col("doc_id") % 2 == 0)
    b2 = docs.filter(FX.col("doc_id") % 2 == 1)

    paths = {k: str(tmp_path / f"idx_{k}") for k in ("exact", "sigs", "bands")}
    idx1 = dedup.build_dedup_index(b1)
    for k, p in paths.items():
        VersionedTable.create(spark, p, idx1[k])

    index = {k: VersionedTable(spark, p).read() for k, p in paths.items()}
    out2 = dedup.incremental_dedup(b2, index).collect()
    novel_ids = [r.doc_id for r in out2 if r.status == "novel"]
    assert novel_ids, "fixture batch should contain novel docs"

    novel_docs = b2.filter(FX.col("doc_id").isin(novel_ids))
    idx2 = dedup.build_dedup_index(novel_docs)
    for k, p in paths.items():
        VersionedTable(spark, p).append(idx2[k])

    # batch 3: a verbatim copy of a batch-2 NOVEL doc + a genuinely new doc
    src = novel_docs.orderBy("doc_id").limit(1).collect()[0]
    b3 = spark.createDataFrame(
        [
            (900001, src.text, src.lang, src.source, len(src.text)),
            (900002, "entirely fresh text never seen before xyzzy", "en",
             "srcX", 43),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    index = {k: VersionedTable(spark, p).read() for k, p in paths.items()}
    got = {r.doc_id: r for r in dedup.incremental_dedup(b3, index).collect()}
    assert got[900001].status == "exact_dup"
    assert got[900001].match_id == src.doc_id  # caught via the APPENDED rows
    assert got[900002].status == "novel"


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 99), st.integers(1, 40)),  # (doc_id, tokens)
        min_size=1,
        max_size=50,
        unique_by=lambda t: t[0],
    )
)
def test_seq_packing_matches_python_greedy(spark_global, rows):
    """Property: the window-cumsum pack law ≡ a pure-Python greedy fill
    per (lang, bucket) stream, for arbitrary token distributions."""
    import hashlib

    from nrtwithdeltalake_spark.operators.llm_ext import seq_pack

    budget, buckets = 50, 4
    docs = spark_global.createDataFrame(
        [(i, " ".join(["w"] * t), "xx") for i, t in rows],
        "doc_id long, text string, lang string",
    )
    got = {
        (r.lang, r.bucket, r.pack_id): (r.n_docs, r.pack_tokens, r.first_doc, r.last_doc)
        for r in seq_pack(docs, budget=budget, buckets=buckets).collect()
    }

    def bkt(doc_id):
        return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % buckets

    streams: dict = {}
    for i, t in sorted(rows):
        streams.setdefault(("xx", bkt(i)), []).append((i, t))
    want: dict = {}
    for key, docs_in in streams.items():
        cum = 0
        for i, t in docs_in:
            pack = cum // budget
            k = (*key, pack)
            n, tot, first, last = want.get(k, (0, 0, i, i))
            want[k] = (n + 1, tot + t, min(first, i), max(last, i))
            cum += t
    assert got == want


def test_incremental_dedup_replay_idempotent(spark, sf_dir):
    """The replay-safety claim of the ingest gate: once a batch's novel
    docs are in the index, re-classifying the SAME batch yields zero
    novel docs (everything is its own exact duplicate), so reprocessing
    after a crash writes nothing."""
    from nrtwithdeltalake_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    index = dedup.build_dedup_index(corpus)
    first = dedup.incremental_dedup(batch, index)
    novel_ids = [r.doc_id for r in first.collect() if r.status == "novel"]
    novel = batch.filter(F.col("doc_id").isin(novel_ids))

    updated = dedup.build_dedup_index(corpus.unionByName(novel))
    replay = dedup.incremental_dedup(batch, updated).collect()
    assert all(r.status != "novel" for r in replay)
    # previously-novel docs now match themselves exactly
    for r in replay:
        if r.doc_id in set(novel_ids):
            assert r.status == "exact_dup" and r.match_id == r.doc_id


def test_chunker_udtf_null_text_matches_catalyst(spark):
    """NULL text: the Catalyst chunker keeps one (0, NULL, NULL) row
    (greatest(length(NULL),1)=1); the UDTF twin must agree — the shared
    oracle otherwise silently depends on the fixture never holding NULL."""
    from nrtwithdeltalake_spark.operators.udtf_ops import ChunkerUdtf
    from nrtwithdeltalake_spark.operators.textstats import CHUNK_LEN, CHUNK_STRIDE

    spark.udtf.register("engine_chunker_nulltest", ChunkerUdtf)
    docs = spark.createDataFrame(
        [(1, None), (2, "short text")], "doc_id long, text string"
    )
    docs.createOrReplaceTempView("__null_docs")
    udtf_rows = sorted(
        spark.sql(
            "SELECT d.doc_id, c.chunk_id, c.chunk_text, c.n_chars "
            "FROM __null_docs d, LATERAL engine_chunker_nulltest(d.text) c"
        ).collect()
    )
    catalyst_rows = sorted(
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
            F.col("chunk_id").cast("long"),
            "chunk_text",
            F.length("chunk_text").cast("long").alias("n_chars"),
        )
        .collect()
    )
    assert [tuple(r) for r in udtf_rows] == [tuple(r) for r in catalyst_rows]
    assert (1, 0, None, None) in [tuple(r) for r in udtf_rows]


def _spark_round6(x: float) -> float:
    """Spark's round(x, 6) twin: HALF_UP on the shortest decimal string
    (BigDecimal.valueOf), NOT python's banker's round."""
    import decimal

    return float(
        decimal.Decimal(repr(x)).quantize(
            decimal.Decimal("0.000001"), rounding=decimal.ROUND_HALF_UP
        )
    )


def test_ann_lsh_matches_pure_python_recompute(spark, sf_dir):
    """Closes the rows-only gap for q_sim_ann_lsh: the hyperplanes are a
    pure function (similarity._plane_component), so the ENTIRE operator —
    bucket signs, candidate generation, left-to-right-fold cosine, top-k
    tie-break — is recomputed in plain python on the sf0.001 fixture and
    compared row-for-row (not just row counts)."""
    from nrtwithdeltalake_spark.operators.similarity import (
        DIM,
        N_PLANES,
        N_QUERIES,
        N_TABLES,
        TOP_K,
        _plane_component,
        q_sim_ann_lsh,
    )

    got = {
        (r.q_id, r.neighbor_id): r.cosine
        for r in q_sim_ann_lsh(spark, sf_dir).collect()
    }

    vecs = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    }
    planes = [
        [[_plane_component(t, p, c) for c in range(DIM)] for p in range(N_PLANES)]
        for t in range(N_TABLES)
    ]

    def fold_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):  # same left-to-right IEEE fold as the
            acc += x * y  # Catalyst aggregate() expression
        return acc

    def bkeys(v):
        out = []
        for t in range(N_TABLES):
            key = 0
            for p in range(N_PLANES):
                if fold_dot(v, planes[t][p]) > 0:
                    key += 1 << p
            out.append((t, key))
        return out

    buckets = {vid: set(bkeys(v)) for vid, v in vecs.items()}
    import math

    want = {}
    r6 = _spark_round6
    for q in range(N_QUERIES):
        cands = [
            vid
            for vid in vecs
            if vid != q and buckets[vid] & buckets[q]
        ]
        scored = []
        for vid in cands:
            c = fold_dot(vecs[q], vecs[vid]) / (
                math.sqrt(fold_dot(vecs[q], vecs[q]))
                * math.sqrt(fold_dot(vecs[vid], vecs[vid]))
            )
            scored.append((r6(c), vid))
        scored.sort(key=lambda t: (-t[0], t[1]))
        for c, vid in scored[:TOP_K]:
            want[(q, vid)] = c
    assert got == want


def test_dedup_minhash_matches_python_recompute(spark, sf_dir):
    """Closes the rows-only gap for q_dedup_minhash: taking Spark's
    xxhash64 shingle hashes as input data, the permutation math, banding,
    candidate generation and exact-Jaccard verify are recomputed in plain
    python and the verified pair set compared exactly. (Band keys hash the
    signature slice; python buckets on the slice TUPLE itself — identical
    partitioning, xxhash64 being injective on these inputs.)"""
    from nrtwithdeltalake_spark.operators import dedup as dd

    docs = dd.load_table(spark, sf_dir, "documents")
    sh = {
        r.doc_id: list(r.sh)
        for r in docs.select(
            "doc_id", F.split("text", " ").alias("__tk")
        ).select("doc_id", dd._shingle_hashes().alias("sh")).collect()
    }
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dd.q_dedup_minhash(spark, sf_dir).collect()
    }

    p = dd._MERSENNE
    r_rows = dd.N_PERM // dd.N_BANDS
    sigs = {}
    for did, hashes in sh.items():
        mods = [h % p for h in hashes]
        sigs[did] = [
            min((a * h + b) % p for h in mods) if mods else None
            for a, b in zip(dd._PERM_A, dd._PERM_B)
        ]
    buckets = {}
    for did, sig in sigs.items():
        if sig[0] is None:
            continue
        for b in range(dd.N_BANDS):
            buckets.setdefault(
                (b, tuple(sig[b * r_rows : (b + 1) * r_rows])), []
            ).append(did)
    cand = set()
    for ids in buckets.values():
        ids.sort()
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                cand.add((ids[i], ids[j]))
    want = {}
    for a, b in cand:
        sa, sb = set(sh[a]), set(sh[b])
        jac = _spark_round6(len(sa & sb) / len(sa | sb)) if sa | sb else 0.0
        if jac >= 0.5:
            want[(a, b)] = jac
    assert got == want
    assert want, "fixture should contain at least one near-dup pair"


def test_dedup_simhash_matches_python_recompute(spark, sf_dir):
    """Closes the rows-only gap for q_dedup_simhash: taking Spark's
    per-token xxhash64 values as input data, the 64-bit signature fold,
    4×16-bit pigeonhole banding and hamming verify are recomputed in
    plain python; the pair set (with hamming distances) must match
    exactly."""
    from nrtwithdeltalake_spark.operators import dedup as dd

    docs = dd.load_table(spark, sf_dir, "documents")
    tok_hashes = {
        r.doc_id: list(r.th)
        for r in docs.select(
            "doc_id",
            F.expr(
                "transform(array_distinct(split(text, ' ')), t -> xxhash64(t))"
            ).alias("th"),
        ).collect()
    }
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in dd.q_dedup_simhash(spark, sf_dir).collect()
    }

    def simhash(hashes):
        sig = 0
        for b in range(64):
            s = 0
            for h in hashes:
                s += 1 if (h >> b) & 1 else -1
            if s > 0:
                sig |= 1 << b
        return sig

    sigs = {did: simhash(hs) for did, hs in tok_hashes.items()}
    buckets = {}
    for did, sig in sigs.items():
        for c in range(4):
            buckets.setdefault((c, (sig >> (c * 16)) & 0xFFFF), []).append(did)
    cand = set()
    for ids in buckets.values():
        ids.sort()
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                cand.add((ids[i], ids[j]))
    want = {}
    for a, b in cand:
        ham = bin(sigs[a] ^ sigs[b]).count("1")
        if ham <= 3:
            want[(a, b)] = ham
    assert got == want


def test_dedup_embedding_matches_python_recompute(spark, sf_dir):
    """Closes the rows-only gap for q_dedup_embedding: full python
    recompute of the LSH tables (pure-function hyperplanes), pair
    candidates and cosine≥0.95 verify — exact row-for-row match."""
    from nrtwithdeltalake_spark.operators.similarity import (
        DIM,
        N_PLANES,
        N_TABLES,
        _plane_component,
        q_dedup_embedding,
    )

    got = {
        (r.vec_a, r.vec_b): r.cosine
        for r in q_dedup_embedding(spark, sf_dir).collect()
    }
    vecs = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    }
    planes = [
        [[_plane_component(t, p, c) for c in range(DIM)] for p in range(N_PLANES)]
        for t in range(N_TABLES)
    ]

    def fold_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    def bkeys(v):
        out = set()
        for t in range(N_TABLES):
            key = 0
            for p in range(N_PLANES):
                if fold_dot(v, planes[t][p]) > 0:
                    key += 1 << p
            out.add((t, key))
        return out

    import math

    buckets = {vid: bkeys(v) for vid, v in vecs.items()}
    ids = sorted(vecs)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if not (buckets[a] & buckets[b]):
                continue
            c = _spark_round6(
                fold_dot(vecs[a], vecs[b])
                / (
                    math.sqrt(fold_dot(vecs[a], vecs[a]))
                    * math.sqrt(fold_dot(vecs[b], vecs[b]))
                )
            )
            if c >= 0.95:
                want[(a, b)] = c
    assert got == want


def test_ann_ivf_matches_python_recompute(spark, sf_dir):
    """Closes the rows-only gap for q_sim_ann_ivf: deterministic coarse
    centroids (vec_id % 25 == 7), argmin assignment with the exact
    (d2, c_id) tie order, N_PROBE probe lists and top-k scoring all
    recomputed in plain python — exact row-for-row match."""
    from nrtwithdeltalake_spark.operators.similarity import (
        CENTROID_MOD,
        N_PROBE,
        N_QUERIES,
        TOP_K,
        q_sim_ann_ivf,
    )

    got = {
        (r.q_id, r.neighbor_id): r.cosine
        for r in q_sim_ann_ivf(spark, sf_dir).collect()
    }
    vecs = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    }

    def fold_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    cents = {
        vid: v
        for vid, v in vecs.items()
        if vid % CENTROID_MOD == 7 and vid >= N_QUERIES
    }

    def d2(v, cv):
        return fold_dot(v, v) - 2.0 * fold_dot(v, cv) + fold_dot(cv, cv)

    cell = {
        vid: min(cents, key=lambda c: (d2(v, cents[c]), c))
        for vid, v in vecs.items()
    }
    import math

    want = {}
    for q in range(N_QUERIES):
        probes = sorted(cents, key=lambda c: (d2(vecs[q], cents[c]), c))[:N_PROBE]
        cands = [
            vid for vid in vecs if vid != q and cell[vid] in probes
        ]
        scored = []
        for vid in cands:
            c = _spark_round6(
                fold_dot(vecs[q], vecs[vid])
                / (
                    math.sqrt(fold_dot(vecs[q], vecs[q]))
                    * math.sqrt(fold_dot(vecs[vid], vecs[vid]))
                )
            )
            scored.append((c, vid))
        scored.sort(key=lambda t: (-t[0], t[1]))
        for c, vid in scored[:TOP_K]:
            want[(q, vid)] = c
    assert got == want


def test_incremental_dedup_matches_python_recompute(spark, sf_dir):
    """Closes the rows-only gap for q_dedup_incremental: full python
    recompute of the classification — exact index via hashlib md5
    (byte-identical to Spark's md5(cast binary)), minhash permutation
    math on Spark's shingle hashes, band-bucket candidates, signature
    estimate and the (est, -corpus_id) best-match tie order — compared
    row-for-row including match_id and similarity."""
    import hashlib

    from nrtwithdeltalake_spark.operators import dedup as dd

    docs_rows = dd.load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "text",
        "source",
        F.split("text", " ").alias("__tk"),
    ).select(
        "doc_id", "text", "source", dd._shingle_hashes().alias("sh")
    ).collect()
    got = {
        r.doc_id: (r.source, r.status, r.match_id, r.similarity)
        for r in dd.q_dedup_incremental(spark, sf_dir).collect()
    }

    p = dd._MERSENNE
    rr = dd.N_PERM // dd.N_BANDS

    def sig_of(hashes):
        mods = [h % p for h in hashes]
        return [
            min((a * h + b) % p for h in mods)
            for a, b in zip(dd._PERM_A, dd._PERM_B)
        ]

    corpus = [r for r in docs_rows if r.doc_id % 5 != 0]
    batch = [r for r in docs_rows if r.doc_id % 5 == 0]

    exact_idx = {}
    for r in corpus:
        md5 = hashlib.md5(r.text.encode()).hexdigest()
        exact_idx[md5] = min(exact_idx.get(md5, r.doc_id), r.doc_id)
    csigs = {r.doc_id: sig_of(list(r.sh)) for r in corpus}
    cbuckets = {}
    for cid, sig in csigs.items():
        for b in range(dd.N_BANDS):
            cbuckets.setdefault(
                (b, tuple(sig[b * rr : (b + 1) * rr])), set()
            ).add(cid)

    want = {}
    for r in batch:
        md5 = hashlib.md5(r.text.encode()).hexdigest()
        exact_match = exact_idx.get(md5)
        sig = sig_of(list(r.sh))
        cands = set()
        for b in range(dd.N_BANDS):
            cands |= cbuckets.get((b, tuple(sig[b * rr : (b + 1) * rr])), set())
        best = None
        for cid in cands:
            est = _spark_round6(
                sum(x == y for x, y in zip(sig, csigs[cid])) / dd.N_PERM
            )
            if est >= 0.5 and (
                best is None or (est, -cid) > (best[0], -best[1])
            ):
                best = (est, cid)
        if exact_match is not None:
            want[r.doc_id] = (r.source, "exact_dup", exact_match, 1.0)
        elif best is not None:
            want[r.doc_id] = (r.source, "near_dup", best[1], best[0])
        else:
            want[r.doc_id] = (r.source, "novel", None, None)
    assert got == want


def test_fingerprint_shingles_matches_python_stride(spark, sf_dir):
    """Closes the rows-only gap for q_fingerprint_shingles: the 8-char /
    stride-4 shingle extraction is recomputed in python, the python
    substrings are hashed by the same xxhash64 primitive, and min-hash +
    count must match the operator's output exactly."""
    from nrtwithdeltalake_spark.operators import textstats as ts

    docs = [
        (r.doc_id, r.text)
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    ]
    got = {
        r.doc_id: (r.fp_min, r.n_shingles)
        for r in ts.q_fingerprint_shingles(spark, sf_dir).collect()
    }
    shingles = []
    n_sh = {}
    for did, text in docs:
        starts = list(range(1, max(len(text) - 7, 1) + 1, 4))
        n_sh[did] = len(starts)
        for i in starts:
            shingles.append((did, text[i - 1 : i - 1 + 8]))
    hashed = (
        spark.createDataFrame(shingles, "doc_id long, sub string")
        .groupBy("doc_id")
        .agg(F.min(F.xxhash64("sub")).alias("fp_min"))
        .collect()
    )
    want = {r.doc_id: (r.fp_min, n_sh[r.doc_id]) for r in hashed}
    assert got == want


def test_multimodal_decode_matches_python_recompute(spark, sf_dir):
    """Closes the rows-only gap for q_multimodal_decode with REAL image
    payloads: re-synthesize each document's BMP/PNG in pure Python,
    decode it with the same codec, and require exact row equality —
    including mean_pixel, which needs every pixel decoded correctly —
    through the mapInPandas plumbing."""
    from nrtwithdeltalake_spark.operators.imagecodec import decode_image
    from nrtwithdeltalake_spark.operators.multimodal import synth_payload

    texts = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    got = {
        r.doc_id: (
            r.width, r.height, r.channels, r.img_format, r.n_bytes,
            r.mean_pixel,
        )
        for r in multimodal.q_multimodal_decode(spark, sf_dir).collect()
    }
    want = {}
    for did, text in texts.items():
        payload = synth_payload(did, text.encode())
        img = decode_image(payload)
        want[did] = (
            img.shape[1], img.shape[0], img.shape[2],
            "bmp" if did % 2 == 0 else "png", len(payload),
            round(float(img.mean()), 6),
        )
    assert got == want


def test_multimodal_resize_matches_python_recompute(spark, sf_dir):
    """Exact thumb bytes: real decode → box downsample → BMP re-encode
    recomputed per doc in pure Python."""
    from nrtwithdeltalake_spark.operators.imagecodec import (
        decode_image,
        encode_bmp,
    )
    from nrtwithdeltalake_spark.operators.multimodal import (
        THUMB_H,
        THUMB_W,
        box_resize,
        synth_payload,
    )

    texts = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    got = {
        r.doc_id: (bytes(r.thumb), r.thumb_w, r.thumb_h, r.n_bytes)
        for r in multimodal.q_multimodal_resize(spark, sf_dir).collect()
    }
    want = {}
    for did, text in texts.items():
        img = decode_image(synth_payload(did, text.encode()))
        thumb = encode_bmp(box_resize(img[:, :, :3], THUMB_W, THUMB_H))
        want[did] = (thumb, THUMB_W, THUMB_H, len(thumb))
    assert got == want


def test_multimodal_frame_sample_matches_python_recompute(spark, sf_dir):
    """Exact frame rows on real pixels: decode, cut the 4-row bands,
    re-encode each sampled band as BMP, and compare md5 AND raw frame
    bytes per (doc, index)."""
    import hashlib

    from nrtwithdeltalake_spark.operators.multimodal import (
        sample_frames,
        synth_payload,
    )

    texts = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    got = {
        (r.doc_id, r.frame_index): (r.frame_md5, bytes(r.frame_bytes), r.n_frames_total)
        for r in multimodal.q_multimodal_frame_sample(spark, sf_dir).collect()
    }
    want = {}
    for did, text in texts.items():
        n_frames, frames = sample_frames(synth_payload(did, text.encode()))
        for idx, frame in frames:
            want[(did, idx)] = (
                hashlib.md5(frame).hexdigest(), frame, n_frames,
            )
    assert got == want


def test_image_codec_roundtrip_and_known_pixels(spark):
    """The engine's own BMP/PNG codecs against hand-crafted fixtures:
    pixel-exact encode→decode round-trips (RGB BMP; grey/RGB/RGBA PNG)
    and a PNG assembled byte-by-byte with all five scanline filter
    types (None/Sub/Up/Average/Paeth) decoded against a scalar
    reference unfilter — proving the decoder handles files OUR encoder
    never writes (it emits filter 0 only)."""
    import struct
    import zlib

    import numpy as np

    from nrtwithdeltalake_spark.operators.imagecodec import (
        decode_bmp,
        decode_image,
        decode_png,
        encode_bmp,
        encode_png,
    )

    rng = np.random.default_rng(7)
    for shape in [(5, 7, 3), (1, 1, 3), (16, 16, 3)]:
        a = rng.integers(0, 256, shape, dtype=np.uint8)
        assert (decode_bmp(encode_bmp(a)) == a).all()
        assert (decode_image(encode_bmp(a)) == a).all()
        assert (decode_png(encode_png(a)) == a).all()
    grey = rng.integers(0, 256, (4, 6, 1), dtype=np.uint8)
    assert (decode_png(encode_png(grey)) == grey).all()
    rgba = rng.integers(0, 256, (3, 5, 4), dtype=np.uint8)
    assert (decode_png(encode_png(rgba)) == rgba).all()

    # all-filters PNG, assembled from the spec by hand
    h, w, c = 6, 5, 3
    img = rng.integers(0, 256, (h, w, c), dtype=np.uint8)

    def filt(ftype, cur, prev):
        line = cur.astype(np.int16).ravel()
        stride = len(line)
        out = np.zeros(stride, dtype=np.int16)
        for i in range(stride):
            left = line[i - c] if i >= c else 0
            up = prev[i]
            ul = prev[i - c] if i >= c else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = left
            elif ftype == 2:
                pred = up
            elif ftype == 3:
                pred = (left + up) >> 1
            else:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = (
                    left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
                )
            out[i] = (line[i] - pred) & 0xFF
        return out.astype(np.uint8)

    raw = b""
    prev = np.zeros(w * c, dtype=np.int16)
    for r in range(h):
        ftype = r % 5
        raw += bytes([ftype]) + filt(ftype, img[r], prev).tobytes()
        prev = img[r].astype(np.int16).ravel()

    def chunk(tag, payload):
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert (decode_png(png) == img).all()


def test_ann_pq_matches_python_recompute(spark, sf_dir):
    """Closes the rows-only gap for q_sim_ann_pq: deterministic anchor
    codebook, left-fold subspace distances, struct-min encoding, the
    integer micro-distance LUT and the ADC top-k all recomputed in plain
    python — exact row-for-row match including rank order."""
    import math

    from nrtwithdeltalake_spark.operators.similarity import (
        N_QUERIES,
        PQ_ANCHOR_MOD,
        PQ_K,
        PQ_M,
        PQ_SUB,
        TOP_K,
        q_sim_ann_pq,
    )

    got = {
        (r.q_id, r.neighbor_id): (r.adc_micro, r.rn)
        for r in q_sim_ann_pq(spark, sf_dir).collect()
    }
    vecs = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    }
    anchor_ids = sorted(
        vid
        for vid in vecs
        if vid % PQ_ANCHOR_MOD == 3 and vid >= N_QUERIES
    )[:PQ_K]
    cb = [vecs[a] for a in anchor_ids]

    def subd2(v, c, m):
        acc = 0.0
        for i in range(m * PQ_SUB, (m + 1) * PQ_SUB):
            acc = acc + (v[i] - c[i]) * (v[i] - c[i])
        return acc

    codes = {
        vid: [
            min(range(PQ_K), key=lambda j: (subd2(v, cb[j], m), j))
            for m in range(PQ_M)
        ]
        for vid, v in vecs.items()
    }
    want = {}
    for q in range(N_QUERIES):
        lut = [
            [math.floor(subd2(vecs[q], cb[j], m) * 1e9) for j in range(PQ_K)]
            for m in range(PQ_M)
        ]
        scored = sorted(
            (
                (sum(lut[m][codes[vid][m]] for m in range(PQ_M)), vid)
                for vid in vecs
                if vid != q
            ),
        )
        for rn, (adc, vid) in enumerate(scored[:TOP_K], start=1):
            want[(q, vid)] = (adc, rn)
    assert got == want


def test_semdedup_matches_python_recompute_given_clusters(spark, sf_dir):
    """Closes the rows-only gap for q_dedup_semantic: the kmeans cluster
    assignment (deterministic, separately tested) is taken as input; the
    cluster-blocked pair scan and the keep-lowest-id drop policy are
    recomputed exactly in python."""
    import math

    from nrtwithdeltalake_spark.operators.kmeans import (
        assign_clusters,
        kmeans_fit,
    )
    from nrtwithdeltalake_spark.operators.similarity import (
        SEM_ITERS,
        SEM_K,
        SEM_TAU,
        q_dedup_semantic,
    )
    from nrtwithdeltalake_spark.sources.catalog import load_table

    got = {
        r.vec_id: (r.cluster, r.status, r.dup_of)
        for r in q_dedup_semantic(spark, sf_dir).collect()
    }
    emb = load_table(spark, sf_dir, "embeddings")
    cents, _ = kmeans_fit(emb, k=SEM_K, iters=SEM_ITERS)
    clusters = {
        r.id: r.cluster for r in assign_clusters(emb, cents).collect()
    }
    vecs = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    }

    def fold_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    want = {}
    for vid in vecs:
        dup_of = None
        for other in vecs:
            if other >= vid or clusters[other] != clusters[vid]:
                continue
            cos = fold_dot(vecs[other], vecs[vid]) / (
                math.sqrt(fold_dot(vecs[other], vecs[other]))
                * math.sqrt(fold_dot(vecs[vid], vecs[vid]))
            )
            if cos >= SEM_TAU and (dup_of is None or other < dup_of):
                dup_of = other
        want[vid] = (
            clusters[vid],
            "keep" if dup_of is None else "drop",
            dup_of,
        )
    assert got == want


def test_ann_ivfpq_matches_python_recompute(spark, sf_dir):
    """Closes the rows-only gap for q_sim_ann_ivfpq: IVF cell
    assignment + probe lists (the IVF recompute) feeding PQ codes + ADC
    (the PQ recompute) — the composed pipeline matches row-for-row."""
    import math

    from nrtwithdeltalake_spark.operators.similarity import (
        CENTROID_MOD,
        N_PROBE,
        N_QUERIES,
        PQ_ANCHOR_MOD,
        PQ_K,
        PQ_M,
        PQ_SUB,
        TOP_K,
        q_sim_ann_ivfpq,
    )

    got = {
        (r.q_id, r.neighbor_id): (r.adc_micro, r.rn)
        for r in q_sim_ann_ivfpq(spark, sf_dir).collect()
    }
    vecs = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    }

    def fold_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    cents = {
        vid: v
        for vid, v in vecs.items()
        if vid % CENTROID_MOD == 7 and vid >= N_QUERIES
    }

    def d2(v, cv):
        return fold_dot(v, v) - 2.0 * fold_dot(v, cv) + fold_dot(cv, cv)

    cell = {
        vid: min(cents, key=lambda c: (d2(v, cents[c]), c))
        for vid, v in vecs.items()
    }
    anchor_ids = sorted(
        vid
        for vid in vecs
        if vid % PQ_ANCHOR_MOD == 3 and vid >= N_QUERIES
    )[:PQ_K]
    cb = [vecs[a] for a in anchor_ids]

    def subd2(v, c, m):
        acc = 0.0
        for i in range(m * PQ_SUB, (m + 1) * PQ_SUB):
            acc = acc + (v[i] - c[i]) * (v[i] - c[i])
        return acc

    want = {}
    for q in range(N_QUERIES):
        probes = sorted(cents, key=lambda c: (d2(vecs[q], cents[c]), c))[
            :N_PROBE
        ]
        lut = [
            [math.floor(subd2(vecs[q], cb[j], m) * 1e9) for j in range(PQ_K)]
            for m in range(PQ_M)
        ]
        scored = sorted(
            (
                (
                    sum(
                        lut[m][
                            min(
                                range(PQ_K),
                                key=lambda j: (subd2(vecs[vid], cb[j], m), j),
                            )
                        ]
                        for m in range(PQ_M)
                    ),
                    vid,
                )
                for vid in vecs
                if vid != q and cell[vid] in probes
            ),
        )
        for rn, (adc, vid) in enumerate(scored[:TOP_K], start=1):
            want[(q, vid)] = (adc, rn)
    assert got == want


def test_entity_resolution_perfect_against_ground_truth(spark, sf_dir):
    """The synthesized mention noise carries its own ground truth: each
    customer's three mentions must form exactly one cluster whose label
    is the entity's lowest mention id (custkey*4), with exactly one
    canonical row — no over-merging across entities, no split
    clusters."""
    from nrtwithdeltalake_spark.operators.dedup import q_entity_resolution

    rows = q_entity_resolution(spark, sf_dir).collect()
    by_entity = {}
    for r in rows:
        by_entity.setdefault(r.mention_id // 4, []).append(r)
    for ent, ms in by_entity.items():
        assert len(ms) == 3
        assert {r.cluster_id for r in ms} == {ent * 4}
        assert sum(r.is_canonical for r in ms) == 1
