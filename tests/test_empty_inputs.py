"""Empty-input sweep: every DataFrame→DataFrame operator must handle
an empty corpus (and, where a model/benchmark side exists, an empty
model side) without crashing — returning an empty frame with the
documented schema, or a well-defined degenerate result.

This is the bug class ADVICE r10 item 3 caught in ``kmeans_fit`` (a
worker-side ``np.asarray([])`` axis error reachable only on an empty
table): driver-side ``collect()[0]`` indexing, literal-embedding of
empty collected models, and numpy axis assumptions all live here. A
100 TB pipeline hits empty inputs constantly — an empty partition of a
curation filter chain, a benchmark table not yet loaded, a first
incremental batch.
"""

from __future__ import annotations

import pytest

from hive_scripts_spark.operators import dedup as D
from hive_scripts_spark.operators import similarity as S
from hive_scripts_spark.operators import textstats as X

DOCS_SCHEMA = "doc_id long, text string"
EMB_SCHEMA = "vec_id long, embedding array<float>"


@pytest.fixture(scope="module")
def empty_docs(spark):
    return spark.createDataFrame([], DOCS_SCHEMA)


@pytest.fixture(scope="module")
def empty_emb(spark):
    return spark.createDataFrame([], EMB_SCHEMA)


@pytest.fixture(scope="module")
def small_docs(spark):
    return spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog again and again"),
         (2, "lorem ipsum dolor sit amet consectetur adipiscing elit sed do")],
        DOCS_SCHEMA,
    )


@pytest.fixture(scope="module")
def small_emb(spark):
    return spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 1.0])], EMB_SCHEMA
    )


# ---- text/dedup operators over an EMPTY corpus --------------------

TEXT_OPS = [
    ("exact_dedup", lambda df: D.exact_dedup(df, ["text"])),
    ("fingerprint_dedup", lambda df: D.fingerprint_dedup(df)),
    ("dedup_lines", lambda df: D.dedup_lines(df)),
    ("dedup_lines_within_doc", lambda df: D.dedup_lines_within_doc(df)),
    ("strip_boilerplate", lambda df: D.strip_boilerplate(df)),
    ("remove_repeated_spans", lambda df: D.remove_repeated_spans(df)),
    ("ngram_jaccard_pairs", lambda df: D.ngram_jaccard_pairs(df, threshold=0.5)),
    ("minhash_lsh_pairs", lambda df: D.minhash_lsh_pairs(df)),
    ("minhash_lsh_pairs_portable", lambda df: D.minhash_lsh_pairs_portable(df)),
    (
        "near_dup_survivors",
        lambda df: D.near_dup_survivors(
            df.selectExpr("doc_id", "text", "length(text) as n_chars"),
            D.minhash_lsh_pairs(df),
        ),
    ),
    ("simhash_near_pairs", lambda df: D.simhash_near_pairs(df)),
    ("simhash_near_pairs_portable", lambda df: D.simhash_near_pairs_portable(df)),
    ("quality_features", lambda df: X.quality_features(df)),
    ("language_id", lambda df: X.language_id(df)),
    ("doc_fingerprint", lambda df: X.doc_fingerprint(df)),
    ("repetition_signals", lambda df: X.repetition_signals(df)),
    ("word_entropy", lambda df: X.word_entropy(df)),
    ("vocabulary", lambda df: X.vocabulary(df)),
    (
        "length_histogram",
        lambda df: X.length_histogram(
            df.selectExpr("doc_id", "length(text) as n_chars")
        ),
    ),
    ("pii_signals", lambda df: X.pii_signals(df)),
    ("pii_redact", lambda df: X.pii_redact(df)),
    ("chunk_documents", lambda df: X.chunk_documents(df)),
    ("unigram_logprob_score", lambda df: X.unigram_logprob_score(df)),
    ("corpus_ngram_topk", lambda df: X.corpus_ngram_topk(df)),
    (
        "quality_gate_report",
        lambda df: X.quality_gate_report(
            df.selectExpr("doc_id", "text", "'web' as source"),
            weights=[0.1] * 8,
        ),
    ),
    ("compression_signal", lambda df: X.compression_signal(df)),
    (
        "length_profile",
        lambda df: X.length_profile(
            df.selectExpr("doc_id", "text", "'web' as source")
        ),
    ),
]


@pytest.mark.parametrize("name,op", TEXT_OPS, ids=[n for n, _ in TEXT_OPS])
def test_text_op_on_empty_corpus(empty_docs, name, op):
    out = op(empty_docs)
    assert out.count() == 0


# ---- embedding operators over an EMPTY corpus ----------------------


def test_brute_force_topk_empty_corpus(empty_emb, small_emb):
    assert S.brute_force_topk(empty_emb, small_emb, k=3).count() == 0


def test_brute_force_topk_empty_queries(small_emb, empty_emb):
    assert S.brute_force_topk(small_emb, empty_emb, k=3).count() == 0


@pytest.mark.parametrize("use_lsh", [False, True])
def test_near_dup_pairs_empty_corpus(empty_emb, use_lsh):
    out = S.embedding_near_dup_pairs(
        empty_emb, threshold=0.5, use_lsh=use_lsh, max_docs=None
    )
    assert out.count() == 0


def test_lsh_portable_empty_corpus(empty_emb):
    assert S.embedding_lsh_pairs_portable(empty_emb, threshold=0.5).count() == 0


def test_ivf_assign_empty_corpus(spark, empty_emb, small_emb):
    cents = small_emb.selectExpr(
        "vec_id as centroid_id",
        "transform(embedding, x -> cast(x as double)) as centroid",
    )
    assert S.ivf_assign(empty_emb, cents).count() == 0
    assert S.ivf_cell_stats(empty_emb, cents).count() == 0


def test_cluster_balanced_sample_empty_corpus(empty_emb, small_emb):
    cents = small_emb.selectExpr(
        "vec_id as centroid_id",
        "transform(embedding, x -> cast(x as double)) as centroid",
    )
    assert S.cluster_balanced_sample(empty_emb, cents, cap_per_cell=5).count() == 0


def test_semantic_dedup_empty_corpus(empty_emb, small_emb):
    cents = small_emb.selectExpr(
        "vec_id as centroid_id",
        "transform(embedding, x -> cast(x as double)) as centroid",
    )
    assert S.semantic_dedup(empty_emb, cents, threshold=0.9).count() == 0


def test_embedding_decontaminate_empty_corpus(empty_emb, small_emb):
    assert S.embedding_decontaminate(empty_emb, small_emb).count() == 0


def test_quantize_embeddings_empty(empty_emb):
    assert S.quantize_embeddings(empty_emb).count() == 0


# ---- EMPTY model / benchmark sides ---------------------------------


def test_embedding_decontaminate_empty_benchmark(small_emb, empty_emb):
    """An empty benchmark means NOTHING is contaminated — every corpus
    row survives (not a crash, not an empty result)."""
    out = S.embedding_decontaminate(small_emb, empty_emb)
    assert out.count() == 3


def test_contamination_overlap_empty_benchmark(spark, small_docs, empty_docs):
    """Documented contract: only docs with >= 1 shared gram are
    returned — an empty benchmark therefore yields an empty overlap
    frame (nothing contaminated), not a crash."""
    assert D.contamination_overlap(small_docs, empty_docs).count() == 0


def test_ivf_assign_empty_model(spark, small_emb, empty_emb):
    """An empty centroids frame returns an empty assignment with the
    contract schema — previously an AnalysisException from an
    element-less (VOID-typed) literal struct array."""
    cents = empty_emb.selectExpr(
        "vec_id as centroid_id",
        "transform(embedding, x -> cast(x as double)) as centroid",
    )
    out = S.ivf_assign(small_emb, cents)
    assert out.columns == ["vec_id", "centroid_id", "sim"]
    assert out.count() == 0


def test_contamination_overlap_empty_corpus(empty_docs, small_docs):
    assert D.contamination_overlap(empty_docs, small_docs).count() == 0


def test_cross_corpus_dedup_empty_reference(small_docs, empty_docs):
    """Nothing in the reference corpus -> every doc survives."""
    out = D.cross_corpus_dedup(small_docs, empty_docs)
    assert out.count() == 2


def test_cross_corpus_dedup_empty_corpus(empty_docs, small_docs):
    assert D.cross_corpus_dedup(empty_docs, small_docs).count() == 0


# ---- degenerate VALUES (the other certain-at-scale input class) -----

DEGENERATE_ROWS = [
    (1, None),                # null text
    (2, ""),                  # empty
    (3, " "),                 # whitespace-only
    (4, "a"),                 # single char
    (5, "normal text with several words here"),
    (6, "\n\n\n"),            # newlines only
    (7, "x" * 10_000),        # one huge token
]


@pytest.fixture(scope="module")
def degenerate_docs(spark):
    return spark.createDataFrame(DEGENERATE_ROWS, DOCS_SCHEMA)


DEGENERATE_OPS = [
    ("exact_dedup", lambda df: D.exact_dedup(df, ["text"])),
    ("fingerprint_dedup", lambda df: D.fingerprint_dedup(df)),
    ("dedup_lines", lambda df: D.dedup_lines(df)),
    ("dedup_lines_within_doc", lambda df: D.dedup_lines_within_doc(df)),
    ("strip_boilerplate", lambda df: D.strip_boilerplate(df)),
    ("remove_repeated_spans", lambda df: D.remove_repeated_spans(df)),
    ("ngram_jaccard_pairs", lambda df: D.ngram_jaccard_pairs(df, threshold=0.5)),
    ("minhash_lsh_pairs", lambda df: D.minhash_lsh_pairs(df)),
    ("simhash_near_pairs", lambda df: D.simhash_near_pairs(df)),
    (
        "contamination_substring",
        lambda df: D.contamination_substring(
            df, df.where("doc_id = 5").selectExpr("doc_id", "text as snippet")
        ),
    ),
    ("quality_features", lambda df: X.quality_features(df)),
    ("language_id", lambda df: X.language_id(df)),
    ("doc_fingerprint", lambda df: X.doc_fingerprint(df)),
    ("repetition_signals", lambda df: X.repetition_signals(df)),
    ("word_entropy", lambda df: X.word_entropy(df)),
    ("vocabulary", lambda df: X.vocabulary(df)),
    ("pii_signals", lambda df: X.pii_signals(df)),
    ("pii_redact", lambda df: X.pii_redact(df)),
    ("chunk_documents", lambda df: X.chunk_documents(df)),
    ("unigram_logprob_score", lambda df: X.unigram_logprob_score(df)),
    ("corpus_ngram_topk", lambda df: X.corpus_ngram_topk(df)),
    ("compression_signal", lambda df: X.compression_signal(df)),
]


@pytest.mark.parametrize(
    "name,op", DEGENERATE_OPS, ids=[n for n, _ in DEGENERATE_OPS]
)
def test_op_on_degenerate_text(degenerate_docs, name, op):
    """Null text, empty/whitespace-only strings, a single char, a
    100k-char single token: every operator must run, never crash.
    (Row counts are each operator's own semantics — pair generators
    may emit zero, per-doc signals may skip token-less docs; the pin
    here is NO EXCEPTION on the value shapes a real corpus contains.)"""
    op(degenerate_docs).collect()  # materialize fully, not just count


# ---- degenerate EMBEDDING values ------------------------------------


@pytest.fixture(scope="module")
def degenerate_emb(spark):
    return spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, None), (2, []), (3, [float("nan"), 1.0]),
         (4, [0.0, 0.0]), (5, [0.9, 0.1]), (6, [1.0, 0.0])],
        EMB_SCHEMA,
    )


def test_near_dup_paths_on_degenerate_embeddings(degenerate_emb):
    """Null/empty vectors are excluded at staging (can never be
    near-dups); NaN vectors read sim NaN→excluded numpy-side and
    sim 0 Spark-side; both paths emit exactly the one real dup pair."""
    # cos(0,6)=1 (exact dup); cos(0,5)=cos(6,5)~0.9934 — all three
    # clear 0.99; the NaN vector (3) and the zero vector (4) never pair
    for use_lsh in (False, True):
        got = S.embedding_near_dup_pairs(
            degenerate_emb, threshold=0.99, use_lsh=use_lsh, max_docs=None
        ).collect()
        pairs = sorted((r["a_id"], r["b_id"]) for r in got)
        assert pairs == [(0, 5), (0, 6), (5, 6)], (use_lsh, pairs)


def test_ivf_assign_routes_on_degenerate_embeddings(spark, degenerate_emb):
    """Both ivf_assign routes (plan-literal and numpy mapInPandas)
    run over null/empty/NaN rows: null/empty staged out, the rest
    assigned — the numpy route previously crashed on the object array
    np.array builds from ragged/None rows."""
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
        "centroid_id long, centroid array<double>",
    )
    lit = S.ivf_assign(degenerate_emb, cents)
    np_route = S.ivf_assign(degenerate_emb, cents, literal_threshold=1)
    assert lit.count() == np_route.count() == 5  # 7 - null - empty
    lit_ids = {r["vec_id"] for r in lit.collect()}
    assert lit_ids == {0, 3, 4, 5, 6}


def test_training_and_quantize_on_degenerate_embeddings(spark, degenerate_emb):
    """kmeans_fit excludes non-finite vectors from training (one NaN
    element would poison a centroid sum forever; Arrow also maps NaN
    inside nested pandas lists to NULL); quantize/pq/ivfpq drop only
    null/empty rows."""
    fitted = S.kmeans_fit(degenerate_emb, k=2, iters=2).collect()
    assert len(fitted) == 2
    for r in fitted:
        assert all(x == x for x in r["centroid"])  # no NaN poisoning
    assert S.quantize_embeddings(degenerate_emb).count() == 5
    books = S.train_pq_codebooks(degenerate_emb, m=2, k=2)
    assert S.pq_encode(degenerate_emb, books).count() == 5
    cents, res = S.train_ivfpq_model(degenerate_emb, nlist=2, m=2, k=2)
    assert len(cents) == 2


def test_topk_paths_exclude_invalid_vectors(spark, degenerate_emb):
    """ADVICE r11 (medium): brute_force_topk / ivf_topk must stage
    through _drop_invalid_vecs on BOTH sides — unfiltered, a
    null/empty corpus row's NULL dot coalesces to cosine 0.0 in
    guarded_div and ranks ABOVE genuine negative-similarity
    neighbors; a null/empty query row would fabricate a neighbor
    list for a vector that does not exist."""
    queries = spark.createDataFrame(
        [(100, [1.0, 0.0]), (101, None), (102, [])], EMB_SCHEMA
    )
    cents = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
    for out in (
        S.brute_force_topk(degenerate_emb, queries, k=10),
        S.ivf_topk(degenerate_emb, cents, queries, k=10, nprobe=2),
    ):
        rows = out.collect()
        # invalid queries (101, 102) produce no neighbor lists
        assert {r["query_id"] for r in rows} == {100}
        # invalid corpus rows (1 null, 2 empty) are never neighbors
        assert not {r["neighbor_id"] for r in rows} & {1, 2}


def test_semantic_dedup_all_invalid_corpus_zero_centroids_survives(spark):
    """ADVICE r11 (low): a corpus whose rows are ALL null/empty
    embeddings legitimately trains zero centroids; by the
    unassignable-survivor convention every row survives with a NULL
    assignment — this must not trip the empty-model guard (which
    exists for the 'valid vectors but no model' misconfig)."""
    all_invalid = spark.createDataFrame(
        [(7, None), (8, []), (9, None)], EMB_SCHEMA
    )
    no_cents = spark.createDataFrame(
        [], "centroid_id long, centroid array<double>"
    )
    out = {r["vec_id"]: r for r in S.semantic_dedup(
        all_invalid, no_cents, threshold=0.9).collect()}
    assert set(out) == {7, 8, 9}
    for r in out.values():
        assert r["centroid_id"] is None and r["centroid_sim"] is None


def test_semantic_dedup_on_degenerate_embeddings(spark, degenerate_emb):
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
        "centroid_id long, centroid array<double>",
    )
    out = {r["vec_id"]: r for r in S.semantic_dedup(
        degenerate_emb, cents, threshold=0.9).collect()}
    survivors = set(out)
    # {0,5,6} form one near-dup cluster (pairwise cosine >= 0.99) ->
    # exactly ONE survives per the keep policy; the NaN row (3) and
    # zero vector (4) survive as singletons (their sims read NaN/0 ->
    # no pair); the null (1) and empty (2) rows are UNASSIGNABLE, can
    # never be duplicates, and survive with a NULL assignment
    assert len(survivors & {0, 5, 6}) == 1, survivors
    assert {1, 2, 3, 4} <= survivors
    for vid in (1, 2):
        assert out[vid]["centroid_id"] is None
        assert out[vid]["centroid_sim"] is None


def test_empty_model_raises_where_silence_is_data_loss(spark, small_emb, empty_emb):
    """semantic_dedup / cluster_balanced_sample with ZERO centroids
    would silently return an empty survivor/sample frame — which a
    keep-the-survivors pipeline reads as 'drop the whole corpus'.
    They raise instead; the trainers raise on an empty/all-invalid
    corpus (a model cannot be fit from zero samples)."""
    no_cents = empty_emb.selectExpr(
        "vec_id as centroid_id",
        "transform(embedding, x -> cast(x as double)) as centroid",
    )
    with pytest.raises(ValueError, match="non-empty centroids"):
        S.semantic_dedup(small_emb, no_cents)
    with pytest.raises(ValueError, match="non-empty centroids"):
        S.cluster_balanced_sample(small_emb, no_cents, cap_per_cell=2)
    # ...but empty corpus + empty model is empty-in/empty-out (an
    # empty incremental batch through a --train-full pipeline)
    assert S.semantic_dedup(empty_emb, no_cents).count() == 0
    assert S.cluster_balanced_sample(empty_emb, no_cents, cap_per_cell=2).count() == 0
    with pytest.raises(ValueError, match="zero samples"):
        S.train_pq_codebooks(empty_emb, m=2, k=2)
    with pytest.raises(ValueError, match="zero samples"):
        S.train_ivfpq_model(empty_emb, nlist=2, m=2, k=2)


def test_ivf_assign_numpy_route_nan_sim_matches_literal(spark):
    """Both ivf_assign routes must emit sim 0 for a NaN-element vector
    — raw NaN from the numpy route would order above every threshold
    Spark-side, silently flipping embedding_decontaminate's >= gate
    between routes."""
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [float("nan"), 1.0])],
        "vec_id long, embedding array<float>",
    )
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
        "centroid_id long, centroid array<double>",
    )
    lit = {r["vec_id"]: r for r in S.ivf_assign(emb, cents).collect()}
    np_route = {
        r["vec_id"]: r
        for r in S.ivf_assign(emb, cents, literal_threshold=1).collect()
    }
    for route in (lit, np_route):
        assert route[1]["sim"] == 0.0
        assert route[1]["centroid_id"] == lit[1]["centroid_id"]


def test_kmeans_fit_excludes_infinite_vectors(spark):
    """+/-Inf elements poison centroid sums exactly like NaN — the
    training filter must exclude them too."""
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [float("inf"), 0.0]),
         (2, [0.9, 0.1]), (3, [float("-inf"), 1.0])],
        "vec_id long, embedding array<float>",
    )
    out = S.kmeans_fit(emb, k=2, iters=2).collect()
    assert len(out) == 2
    for r in out:
        assert all(x == x and abs(x) != float("inf") for x in r["centroid"])


def test_near_dup_max_docs_probe_ignores_invalid_rows(spark, recwarn):
    """The exhaustive-guard probe counts only rows that reach the
    quadratic stage: 3 valid vectors + 3 null rows with max_docs=4
    must NOT reroute to LSH (no warning)."""
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, None), (2, None), (3, None),
         (4, [0.0, 1.0]), (5, [1.0, 0.0])],
        EMB_SCHEMA,
    )
    pairs = S.embedding_near_dup_pairs(
        emb, threshold=0.99, use_lsh=False, max_docs=4
    ).collect()
    assert not [w for w in recwarn.list if issubclass(w.category, UserWarning)]
    assert sorted((r["a_id"], r["b_id"]) for r in pairs) == [(0, 5)]


# ---- degenerate BINARY payloads (multimodal) ------------------------


def test_multimodal_on_degenerate_payloads(spark):
    """Null payloads, empty/1-byte payloads, garbage, truncated
    headers, and a RIFF header lying about its sizes: every decode
    path emits a row with NULL metadata instead of crashing the batch
    (the published-format parsers' documented contract; the NULL
    payload previously crashed bytes(None) before parsing began)."""
    from pyspark.sql import functions as F

    from hive_scripts_spark.operators import multimodal as M

    rows = [
        (1, None),
        (2, b""),
        (3, b"\x00"),
        (4, b"garbage not an image at all"),
        (5, b"BM" + b"\x00" * 10),                 # truncated BMP
        (6, b"\x89PNG\r\n\x1a\n" + b"\x00" * 8),   # truncated PNG
        (7, b"RIFF\x00\x00\x00\x00WAVE"),          # truncated WAV
        (8, b"RIFF\xff\xff\xff\xffWAVEfmt "),      # sizes lie
    ]
    docs = spark.createDataFrame(rows, "doc_id long, payload binary").select(
        "doc_id",
        "payload",
        F.lit("image").alias("modality"),
        F.octet_length("payload").alias("byte_len"),
    )
    assert M.decode_image_meta(docs).count() == 8
    assert M.audio_features(docs).count() == 8
    assert M.video_meta(docs).count() == 8
    assert M.resize_images(docs).count() == 8
    # none of the degenerate payloads may fabricate dimensions
    metas = {r["doc_id"]: r for r in M.decode_image_meta(docs).collect()}
    for i in (1, 2, 3, 4):
        assert metas[i]["width"] is None and metas[i]["height"] is None, i
    # a NULL payload must read NULL content_md5/byte_len — md5(b"")
    # would collapse every failed fetch and every genuinely empty
    # payload into one content-dedup survivor downstream
    assert metas[1]["content_md5"] is None and metas[1]["byte_len"] is None
    assert metas[2]["content_md5"] is not None and metas[2]["byte_len"] == 0
    assert metas[1]["content_md5"] != metas[2]["content_md5"]
