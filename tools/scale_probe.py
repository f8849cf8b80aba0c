"""One-off larger-scale measurement for the r8 scale claims
(VERDICT r7 item 6): synthesize an sf1-equivalent embeddings/documents
scratch (≥100× the sf0.1 row counts), then measure warm times +
exchange counts for

* PQ: recompute-per-query (`pq_topk`) vs build-once/search-from-stored
  (`pq_encode` → parquet → `pq_search_codes`) — does the persisted
  index amortize the encode away?
* IVF+PQ: same pair, with the cell-partitioned layout.
* decontamination: broadcast exact (`contamination_overlap`) vs
  plan-literal Bloom prefilter (`bloom_contamination_overlap`) across
  growing benchmark sizes — does the broadcast→bloom crossover cross?

Synthetic data is deterministic (trig-hash pseudo-noise around 16
cluster centers; token text from a shared vocab so bench grams really
overlap) — no RNG state, same rows every run. Results go to stdout as
one JSON line per probe; paste the summary into PLANS.md.

Usage: python tools/scale_probe.py [--vectors 200000] [--docs 100000]
                                   [--reps 2]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _steal_ticks() -> int:
    """Hypervisor CPU-steal counter (/proc/stat col 9) — same telemetry
    as bench.py/sweep.py: this box's host steals CPU in multi-second
    bursts that loadavg and pre-run probes can't see; a probe report
    whose steal accounts for its excess is host contention, not a plan
    change."""
    try:
        with open("/proc/stat") as fh:
            parts = fh.readline().split()
        return int(parts[8]) if parts and parts[0] == "cpu" else 0
    except Exception:  # noqa: BLE001 — telemetry must never fail a probe
        return 0


_CLK_TCK = float(os.sysconf("SC_CLK_TCK")) if hasattr(os, "sysconf") else 100.0


def _timed(df_builder, reps):
    """Min-of-reps wall time + exchange count of the executed plan."""
    best, exchanges, _, _ = _timed_full(df_builder, reps)
    return best, exchanges


def _timed_full(df_builder, reps):
    """Min-of-reps wall time + exchange count + join-strategy counts
    (AQE-final BroadcastHashJoin vs SortMergeJoin) of the executed
    plan — the bhj/smj split is the signal for broadcast→shuffle
    flips as inputs grow."""
    best, exchanges, bhj, smj = None, None, None, None
    for _ in range(max(1, reps)):
        df = df_builder()
        steal0 = _steal_ticks()
        t0 = time.perf_counter()
        _noop(df)
        dt = time.perf_counter() - t0
        steal = (_steal_ticks() - steal0) / _CLK_TCK
        if best is None or dt < best:
            best, best_steal = dt, steal
        plan = df._jdf.queryExecution().executedPlan().toString()
        exchanges = plan.count("Exchange ")
        bhj = plan.count("BroadcastHashJoin")
        smj = plan.count("SortMergeJoin")
    print(json.dumps({"telemetry": "best_rep_steal_s",
                      "value": round(best_steal, 2)}), flush=True)
    return round(best, 2), exchanges, bhj, smj


def gen_embeddings(spark, n, path):
    """n 64-dim vectors clustered around 16 deterministic centers."""
    dim, n_clusters = 64, 16
    comps = [
        (
            F.cos(F.lit(float(i) * 0.71) + (F.col("id") % n_clusters) * 2.39)
            + 0.1 * F.sin(F.col("id") * 0.137 + F.lit(float(i) * 1.93))
        ).cast("float")
        for i in range(dim)
    ]
    df = spark.range(0, n, 1, 32).select(
        F.col("id").alias("vec_id"), F.array(*comps).alias("embedding")
    )
    df.write.mode("overwrite").parquet(path)


def gen_documents(spark, n, path, vocab=500, tokens=50, start=0):
    """n docs of `tokens` words from a `vocab`-word pool; pass a
    disjoint `start` for the bench set so its docs are DISTINCT from
    the corpus (same vocab → realistic partial trigram overlap, not
    the degenerate bench⊂corpus 100%-contamination case)."""
    text = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), F.lit(tokens)),
            lambda t: F.concat(
                F.lit("w"),
                F.pmod(F.xxhash64(F.col("id") * tokens + t), F.lit(vocab)),
            ),
        ),
    )
    df = spark.range(start, start + n, 1, 32).select(
        F.col("id").alias("doc_id"), text.alias("text")
    )
    df.write.mode("overwrite").parquet(path)


def gen_neardup_documents(spark, n, path, copies=4, tokens=50, vocab=500):
    """n docs where each group of `copies` shares a 50-token base text
    and differs only in a per-copy marker token — near-dup-DENSE by
    construction (pairwise 3-gram Jaccard within a group ≈ 0.88 at the
    defaults), the worst realistic load for the LSH verify stage."""
    base_id = (F.col("id") - (F.col("id") % copies)) / F.lit(copies)
    body = F.transform(
        F.sequence(F.lit(1), F.lit(tokens)),
        lambda t: F.concat(
            F.lit("w"),
            (
                (F.xxhash64(base_id.cast("long"), t) % vocab + vocab) % vocab
            ).cast("string"),
        ),
    )
    text = F.concat_ws(
        " ",
        F.concat(F.lit("copy"), (F.col("id") % copies).cast("string")),
        F.concat_ws(" ", body),
    )
    df = spark.range(0, n, 1, 32).select(
        F.col("id").alias("doc_id"), text.alias("text")
    )
    df.write.mode("overwrite").parquet(path)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--vectors", type=int, default=200_000)
    ap.add_argument("--docs", type=int, default=100_000)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument(
        "--probe",
        choices=(
            "all",
            "ann",
            "decon",
            "minhash",
            "curation",
            "semdedup",
            "semdedup1m",
            "spans",
            "balance",
            "kmeansfit",
            "trim",
            "sessionize",
            "pipeline10m",
            "multimodal",
            "codecthroughput",
            "sketches",
            "pagerank",
            "bpe",
            "robots",
            "mojibake",
        ),
        default="all",
        help="which probe family to run (default: all)",
    )
    ap.add_argument(
        "--minhash-docs",
        type=int,
        default=1_000_000,
        help="corpus size for the minhash-LSH verify probe",
    )
    ap.add_argument(
        "--curation-docs",
        type=int,
        default=1_000_000,
        help="corpus size for the end-to-end curation probe",
    )
    args = ap.parse_args()

    from hive_scripts_spark.operators import dedup as D
    from hive_scripts_spark.operators import similarity as S
    from hive_scripts_spark.session import get_spark

    spark = get_spark("scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    scratch = Path(__file__).resolve().parents[1] / ".scratch" / "scale_probe"
    shutil.rmtree(scratch, ignore_errors=True)
    scratch.mkdir(parents=True)
    results = {}

    def report(name, **kv):
        results[name] = kv
        print(json.dumps({"probe": name, **kv}), flush=True)

    if args.probe in ("all", "ann"):
        _probe_ann(spark, scratch, args, S, report)
    if args.probe in ("all", "decon"):
        _probe_decon(spark, scratch, args, D, report)
    if args.probe in ("all", "minhash"):
        _probe_minhash(spark, scratch, args, D, report)
    if args.probe in ("all", "curation"):
        _probe_curation(spark, scratch, args, report)
    if args.probe in ("all", "semdedup"):
        _probe_semdedup(spark, scratch, args, S, report)
    # the two r10 probes are opt-in (1M-row scale — not part of "all")
    if args.probe == "semdedup1m":
        _probe_semdedup_1m(spark, scratch, args, S, report)
    if args.probe == "spans":
        _probe_spans(spark, scratch, args, D, report)
    if args.probe == "balance":
        _probe_balance(spark, scratch, args, S, report)
    if args.probe == "kmeansfit":
        _probe_kmeansfit(spark, scratch, args, S, report)
    if args.probe == "trim":
        _probe_trim(spark, scratch, args, report)
    if args.probe == "sessionize":
        _probe_sessionize(spark, scratch, args, report)
    if args.probe == "pipeline10m":
        _probe_pipeline10m(spark, scratch, args, report)
    if args.probe == "multimodal":
        _probe_multimodal(spark, scratch, args, report)
    if args.probe == "codecthroughput":
        _probe_codec_throughput(spark, scratch, args, report)
    if args.probe == "sketches":
        _probe_sketches(spark, scratch, args, report)
    if args.probe == "pagerank":
        _probe_pagerank(spark, scratch, args, report)
    if args.probe == "bpe":
        _probe_bpe(spark, scratch, args, report)
    if args.probe == "robots":
        _probe_robots(spark, scratch, args, report)
    if args.probe == "mojibake":
        _probe_mojibake(spark, scratch, args, report)

    print(json.dumps({"summary": results}))
    shutil.rmtree(scratch, ignore_errors=True)
    return 0


def _probe_ann(spark, scratch, args, S, report):
    # ---------------- ANN: persisted index vs recompute ----------------
    emb_path = str(scratch / "embeddings")
    gen_embeddings(spark, args.vectors, emb_path)
    emb = spark.read.parquet(emb_path)
    # model parameters mirror the registered queries' construction
    rows = emb.where(F.col("vec_id") < 16).orderBy("vec_id").collect()
    books = [
        [[float(x) for x in r["embedding"][s * 16 : (s + 1) * 16]] for r in rows[:8]]
        for s in range(4)
    ]
    queries = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]]) for r in rows[:8]
    ]
    centroids = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]]) for r in rows[:8]
    ]
    res_books = [[] for _ in range(4)]
    for r in rows[8:16]:
        v = [float(x) for x in r["embedding"]]
        best = max(((S.seq_cosine(v, c), -cid) for cid, c in centroids))
        cvec = centroids[-best[1]][1]
        resid = [a - b for a, b in zip(v, cvec)]
        for s in range(4):
            res_books[s].append(resid[s * 16 : (s + 1) * 16])

    # PQ build: encode + write stored codes
    pq_idx = str(scratch / "pq_codes")
    t0 = time.perf_counter()
    S.pq_encode(emb, books).write.mode("overwrite").parquet(pq_idx)
    report("pq_build", sec=round(time.perf_counter() - t0, 2), vectors=args.vectors)
    stored = spark.read.parquet(pq_idx)
    sec, ex = _timed(lambda: S.pq_search_codes(stored, books, queries, k=10), args.reps)
    report("pq_search_stored", sec=sec, exchanges=ex)
    sec, ex = _timed(lambda: S.pq_topk(emb, books, queries, k=10), args.reps)
    report("pq_recompute", sec=sec, exchanges=ex)

    # IVF+PQ build: encode + cell-partitioned write
    ivf_idx = str(scratch / "ivfpq_codes")
    t0 = time.perf_counter()
    S.ivfpq_encode(emb, centroids, res_books).repartition("cell").write.partitionBy(
        "cell"
    ).mode("overwrite").parquet(ivf_idx)
    report("ivfpq_build", sec=round(time.perf_counter() - t0, 2))
    stored_ivf = spark.read.parquet(ivf_idx)
    sec, ex = _timed(
        lambda: S.ivfpq_search_codes(
            stored_ivf, centroids, res_books, queries, k=5, nprobe=2
        ),
        args.reps,
    )
    report("ivfpq_search_stored", sec=sec, exchanges=ex)
    sec, ex = _timed(
        lambda: S.ivfpq_topk(emb, centroids, res_books, queries, k=5, nprobe=2),
        args.reps,
    )
    report("ivfpq_recompute", sec=sec, exchanges=ex)


def _probe_decon(spark, scratch, args, D, report):
    # ---------------- decontaminate: broadcast vs bloom crossover ------
    docs_path = str(scratch / "documents")
    gen_documents(spark, args.docs, docs_path)
    corpus = spark.read.parquet(docs_path)
    for bench_n in (1_000, 10_000, 50_000):
        bench_path = str(scratch / f"bench_{bench_n}")
        # offset ids so bench is a distinct doc set from the same vocab
        gen_documents(spark, bench_n, bench_path, start=10_000_000)
        bench = spark.read.parquet(bench_path)
        sec, ex = _timed(
            lambda: D.contamination_overlap(corpus, bench), args.reps
        )
        report(f"decon_broadcast_{bench_n}", sec=sec, exchanges=ex)
        for route in ("literal", "distributed"):
            if route == "literal" and bench_n > 10_000:
                continue  # measured scale-killer; don't burn minutes on it
            sec, ex = _timed(
                lambda: D.bloom_contamination_overlap(corpus, bench, route=route),
                args.reps,
            )
            report(f"decon_bloom_{route}_{bench_n}", sec=sec, exchanges=ex)


def _probe_minhash(spark, scratch, args, D, report):
    # ------------- minhash LSH verify stage at ~1M near-dup docs -------
    # (r8 judge item 5a): the r7 datapoint stopped at 100k docs; this
    # probes the full signature→band-bucket→exact-verify chain at 10×
    # that, on a corpus where EVERY doc is in a 4-copy near-dup group —
    # the densest realistic candidate load. The bhj/smj split of the
    # executed plan records whether AQE's broadcast verify flipped to a
    # shuffle join at this size.
    n = args.minhash_docs
    path = str(scratch / f"neardup_{n}")
    gen_neardup_documents(spark, n, path)
    docs = spark.read.parquet(path)
    sec, ex, bhj, smj = _timed_full(
        lambda: D.minhash_lsh_pairs(docs, threshold=0.5), args.reps
    )
    report("minhash_lsh_pairs_neardup", docs=n, sec=sec, exchanges=ex,
           bhj=bhj, smj=smj)
    # max_bucket_size guard on: same chain with degenerate buckets
    # dropped — the production knob for boilerplate-heavy corpora
    sec, ex, bhj, smj = _timed_full(
        lambda: D.minhash_lsh_pairs(
            docs, threshold=0.5, max_bucket_size=64
        ),
        args.reps,
    )
    report("minhash_lsh_pairs_bucketcap", docs=n, sec=sec, exchanges=ex,
           bhj=bhj, smj=smj)


def _probe_curation(spark, scratch, args, report):
    # ------------- full curation composition at ~1M docs ---------------
    # (r8 judge item 5b): x_curation_full's exact composition — exact
    # dedup → 4-gram decontamination (10k-doc disjoint bench) →
    # repetition gate → quality gate → lang-ID rollup — end-to-end.
    from hive_scripts_spark.operators.curation import (
        curate_documents,
        curation_report,
    )

    n = args.curation_docs
    corpus_path = str(scratch / f"curation_corpus_{n}")
    bench_path = str(scratch / "curation_bench")
    gen_documents(spark, n, corpus_path)
    gen_documents(spark, 10_000, bench_path, start=10_000_000)
    corpus = spark.read.parquet(corpus_path)
    bench = spark.read.parquet(bench_path)
    sec, ex, bhj, smj = _timed_full(
        lambda: curation_report(curate_documents(corpus, bench)), args.reps
    )
    report("curation_full_e2e", docs=n, bench=10_000, sec=sec,
           exchanges=ex, bhj=bhj, smj=smj)


def gen_semdedup_embeddings(spark, n, path, dim=64, n_clusters=16):
    """Twin-planted embeddings for SemDeDup probes.

    gen_embeddings' 0.1-amplitude noise makes every same-cluster pair a
    near-dup (kept=512 of 100k — a 99.5%-duplicate corpus, nothing like
    the ~5% of a real crawl and a degenerate clique workload for the
    component stage). This generator: 0.5-amplitude noise keeps
    ordinary same-cluster cosine ~0.8, and every 20th vector is a
    planted twin of its predecessor (0.01 perturbation → cosine
    ≈ 0.9999+) — ~5% true duplicate rate.
    """
    base = F.col("id") - F.when(F.col("id") % 20 == 19, 1).otherwise(0)
    # noise frequency varies PER DIM (0.137 + 0.0911·i): a single shared
    # frequency makes every pair's noise vectors phase-correlated
    # sinusoids (cosine up to 1 → accidental twins everywhere); distinct
    # frequencies decorrelate the dot product across dims
    comps = [
        (
            F.cos(F.lit(float(i) * 0.71) + (base % n_clusters) * 2.39)
            + 0.5 * F.sin(base * F.lit(0.137 + 0.0911 * i) + F.lit(float(i) * 1.93))
            + 0.01 * F.sin(F.col("id") * F.lit(0.611 + 0.0407 * i) + F.lit(float(i) * 2.17))
        ).cast("float")
        for i in range(dim)
    ]
    spark.range(0, n, 1, 32).select(
        F.col("id").alias("vec_id"), F.array(*comps).alias("embedding")
    ).write.mode("overwrite").parquet(path)


def _probe_semdedup(spark, scratch, args, S, report):
    # ------------- SemDeDup at 100k vectors, 512 cells ------------------
    # (r9): the intra-cell pair join is the scale-sensitive stage —
    # cells ≈ n/nlist, candidate volume Σ cell². 512 data-vector
    # "centroids" (no k-means needed for a probe) keep cells ~200, the
    # operating shape the PLANS row claims. Also measures the
    # embedding-decontamination argmax at the same corpus size.
    n = min(args.vectors, 100_000)
    emb_path = str(scratch / f"semdedup_emb_{n}")
    gen_semdedup_embeddings(spark, n, emb_path)
    emb = spark.read.parquet(emb_path)
    cents = emb.where(F.col("vec_id") < 512).select(
        F.col("vec_id").alias("centroid_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("centroid"),
    )
    t0 = time.perf_counter()
    survivors = S.semantic_dedup(emb, cents, threshold=0.9999)
    kept = survivors.count()
    report(
        "semantic_dedup",
        vectors=n,
        nlist=512,
        kept=kept,
        dropped=n - kept,
        sec=round(time.perf_counter() - t0, 2),
        exchanges=survivors._jdf.queryExecution()
        .executedPlan()
        .toString()
        .count("Exchange "),
    )
    bench = emb.where(F.col("vec_id") % 997 == 0).limit(100)
    sec, ex = _timed(
        lambda: S.embedding_decontaminate(emb, bench, threshold=0.9999),
        args.reps,
    )
    report("embedding_decontaminate", vectors=n, bench=100, sec=sec, exchanges=ex)


def _probe_semdedup_1m(spark, scratch, args, S, report):
    # ---------- SemDeDup at 1M vectors, nlist 2048 (r10 item 7) ---------
    # 10× the r9 probe and past the 256-literal threshold, so coarse
    # assignment takes the numpy mapInPandas route; cells average
    # ~n/nlist ≈ 500. Two runs: the default cap (65536 — never engages,
    # the pre-cap plan shape) and a forced max_cell_size=256 (every cell
    # sub-blocks into g≈2 groups → 3 tasks/cell) to price the exact
    # sub-blocking machinery against its straggler insurance.
    n = args.vectors
    nlist = 2048
    emb_path = str(scratch / f"semdedup1m_emb_{n}")
    gen_semdedup_embeddings(spark, n, emb_path)
    emb = spark.read.parquet(emb_path)
    cents = emb.where(F.col("vec_id") < nlist).select(
        F.col("vec_id").alias("centroid_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("centroid"),
    )
    for tag, cap in (("default_cap", 65536), ("forced_cap256", 256)):
        t0 = time.perf_counter()
        survivors = S.semantic_dedup(
            emb, cents, threshold=0.9999, max_cell_size=cap
        )
        kept = survivors.count()
        report(
            f"semantic_dedup_1m_{tag}",
            vectors=n,
            nlist=nlist,
            max_cell_size=cap,
            kept=kept,
            dropped=n - kept,
            sec=round(time.perf_counter() - t0, 2),
            exchanges=survivors._jdf.queryExecution()
            .executedPlan()
            .toString()
            .count("Exchange "),
        )


#: 12-token passage planted by the hot-span probe (5 hot 8-gram hashes
#: shared by every tagged doc — the straggler shape the r10 de-skew of
#: remove_repeated_spans exists to survive)
_PROBE_PASSAGE = (
    "shared boilerplate passage tokens alpha beta gamma delta "
    "epsilon zeta eta theta"
)


def _probe_spans(spark, scratch, args, D, report):
    # -------- ExactSubstr repeated-span removal (r10 item 7) ------------
    # Clean corpus: unique per-doc token streams (dup spans are hash
    # accidents only) — prices the groupBy-min keeper election + 1:1
    # join at full occ volume (~docs × (tokens-7) span rows). Hot
    # corpus: every 10th doc carries the same 12-token passage → 5 span
    # hashes with docs/10 occurrences EACH. Pre-r10 this was a single
    # row_number straggler partition; the de-skewed election partial-
    # aggregates it map-side and the 1:1 probe join AQE-splits.
    n = args.docs
    path = str(scratch / f"spans_docs_{n}")
    gen_documents(spark, n, path)
    docs = spark.read.parquet(path)
    sec, ex = _timed(lambda: D.remove_repeated_spans(docs, k=8), args.reps)
    report("repeated_spans_clean", docs=n, sec=round(sec, 2), exchanges=ex)
    hot = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 10 == 0,
            F.concat_ws(" ", F.col("text"), F.lit(_PROBE_PASSAGE)),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    sec, ex = _timed(lambda: D.remove_repeated_spans(hot, k=8), args.reps)
    report(
        "repeated_spans_hot10pct",
        docs=n,
        hot_occurrences=n // 10,
        sec=round(sec, 2),
        exchanges=ex,
    )


def _probe_balance(spark, scratch, args, S, report):
    # ----- cluster-balanced sampling at --vectors, nlist 2048 (r10) -----
    # Normal shape: cells ≈ n/nlist; the pick's level-1 window rides
    # (cell, salt). Hot shape: ONE centroid — every vector lands in one
    # cell, the exact straggler the salting insures against — measured
    # salted vs the naive single-window form (same results, pinned by
    # tests; here we price the physical difference).
    from pyspark.sql.window import Window

    n = args.vectors
    nlist = 2048
    emb_path = str(scratch / f"balance_emb_{n}")
    gen_semdedup_embeddings(spark, n, emb_path)
    emb = spark.read.parquet(emb_path)
    cents = emb.where(F.col("vec_id") < nlist).select(
        F.col("vec_id").alias("centroid_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("centroid"),
    )
    sec, ex = _timed(
        lambda: S.cluster_balanced_sample(emb, cents, cap_per_cell=100),
        args.reps,
    )
    report("cluster_balanced_sample", vectors=n, nlist=nlist, cap=100,
           sec=sec, exchanges=ex)

    cents1 = cents.where(F.col("centroid_id") < 1)
    sec, ex = _timed(
        lambda: S.cluster_balanced_sample(emb, cents1, cap_per_cell=100),
        args.reps,
    )
    report("cluster_balanced_sample_hot", vectors=n, nlist=1, cap=100,
           sec=sec, exchanges=ex)

    def naive():
        assigned = S.ivf_assign(emb, cents1)
        w = Window.partitionBy("centroid_id").orderBy(
            F.md5(F.col("vec_id").cast("string")), F.col("vec_id")
        )
        return assigned.withColumn(
            "pick_order", F.row_number().over(w)
        ).where(F.col("pick_order") <= 100)

    sec, ex = _timed(naive, args.reps)
    report("cluster_balanced_sample_hot_naive_window", vectors=n, nlist=1,
           cap=100, sec=sec, exchanges=ex)


def _probe_kmeansfit(spark, scratch, args, S, report):
    # ---- distributed Lloyd at --vectors, k 256 (r10 new trainer) ----
    # Per-iteration cost is ONE map-only corpus pass (assign + partial
    # sums) + a (partitions x k)-row combine + a k-row collect; what
    # this probe pins is that per-iteration wall time is flat across
    # iterations (no state accumulates) and the end-to-end fit is
    # ~iters x one-pass, i.e. the bounded-collect design holds at 1M.
    import time as _t

    n = args.vectors
    k = 256
    emb_path = str(scratch / f"kmeansfit_emb_{n}")
    gen_semdedup_embeddings(spark, n, emb_path)
    emb = spark.read.parquet(emb_path)
    for iters in (1, 3):
        t0 = _t.perf_counter()
        cents = S.kmeans_fit(emb, k=k, iters=iters)
        n_cents = cents.count()
        report(
            f"kmeans_fit_iters{iters}",
            vectors=n,
            k=k,
            iters=iters,
            centroids=n_cents,
            sec=round(_t.perf_counter() - t0, 2),
        )


def _shuffle_totals(spark):
    """Cumulative (write, read) shuffle bytes across all completed
    stages, from the live AppStatusStore — snapshot before/after a
    stage and diff to get that stage's shuffle volume. (The executed-
    plan SQLMetrics read zero under AQE stage reuse, so the UI store
    is the reliable source.)"""
    store = spark.sparkContext._jsc.sc().statusStore()
    empty = spark.sparkContext._jvm.java.util.ArrayList()
    ds = [getattr(store, f"stageList$default${i}")() for i in (2, 3, 4, 5)]
    stages = store.stageList(empty, *ds)
    w = sum(stages.apply(i).shuffleWriteBytes() for i in range(stages.size()))
    r = sum(stages.apply(i).shuffleReadBytes() for i in range(stages.size()))
    return w, r


#: alphabetic vocab for the pipeline probe: gen_documents' "w123"
#: tokens fail the alpha-ratio quality gate (1 letter in 4 chars), so
#: every doc died at the gates stage and the downstream measurements
#: were vacuous. Mixed EN/DE/ES stopwords + filler words keep most
#: docs alive through the gates AND give language-ID real variety.
_PIPE_VOCAB = (
    "the and is of to in a it that was for on are with they be at one "
    "have this from or had by word but not what all were when your can "
    "said der die und ist nicht ein das el la que los en y de les un "
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
    "kilo lima mike november oscar papa quebec romeo sierra tango "
    "uniform victor whiskey xray yankee zulu apple river stone cloud "
    "light water mountain forest window garden market bridge castle"
).split()


def gen_alpha_documents(spark, n, path, tokens=50, start=0):
    """n docs of alphabetic tokens drawn deterministically from
    _PIPE_VOCAB — same hash scheme as gen_documents, but every token
    survives the alpha-ratio gate."""
    vocab = F.array(*[F.lit(w) for w in _PIPE_VOCAB])
    text = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), F.lit(tokens)),
            lambda t: F.element_at(
                vocab,
                (
                    F.pmod(
                        F.xxhash64(F.col("id") * tokens + t),
                        F.lit(len(_PIPE_VOCAB)),
                    )
                    + 1
                ).cast("int"),
            ),
        ),
    )
    df = spark.range(start, start + n, 1, 32).select(
        F.col("id").alias("doc_id"), text.alias("text")
    )
    df.write.mode("overwrite").parquet(path)


def _probe_pipeline10m(spark, scratch, args, report):
    # ---- whole-pipeline probe at --docs (VERDICT r11 item 6) -----------
    # The full curate -> export chain (exact dedup -> 4-gram decon ->
    # repetition gate -> quality gate + lang-ID -> split/shard/pack ->
    # partitioned write), measured BOTH stage-isolated (each stage
    # reads the previous stage's parquet — per-stage wall + shuffle
    # bytes) AND fused end-to-end (the production plan). Stage bodies
    # call the same operator functions cmd_export does.
    import time as _t

    from pyspark.sql import Window

    from hive_scripts_spark.functions.canonical import (
        shard_by_hash,
        train_val_test_split,
    )
    from hive_scripts_spark.functions.strings import normalize_whitespace
    from hive_scripts_spark.operators import dedup as D
    from hive_scripts_spark.operators import textstats as X
    from hive_scripts_spark.operators.curation import curate_documents

    n = args.docs
    corpus_path = str(scratch / f"pipe_corpus_{n}")
    bench_path = str(scratch / "pipe_bench")
    gen_alpha_documents(spark, n, corpus_path)
    gen_alpha_documents(spark, 10_000, bench_path, start=100_000_000)
    bench = spark.read.parquet(bench_path)

    def staged(name, build, out):
        w0, r0 = _shuffle_totals(spark)
        t0 = _t.perf_counter()
        df = build()
        df.write.mode("overwrite").parquet(out)
        dt = _t.perf_counter() - t0
        w1, r1 = _shuffle_totals(spark)
        rows = spark.read.parquet(out).count()
        report(
            f"pipe10m_{name}",
            sec=round(dt, 2),
            rows=rows,
            shuffle_write_mb=round((w1 - w0) / 1e6, 1),
            shuffle_read_mb=round((r1 - r0) / 1e6, 1),
        )
        return out

    # s1: exact dedup (the curate_documents stage-1 expression)
    docs = spark.read.parquet(corpus_path)
    p1 = staged(
        "dedup",
        lambda: (
            docs.select(
                "doc_id", "text",
                F.md5(normalize_whitespace("text")).alias("__h"),
            )
            .groupBy("__h")
            .agg(F.min_by(F.struct("doc_id", "text"), "doc_id").alias("__r"))
            .select(
                F.col("__r.doc_id").alias("doc_id"),
                F.col("__r.text").alias("text"),
            )
        ),
        str(scratch / "pipe_s1"),
    )
    # s2: benchmark decontamination (broadcast gram anti-join)
    s1 = spark.read.parquet(p1)
    p2 = staged(
        "decon",
        lambda: s1.join(
            F.broadcast(
                D.contamination_overlap(s1, bench, n=4).select("doc_id")
            ),
            "doc_id",
            "left_anti",
        ),
        str(scratch / "pipe_s2"),
    )
    # s3: repetition + quality gates (map-only)
    s2 = spark.read.parquet(p2)
    alpha = F.length(F.regexp_replace("text", "[^A-Za-z]", "")).cast(
        "double"
    ) / F.greatest(F.length("text"), F.lit(1))
    p3 = staged(
        "gates",
        lambda: (
            X.repetition_signals(s2, keep_cols=["text"])
            .where(F.col("dup_gram_frac") <= 0.10)
            .select(
                "doc_id", "text",
                X.tokens("text").alias("__t"), alpha.alias("__alpha"),
            )
            .where((F.col("__alpha") >= 0.5) & (F.size("__t") >= 10))
            .select("doc_id", "text", F.size("__t").alias("n_tokens"))
        ),
        str(scratch / "pipe_s3"),
    )
    # s4: language-ID (map-only argmax over stopword hits)
    s3 = spark.read.parquet(p3)
    p4 = staged(
        "langid",
        lambda: X.language_id(s3, keep_cols=["n_tokens", "text"]).select(
            "doc_id", "text", "n_tokens", "predicted_lang"
        ),
        str(scratch / "pipe_s4"),
    )
    # s5: split + shard + token-budget pack + Hive-partitioned write
    # (cmd_export's exact expressions; the window rides (split, shard))
    s4 = spark.read.parquet(p4)
    part_cols = ["split", "shard"]

    def pack():
        cur = train_val_test_split(s4, ["doc_id"], val_pct=5, test_pct=5)
        sharded = shard_by_hash(cur, ["doc_id"], n_shards=16)
        w = (
            Window.partitionBy(*part_cols)
            .orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        offset = F.sum("n_tokens").over(w) - F.col("n_tokens")
        return sharded.withColumn(
            "pack_id", F.floor(offset / 4096.0).cast("bigint")
        )

    w0, r0 = _shuffle_totals(spark)
    t0 = _t.perf_counter()
    pack().write.mode("overwrite").partitionBy(*part_cols).parquet(
        str(scratch / "pipe_s5")
    )
    dt = _t.perf_counter() - t0
    w1, r1 = _shuffle_totals(spark)
    report(
        "pipe10m_pack_shard_write",
        sec=round(dt, 2),
        shuffle_write_mb=round((w1 - w0) / 1e6, 1),
        shuffle_read_mb=round((r1 - r0) / 1e6, 1),
    )
    # fused end-to-end (no inter-stage materialization): the plan the
    # production `export` command actually runs
    w0, r0 = _shuffle_totals(spark)
    t0 = _t.perf_counter()
    curated = curate_documents(docs, bench)
    cur = train_val_test_split(curated, ["doc_id"], val_pct=5, test_pct=5)
    sharded = shard_by_hash(cur, ["doc_id"], n_shards=16)
    w = (
        Window.partitionBy(*part_cols)
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = sharded.withColumn(
        "pack_id",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / 4096.0)
        .cast("bigint"),
    )
    packed.write.mode("overwrite").partitionBy(*part_cols).parquet(
        str(scratch / "pipe_fused")
    )
    dt = _t.perf_counter() - t0
    w1, r1 = _shuffle_totals(spark)
    report(
        "pipe10m_fused_e2e",
        docs=n,
        sec=round(dt, 2),
        shuffle_write_mb=round((w1 - w0) / 1e6, 1),
        shuffle_read_mb=round((r1 - r0) / 1e6, 1),
    )


def _probe_trim(spark, scratch, args, report):
    # ---- group_cap / rank_trim hot-group posture (VERDICT r11 item 3) --
    # Clean corpus: 200 uniform groups. Hot corpus: ONE group holds 50%
    # of all rows — the straggler shape the r12 retrofit (salted two-
    # level top-k for group_cap, range-bucketed exact ranks for
    # rank_trim) is supposed to absorb: hot must price ≤ clean, where
    # the old single-window form made the hot group one sorting task.
    from hive_scripts_spark.functions.canonical import group_cap, rank_trim

    n = args.docs
    base = spark.range(0, n, 1, 32).select(
        F.col("id"),
        F.pmod(F.xxhash64(F.col("id") + 7), F.lit(10_000))
        .cast("int")
        .alias("val"),
    )
    clean_path = str(scratch / f"trim_clean_{n}")
    hot_path = str(scratch / f"trim_hot_{n}")
    base.withColumn(
        "grp", F.pmod(F.col("id"), F.lit(200)).cast("int")
    ).write.mode("overwrite").parquet(clean_path)
    base.withColumn(
        "grp",
        F.when(F.col("id") < n // 2, F.lit(0))
        .otherwise(F.pmod(F.col("id"), F.lit(200)))
        .cast("int"),
    ).write.mode("overwrite").parquet(hot_path)
    for label, path in (("clean", clean_path), ("hot50pct", hot_path)):
        df = spark.read.parquet(path)
        sec, ex = _timed(
            lambda d=df: group_cap(d, ["grp"], n=20, order_key="id"),
            args.reps,
        )
        report(f"group_cap_{label}", rows=n, sec=round(sec, 2), exchanges=ex)
        sec, ex = _timed(
            lambda d=df: rank_trim(
                d, ["grp"], "val", order_key="id", lo_pct=1, hi_pct=99
            ),
            args.reps,
        )
        report(f"rank_trim_{label}", rows=n, sec=round(sec, 2), exchanges=ex)


def _probe_sessionize(spark, scratch, args, report):
    # ---- sessionize hot-user posture (VERDICT r11 item 4) --------------
    # The user_id window (lag + running sum) is the one data-path window
    # on an unbounded external key. Clean: 10k uniform users. Hot: ONE
    # user owns 30% of all events — its whole stream lands in a single
    # window partition (windows get no AQE skew split). This probe
    # prices that task: the Done bar is hot ≤ ~1.5× clean.
    from pyspark.sql.window import Window

    n = args.docs
    base = spark.range(0, n, 1, 32).select(
        F.col("id").alias("event_id"),
        F.timestamp_micros(
            F.lit(1_700_000_000_000_000)
            + F.pmod(F.xxhash64(F.col("id")), F.lit(86_400_000))
            * 1_000_000
        ).alias("ts"),
    )
    clean_path = str(scratch / f"sess_clean_{n}")
    hot_path = str(scratch / f"sess_hot_{n}")
    base.withColumn(
        "user_id", F.pmod(F.col("event_id"), F.lit(10_000))
    ).write.mode("overwrite").parquet(clean_path)
    base.withColumn(
        "user_id",
        F.when(F.col("event_id") % 10 < 3, F.lit(0)).otherwise(
            F.pmod(F.col("event_id"), F.lit(10_000))
        ),
    ).write.mode("overwrite").parquet(hot_path)

    def sessionized(ev):
        # the exact x_events_sessionize window chain (30-min gap)
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        marked = ev.withColumn(
            "new_session",
            F.when(
                F.lag("ts").over(w).isNull()
                | (
                    F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
                    > 1800 * 1_000_000
                ),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        w2 = (
            Window.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return (
            marked.withColumn("session_id", F.sum("new_session").over(w2))
            .groupBy("user_id", "session_id")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.min("ts").alias("session_start"),
                F.max("ts").alias("session_end"),
            )
        )

    for label, path in (("clean", clean_path), ("hot30pct", hot_path)):
        ev = spark.read.parquet(path)
        sec, ex = _timed(lambda e=ev: sessionized(e), args.reps)
        report(
            f"sessionize_{label}", events=n, sec=round(sec, 2), exchanges=ex
        )
    # r13: the chunk-and-stitch escalation (operators/sessions.py) on
    # the same hot shape — prices the knob a ~100M-event bot user
    # would need (events span 24h, so chunk_hours=1 splits the hot
    # user's window ~24 ways)
    from hive_scripts_spark.operators.sessions import sessionize_events

    for label, path in (("clean", clean_path), ("hot30pct", hot_path)):
        ev = spark.read.parquet(path)
        sec, ex = _timed(
            lambda e=ev: sessionize_events(e, chunk_hours=1), args.reps
        )
        report(
            f"sessionize_chunked_{label}",
            events=n,
            sec=round(sec, 2),
            exchanges=ex,
        )


def _gen_multimodal_corpus(spark, n, path):
    """n mixed-format payload rows: doc_id % 5 picks the container
    (JPEG / PNG / GIF / WAV / AVI), (doc_id // 5) % 4 the variant.
    Payload bytes come from the repo's own test encoders (fixed seeds
    — deterministic), wired in as plan literals; the per-row DECODE
    cost downstream is real regardless of byte reuse because
    mapInPandas decodes every row."""
    import numpy as np

    from tests.jpeg_codec import encode_gray
    from tests.test_multimodal import _avi, _gif, _png

    rng = np.random.RandomState(20260815)
    jpegs = [encode_gray(np.full((8, 8), g, np.uint8)) for g in (16, 64, 100, 126)]
    pngs = []
    pal = [(int(r), int(g), int(b)) for r, g, b in rng.randint(0, 256, (4, 3))]
    for k in range(4):
        px = rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)
        if k == 2:  # one 2-bit palette variant
            pngs.append(
                _png(rng.randint(0, 4, (16, 16)).astype(np.uint8),
                     color_type=3, bitd=2, palette=pal)
            )
        elif k == 3:  # one Adam7 grayscale variant
            pngs.append(
                _png(px[..., :1], filters=[0, 1, 2, 3] * 4,
                     color_type=0, interlace=1)
            )
        else:
            pngs.append(_png(px, filters=[0, 1, 2, 3] * 4))
    gifs = [
        _gif(rng.randint(0, 4, (12, 12)), pal) for _ in range(4)
    ]
    wav_head = bytes.fromhex(
        "524946466400000057415645666d7420100000000100010040"
        "1f0000401f0000010008006461746140000000"
    )
    wavs = [wav_head + bytes(rng.randint(0, 256, 64, dtype=np.uint8).tolist())
            for _ in range(4)]
    avis = [_avi([jpegs[k], jpegs[(k + 1) % 4], jpegs[(k + 2) % 4]])
            for k in range(4)]

    def pick(variants):
        v = F.pmod(F.floor(F.col("id") / 5), F.lit(4)).cast("int")
        return (
            F.when(v == 1, F.lit(variants[1]))
            .when(v == 2, F.lit(variants[2]))
            .when(v == 3, F.lit(variants[3]))
            .otherwise(F.lit(variants[0]))
        )

    fmt = F.pmod(F.col("id"), F.lit(5)).cast("int")
    spark.range(0, n, 1, 64).select(
        F.col("id").alias("doc_id"),
        fmt.alias("fmt"),
        F.when(fmt == 0, pick(jpegs))
        .when(fmt == 1, pick(pngs))
        .when(fmt == 2, pick(gifs))
        .when(fmt == 3, pick(wavs))
        .otherwise(pick(avis))
        .alias("payload"),
    ).write.mode("overwrite").parquet(path)


def _probe_multimodal(spark, scratch, args, report):
    # ---- codec-layer scale record (VERDICT r12 item 5) -----------------
    # The 10M text probe grounded the curation chain; this prices the
    # r12/r13 codec layer over ~args.docs mixed framed payloads:
    # meta (header walk, all formats), resize (full pixel decode,
    # image rows), audio (WAV chunk walk + sample decode), frames
    # (AVI movi walk, 3 frames/clip), fingerprint (the ONLY shuffle:
    # groupBy frame/image md5). Each stage runs at n/10 and n — a
    # stage whose cost grows >2x faster than rows signals a per-batch
    # or driver-side bottleneck, not map-parallel decode.
    from hive_scripts_spark.operators import multimodal as M

    n = args.docs
    for scale in (n // 10, n):
        path = str(scratch / f"mm_corpus_{scale}")
        _gen_multimodal_corpus(spark, scale, path)
        corpus = spark.read.parquet(path)
        images = corpus.where(F.col("fmt") < 3).select("doc_id", "payload")
        wavs = corpus.where(F.col("fmt") == 3).select("doc_id", "payload")
        clips = corpus.where(F.col("fmt") == 4).select("doc_id", "payload")

        stages = {
            "meta": lambda c=corpus: M.decode_image_meta(
                c.select("doc_id", "payload"), fake=False
            ),
            "resize": lambda i=images: M.resize_images(
                i, target=(8, 8), fake=False
            ),
            "audio": lambda a=wavs: M.audio_features(a, fake=False),
            "frames": lambda v=clips: M.extract_frames(v, every_n=2),
            "fingerprint": lambda i=images, v=clips: (
                M.resize_images(i, target=(8, 8), fake=False)
                .select(F.col("resized_md5").alias("h"))
                .unionAll(
                    M.extract_frames(v, every_n=2).select(
                        F.col("frame_md5").alias("h")
                    )
                )
                .groupBy("h")
                .agg(F.count(F.lit(1)).alias("n"))
            ),
        }
        for name, build in stages.items():
            w0, r0 = _shuffle_totals(spark)
            sec, ex = _timed(build, args.reps)
            w1, r1 = _shuffle_totals(spark)
            report(
                f"multimodal_{name}_{scale}",
                rows=scale,
                sec=round(sec, 2),
                exchanges=ex,
                shuffle_write_mb=round((w1 - w0) / 1e6, 1),
                shuffle_read_mb=round((r1 - r0) / 1e6, 1),
            )


def _probe_codec_throughput(spark, scratch, args, report):
    # ---- realistic-payload decode throughput (r13 follow-up to the
    # 1M tiny-payload probe, where fixed batch overhead dominates):
    # 256x256 JPEG / PNG and 64x64 GIF payloads, replicated executor-
    # side (explode(sequence)), full pixel decode timed as images/s
    # and decoded-MB/s. JPEG/PNG decode is batched numpy; GIF LZW is
    # the sequential-Python path — this probe prices all three.
    import numpy as np

    from tests.jpeg_codec import encode_gray
    from tests.test_multimodal import _gif, _png

    from tests.jpeg_codec import encode_progressive, fdct_quantize

    rng = np.random.RandomState(20260815)
    yy, xx = np.mgrid[0:256, 0:256]
    jpegs = []
    progs = []
    for k in range(8):
        # band-limited texture: realistic entropy-coded size (pure
        # noise would be the pathological max-entropy case)
        img = (
            128
            + 60 * np.sin(xx / (3 + k) + k)
            + 50 * np.cos(yy / (5 + k))
            + rng.randint(-24, 25, (256, 256))
        ).clip(0, 255).astype(np.uint8)
        jpegs.append(encode_gray(img))
        if k < 4:
            progs.append(
                encode_progressive(
                    256, 256, [(1, 1, 1, fdct_quantize(img))]
                )
            )
    pngs = [
        _png(rng.randint(0, 256, (256, 256, 3)).astype(np.uint8),
             filters=[4] * 256)
        for _ in range(4)
    ]
    gifs = [
        _gif(rng.randint(0, 16, (64, 64)),
             [tuple(int(v) for v in c) for c in rng.randint(0, 256, (16, 3))])
        for _ in range(4)
    ]
    plans = (
        ("jpeg", jpegs, 20_000),
        ("jpeg_progressive", progs, 10_000),
        ("png", pngs, 5_000),
        ("gif", gifs, 5_000),
    )
    from hive_scripts_spark.operators import multimodal as M

    for fmt, payloads, n in plans:
        k = len(payloads)
        base = spark.createDataFrame(
            [(i, p) for i, p in enumerate(payloads)],
            "vid long, payload binary",
        )
        path = str(scratch / f"codec_{fmt}")
        base.select(
            "vid",
            F.explode(F.sequence(F.lit(1), F.lit(n // k))).alias("c"),
            "payload",
        ).select(
            (F.col("vid") * (n // k) + F.col("c")).alias("doc_id"),
            "payload",
        ).repartition(64).write.mode("overwrite").parquet(path)
        corpus = spark.read.parquet(path)
        mb = sum(len(p) for p in payloads) / k * n / 1e6
        sec, ex = _timed(
            lambda c=corpus: M.resize_images(c, target=(8, 8), fake=False),
            args.reps,
        )
        report(
            f"codec_throughput_{fmt}",
            images=n,
            payload_kb=round(sum(len(p) for p in payloads) / k / 1000, 1),
            sec=sec,
            images_per_s=round(n / sec),
            mb_per_s=round(mb / sec, 1),
            exchanges=ex,
        )


def _probe_sketches(spark, scratch, args, report):
    # ---- mergeable sketches vs exact distinct at scale (r14) --------
    # args.docs rows (10M default shape), ~docs/10 distinct string
    # keys, 32 partitions. Claims to verify: kmv_sketch's exchange
    # carries only partitions×k survivors (the exact-distinct plan
    # shuffles every distinct key), build cost stays scan-bound, and
    # the estimate lands inside the ~1/sqrt(k-2) band.
    from hive_scripts_spark.operators import sketches as SK

    n = args.docs
    n_keys = max(1, n // 10)
    path = str(scratch / f"sketch_{n}")
    spark.range(0, n, 1, 32).select(
        F.concat(
            F.lit("u"), F.pmod(F.xxhash64("id"), F.lit(n_keys))
        ).alias("k"),
        F.pmod(F.col("id"), F.lit(8)).cast("int").alias("g"),
    ).write.mode("overwrite").parquet(path)
    df = spark.read.parquet(path)
    true_distinct = df.select("k").distinct().count()

    sec, ex = _timed(
        lambda: df.select(F.countDistinct("k").alias("d")), args.reps
    )
    report("exact_count_distinct", rows=n, sec=sec, exchanges=ex,
           true_distinct=true_distinct)

    sec, ex = _timed(lambda: SK.kmv_sketch(df, ["k"], k=256), args.reps)
    est = SK.kmv_estimate(
        SK.kmv_sketch(df, ["k"], k=256), k=256
    ).collect()[0]["est_distinct"]
    report(
        "kmv_sketch_k256", rows=n, sec=sec, exchanges=ex, est=est,
        rel_err=round(abs(est - true_distinct) / true_distinct, 4),
    )

    sec, ex = _timed(
        lambda: SK.kmv_sketch_grouped(df, ["g"], ["k"], k=256), args.reps
    )
    report("kmv_grouped_8groups_k256", rows=n, sec=sec, exchanges=ex)

    sec, ex = _timed(
        lambda: SK.countmin_build(df, "k", depth=4, width=4096), args.reps
    )
    report("countmin_4x4096", rows=n, sec=sec, exchanges=ex)


def _probe_pagerank(spark, scratch, args, report):
    # ---- iterative link-graph scaling (r14) -------------------------
    # args.docs edges over docs/10 nodes with a power-law-ish hub (node
    # 0 receives 10% of all edges — the real crawl-graph shape). The
    # claims: per-iteration cost is flat (the lineage truncation works),
    # total time is linear in edges, and the hot dst key (a 10%-mass
    # hub under the inflow groupBy) is absorbed by map-side partial agg.
    from hive_scripts_spark.operators.graph import (
        pagerank,
        pagerank_portable,
    )

    n_edges = args.docs
    n_nodes = max(2, n_edges // 10)
    path = str(scratch / f"pr_{n_edges}")
    spark.range(0, n_edges, 1, 32).select(
        F.pmod(F.xxhash64("id"), F.lit(n_nodes)).alias("src"),
        F.when(
            F.col("id") % 10 == 0, F.lit(0)  # hub: 10% of edges land on 0
        ).otherwise(F.pmod(F.xxhash64("id") + 7, F.lit(n_nodes))).alias("dst"),
    ).write.mode("overwrite").parquet(path)
    edges = spark.read.parquet(path)

    def timed_inclusive(build):
        # _timed() starts its clock AFTER df_builder() returns, but
        # pagerank's localCheckpoint is EAGER — most of the compute
        # happens during construction, so time the whole thing (with
        # the same steal telemetry every other probe carries)
        best, best_steal = None, None
        for _ in range(max(1, args.reps)):
            steal0 = _steal_ticks()
            t0 = time.perf_counter()
            _noop(build())
            dt = time.perf_counter() - t0
            steal = (_steal_ticks() - steal0) / _CLK_TCK
            if best is None or dt < best:
                best, best_steal = dt, steal
        print(json.dumps({"telemetry": "best_rep_steal_s",
                          "value": round(best_steal, 2)}), flush=True)
        return round(best, 2)

    for label, iters in (("5it", 5), ("10it", 10)):
        sec = timed_inclusive(
            lambda i=iters: pagerank_portable(edges, iterations=i)
        )
        report(
            f"pagerank_portable_{label}", edges=n_edges, nodes=n_nodes,
            sec=sec,
        )
    sec = timed_inclusive(lambda: pagerank(edges, iterations=5))
    report("pagerank_double_5it", edges=n_edges, nodes=n_nodes, sec=sec)


def _probe_bpe(spark, scratch, args, report):
    # ---- real-BPE apply throughput (r14) ----------------------------
    # args.docs synthetic docs × 50 tokens from a 500-word vocab (the
    # word-memo best case is Zipf reality; this uniform vocab is its
    # WORST case — real corpora re-encode fewer distinct words).
    from hive_scripts_spark.operators import tokenizer as T

    n = args.docs
    path = str(scratch / f"bpe_{n}")
    gen_documents(spark, n, path)
    docs = spark.read.parquet(path)
    t0 = time.perf_counter()
    merges = T.train_bpe(docs, num_merges=200, max_words=50_000)
    train_s = round(time.perf_counter() - t0, 2)
    report("bpe_train_200", docs=n, sec=train_s)
    sec, ex = _timed(lambda: T.bpe_encode(docs, merges), args.reps)
    tokens = T.bpe_encode(docs, merges).agg(F.sum("n_tokens")).collect()[0][0]
    report(
        "bpe_apply", docs=n, sec=sec, exchanges=ex,
        tokens=int(tokens), docs_per_s=round(n / sec),
        tokens_per_s=round(tokens / sec),
    )


def _probe_mojibake(spark, scratch, args, report):
    # ---- mojibake repair throughput (r15) ---------------------------
    # args.docs ~300-char docs, every 10th mangled (utf8 read as
    # latin-1): the fast path is a regex scan, the slow path two full
    # codec round-trips; 10% dirty is a realistic crawl mix.
    from hive_scripts_spark.operators.encoding import fix_mojibake

    n = args.docs
    clean = "The quick brown fox — naïve café résumé. " * 7
    mangled = clean.encode("utf-8").decode("latin-1")
    path = str(scratch / f"moji_{n}")
    spark.range(n).select(
        F.when(F.col("id") % 10 == 0, F.lit(mangled))
        .otherwise(F.lit(clean))
        .alias("text")
    ).write.mode("overwrite").parquet(path)
    docs = spark.read.parquet(path)
    sec, ex = _timed(
        lambda: fix_mojibake(docs, "text", flag_col="was_mojibake"),
        args.reps,
    )
    fixed = (
        fix_mojibake(docs, "text", flag_col="was_mojibake")
        .where(F.col("was_mojibake"))
        .count()
    )
    report(
        "mojibake_fix", docs=n, sec=sec, exchanges=ex, fixed=fixed,
        docs_per_s=round(n / sec),
    )


def _probe_robots(spark, scratch, args, report):
    # ---- robots.txt gate throughput (r15) ---------------------------
    # args.docs URLs spread over 10k hosts, 8 rules/host (wildcards,
    # an anchor, an allow-override — the shapes real files use); the
    # decision is one broadcast host join + a LIKE fold per row.
    from hive_scripts_spark.operators import robots as R

    n, hosts = args.docs, 10_000
    payload = (
        "User-agent: probe\nDisallow: /blocked/\n"
        "User-agent: *\n"
        "Disallow: /private/\nAllow: /private/public\n"
        "Disallow: /*.pdf$\nDisallow: /tmp*\nAllow: /tmp/keep\n"
        "Disallow: /search?\nAllow: /search?safe=1\n"
    )
    robots_src = spark.range(hosts).select(
        F.concat(F.lit("h"), F.col("id"), F.lit(".example")).alias("host"),
        F.lit(payload).alias("payload"),
    )
    t0 = time.perf_counter()
    rules_path = str(scratch / "robots_rules")
    R.robots_rules(robots_src).write.mode("overwrite").parquet(rules_path)
    build_s = round(time.perf_counter() - t0, 2)
    rules = spark.read.parquet(rules_path)
    report("robots_rules_build", hosts=hosts, sec=build_s)

    seg = F.element_at(
        F.array(
            F.lit("/private/a"), F.lit("/private/public/x"),
            F.lit("/doc.pdf"), F.lit("/doc.pdf?dl=1"), F.lit("/tmp/x"),
            F.lit("/tmp/keep/y"), F.lit("/search?q=z"), F.lit("/open/page"),
        ),
        (F.col("id") % 8 + 1).cast("int"),
    )
    docs_path = str(scratch / f"robots_docs_{n}")
    spark.range(n).select(
        F.concat(
            F.lit("https://h"), (F.col("id") % hosts), F.lit(".example"), seg
        ).alias("url")
    ).write.mode("overwrite").parquet(docs_path)
    docs = spark.read.parquet(docs_path)
    sec, ex = _timed(lambda: R.apply_robots(docs, rules), args.reps)
    blocked = (
        R.apply_robots(docs, rules)
        .where(~F.col("robots_allowed"))
        .count()
    )
    report(
        "robots_apply", docs=n, hosts=hosts, sec=sec, exchanges=ex,
        blocked=blocked, docs_per_s=round(n / sec),
    )


if __name__ == "__main__":
    raise SystemExit(main())
