"""Scale check: replicate the documents corpus N× (fresh ids, perturbed
texts) and run the heavy operators, recording wall time vs corpus size.

This is the 100×-scale-up sanity the small-SF bench cannot give:
  * does candidate volume grow like the banding model predicts?
  * does anything collect/OOM on the driver?
  * is the growth in wall time ~linear in rows (for signatures) and
    ~linear in candidate pairs (for dedup)?

Run: python3 scripts/scale_check.py [replication ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    from lsh_spark.operators.similarity_join import (
        lsh_dedup_clusters,
        lsh_dedup_keep_first,
    )
    from lsh_spark.plans import get_spark
    from lsh_spark.sources.io import load_table

    reps = [int(a) for a in sys.argv[1:]] or [1, 5, 20]
    spark = get_spark(app_name="lsh_spark-scale-check")
    spark.sparkContext.setLogLevel("ERROR")
    base = load_table(spark, "/root/testdata/sf0.1", "documents")
    n_base = base.count()

    for rep in reps:
        # fresh ids per replica; perturb text per replica so replicas are
        # near-dups (suffix changes a few trailing shingles), exercising
        # the verification path rather than pure exact-dup collapse
        docs = (
            base.crossJoin(
                spark.range(rep).select(F.col("id").alias("__rep")))
            .select(
                (F.col("doc_id") * rep + F.col("__rep")).alias("doc_id"),
                F.concat(
                    F.col("text"), F.lit(" tail"),
                    F.col("__rep").cast("string")).alias("text"),
            )
        )
        n = n_base * rep
        t0 = time.perf_counter()
        # 1) signature pass
        from lsh_spark.functions.lsh import lsh_min_bands_long

        n_sig = docs.select(
            lsh_min_bands_long(F.col("text"), 3, 6, 6, 123).alias("b")
        ).where(F.size("b") == 6).count()
        t_sig = time.perf_counter() - t0

        # 2) pair-free cluster dedup (the 100 TB path — scales with rows,
        # not with within-cluster pair counts)
        t0 = time.perf_counter()
        clusters = lsh_dedup_clusters(
            docs, "text", id_col="doc_id", ngram_width=3, band_count=6,
            band_size=6, seed=123)
        n_reps = clusters.where("is_representative").count()
        t_cc = time.perf_counter() - t0

        # 3) verified keep-first dedup — output-bound (within-cluster pairs
        # grow quadratically with replication), so only at small reps
        t_dedup, n_kept = float("nan"), -1
        if rep <= 5:
            t0 = time.perf_counter()
            kept = lsh_dedup_keep_first(
                docs, "text", id_col="doc_id", ngram_width=3, band_count=6,
                band_size=6, seed=123, threshold=0.8,
                broadcast_sets=(n <= 200_000))
            n_kept = kept.count()
            t_dedup = time.perf_counter() - t0
        print(
            f"rep={rep:3d} rows={n:8d}  signatures={t_sig:7.1f}s "
            f"({n_sig} ok)  cluster_cc={t_cc:7.1f}s ({n_reps} reps)  "
            f"keep_first={t_dedup:7.1f}s (kept {n_kept})",
            flush=True)
        spark.catalog.clearCache()
    spark.stop()




def vectors() -> None:
    """Vector-family scale check: replicate embeddings N× (fresh ids,
    small deterministic perturbation via id-seeded linear shift) and run
    cell-blocked semantic dedup + IVF-flat search."""
    from lsh_spark.operators.ann import ivf_flat_topk
    from lsh_spark.operators.dedup import semantic_dedup_cells
    from lsh_spark.plans import get_spark
    from lsh_spark.sources.io import load_table

    reps = [int(a) for a in sys.argv[2:]] or [1, 5, 20]
    spark = get_spark(app_name="lsh_spark-scale-check-vec")
    spark.sparkContext.setLogLevel("ERROR")
    base = load_table(spark, "/root/testdata/sf0.1", "embeddings")
    n_base = base.count()
    for rep in reps:
        emb = (
            base.crossJoin(spark.range(rep).select(F.col("id").alias("__rep")))
            .select(
                (F.col("vec_id") * rep + F.col("__rep")).alias("vec_id"),
                F.transform(
                    "embedding",
                    lambda x, i: x + (F.col("__rep") % 7).cast("float")
                    * F.lit(0.001) * (i % 3).cast("float")
                ).alias("embedding"),
            )
        )
        n = n_base * rep
        # production inputs are tables, not lazy transform chains —
        # materialize the replica so operator timings measure the
        # operators, and scale cells LINEARLY with rows so cell width
        # (hence pairs per row) stays constant
        from pyspark import StorageLevel

        emb = emb.persist(StorageLevel.MEMORY_AND_DISK)
        emb.count()
        n_lists = 32 * rep
        t0 = time.perf_counter()
        n_reps = (semantic_dedup_cells(emb, n_lists=n_lists, threshold=0.95)
                  .where("is_representative").count())
        t_sem = time.perf_counter() - t0
        t0 = time.perf_counter()
        n_hits = ivf_flat_topk(
            emb, emb.where(F.col("vec_id") < 10), k=10,
            n_lists=n_lists, n_probe=4).count()
        t_ivf = time.perf_counter() - t0
        print(
            f"rep={rep:3d} rows={n:8d} cells={n_lists:4d}  "
            f"semantic_dedup={t_sem:7.1f}s ({n_reps} reps)  "
            f"ivf_flat={t_ivf:7.1f}s ({n_hits} hits)", flush=True)
        spark.catalog.clearCache()
    spark.stop()


def indexes() -> None:
    """Index-lifecycle scale check: replicate the corpus N× and measure
    BUILD wall (grows with the corpus — paid once) vs PROBE wall for a
    FIXED-size probe set (should stay ~flat — the amortization claim of
    the persisted bucketed indexes: probes shuffle only the probe side,
    the corpus side reads matching buckets with no exchange)."""
    from pyspark import StorageLevel

    from lsh_spark.operators.ann import build_ivf_index, search_ivf_index
    from lsh_spark.operators.similarity_join import (
        build_lsh_corpus_index,
        lsh_similarity_join_indexed,
    )
    from lsh_spark.plans import get_spark
    from lsh_spark.sources.io import load_table

    reps = [int(a) for a in sys.argv[2:]] or [1, 5, 20]
    spark = get_spark(app_name="lsh_spark-scale-check-idx")
    spark.sparkContext.setLogLevel("ERROR")
    base = load_table(spark, "/root/testdata/sf0.1", "documents")
    n_base = base.count()
    # fixed probe set: 500 lightly perturbed docs — constant work per rep
    probe = (
        base.where(F.col("doc_id") % 10 == 3).limit(500)
        .select(F.col("doc_id").alias("probe_id"),
                F.concat(F.col("text"), F.lit(" probetail")).alias("text"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    probe.count()
    emb_base = load_table(spark, "/root/testdata/sf0.1", "embeddings")
    n_emb = emb_base.count()
    queries = emb_base.where(F.col("vec_id") < 50).persist(
        StorageLevel.MEMORY_AND_DISK)
    queries.count()

    for rep in reps:
        docs = (
            base.crossJoin(
                spark.range(rep).select(F.col("id").alias("__rep")))
            .select(
                (F.col("doc_id") * rep + F.col("__rep")).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" tail"),
                         F.col("__rep").cast("string")).alias("text"),
            ).persist(StorageLevel.MEMORY_AND_DISK)
        )
        docs.count()
        name = f"scalecheck_lsh_{rep}"
        t0 = time.perf_counter()
        build_lsh_corpus_index(docs, name, text_col="text",
                               id_col="doc_id", ngram_width=3,
                               band_count=6, band_size=6, seed=123)
        t_build = time.perf_counter() - t0
        t_probe = float("inf")
        for _ in range(2):          # best-of-2: damp host noise
            t0 = time.perf_counter()
            n_hits = lsh_similarity_join_indexed(
                spark, name, probe, "text", probe_id="probe_id",
                threshold=0.7).count()
            t_probe = min(t_probe, time.perf_counter() - t0)
            spark.catalog.clearCache()

        emb = (
            emb_base.crossJoin(
                spark.range(rep).select(F.col("id").alias("__rep")))
            .select(
                (F.col("vec_id") * rep + F.col("__rep")).alias("vec_id"),
                F.transform(
                    "embedding",
                    lambda x, i: x + (F.col("__rep") % 7).cast("float")
                    * F.lit(0.001) * (i % 3).cast("float")
                ).alias("embedding"),
            ).persist(StorageLevel.MEMORY_AND_DISK)
        )
        emb.count()
        vname = f"scalecheck_ivf_{rep}"
        n_lists = 32 * rep          # constant cell width as rows grow
        t0 = time.perf_counter()
        build_ivf_index(emb, vname, n_lists=n_lists)
        t_vbuild = time.perf_counter() - t0
        t_vprobe = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            n_vhits = search_ivf_index(spark, vname, queries, k=10,
                                       n_probe=4).count()
            t_vprobe = min(t_vprobe, time.perf_counter() - t0)
            spark.catalog.clearCache()
        print(
            f"rep={rep:3d} rows={n_base * rep:8d}  "
            f"lsh_build={t_build:6.1f}s lsh_probe={t_probe:6.1f}s "
            f"({n_hits} hits)  | emb_rows={n_emb * rep:7d} "
            f"ivf_build={t_vbuild:6.1f}s ivf_probe={t_vprobe:6.1f}s "
            f"({n_vhits} hits)", flush=True)
        for t in (f"{name}_bands", f"{name}_sets", f"{name}_meta",
                  vname, f"{vname}_centroids", f"{vname}_meta"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
        docs.unpersist()
        emb.unpersist()
    spark.stop()


def training() -> None:
    """Training-op scale check: dup_ngram_stats (span frequency — the
    op with a corpus-wide digest shuffle), remove_duplicated_spans (the
    mutation twin: adds the hot-span coverage explode + per-doc
    rebuild), and pack_sequences (shard-bounded packing) on the
    replicated corpus.  Replication is the ALL-HOT worst case for the
    span ops: every replica shares every 8-gram, so every span is
    duplicated and the removal's explode covers every token."""
    from pyspark import StorageLevel

    from lsh_spark.operators.training_ops import (
        dup_ngram_stats_df,
        pack_sequences_df,
        remove_duplicated_spans_df,
        shard_assignment_df,
    )
    from lsh_spark.plans import get_spark
    from lsh_spark.sources.io import load_table

    reps = [int(a) for a in sys.argv[2:]] or [1, 5, 20]
    spark = get_spark(app_name="lsh_spark-scale-check-train")
    spark.sparkContext.setLogLevel("ERROR")
    base = load_table(spark, "/root/testdata/sf0.1", "documents")
    n_base = base.count()
    for rep in reps:
        docs = (
            base.crossJoin(
                spark.range(rep).select(F.col("id").alias("__rep")))
            .select(
                (F.col("doc_id") * rep + F.col("__rep")).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" tail"),
                         F.col("__rep").cast("string")).alias("text"),
            )
            # a real corpus table arrives in many partitions; the
            # replication crossJoin inherits the single-file scan's ONE
            # partition, which would serialize the scan-side work of ops
            # that (correctly) rely on input partitioning
            .repartition(spark.sparkContext.defaultParallelism)
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        docs.count()
        t0 = time.perf_counter()
        n_dup = dup_ngram_stats_df(docs).where("n_dup > 0").count()
        t_dup = time.perf_counter() - t0
        t0 = time.perf_counter()
        n_kept = remove_duplicated_spans_df(docs).where(
            F.length("text") > 0).count()
        t_rm = time.perf_counter() - t0
        t0 = time.perf_counter()
        n_shard = shard_assignment_df(docs).agg(
            F.max("shard")).first()[0]
        t_shard = time.perf_counter() - t0
        t0 = time.perf_counter()
        n_seq = pack_sequences_df(docs, max_len=512).agg(
            F.max("seq_id")).first()[0]
        t_pack = time.perf_counter() - t0
        print(
            f"rep={rep:3d} rows={n_base * rep:8d}  "
            f"dup_ngram={t_dup:6.1f}s ({n_dup} dup-docs)  "
            f"rm_spans={t_rm:6.1f}s ({n_kept} nonempty)  "
            f"shard={t_shard:6.1f}s ({n_shard + 1} shards)  "
            f"pack={t_pack:6.1f}s ({n_seq + 1} seqs)", flush=True)
        docs.unpersist()
        spark.catalog.clearCache()
    spark.stop()


def cleaning() -> None:
    """Scale curves for the round-6 cleaning/multimodal ops: line-level
    dedup (planted boilerplate — the winner-aggregate is the scale
    surface), PII scrub (pure map, expected flat per row), dHash pair
    mining over real BMP decode, and WAV signal stats."""
    from pyspark import StorageLevel

    from lsh_spark.multimodal.audio import audio_signal_stats
    from lsh_spark.multimodal.media import (
        synthesize_gradient_images_from_documents,
        synthesize_tone_audio_from_documents,
    )
    from lsh_spark.multimodal.phash import (
        image_dedup_clusters,
        image_near_dup_pairs,
    )
    from lsh_spark.operators.dedup import dedup_lines_df
    from lsh_spark.functions import pii
    from lsh_spark.plans import get_spark
    from lsh_spark.sources.io import load_table

    reps = [int(a) for a in sys.argv[2:]] or [1, 5, 20]
    spark = get_spark(app_name="lsh_spark-scale-check-clean")
    spark.sparkContext.setLogLevel("ERROR")
    base = load_table(spark, "/root/testdata/sf0.1", "documents")
    n_base = base.count()
    for rep in reps:
        d = F.col("doc_id")
        docs = (
            base.crossJoin(
                spark.range(rep).select(F.col("id").alias("__rep")))
            .select(
                (F.col("doc_id") * rep + F.col("__rep")).alias("doc_id"),
                # the gate's planted boilerplate: replication multiplies
                # the duplicate-line hit rate, the worst case for the
                # winner aggregate
                F.concat(
                    F.col("text"),
                    F.lit("\nAll rights reserved."),
                    F.when(F.col("doc_id") % 2 == 0,
                           F.lit("\nSubscribe to our newsletter today")
                           ).otherwise(F.lit("")),
                    F.lit("\nvisit shop "),
                    (F.col("doc_id") % 20).cast("string"),
                ).alias("text"),
            )
            .repartition(spark.sparkContext.defaultParallelism)
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        docs.count()
        t0 = time.perf_counter()
        n_dropped = dedup_lines_df(docs).where(
            F.col("n_kept") < F.col("n_lines")).count()
        t_lines = time.perf_counter() - t0
        t0 = time.perf_counter()
        n_pii = docs.select(
            (pii.email_count("text") + pii.ipv4_count("text")
             + pii.phone_count("text")).alias("n"),
            pii.redact_pii("text").alias("c"),
        ).where(F.length("c") > 0).count()
        t_pii = time.perf_counter() - t0
        # the pair operator is output-bound: the gradient corpus's hash
        # period (8960) makes replication a worst case — every replica
        # group is mutually within distance 0-2, so pairs grow
        # quadratically (measured 137k → 3.5M for 1→5); rep 20 OOMs the
        # shared host on ~10⁸ candidates, exactly the regime the
        # pair-free cluster path below exists for
        t_img, n_pairs = float("nan"), -1
        if rep <= 5:
            t0 = time.perf_counter()
            n_pairs = image_near_dup_pairs(
                synthesize_gradient_images_from_documents(docs),
                max_hamming=2).count()
            t_img = time.perf_counter() - t0
        t0 = time.perf_counter()
        n_clusters = image_dedup_clusters(
            synthesize_gradient_images_from_documents(docs),
            max_hamming=2).where("is_representative").count()
        t_cc = time.perf_counter() - t0
        t0 = time.perf_counter()
        n_audio = audio_signal_stats(
            synthesize_tone_audio_from_documents(docs)).where(
            F.col("sum_sq").isNotNull()).count()
        t_audio = time.perf_counter() - t0
        print(
            f"rep={rep:3d} rows={n_base * rep:8d}  "
            f"line_dedup={t_lines:6.1f}s ({n_dropped} docs shrunk)  "
            f"pii={t_pii:6.1f}s ({n_pii} rows)  "
            f"dhash_pairs={t_img:6.1f}s ({n_pairs} pairs)  "
            f"dhash_clusters={t_cc:6.1f}s ({n_clusters} reps)  "
            f"audio={t_audio:6.1f}s ({n_audio} clips)", flush=True)
        docs.unpersist()
        spark.catalog.clearCache()
    spark.stop()


def round7() -> None:
    """Scale curves for the round-7 ops: char-n-gram language ID (one
    corpus-wide (id, lang, ngram) aggregate + broadcast profile — the
    wide shuffle is the scale surface), SQ8 quantized ANN for a FIXED
    query set (corpus scan, expected linear), and the MP3/MP4 header
    walks (pure narrow maps, expected flat per row)."""
    from pyspark import StorageLevel

    from lsh_spark.multimodal.audio import mp3_stream_features
    from lsh_spark.multimodal.media import (
        mp4_box_features,
        synthesize_mp3_audio_from_documents,
        synthesize_mp4_video_from_documents,
    )
    from lsh_spark.functions import text as T
    from lsh_spark.operators.ann import sq8_topk
    from lsh_spark.operators.langid import char_ngram_lang_id
    from lsh_spark.operators.training_ops import (
        chunk_documents_df,
        pack_sequences_df,
    )
    from lsh_spark.plans import get_spark
    from lsh_spark.sources.io import load_table

    reps = [int(a) for a in sys.argv[2:]] or [1, 5, 20]
    spark = get_spark(app_name="lsh_spark-scale-check-r7")
    spark.sparkContext.setLogLevel("ERROR")
    base = load_table(spark, "/root/testdata/sf0.1", "documents")
    n_base = base.count()
    emb_base = load_table(spark, "/root/testdata/sf0.1", "embeddings")
    n_emb = emb_base.count()
    for rep in reps:
        docs = (
            base.crossJoin(
                spark.range(rep).select(F.col("id").alias("__rep")))
            .select(
                (F.col("doc_id") * rep + F.col("__rep")).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" tail"),
                         F.col("__rep").cast("string")).alias("text"),
                "lang",
            ).persist(StorageLevel.MEMORY_AND_DISK)
        )
        docs.count()
        emb = (
            emb_base.crossJoin(
                spark.range(rep).select(F.col("id").alias("__rep")))
            .select(
                (F.col("vec_id") * rep + F.col("__rep")).alias("vec_id"),
                F.transform(
                    "embedding",
                    lambda x, i: x + (F.col("__rep") % 7).cast("float")
                    * F.lit(0.001) * (i % 3).cast("float")
                ).alias("embedding"),
            ).persist(StorageLevel.MEMORY_AND_DISK)
        )
        emb.count()
        t0 = time.perf_counter()
        n_match = char_ngram_lang_id(docs).where("is_match").count()
        t_lid = time.perf_counter() - t0
        t0 = time.perf_counter()
        n_hits = sq8_topk(emb, emb.where(F.col("vec_id") < 10), dim=64,
                          k=10).count()
        t_sq8 = time.perf_counter() - t0
        t0 = time.perf_counter()
        n_mp3 = mp3_stream_features(
            synthesize_mp3_audio_from_documents(docs)).where(
            F.col("n_mpeg_frames").isNotNull()).count()
        t_mp3 = time.perf_counter() - t0
        t0 = time.perf_counter()
        n_mp4 = mp4_box_features(
            synthesize_mp4_video_from_documents(docs)).where(
            F.col("n_tracks").isNotNull()).count()
        t_mp4 = time.perf_counter() - t0
        # composed quality -> chunk -> chunk-dedup -> pack pipeline
        # (prepare_training_corpus shape; replicas are near-dups so the
        # chunk-dedup stage collapses most replicated chunks)
        t0 = time.perf_counter()
        kept = docs.where(T.quality_score("text") > 0.3)
        chunks = chunk_documents_df(kept, chunk_chars=256, overlap=32)
        deduped = (
            chunks.select(
                (F.col("doc_id") * 1_000_000
                 + F.col("chunk_idx")).alias("doc_id"),
                F.col("chunk_text").alias("text"))
            .groupBy("text").agg(F.min("doc_id").alias("doc_id"))
        )
        n_seqs = pack_sequences_df(
            deduped, max_len=64, shard_budget=2000).agg(
            F.countDistinct("seq_id")).first()[0]
        t_ptc = time.perf_counter() - t0
        print(
            f"rep={rep:3d} docs={n_base * rep:8d} vecs={n_emb * rep:8d}  "
            f"lang_id={t_lid:6.1f}s ({n_match} matched)  "
            f"sq8={t_sq8:6.1f}s ({n_hits} hits)  "
            f"mp3={t_mp3:6.1f}s ({n_mp3})  mp4={t_mp4:6.1f}s ({n_mp4})  "
            f"prep_corpus={t_ptc:6.1f}s ({n_seqs} seqs)",
            flush=True)
        docs.unpersist()
        emb.unpersist()
        spark.catalog.clearCache()
    spark.stop()


def urls_splits() -> None:
    """Scale curves for the round-7 URL/domain family (host extraction
    is a per-row JVM regexp map — only (doc, domain) pairs ever
    shuffle), the deterministic split assignment (pure md5 arithmetic,
    zero shuffle — expected flat per row), and the round-8-fixed
    split-leakage composition (pair miner + in-plan split projection:
    after the de-broadcast the ONLY scale surface left is the pair
    miner itself)."""
    from pyspark import StorageLevel

    from lsh_spark.functions.urls import domain_stats, flag_blocked_docs
    from lsh_spark.operators.similarity_join import lsh_self_dedup_pairs
    from lsh_spark.operators.training_ops import (
        dataset_splits_df,
        split_expr,
    )
    from lsh_spark.plans import get_spark
    from lsh_spark.sources.io import load_table

    reps = [int(a) for a in sys.argv[2:]] or [1, 5, 20]
    spark = get_spark(app_name="lsh_spark-scale-check-urls")
    spark.sparkContext.setLogLevel("ERROR")
    base = load_table(spark, "/root/testdata/sf0.1", "documents")
    n_base = base.count()
    blocklist = tuple(f"site{i}.example0.org" for i in range(0, 40, 5))
    for rep in reps:
        docs = (
            base.crossJoin(
                spark.range(rep).select(F.col("id").alias("__rep")))
            .select(
                (F.col("doc_id") * rep + F.col("__rep")).alias("doc_id"),
                # plant 1-3 URLs per doc so extraction does real work
                F.concat(
                    F.col("text"), F.lit(" see https://site"),
                    (F.col("doc_id") % 40).cast("string"),
                    F.lit(".example"), (F.col("__rep") % 3).cast("string"),
                    F.lit(".org/page and http://site"),
                    ((F.col("doc_id") + 7) % 40).cast("string"),
                    F.lit(".example0.org/x"),
                ).alias("text"),
            ).persist(StorageLevel.MEMORY_AND_DISK)
        )
        docs.count()
        t0 = time.perf_counter()
        n_dom = domain_stats(docs, blocklist=blocklist).count()
        t_dom = time.perf_counter() - t0
        t0 = time.perf_counter()
        n_drop = flag_blocked_docs(docs, blocklist=blocklist).where(
            ~F.col("keep")).count()
        t_flag = time.perf_counter() - t0
        t0 = time.perf_counter()
        n_splits = dataset_splits_df(docs).groupBy("split").count().count()
        t_split = time.perf_counter() - t0
        # split-leakage composition: the gate query's exact shape
        # (tuner-selected banding differs; the surface is identical)
        t0 = time.perf_counter()
        pairs = lsh_self_dedup_pairs(
            docs, "text", id_col="doc_id", ngram_width=3, band_count=6,
            band_size=6, seed=123, threshold=0.7)
        n_leak = (
            pairs.groupBy(
                F.least(split_expr(F.col("id_a")),
                        split_expr(F.col("id_b"))).alias("a"),
                F.greatest(split_expr(F.col("id_a")),
                           split_expr(F.col("id_b"))).alias("b"))
            .count().count()
        )
        t_leak = time.perf_counter() - t0
        print(
            f"rep={rep:3d} docs={n_base * rep:8d}  "
            f"domain_stats={t_dom:6.1f}s ({n_dom} domains)  "
            f"flag_blocked={t_flag:6.1f}s ({n_drop} dropped)  "
            f"splits={t_split:6.1f}s ({n_splits})  "
            f"split_leakage={t_leak:6.1f}s ({n_leak} cells)",
            flush=True)
        docs.unpersist()
        spark.catalog.clearCache()
    spark.stop()


def retrieval() -> None:
    """Retrieval-family scale check: corpus replication (perturbed
    texts) with a FIXED 3-query set.  Expected shapes: on-the-fly BM25
    linear in corpus rows (the postings aggregate); the persisted
    index's BUILD linear, its PROBE bounded by the matched postings
    (query-vocabulary buckets), not the corpus."""
    from pyspark import StorageLevel

    from lsh_spark.operators.retrieval import (
        bm25_search_indexed,
        bm25_topk,
        build_text_index,
    )
    from lsh_spark.plans import get_spark
    from lsh_spark.sources.formats import drop_table_and_files
    from lsh_spark.sources.io import load_table

    reps = [int(a) for a in sys.argv[2:]] or [1, 5, 20]
    spark = get_spark(app_name="lsh_spark-scale-check-retrieval")
    spark.sparkContext.setLogLevel("ERROR")
    base = load_table(spark, "/root/testdata/sf0.1", "documents")
    n_base = base.count()
    queries = spark.createDataFrame(
        [(0, "hash join merge"), (1, "window scan sort"),
         (2, "fast batch stream")],
        "query_id long, query_text string").persist(
        StorageLevel.MEMORY_AND_DISK)
    queries.count()
    for rep in reps:
        docs = (
            base.crossJoin(
                spark.range(rep).select(F.col("id").alias("__rep")))
            .select(
                (F.col("doc_id") * rep + F.col("__rep")).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" tail"),
                         F.col("__rep").cast("string")).alias("text"),
            ).persist(StorageLevel.MEMORY_AND_DISK)
        )
        docs.count()
        t0 = time.perf_counter()
        n_fly = bm25_topk(docs, queries, k=10).count()
        t_fly = time.perf_counter() - t0
        name = f"scalecheck_txt_{rep}"
        t0 = time.perf_counter()
        build_text_index(docs, name)
        t_build = time.perf_counter() - t0
        t_probe = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            n_idx = bm25_search_indexed(spark, name, queries, k=10).count()
            t_probe = min(t_probe, time.perf_counter() - t0)
        print(
            f"rep={rep:3d} docs={n_base * rep:8d}  "
            f"bm25_fly={t_fly:6.1f}s ({n_fly})  "
            f"index_build={t_build:6.1f}s  "
            f"index_probe={t_probe:6.1f}s ({n_idx})",
            flush=True)
        for sfx in ("_postings", "_doclen", "_stats", "_meta", "_deletes"):
            drop_table_and_files(spark, f"{name}{sfx}")
        docs.unpersist()
        spark.catalog.clearCache()
    spark.stop()


def pmi_vocab() -> None:
    """PMI/vocab-family scale check (round-8 verdict item 5): the pair
    table is the corpus's DISTINCT adjacent-bigram set — worst case
    ~vocab² but in natural text bounded by observed adjacencies (Heaps-
    law-ish growth), and the min-count filter bounds the scoring join.
    Replication note: replicas multiply COUNTS of existing bigrams and
    add ~1 new type per doc (the ' tailN' suffix), so distinct-pair
    growth here is deliberately sublinear — the numbers to watch are
    wall vs rows (explode+agg cost) and survivors vs min-count."""
    from pyspark import StorageLevel

    from lsh_spark.operators.training_ops import _words
    from lsh_spark.plans import get_spark
    from lsh_spark.sources.io import load_table

    reps = [int(a) for a in sys.argv[2:]] or [1, 5, 20]
    spark = get_spark(app_name="lsh_spark-scale-check-pmi")
    spark.sparkContext.setLogLevel("ERROR")
    base = load_table(spark, "/root/testdata/sf0.1", "documents")
    n_base = base.count()
    for rep in reps:
        docs = (
            base.crossJoin(
                spark.range(rep).select(F.col("id").alias("__rep")))
            .select(
                (F.col("doc_id") * rep + F.col("__rep")).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" tail"),
                         F.col("__rep").cast("string")).alias("text"),
            ).persist(StorageLevel.MEMORY_AND_DISK)
        )
        docs.count()
        # vocab_stats plan over the replicated frame
        t0 = time.perf_counter()
        freq = (
            docs.select(F.explode(_words(F.col("text"))).alias("__w"))
            .groupBy("__w").agg(F.count(F.lit(1)).alias("__c"))
        )
        row = freq.agg(
            F.sum("__c").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("vocab"),
        ).first()
        t_vocab = time.perf_counter() - t0
        # pmi_top_pairs plan (same shape as the gate query), plus the
        # two scale diagnostics: distinct-pair count and min-count
        # survivors
        t0 = time.perf_counter()
        toks = docs.select(_words(F.col("text")).alias("__t"))
        grams = toks.select(
            F.explode(F.expr(
                "transform(sequence(1, greatest(size(__t) - 1, 0)), "
                "i -> struct(element_at(__t, i) AS w1, "
                "element_at(__t, i + 1) AS w2))")).alias("__g"),
        ).select(F.col("__g.w1").alias("w1"), F.col("__g.w2").alias("w2"))
        pair = (grams.groupBy("w1", "w2")
                .agg(F.count(F.lit(1)).alias("__c12"))
                .persist(StorageLevel.MEMORY_AND_DISK))
        diag = pair.agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.when(F.col("__c12") >= 5, 1).otherwise(0))
            .alias("n_kept")).first()
        left = pair.groupBy("w1").agg(F.sum("__c12").alias("__c1"))
        right = pair.groupBy("w2").agg(F.sum("__c12").alias("__c2"))
        total = pair.agg(F.sum("__c12").alias("__n"))
        pmi = F.log(
            (F.col("__c12").cast("double") * F.col("__n").cast("double"))
            / (F.col("__c1").cast("double") * F.col("__c2").cast("double")))
        n_top = (
            pair.where(F.col("__c12") >= 5)
            .join(left, "w1").join(right, "w2")
            .crossJoin(F.broadcast(total))
            .select("w1", "w2", F.round(pmi, 6).alias("pmi"))
            .orderBy(F.col("pmi").desc(), F.col("w1").asc(),
                     F.col("w2").asc())
            .limit(50).count()
        )
        t_pmi = time.perf_counter() - t0
        print(
            f"rep={rep:3d} docs={n_base * rep:8d}  "
            f"vocab_stats={t_vocab:6.1f}s (tokens={row.n_tokens} "
            f"vocab={row.vocab})  pmi={t_pmi:6.1f}s "
            f"(pairs={diag.n_pairs} kept>=5={diag.n_kept} top={n_top})",
            flush=True)
        pair.unpersist()
        docs.unpersist()
        spark.catalog.clearCache()
    spark.stop()


def pq() -> None:
    """PQ-family scale check: embeddings replicated with fresh ids and
    a per-replica component nudge (so codes do real work).  Expected
    shapes: on-the-fly pq_topk linear-ish in rows (train + encode +
    scan per call); the persisted index's BUILD linear and paid once,
    its SEARCH linear in rows but over m ints per vector instead of
    dim floats — the compression claim, measured."""
    from pyspark import StorageLevel

    from lsh_spark.operators.ann import (
        build_pq_index,
        pq_topk,
        search_pq_index,
    )
    from lsh_spark.plans import get_spark
    from lsh_spark.sources.formats import drop_table_and_files
    from lsh_spark.sources.io import load_table

    reps = [int(a) for a in sys.argv[2:]] or [1, 5, 20]
    spark = get_spark(app_name="lsh_spark-scale-check-pq")
    spark.sparkContext.setLogLevel("ERROR")
    base = load_table(spark, "/root/testdata/sf0.1", "embeddings")
    n_base = base.count()
    for rep in reps:
        emb = (
            base.crossJoin(
                spark.range(rep).select(F.col("id").alias("__rep")))
            .select(
                (F.col("vec_id") * rep + F.col("__rep")).alias("vec_id"),
                F.transform(
                    F.col("embedding").cast("array<double>"),
                    lambda x: x + F.col("__rep").cast("double") * 0.001)
                .alias("embedding"),
            ).persist(StorageLevel.MEMORY_AND_DISK)
        )
        emb.count()
        queries = emb.where(F.col("vec_id") < 10)
        t0 = time.perf_counter()
        n_fly = pq_topk(emb, queries, k=10, m=4, n_codes=8, n_iters=2,
                        dim=64).count()
        t_fly = time.perf_counter() - t0
        name = f"scalecheck_pq_{rep}"
        t0 = time.perf_counter()
        build_pq_index(emb, name, m=4, n_codes=8, n_iters=2, dim=64)
        t_build = time.perf_counter() - t0
        t_search = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            n_idx = search_pq_index(spark, name, queries, k=10).count()
            t_search = min(t_search, time.perf_counter() - t0)
        print(
            f"rep={rep:3d} vecs={n_base * rep:8d}  "
            f"pq_fly={t_fly:6.1f}s ({n_fly})  "
            f"index_build={t_build:6.1f}s  "
            f"index_search={t_search:6.1f}s ({n_idx})",
            flush=True)
        for sfx in ("_codes", "_codebooks", "_meta", "_deletes"):
            drop_table_and_files(spark, f"{name}{sfx}")
        emb.unpersist()
        spark.catalog.clearCache()
    spark.stop()


def phrase() -> None:
    """Phrase-search scale check: corpus replication with a fixed
    3-phrase set.  Expected shape: linear-ish in rows (the posexplode +
    anchor aggregate is the cost; the shuffle carries ids+ints only),
    with occurrence counts scaling exactly with rep."""
    from pyspark import StorageLevel

    from lsh_spark.operators.retrieval import phrase_search
    from lsh_spark.plans import get_spark
    from lsh_spark.sources.io import load_table

    reps = [int(a) for a in sys.argv[2:]] or [1, 5, 20]
    spark = get_spark(app_name="lsh_spark-scale-check-phrase")
    spark.sparkContext.setLogLevel("ERROR")
    base = load_table(spark, "/root/testdata/sf0.1", "documents")
    n_base = base.count()
    queries = spark.createDataFrame(
        [(0, "sort merge"), (1, "table scan merge"), (2, "hash join")],
        "query_id long, phrase string").persist(
        StorageLevel.MEMORY_AND_DISK)
    queries.count()
    for rep in reps:
        docs = (
            base.crossJoin(
                spark.range(rep).select(F.col("id").alias("__rep")))
            .select(
                (F.col("doc_id") * rep + F.col("__rep")).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" tail"),
                         F.col("__rep").cast("string")).alias("text"),
            ).persist(StorageLevel.MEMORY_AND_DISK)
        )
        docs.count()
        t = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            n = phrase_search(docs, queries).count()
            t = min(t, time.perf_counter() - t0)
        print(f"rep={rep:3d} docs={n_base * rep:8d}  "
              f"phrase={t:6.1f}s (matching docs={n})", flush=True)
        docs.unpersist()
        spark.catalog.clearCache()
    spark.stop()


def ivfpq() -> None:
    """IVF-PQ persisted-index scale check (round-9 verdict item 5):
    replicate the embeddings N× with fresh ids, BUILD the two-level
    index with n_lists scaled to keep cell width constant (the
    deployment posture: lists ∝ corpus, ~sqrt(N) in practice), then
    probe with a FIXED 50-query set.  Expected shape: build linear in
    rows (paid once); probe ~flat — each query touches n_probe cells of
    constant width, the codes table is bucketed BY CELL so the corpus
    side reads matching buckets with no exchange, and scoring is m int
    lookups per candidate."""
    from pyspark import StorageLevel

    from lsh_spark.operators.ann import (
        build_ivf_pq_index,
        search_ivf_pq_index,
    )
    from lsh_spark.plans import get_spark
    from lsh_spark.sources.formats import drop_table_and_files
    from lsh_spark.sources.io import load_table

    reps = [int(a) for a in sys.argv[2:]] or [1, 5, 20]
    spark = get_spark(app_name="lsh_spark-scale-check-ivfpq")
    spark.sparkContext.setLogLevel("ERROR")
    base = load_table(spark, "/root/testdata/sf0.1", "embeddings")
    n_base = base.count()
    queries = base.where(F.col("vec_id") < 50).persist(
        StorageLevel.MEMORY_AND_DISK)
    queries.count()
    for rep in reps:
        emb = (
            base.crossJoin(
                spark.range(rep).select(F.col("id").alias("__rep")))
            .select(
                (F.col("vec_id") * rep + F.col("__rep")).alias("vec_id"),
                F.transform(
                    "embedding",
                    lambda x, i: x + (F.col("__rep") % 7).cast("float")
                    * F.lit(0.001) * (i % 3).cast("float")
                ).alias("embedding"),
            ).persist(StorageLevel.MEMORY_AND_DISK)
        )
        emb.count()
        name = f"scalecheck_ivfpq_{rep}"
        t0 = time.perf_counter()
        build_ivf_pq_index(emb, name, n_lists=8 * rep, cells_iters=2,
                           m=4, n_codes=8, pq_iters=2, dim=64)
        t_build = time.perf_counter() - t0
        t_probe = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            n_hits = search_ivf_pq_index(spark, name, queries, k=10,
                                         n_probe=2).count()
            t_probe = min(t_probe, time.perf_counter() - t0)
            spark.catalog.clearCache()
        print(
            f"rep={rep:3d} vecs={n_base * rep:8d}  "
            f"ivfpq_build={t_build:6.1f}s  "
            f"ivfpq_probe={t_probe:6.1f}s ({n_hits} hits)", flush=True)
        for sfx in ("_codes", "_codebooks", "_centroids", "_meta",
                    "_deletes"):
            drop_table_and_files(spark, f"{name}{sfx}")
        emb.unpersist()
        spark.catalog.clearCache()
    spark.stop()


def round10() -> None:
    """Round-10 additions under corpus replication (fresh ids, perturbed
    texts — replicas are near-dups, the adversarial case for pair ops).

    Expected shapes:
      * tfidf_cosine_pairs — pair volume is Σ_term df², and replication
        multiplies every df by rep, so work grows ~rep²: the df cap is
        the scalability control, and the sweep shows the quadratic
        honestly.
      * containment / edit-distance pairs — replicas form near-dup
        clusters of size rep, so candidate pairs grow ~rep² WITHIN
        clusters (output-bound, like the verified-dedup sweep in
        main()); small reps only."""
    from pyspark import StorageLevel

    from lsh_spark.operators.similarity_join import (
        lsh_containment_pairs,
        lsh_edit_distance_pairs,
    )
    from lsh_spark.operators.sparse_sim import tfidf_cosine_pairs
    from lsh_spark.plans import get_spark, release_intermediates
    from lsh_spark.sources.io import load_table

    reps = [int(a) for a in sys.argv[2:]] or [1, 2, 5]
    spark = get_spark(app_name="lsh_spark-scale-check-r10")
    spark.sparkContext.setLogLevel("ERROR")
    base = load_table(spark, "/root/testdata/sf0.1", "documents")
    n_base = base.count()
    for rep in reps:
        docs = (
            base.crossJoin(
                spark.range(rep).select(F.col("id").alias("__rep")))
            .select(
                (F.col("doc_id") * rep + F.col("__rep")).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" tail"),
                         F.col("__rep").cast("string")).alias("text"),
            ).persist(StorageLevel.MEMORY_AND_DISK)
        )
        docs.count()
        t0 = time.perf_counter()
        n_cos = tfidf_cosine_pairs(docs, threshold=0.3, max_df_num=1,
                                   max_df_den=20).count()
        t_cos = time.perf_counter() - t0
        release_intermediates()
        t0 = time.perf_counter()
        n_cont = lsh_containment_pairs(
            docs, "text", id_col="doc_id", threshold=0.8).count()
        t_cont = time.perf_counter() - t0
        release_intermediates()
        t0 = time.perf_counter()
        n_edit = lsh_edit_distance_pairs(
            docs, "text", id_col="doc_id", threshold=0.4).count()
        t_edit = time.perf_counter() - t0
        release_intermediates()
        print(
            f"rep={rep:3d} docs={n_base * rep:8d}  "
            f"tfidf_cos={t_cos:6.1f}s ({n_cos})  "
            f"containment={t_cont:6.1f}s ({n_cont})  "
            f"edit={t_edit:6.1f}s ({n_edit})", flush=True)
        docs.unpersist()
        spark.catalog.clearCache()
    spark.stop()


def edit_only() -> None:
    """Round-11 re-measurement of the edit-distance 5× adversarial
    point after the capped-DP change (3-arg levenshtein bound): the
    round-10 sweep measured 212 s at rep=5 with the uncapped
    O(len_a·len_b) DP; the bound caps each verify at O(len·(1−t)·len).
    Same replication recipe as --round10 (near-dup replica cliques)."""
    from pyspark import StorageLevel

    from lsh_spark.operators.similarity_join import lsh_edit_distance_pairs
    from lsh_spark.plans import get_spark, release_intermediates
    from lsh_spark.sources.io import load_table

    reps = [int(a) for a in sys.argv[2:]] or [1, 2, 5]
    spark = get_spark(app_name="lsh_spark-scale-check-edit")
    spark.sparkContext.setLogLevel("ERROR")
    base = load_table(spark, "/root/testdata/sf0.1", "documents")
    n_base = base.count()
    for rep in reps:
        docs = (
            base.crossJoin(
                spark.range(rep).select(F.col("id").alias("__rep")))
            .select(
                (F.col("doc_id") * rep + F.col("__rep")).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" tail"),
                         F.col("__rep").cast("string")).alias("text"),
            ).persist(StorageLevel.MEMORY_AND_DISK)
        )
        docs.count()
        t0 = time.perf_counter()
        n_edit = lsh_edit_distance_pairs(
            docs, "text", id_col="doc_id", threshold=0.4).count()
        t_edit = time.perf_counter() - t0
        release_intermediates()
        print(f"rep={rep:3d} docs={n_base * rep:8d}  "
              f"edit={t_edit:6.1f}s ({n_edit})", flush=True)
        docs.unpersist()
        spark.catalog.clearCache()
    spark.stop()


def graph() -> None:
    """Round-11 graph-family sweep (round-10 verdict item 6).

    * events_pagerank — replicate the graph as DISJOINT copies (fresh
      users AND fresh items per replica): edges grow ×rep, so each
      iteration's join+aggregate should be ~linear in rep.
    * item_cooccurrence — the adversarial co-visitation case: SAME
      users, fresh items per replica, so every user's item set grows
      ×rep and the self-join's per-user candidate volume grows ~rep².
      Measured twice: with the operator default cap (1000 — never
      binds at these sizes: the HONEST quadratic) and with a cap that
      binds at the upper reps (heavy users dropped wholesale — the
      flattening the cap is designed to provide)."""
    from pyspark import StorageLevel

    from lsh_spark.operators.graph import (
        item_cooccurrence_pairs,
        pagerank_undirected,
        user_item_edges,
    )
    from lsh_spark.plans import get_spark, release_intermediates
    from lsh_spark.sources.io import load_table

    reps = [int(a) for a in sys.argv[2:]] or [1, 3, 6]
    spark = get_spark(app_name="lsh_spark-scale-check-graph")
    spark.sparkContext.setLogLevel("ERROR")
    base = load_table(spark, "/root/testdata/sf0.1", "events")
    k0 = F.from_json("props", "k BIGINT")["k"]
    # sf0.1 has ~48.7 distinct items/user (max 67): 150 never binds at
    # rep=1, binds from rep>=4 (the flattening the sweep demonstrates)
    binding_cap = 150
    for rep in reps:
        repd = base.crossJoin(
            spark.range(rep).select(F.col("id").alias("__rep")))
        # disjoint copies: fresh users + fresh items
        ev_disjoint = repd.select(
            (F.col("user_id") * rep + F.col("__rep")).alias("user_id"),
            F.to_json(F.struct(
                (k0 * rep + F.col("__rep")).alias("k"))).alias("props"),
        ).persist(StorageLevel.MEMORY_AND_DISK)
        # adversarial co-visitation: same users, fresh items
        ev_heavy = repd.select(
            F.col("user_id"),
            F.to_json(F.struct(
                (k0 * rep + F.col("__rep")).alias("k"))).alias("props"),
        ).persist(StorageLevel.MEMORY_AND_DISK)
        n_dis = ev_disjoint.count()
        ev_heavy.count()
        t0 = time.perf_counter()
        edges = user_item_edges(ev_disjoint)
        pr = pagerank_undirected(edges, iters=3)
        n_nodes = pr.count()
        t_pr = time.perf_counter() - t0
        release_intermediates()
        t0 = time.perf_counter()
        n_co = item_cooccurrence_pairs(
            ev_heavy, min_support_num=1, min_support_den=4).count()
        t_co = time.perf_counter() - t0
        release_intermediates()
        t0 = time.perf_counter()
        n_cap = item_cooccurrence_pairs(
            ev_heavy, min_support_num=1, min_support_den=4,
            max_items_per_user=binding_cap).count()
        t_cap = time.perf_counter() - t0
        release_intermediates()
        print(
            f"rep={rep:3d} events={n_dis:9d}  "
            f"pagerank={t_pr:6.1f}s ({n_nodes} nodes)  "
            f"cooc[cap=1000]={t_co:6.1f}s ({n_co})  "
            f"cooc[cap={binding_cap}]={t_cap:6.1f}s ({n_cap})",
            flush=True)
        ev_disjoint.unpersist()
        ev_heavy.unpersist()
        spark.catalog.clearCache()
    spark.stop()




def r11() -> None:
    """Round-11 family scale check (corpus replication, perturbed
    texts).  Expected shapes:
      * cdc_chunk_stats — linear in total chars (position-local
        boundaries: one mapInPandas scan + digest aggregates);
      * CDC index build linear; the novelty PROBE with a FIXED batch
        must stay bounded by the batch + matched buckets, not the
        corpus;
      * token_budget_per_source under a SINGLE DOMINANT source (every
        replica mapped to one source) — the adversarial case the
        two-phase bucket cutoff exists for: the exact window's input
        stays O(budget), so wall grows only with the phase-1 histogram
        (linear scan), never with a corpus-sized single-task sort;
      * hll_vocab_report — linear scan + bounded register state.
    """
    from pyspark import StorageLevel

    from lsh_spark.operators.dedup import (
        build_cdc_chunk_index,
        cdc_chunk_stats,
        chunk_novelty_against_index,
    )
    from lsh_spark.operators.pipeline_queries import hll_vocab_report
    from lsh_spark.operators.training_ops import token_budget_per_source
    from lsh_spark.plans import get_spark
    from lsh_spark.sources.formats import drop_table_and_files
    from lsh_spark.sources.io import load_table

    reps = [int(a) for a in sys.argv[2:]] or [1, 5, 20]
    spark = get_spark(app_name="lsh_spark-scale-check-r11")
    spark.sparkContext.setLogLevel("ERROR")
    base = load_table(spark, "/root/testdata/sf0.1", "documents")
    n_base = base.count()
    probe_batch = base.limit(500).select("doc_id", "text").persist(
        StorageLevel.MEMORY_AND_DISK)
    probe_batch.count()
    for rep in reps:
        docs = (
            base.crossJoin(
                spark.range(rep).select(F.col("id").alias("__rep")))
            .select(
                (F.col("doc_id") * rep + F.col("__rep")).alias("doc_id"),
                F.lit("src_dominant").alias("source"),
                F.concat(F.col("text"), F.lit(" tail"),
                         F.col("__rep").cast("string")).alias("text"),
            ).persist(StorageLevel.MEMORY_AND_DISK)
        )
        docs.count()
        t0 = time.perf_counter()
        n_cdc = cdc_chunk_stats(docs).count()
        t_cdc = time.perf_counter() - t0
        name = f"scalecheck_cdc_{rep}"
        t0 = time.perf_counter()
        build_cdc_chunk_index(docs, name, num_buckets=32)
        t_build = time.perf_counter() - t0
        t_probe = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            n_probe = chunk_novelty_against_index(
                spark, name, probe_batch).count()
            t_probe = min(t_probe, time.perf_counter() - t0)
        t0 = time.perf_counter()
        n_budget = token_budget_per_source(docs, budget=50_000).count()
        t_budget = time.perf_counter() - t0
        t0 = time.perf_counter()
        n_hll = _hll_inline(docs).count()
        t_hll = time.perf_counter() - t0
        print(
            f"rep={rep:3d} docs={n_base * rep:8d}  "
            f"cdc_stats={t_cdc:6.1f}s ({n_cdc})  "
            f"idx_build={t_build:6.1f}s  probe500={t_probe:6.1f}s "
            f"({n_probe})  budget50k={t_budget:6.1f}s ({n_budget})  "
            f"hll={t_hll:6.1f}s ({n_hll})",
            flush=True)
        for sfx in ("_chunks", "_meta", "_deletes"):
            drop_table_and_files(spark, f"{name}{sfx}")
        docs.unpersist()
        spark.catalog.clearCache()
    spark.stop()


def _hll_inline(docs):
    """hll_vocab_report's register plan over an in-memory frame (the
    gate query loads from a path; the aggregate shape is identical)."""
    from lsh_spark.operators.training_ops import (_words,
                                                  exploded_word_bigrams)

    bg = exploded_word_bigrams(
        docs.select("source", _words(F.col("text")).alias("__t")),
        F.col("__t"), keep=("source",)
    ).select("source", "__g", F.md5("__g").alias("__hx"))
    reg = bg.select(
        "source", "__g",
        F.conv(F.substring("__hx", 1, 2), 16, 10).cast("int")
        .alias("__idx"),
        F.conv(F.substring("__hx", 3, 14), 16, 10).cast("bigint")
        .alias("__v"),
    ).select(
        "source", "__g", "__idx",
        F.when(F.col("__v") == 0, F.lit(57))
        .otherwise(F.lit(57) - F.length(F.bin(F.col("__v"))))
        .cast("int").alias("__rho"))
    regs = reg.groupBy("source", "__idx").agg(
        F.max("__rho").alias("__m"),
        F.countDistinct("__g").alias("__nd"))
    return regs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_registers"))


def s2() -> None:
    """Round-11 session-2 sweep: Bloom membership (build linear, probe
    flat), triangle counting (wedge volume under co-visitation growth),
    and IVF radius search (corpus replication, fixed query set)."""
    from lsh_spark.operators.ann import ivf_radius_search
    from lsh_spark.operators.bloom import (bloom_build_words,
                                           bloom_probe_report)
    from lsh_spark.operators.graph import triangle_counts
    from lsh_spark.plans import get_spark
    from lsh_spark.sources.io import load_table
    from pyspark import StorageLevel

    reps = [int(a) for a in sys.argv[2:]] or [1, 5, 20]
    spark = get_spark(app_name="lsh_spark-scale-check-s2")
    spark.sparkContext.setLogLevel("ERROR")
    docs0 = load_table(spark, "/root/testdata/sf0.1", "documents")
    ev0 = load_table(spark, "/root/testdata/sf0.1", "events")
    emb0 = load_table(spark, "/root/testdata/sf0.1", "embeddings")
    probe = (docs0.where(F.col("doc_id") % 10 == 1)
             .select("doc_id", "text"))  # fixed 500-doc batch
    n_probe_docs = probe.count()
    for rep in reps:
        docs = (
            docs0.crossJoin(
                spark.range(rep).select(F.col("id").alias("__rep")))
            .select((F.col("doc_id") * rep + F.col("__rep"))
                    .alias("doc_id"),
                    F.concat(F.col("text"), F.lit(" tail"),
                             F.col("__rep").cast("string")).alias("text"))
            .persist(StorageLevel.MEMORY_AND_DISK))
        n = docs.count()
        # bloom: m scales with the corpus (kn/m ~ 0.3 here), the
        # production sizing rule — words stay <= m/32 rows
        m_bits = 1 << (16 + max(0, rep.bit_length() - 1))
        t0 = time.perf_counter()
        words = bloom_build_words(docs, m_bits=m_bits)
        n_words = words.count()
        t_build = time.perf_counter() - t0
        words = words.localCheckpoint(eager=True)
        seen = (docs.select(F.md5(F.col("text")).alias("__hx"))
                .distinct().localCheckpoint(eager=True))
        t0 = time.perf_counter()
        n_hits = (bloom_probe_report(probe, words, seen, m_bits=m_bits)
                  .where("bloom_hit").count())
        t_probe = time.perf_counter() - t0
        # events replicated: users duplicated with fresh ids -> item
        # popularity grows linearly, pair supports grow linearly, the
        # co-occurrence edge set (support >= rep) stays comparable
        ev = (
            ev0.crossJoin(
                spark.range(rep).select(F.col("id").alias("__rep")))
            .select((F.col("user_id") * rep + F.col("__rep"))
                    .alias("user_id"), "props")
            .persist(StorageLevel.MEMORY_AND_DISK))
        ev.count()
        t0 = time.perf_counter()
        n_tri = triangle_counts(ev, min_cooccur=2 * rep).count()
        t_tri = time.perf_counter() - t0
        # radius search: corpus replicated with perturbed vectors,
        # cells scale linearly so cell width stays constant
        emb = (
            emb0.crossJoin(
                spark.range(rep).select(F.col("id").alias("__rep")))
            .select((F.col("vec_id") * rep + F.col("__rep"))
                    .alias("vec_id"),
                    F.transform(
                        "embedding",
                        lambda x, i: x + (F.col("__rep") % 7).cast("float")
                        * F.lit(0.001) * (i % 3).cast("float")
                    ).alias("embedding"))
            .persist(StorageLevel.MEMORY_AND_DISK))
        emb.count()
        t0 = time.perf_counter()
        n_rad = ivf_radius_search(
            emb, emb.where(F.col("vec_id") < 10), threshold=0.25,
            n_lists=16 * rep, n_probe=4).count()
        t_rad = time.perf_counter() - t0
        print(
            f"rep={rep:3d} docs={n:7d}  bloom_build={t_build:6.1f}s "
            f"({n_words} words, m=2^{m_bits.bit_length() - 1})  "
            f"probe[{n_probe_docs}]={t_probe:5.1f}s ({n_hits} hits)  "
            f"triangles={t_tri:6.1f}s ({n_tri} items)  "
            f"radius={t_rad:6.1f}s ({n_rad} pairs)",
            flush=True)
        for d in (docs, ev, emb):
            d.unpersist()
        spark.catalog.clearCache()
    spark.stop()


def r12() -> None:
    """Round-12 sweep: event-path trigrams (uniform user growth AND a
    single hot user), hourly spikes (event volume growth over a fixed
    time span), and the calibration kernel's enforced max_docs sampling
    (matrix stays capped while the corpus grows)."""
    from lsh_spark.operators.relational import (path_trigrams_df,
                                                spikes_from_hourly)
    from lsh_spark.operators.similarity_join import (
        minhash_estimate_for_pairs)
    from lsh_spark.plans import get_spark
    from lsh_spark.sources.io import load_table
    from pyspark import StorageLevel

    reps = [int(a) for a in sys.argv[2:]] or [1, 5, 20]
    spark = get_spark(app_name="lsh_spark-scale-check-r12")
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.1"
    ev0 = load_table(spark, sf, "events").select(
        "event_id", "user_id", "event_type", "ts")
    docs0 = load_table(spark, sf, "documents")
    n_ev0 = ev0.count()
    # fixed pair set for the calibration kernel: the flagship's verified
    # pairs on the BASE corpus (ids remapped per replication below)
    from lsh_spark.operators.lsh_queries import minhash_near_dup_pairs

    pairs0 = (minhash_near_dup_pairs(spark, sf)
              .localCheckpoint(eager=True))
    n_pairs0 = pairs0.count()
    max_docs = 20_000
    for rep in reps:
        # (a) uniform user growth: every user duplicated with fresh ids
        # -> more window partitions of UNCHANGED size
        ev_u = (
            ev0.crossJoin(
                spark.range(rep).select(F.col("id").alias("__rep")))
            .select((F.col("event_id") * rep + F.col("__rep"))
                    .alias("event_id"),
                    (F.col("user_id") * rep + F.col("__rep"))
                    .alias("user_id"), "event_type", "ts")
            .persist(StorageLevel.MEMORY_AND_DISK))
        n_u = ev_u.count()
        t0 = time.perf_counter()
        n_tri_u = path_trigrams_df(ev_u).count()
        t_tri_u = time.perf_counter() - t0
        # (b) ONE hot user: user 0's events replicated rep*10x on the
        # SAME id (fresh event ids) -> one window partition carries
        # ~rep*10x the events of any other (the 100 TB skewed-key case)
        hot = ev0.where(F.col("user_id") == 0)
        ev_h = (
            ev0.unionAll(
                hot.crossJoin(
                    spark.range(rep * 10 - 1)
                    .select(F.col("id").alias("__rep")))
                .select((F.col("event_id") * (rep * 10) + F.col("__rep")
                         + F.lit(1)).alias("event_id"),
                        "user_id", "event_type", "ts"))
            .persist(StorageLevel.MEMORY_AND_DISK))
        n_hot = ev_h.where(F.col("user_id") == 0).count()
        t0 = time.perf_counter()
        n_tri_h = path_trigrams_df(ev_h).count()
        t_tri_h = time.perf_counter() - t0
        # (c) spikes: volume grows, hour span fixed -> the window input
        # (types x hours) must stay CONSTANT
        t0 = time.perf_counter()
        hourly = (
            ev_u.groupBy(
                "event_type",
                F.date_format(F.date_trunc("hour", F.col("ts")),
                              "yyyy-MM-dd HH:mm:ss").alias("hour"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_events")))
        n_spk = spikes_from_hourly(hourly).count()
        t_spk = time.perf_counter() - t0
        # (d) calibration kernel under the enforced sampling contract:
        # corpus grows rep x, the broadcast matrix stays <= max_docs
        docs = (
            docs0.crossJoin(
                spark.range(rep).select(F.col("id").alias("__rep")))
            .select((F.col("doc_id") * rep + F.col("__rep"))
                    .alias("doc_id"),
                    F.concat(F.col("text"), F.lit(" tail"),
                             F.col("__rep").cast("string")).alias("text"))
            .persist(StorageLevel.MEMORY_AND_DISK))
        n_docs = docs.count()
        pairs = pairs0.select(
            (F.col("id_a") * rep).alias("id_a"),
            (F.col("id_b") * rep).alias("id_b"), "jaccard")
        t0 = time.perf_counter()
        n_est = minhash_estimate_for_pairs(
            pairs, docs, "text", id_col="doc_id",
            max_docs=max_docs).count()
        t_cal = time.perf_counter() - t0
        print(
            f"rep={rep:3d} events={n_u:8d}  "
            f"trigrams_uniform={t_tri_u:6.1f}s ({n_tri_u} paths)  "
            f"trigrams_hot[{n_hot:7d} ev/user]={t_tri_h:6.1f}s "
            f"({n_tri_h})  spikes={t_spk:5.1f}s ({n_spk} rows)  "
            f"calib[docs={n_docs:7d},cap={max_docs},"
            f"pairs={n_pairs0}]={t_cal:6.1f}s ({n_est} kept)",
            flush=True)
        for d in (ev_u, ev_h, docs):
            d.unpersist()
        spark.catalog.clearCache()
    spark.stop()


def r12b() -> None:
    """Round-12 new-operator sweep: proximity search (posting volume
    growth under fixed query terms), personalized PageRank (graph
    growth), and progressive-JPEG decode throughput (batch decode of
    the synthesized SOF2 corpus)."""
    from lsh_spark.operators.graph import (personalized_pagerank,
                                           user_item_edges)
    from lsh_spark.operators.retrieval import proximity_search
    from lsh_spark.plans import get_spark
    from lsh_spark.sources.io import load_table
    from pyspark import StorageLevel

    reps = [int(a) for a in sys.argv[2:]] or [1, 5, 20]
    spark = get_spark(app_name="lsh_spark-scale-check-r12b")
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.1"
    docs0 = load_table(spark, sf, "documents")
    ev0 = load_table(spark, sf, "events")
    terms = spark.range(3).select(
        F.col("id").alias("query_id"),
        F.element_at(F.array(F.lit("sort"), F.lit("hash"),
                             F.lit("merge")),
                     (F.col("id") + 1).cast("int")).alias("term_a"),
        F.element_at(F.array(F.lit("join"), F.lit("scan"),
                             F.lit("table")),
                     (F.col("id") + 1).cast("int")).alias("term_b"))
    for rep in reps:
        docs = (
            docs0.crossJoin(
                spark.range(rep).select(F.col("id").alias("__rep")))
            .select((F.col("doc_id") * rep + F.col("__rep"))
                    .alias("doc_id"),
                    F.concat(F.col("text"), F.lit(" tail"),
                             F.col("__rep").cast("string")).alias("text"))
            .persist(StorageLevel.MEMORY_AND_DISK))
        n_docs = docs.count()
        t0 = time.perf_counter()
        n_prox = proximity_search(docs, terms, window=6).count()
        t_prox = time.perf_counter() - t0
        # PPR: users duplicated with fresh ids -> graph grows linearly,
        # seed set (items) stays the same size
        ev = (
            ev0.crossJoin(
                spark.range(rep).select(F.col("id").alias("__rep")))
            .select((F.col("user_id") * rep + F.col("__rep"))
                    .alias("user_id"), "props")
            .persist(StorageLevel.MEMORY_AND_DISK))
        ev.count()
        edges = user_item_edges(ev)
        nodes = edges.select(F.col("src").alias("node")).distinct()
        seeds = nodes.where((F.col("node") % 2 == 1)
                            & (F.expr("node DIV 2") % 17 == 0))
        t0 = time.perf_counter()
        n_ppr = personalized_pagerank(edges, seeds, iters=3).count()
        t_ppr = time.perf_counter() - t0
        # progressive decode throughput: synthesize + decode the SOF2
        # corpus over the replicated doc ids (CPU-bound Arrow batches)
        from lsh_spark.multimodal.media import (
            decoded_image_stats, synthesize_progressive_jpegs_from_documents)
        from lsh_spark.sources.io import fanout_scan

        t0 = time.perf_counter()
        n_dec = decoded_image_stats(
            synthesize_progressive_jpegs_from_documents(
                fanout_scan(docs))).count()
        t_dec = time.perf_counter() - t0
        print(
            f"rep={rep:3d} docs={n_docs:7d}  "
            f"proximity={t_prox:6.1f}s ({n_prox} rows)  "
            f"ppr[3 iters]={t_ppr:6.1f}s ({n_ppr} nodes)  "
            f"prog_decode={t_dec:6.1f}s ({n_dec} images)",
            flush=True)
        for d in (docs, ev):
            d.unpersist()
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--vectors":
        vectors()
    elif len(sys.argv) > 1 and sys.argv[1] == "--indexes":
        indexes()
    elif len(sys.argv) > 1 and sys.argv[1] == "--training":
        training()
    elif len(sys.argv) > 1 and sys.argv[1] == "--cleaning":
        cleaning()
    elif len(sys.argv) > 1 and sys.argv[1] == "--round7":
        round7()
    elif len(sys.argv) > 1 and sys.argv[1] == "--urls-splits":
        urls_splits()
    elif len(sys.argv) > 1 and sys.argv[1] == "--retrieval":
        retrieval()
    elif len(sys.argv) > 1 and sys.argv[1] == "--pmi-vocab":
        pmi_vocab()
    elif len(sys.argv) > 1 and sys.argv[1] == "--pq":
        pq()
    elif len(sys.argv) > 1 and sys.argv[1] == "--phrase":
        phrase()
    elif len(sys.argv) > 1 and sys.argv[1] == "--ivfpq":
        ivfpq()
    elif len(sys.argv) > 1 and sys.argv[1] == "--round10":
        round10()
    elif len(sys.argv) > 1 and sys.argv[1] == "--edit":
        edit_only()
    elif len(sys.argv) > 1 and sys.argv[1] == "--graph":
        graph()
    elif len(sys.argv) > 1 and sys.argv[1] == "--r11":
        r11()
    elif len(sys.argv) > 1 and sys.argv[1] == "--s2":
        s2()
    elif len(sys.argv) > 1 and sys.argv[1] == "--r12":
        r12()
    elif len(sys.argv) > 1 and sys.argv[1] == "--r12b":
        r12b()
    else:
        main()
