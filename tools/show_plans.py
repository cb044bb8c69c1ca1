"""Dump formatted physical plans for the headline queries → PLANS.md.

Run after plan-affecting changes; the committed PLANS.md is the review
artifact showing pushdown / pruning / broadcast / codegen behavior.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"


def main() -> None:
    import paperoni_spark.contract as contract
    from paperoni_spark.operators import (
        dedup,
        packing,
        sampling,
        sessionize,
        similarity,
        temporal,
        textstats,
    )
    from paperoni_spark.pipeline import build_spark, extract_pipeline

    spark = build_spark(master="local[4]")
    docs = contract.load(spark, SF, "documents")
    embeds = contract.load(spark, SF, "embeddings")
    events = contract.load(spark, SF, "events")

    plans = {
        "extraction (scan-aligned, default)": extract_pipeline(
            spark.read.parquet(SF + "/documents.parquet").limit(0).selectExpr(
                "cast(doc_id as string) doc_id",
                "array(struct('t' as kind, text, cast(null as string) media_ref, 0 as offset)) spans",
            )
        ),
        "exact_dedup": dedup.exact_dedup_stats(docs),
        "minhash_signatures": dedup.minhash_signatures(docs),
        "cosine_topk (broadcast + WindowGroupLimit)": similarity.cosine_topk(embeds),
        "ann_lsh_topk (banded buckets + multi-probe + cap)": similarity.ann_lsh_topk(embeds),
        "embedding_near_dup (banded blocking, capped)": similarity.embedding_near_dup_pairs(embeds),
        "ngram_jaccard (DF-capped blocking)": dedup.ngram_jaccard_pairs(docs),
        "token_stats (pruned scan + partial agg)": textstats.token_stats(docs),
        "quality_filter (map-side rules)": textstats.quality_filter(docs),
        "hash_sample (map-side membership)": sampling.hash_sample(docs),
        "token_budget_sample (two-phase prefix cut: summary window + (lang,pfx) data window)": sampling.token_budget_sample(
            docs, contract._TOKEN_BUDGETS, contract._TOKEN_BUDGET_DEFAULT
        ),
        "unigram_logprob (checkpointed doc_tf/counts, broadcast head + anti-join tail)": textstats.unigram_logprob(docs),
        "lsh_candidate_doc_pairs (capped band self-join)": dedup.lsh_candidate_doc_pairs(docs),
        "winnow_overlap_pairs (fingerprint equi-join, DF-capped, direct sizes)": dedup.winnow_overlap_pairs(docs),
        "simhash_near_dup_pairs (pigeonhole-exact band blocking + bit_count verify; 64-bit since r4)": dedup.simhash_near_dup_pairs(docs),
        "dedup_delta_pairs (persisted band index probe; corpus never re-shingled)": contract.q_dedup_delta_pairs(spark, SF),
        "simhash_delta_pairs (16 B/doc fingerprint index; bands derived map-side at probe)": contract.q_simhash_delta_pairs(spark, SF),
        "embedding_delta_near_dup (vectors+codes index; delta-only coding UDF)": contract.q_embedding_delta_near_dup(spark, SF),
        "ann_lsh_topk_indexed (partition-pruned bucket-index probe)": contract.q_ann_lsh_topk_indexed(spark, SF),
        "benchmark_contamination (broadcast benchmark set, map-side probe)": contract.q_benchmark_contamination(spark, SF),
        "lang_id_profile (map-side greatest-struct argmax)": contract.q_lang_id_profile(spark, SF),
        "session_stats (one shared window shuffle)": sessionize.session_stats(events),
        "line_dedup (hot-line anti-join + per-doc regroup)": contract.q_line_dedup(spark, SF),
        "pii_redact (pure map-side codegen regex)": contract.q_pii_redact(spark, SF),
        "source_cap_sample (two-phase prefix cut, unit weights)": sampling.source_cap_sample(docs),
        "dup_ngram_stats (materialized shingle frame, no pair enumeration)": dedup.dup_ngram_stats(docs),
        "substring_dedup (histogram + covered-interval union; JVM-side rewrite)": dedup.substring_dedup(docs, n=8),
        "edit_verified_pairs (Levenshtein over capped candidates, length-gap gate)": dedup.edit_verified_pairs(docs),
        "normalized_dedup (normalized-key digest agg)": dedup.normalized_dedup(docs),
        "sequence_pack (two-phase order-aligned packing prefix sum)": packing.sequence_pack(
            docs, seq_len=256, bucket_size=64
        ),
        "ann_pq_topk (PQ ADC: broadcast query tables over the coded scan)": similarity.ann_pq_topk(embeds),
        "ann_ivfpq_topk (coarse probe restriction + ADC over codes)": similarity.ann_ivfpq_topk(embeds),
        "ngram_containment (shared blocked-pair scaffolding, asymmetric score)": dedup.ngram_containment_pairs(docs),
        "substring_delta (persisted-histogram probe; only the delta tokenized)": contract.q_substring_delta(spark, SF),
        "ann_ivfpq_residual_topk (classical IVFADC: residual codes, per-probe tables)": similarity.ann_ivfpq_topk(embeds, residual=True),
        "ann_ivfpq_topk_indexed (partition-pruned residual-code probe, frozen quantizers)": contract.q_ann_ivfpq_topk_indexed(spark, SF),
        "ann_recall_at_k (4-method union joined to exact ground truth)": similarity.ann_recall_at_k(embeds),
        "semantic_dedup (frozen-centroid assignment; within-cluster min-id pruning)": similarity.semantic_dedup(embeds),
        "bigram_logprob (vocab²-bounded lp table; zipf head/tail split join)": textstats.bigram_logprob(docs),
        "tfidf_top_terms (df head/tail split; per-doc WindowGroupLimit rank)": textstats.tfidf_top_terms(docs),
        "source_kl_divergence (per-source KL rollup; broadcast source totals)": textstats.source_kl_divergence(docs),
        "perplexity_buckets (band-histogram two-phase per-lang tertile rank)": textstats.perplexity_buckets(docs),
        "cms_heavy_hitters (depth×4096 sketch from vocab counts; broadcast join back)": textstats.cms_heavy_hitters(docs),
        "cluster_balanced_sample (k-means assignment + two-phase stratum cap)": similarity.cluster_balanced_sample(embeds),
        "cms_delta_heavy_hitters (persisted constant-size sketch; only the delta tokenized)": contract.q_cms_delta_heavy_hitters(spark, SF),
        "hll_distinct_tokens (string-level rho; 256-register partial-agg sketch)": textstats.hll_distinct_tokens(docs),
        "quality_classifier_scores (map-side hashed-linear model; one doc shuffle)": textstats.quality_classifier_scores(docs),
        "source_temperature_mix (p^alpha mixing; 1-row broadcast totals)": textstats.source_temperature_mix(docs),
        "zipf_law_fit (banded two-phase head rank; integer regression sums)": textstats.zipf_law_fit(docs),
        "bloom_delta_new_docs (broadcast 65536-bit filter; O(delta) probe)": contract.q_bloom_delta_new_docs(spark, SF),
        "shingle_novelty (digest-restricted index join; per-doc novelty fold)": contract.q_shingle_novelty(spark, SF),
        "funnel_conversion (per-step user-keyed min-joins; pushed event_type filters)": sessionize.funnel_conversion(events),
        "asof_join_enrich (union-window as-of join; one user-keyed shuffle)": temporal.asof_enrich(events),
        "time_rollup (multi-resolution rollup; coarse levels from fine partials)": temporal.time_rollup(events),
        "session_concurrency (interval sweep; band histogram + in-band count)": temporal.session_concurrency(events),
        "source_overlap_matrix (winnow fps to sources; bounded fp join)": dedup.source_overlap_matrix(docs),
        "asof_delta_enrich (O(users) state-index probe + within-delta carry)": contract.q_asof_delta_enrich(spark, SF),
        "time_rollup_delta (persisted finest-grid partials; O(index) probe)": contract.q_time_rollup_delta(spark, SF),
        "label_centroid_similarity (rounded per-dim means; label-bounded joins)": similarity.label_centroid_similarity(embeds),
        "pmi_collocations (quantized five-term log2 sum; TakeOrdered top-K)": textstats.pmi_collocations(docs),
    }

    out = ["# PLANS — formatted physical plans for the headline queries\n"]
    out.append(
        "Generated by `python tools/show_plans.py` at sf0.001. Review points:\n"
        "pruned `ReadSchema`, `PushedFilters`, partial aggregation before each\n"
        "`Exchange`, `BroadcastExchange` for small sides, `WindowGroupLimit`\n"
        "(top-k pushdown), and a bare `MapInPandas` over the scan for\n"
        "extraction (no shuffle).\n"
    )
    for name, df in plans.items():
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        text = buf.getvalue()
        # keep the operator tree + scan details, drop verbose column lists
        out.append(f"\n## {name}\n\n```\n{text.strip()}\n```\n")
    with open(os.path.join(os.path.dirname(__file__), "..", "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    spark.stop()
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
