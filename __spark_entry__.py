"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over the query catalog in
``movie_data_pipeline_spark.plans`` — every implemented operator from
SURVEY.md §2 (plus the LLM-pipeline extensions) registers there as a
(Spark builder, DuckDB oracle SQL) pair with aligned column names and
rounding.
"""

from __future__ import annotations

import glob
import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from movie_data_pipeline_spark.plans import REGISTRY

FLAGSHIP = "q02_region_revenue"
SMOKE_SF_DIR = "/root/testdata/sf0.001"

# The verification driver records CORRECTNESS rows for the first 50
# entries of the ``queries()`` dict in INSERTION order (proven by
# CORRECTNESS_r02: the verified set was exactly the first 50 entries of
# the sorted-by-canonical-name dict, not the ``a_``-aliased sort order).
# To rotate driver coverage across the full catalog, the dict is built
# with never-driver-verified queries inserted FIRST — an explicit
# priority window (heaviest extension operators + the oldest unverified
# block), then the remaining unverified sorted, then the verified
# sorted.  Canonical names stay in
# ``movie_data_pipeline_spark.plans.REGISTRY`` and in all tests/bench.
#
# The verified set is DERIVED from the CORRECTNESS_r{N}.json files the
# driver itself writes into the repo root — a name counts as verified
# only when its row was fully green (rows+schema+hash, no err) in some
# round. No per-round manual update, nothing to forget: the next
# round's files extend the set automatically, and a RED row keeps its
# query in the re-verification window.


def _load_green_rounds() -> dict[str, int]:
    """name -> latest round number whose CORRECTNESS row was fully
    green (rows+schema+hash, no err)."""
    here = os.path.dirname(os.path.abspath(__file__))
    green_round: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        stem = os.path.basename(path)[len("CORRECTNESS_r"):].split(".")[0]
        try:
            rnd = int(stem)
        except ValueError:
            continue
        try:
            with open(path) as fh:
                data = json.load(fh)
        except (OSError, ValueError):
            continue
        for key, row in data.items():
            if not isinstance(row, dict):
                continue
            green = (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match", True)  # rows-only checks
                and not row.get("err")
            )
            if green:
                name = key[2:] if key.startswith("a_") else key
                green_round[name] = max(green_round.get(name, 0), rnd)
    return green_round


_GREEN_ROUND: dict[str, int] = _load_green_rounds()
_DRIVER_VERIFIED: frozenset[str] = frozenset(_GREEN_ROUND)


# Hand-picked head of this round's 50-query verification window: the
# most algorithmically intricate never-verified oracles (VERDICT r3 #5
# "promote these first" — numeric ordering alone would stop at ~q152
# and never reach them), ahead of the oldest unverified block.  Names
# not in REGISTRY or already driver-verified are ignored.
_PRIORITY: tuple[str, ...] = (
    "q155_kcore_peeling",  # iterative k-core — VERDICT r3 #5
    "q171_pca_power_iteration",
    "q176_item_item_cf",
    "q179_lpa_communities",
    "q185_trigram_search",
    "q191_kaplan_meier",
    "q228_chaining_audit",  # Jaccard df-cap rework (VERDICT r3 #3)
    "q229_dedup_threshold_curve",
    "q239_stop_shingle_lexicon",
    "q244_streaming_multibatch_gate",  # new this round — VERDICT r3 #7
    "q245_df_cap_sensitivity",  # new this round — VERDICT r3 #3
)

# Queries whose registered plan AND oracle changed semantics in some
# round AFTER their last green driver row (round 4: the
# q239-calibrated ``max_shingle_df`` cap wired into the Jaccard
# family — VERDICT r3 #3).  Their old green rows verified the OLD
# semantics, so each re-enters the verification window until the
# driver records a green row from a round >= the change round (the r4
# rows themselves were recorded post-change, so any r4+ green counts).
# Placement math (VERDICT r4 #1/#3): forced names are inserted AFTER
# ``rest_unverified`` — never displacing never-driver-verified queries
# from the 50-row window — so with 68 never-verified names in r5 they
# sit at positions 69-75 (outside the window, r5 stays 50 fresh
# first-time names), and in r6, with only 18 never-verified left, they
# land at positions 19-25 and all get re-verified.  Once re-greened
# they auto-deactivate via ``_GREEN_ROUND``; nothing to hand-edit.
_REVERIFY_QUEUE: dict[str, int] = {
    # name -> first round whose green row counts as post-change
    "q18_ngram_jaccard_dupes": 4,
    "q63_duplicate_clusters": 4,
    "q82_dedup_kept_corpus": 4,
    "q121_lsh_quality_audit": 4,
    "q134_duplicate_clusters_star": 4,
    "q149_containment_pairs": 4,
    "q209_cluster_best_rep": 4,
    # round 6: q64 rewritten to the segment (lead + gap-explode) LOCF
    # formulation — outputs hash-identical at sf0.01/sf0.001 (builder
    # driver_sim green both), but the registered plan changed, so the
    # green row should postdate the rewrite.
    "q64_hourly_locf": 6,
    # round 6 sf0.1 sweep: latent cross-engine divergence fixed with a
    # SEMANTIC change (computed per-part effects round4-quantized
    # before the decimal rollup) — the old green row verified the old
    # semantics. (q238's twin fix needs no queue entry: it has never
    # had a green driver row, so it is in the window as never-verified
    # already.)
    "q196_pvm_bridge": 6,
    # round 7: both registered plans sample-bounded (VERDICT r6 #1/#3);
    # round 8: rewired onto the shared fixed_sample/fixed_sample_ctes
    # helper (VERDICT r7 #6 — outputs hash-identical, builder-verified
    # at all 3 SFs, but the registered plan + oracle text changed).
    "q256_margin_candidate_mining": 8,
    "q248_lsh_scurve_sweep": 8,
    # round 7: rows-per-band ladder cap raised 8 -> 12 after the 100x
    # probe (r=8 saturated the sig space above ~8k vectors/side).
    # Outputs at every driver SF are unchanged (the new rungs engage
    # only at probe scale), but plan + oracle text changed.
    "q256b_margin_mining_lsh": 7,
    # round 8: q264/q272's exact ground-truth legs sample-bounded with
    # the shared fixed_sample helper (VERDICT r7 #1 — the query set is
    # now a fixed-size md5-bucket sample; modulus 1 at every test SF so
    # outputs are unchanged there, but the registered plans + oracles
    # changed).
    "q264_ivf_recall_sweep": 8,
    "q272_pq_codebook_audit": 8,
    # round 8: SimHash family migrated to the 60-bit fingerprint
    # (VERDICT r7 #2; q21's r8+ green row still covers it — the
    # fingerprint is untouched since).
    "q21_simhash": 8,
    # round 8: q268/q277's groupBy key digested to a fixed-width md5
    # prefix on both engines (VERDICT r7 #3 — ~5x less shuffle bytes;
    # spans identical, plan + oracle text changed).
    # round 12 (optimization): _dup_spans' shared-window test rewritten
    # from groupBy + semi-join to min/max over a digest-partitioned
    # window — the corpus-wide explode+md5 subtree is evaluated ONCE
    # instead of four times (oracle untouched; outputs hash-identical
    # at sf0.001/sf0.01 in the builder's driver_sim, but the
    # registered plans changed shape). q281 consumes the same helper.
    "q268_repeated_passages": 12,
    "q277_passage_scrub_savings": 12,
    "q281_granularity_agreement": 12,
    # round 12 (optimization): containment_pairs emits both directions
    # map-side from ONE evaluation of the pair+size join instead of a
    # unionAll that inlined the whole subtree twice (measured -31% at
    # sf0.1; output-identical, driver_sim green at sf0.01, oracle
    # untouched). Candidate persists for the jaccard family were
    # measured (q18/q63/q273/q276) and REJECTED as regressions — those
    # plans are byte-identical to round 11, so they are not queued.
    "q149_containment_pairs": 12,
    # round 12 (optimization): ppjoin_pairs caches its verification
    # array frame — consumed by both verify dims on different join
    # keys, the collect_list+sort aggregate ran twice (q144 measured
    # 9.7->5.1 s same-context at sf0.1; output-identical, driver_sim
    # green at sf0.01/sf0.001).
    "q144_ppjoin_pairs": 12,
    # round 12 (optimization): the symmetrize/flag/credit unions that
    # inlined their (often expensive) source subtree once per
    # orientation are now map-side two/three-way explodes of ONE
    # evaluation — connected_components/_star (every CC consumer), the
    # q103 edge symmetrization, q116's triangle corner credit + degree,
    # q155's basket-pair symmetrization, q179's edge symmetrization,
    # q198's degree count, q281's pair-member flag. Outputs identical
    # (driver_sim green at sf0.01 for all 14 touched names; oracles
    # untouched); measured -9% to -25% at sf0.1.
    "q82_dedup_kept_corpus": 12,
    "q103_pagerank_trade_graph": 12,
    "q116_copurchase_triangles": 12,
    "q139_corpus_pipeline_report": 12,
    "q155_kcore_peeling": 12,
    "q173_leakage_free_split": 12,
    "q175_entity_resolution": 12,
    "q179_lpa_communities": 12,
    "q182_dedup_savings": 12,
    "q198_degree_powerlaw": 12,
    "q209_cluster_best_rep": 12,
    "q228_chaining_audit": 12,
    "q288_cluster_churn_audit": 12,
    # round 9: SimHash banding migrated to the size-adaptive block-
    # combination ladder (VERDICT r8 #1 — rung from the in-plan
    # fingerprint count; published pair sets CHANGE at every SF: rung 1
    # is exact for Hamming<=5, so q79/q274 gained the pairs the fixed
    # 4x15 layout missed — these entries supersede their round-8 ones).
    # q21's fingerprints are untouched by the ladder.
    "q79_simhash_hamming_pairs": 9,
    "q274_simhash_quality_audit": 9,
    # round 9: q279's Spark-side host regex '^www\.' re-escaped for
    # Spark's SQL literal parser (ADVICE r8 — the shipped pattern
    # reached the regex engine as '^www.'; inert on this corpus, so
    # outputs are unchanged, but the registered plan text changed).
    "q279_url_host_dedup_rollup": 9,
    # round 10 (ADVICE r9): the rung=None ladder path lazily local-
    # checkpoints the fingerprint frame so the in-plan count no longer
    # re-evaluates the aggregation subtree — outputs unchanged, but
    # the registered q79/q274 plans changed shape; q286's shard-width
    # count now aggregates the pre-rank frame instead of replaying the
    # range-partition sort (values identical).
    "q79_simhash_hamming_pairs": 10,
    "q274_simhash_quality_audit": 10,
    "q286_training_order_manifest": 10,
    # round 11: q297's pricing body factored into the _skew_pricing_frame
    # helper shared with q306 (oracle byte-identical — asserted against
    # the r10 tree — and the plan is the same DAG, but the registered
    # builder changed), and the band-row builders gained the
    # bit_blocks=None parameter (default path identical).
    "q297_simhash_skew_pricing": 11,
    # round 13 (optimization): _wj_scored consumes its candidate frame
    # ONCE (jaccard_capped rides through the shared-weight aggregate —
    # the second inline of the whole jaccard_pairs subtree is gone);
    # q254's exact-intersection leg emits source pairs map-side from
    # one bucket pass instead of a self-join; ppjoin_pairs bounds its
    # persists with an eager local checkpoint (q144's registered plan
    # becomes a checkpoint scan). Oracles untouched; driver_sim green
    # at sf0.01 for all four.
    "q273_idf_weighted_jaccard": 13,
    "q276_weighted_dedup_agreement": 13,
    "q254_kmv_overlap_estimates": 13,
    "q144_ppjoin_pairs": 13,
    # round 13 (optimization): the gate writers' bucket append is a
    # REBALANCE instead of a fixed k-way repartition, and the replay-
    # idempotency anti-join is persisted across its emptiness probe +
    # commit — every gate-driven replay re-verifies; q312/q317 overlap
    # their two independent compactions and q316 its three snapshot
    # probes from driver threads (outputs deterministic). driver_sim
    # green at sf0.01 for all 18 touched replay names.
    "q205_streaming_dedup_gate": 13,
    "q244_streaming_multibatch_gate": 13,
    "q287_simhash_index_gate": 13,
    "q292_simhash_multibatch_gate": 13,
    "q295_index_erasure_audit": 13,
    "q296_simhash_rung_migration": 13,
    "q299_erasure_vacuum_compliance": 13,
    "q301_minhash_index_erasure": 13,
    "q302_midstream_erasure_gate": 13,
    "q307_banding_migration_gate": 13,
    "q308_partitioned_index_erasure": 13,
    "q311_centered_gate_replay": 13,
    "q312_gate_compaction_replay": 13,
    "q313_recommended_gate_replay": 13,
    "q315_center_threshold_drift": 13,
    "q316_ivf_cell_split_recovery": 13,
    "q317_bucketed_gate_compaction": 13,
}


def _active_reverify(
    queue: dict[str, int], green_round: dict[str, int]
) -> tuple[str, ...]:
    return tuple(
        n for n, since in queue.items() if green_round.get(n, 0) < since
    )


_FORCE_REVERIFY: tuple[str, ...] = _active_reverify(
    _REVERIFY_QUEUE, _GREEN_ROUND
)

# Freshness rotation of the VERIFIED tail (VERDICT r7 #4, made
# automatic in round 9 per VERDICT r8 #2): the verified tier is
# ordered STALEST GREEN ROW FIRST (latest green round ascending, then
# query number), so whatever block is oldest in the ledger leads the
# tail each round with nothing to hand-edit — re-greened names sink to
# the back automatically as the driver writes fresher rows. Round 9
# this puts the r1-era q12–q24 block first, then the 47-name r3
# cohort, exactly the VERDICT's rotation plan — and every later round
# inherits the policy.


def _qnum(name: str) -> tuple[int, str]:
    digits = ""
    for ch in name[1:]:
        if not ch.isdigit():
            break
        digits += ch
    return (int(digits) if digits else 10**9, name)


def _rotation_order() -> list[str]:
    """Catalog names, never-driver-verified first (priority window,
    then remaining unverified in ascending query number — oldest block
    first), then the force-reverify queue (stale greens re-enter only
    once no never-verified name would be displaced from the window),
    then verified sorted."""
    priority = [
        n for n in _PRIORITY
        if n in REGISTRY and n not in _DRIVER_VERIFIED
    ]
    rest_unverified = sorted(
        (n for n in REGISTRY
         if n not in _DRIVER_VERIFIED and n not in priority),
        key=_qnum,
    )
    forced = [
        n for n in _FORCE_REVERIFY
        if n in REGISTRY and n in _DRIVER_VERIFIED
    ]
    verified = sorted(
        (n for n in REGISTRY
         if n in _DRIVER_VERIFIED and n not in forced),
        key=lambda n: (_GREEN_ROUND.get(n, 0), _qnum(n)),
    )
    return priority + rest_unverified + forced + verified


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return REGISTRY[FLAGSHIP].build(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: REGISTRY[name].build for name in _rotation_order()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for every SQL-expressible query."""
    return {
        name: REGISTRY[name].oracle
        for name in _rotation_order()
        if REGISTRY[name].oracle is not None
    }
