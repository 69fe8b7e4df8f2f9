#!/usr/bin/env bash
# sf1 oracle sweep for the ladder operator set (round-14 verdict item 3).
#
# Correctness is normally proven only at sf0.01; scale-dependent
# wrongness (an overflow past a clamp, a guard mis-scoped to driver
# scale like r13's autoPlanes bug) is invisible there. This runs the
# SAME Verify → DuckDB compare at sf1 for every ladder query that has
# an oracle, writing a CORRECTNESS-style artifact to CORRECTNESS_SF1.json.
#
# Usage: tools/check_sf1.sh [sfdir] (default target/scaledata/sf1 — run
#   `sbt "runMain graft.ScaleGen /root/testdata/sf0.1 target/scaledata/sf1 10"`
#   first if absent)
set -euo pipefail
cd "$(dirname "$0")/.."
SFDIR="${1:-target/scaledata/sf1}"
OUT=/tmp/verify_sf1
# Keep in sync with ScaleLadder.DefaultQueries (the ladder operator
# set), minus two classes the first r14 run showed cannot be
# sf1-replayed BY DESIGN:
#  - the `_auto` twins (qd_pagerank_auto, qd_kcore_auto): their oracle
#    bakes AutoOraclePlanes=4, valid only at driver scale — above
#    DriverScaleMaxRows the engine auto-sizes the plane count (8 at
#    sf1) and the edge sets legitimately diverge (the guard in
#    Dedup.autoPlanes documents exactly this boundary);
#  - qd_prefix_join: its oracle is the BRUTE all-pairs join (the
#    zero-false-negative proof), quadratic in the corpus — hours in
#    DuckDB at 50 k docs. Its pruning-equivalence stays pinned at
#    sf0.01 where the brute mirror is feasible.
QUERIES="qd_tfidf_pairs qd_manifest qd_pagerank \
qd_minhash_pairs qd_kcore qd_simhash_pairs \
qd_sorted_neighbors qp_split qp_dsir_eval qp_contamination qp_pack \
qt_zipf qt_bigram_lm qt_bm25 qe_bootstrap qe_rfm qe_heavytail \
qe_ltv_deciles qe_sessions qe_sessions_stitched qe_funnel \
qm_phash_clusters qs_mmr qs_knn_brute qs_knn_ivf qc_profile \
q_eb_shrinkage q21_waiting qo_topk qo_skew_join"
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
  sbt -batch "runMain graft.Verify $SFDIR $OUT $QUERIES"
python3 tools/check.py "$SFDIR" "$OUT" --json CORRECTNESS_SF1.json
