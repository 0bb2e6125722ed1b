#!/usr/bin/env bash
# Scale-ladder probe beyond sf1 (round-11 verdict item 6): generate a
# deterministic 30x/100x corpus from the driver's sf0.1, run the
# scale-sensitive query families twice for cross-layout bit-parity
# (local[16] vs local[32]), then bench the subset. Complements
# tools/sf1_sweep.sh (which runs the FULL surface at 10x); this rung
# trades surface width for another order of magnitude of volume.
#
# Usage:   tools/scale_probe.sh 30     # sf3  (~18M lineitem / 150k docs)
#          tools/scale_probe.sh 100    # sf10 (~60M lineitem / 500k docs)
#          SCALE_SKIP_BENCH=1 tools/scale_probe.sh 30   # parity only
#          SCALE_CLIQUE_CAP=8 tools/scale_probe.sh 100  # bounded-clique
#            corpus (sfNc8 dir): near-dup cliques capped at 8 replicas,
#            the rest (doc,replica)-salted singletons — pair output is
#            LINEAR in factor, so the PAIR set runs at ANY factor
# Results: record the outcome in TESTDATA.md's scale-ladder section.
#
# Subset adjudication (why not the full 90-query surface):
#  - LINEAR set: queries whose work AND output scale ~linearly in row
#    volume — the honest engine-scaling signal at any factor.
#  - PAIR set: the near-dup pair/cluster family. ScaleGen's corpus
#    shape makes EVERY source doc a near-dup cluster of `factor`
#    distinct variants, so the pair-list contract's own output (and
#    the Jaccard verify join feeding it) grows ~factor^2 per doc —
#    C(30,2)=435 pairs/doc at 30x (~2.2M verified pairs, a genuine
#    adversarial boilerplate-crawl stress test, included), C(100,2)
#    =4950 pairs/doc at 100x (~25M pairs x ~300 shingles each in the
#    verify expansion — measuring the generator's quadratic contract,
#    not the engine; excluded above 30x). A real 100 TB crawl bounds
#    cluster width statistically; this generator deliberately doesn't.
set -euo pipefail
cd "$(dirname "$0")/.."

FACTOR="${1:?usage: scale_probe.sh <factor (e.g. 30 or 100)>}"
CAP="${SCALE_CLIQUE_CAP:-0}"
SF="sf$((FACTOR / 10))"
if [ "$CAP" -gt 0 ]; then SF="${SF}c${CAP}"; fi
DIR=".scratch/$SF"

LINEAR=(q1_pricing_summary eco_stats eco_distinct_users
  q13_asof_join q15_asof_stitched q16_interval_join q17_asof_forward
  q18_asof_tolerance
  llm_dedup_exact llm_dedup_incremental llm_dedup_bloom
  llm_segment_dedup llm_fingerprint llm_contamination
  llm_inverted_index llm_knn_exact llm_dedup_embed)
PAIR=(llm_dedup_near llm_dedup_near_incr llm_dedup_clusters llm_simhash_pairs llm_curate)

SUBSET=("${LINEAR[@]}")
# unbounded cliques: pair output is quadratic in factor above 30x
# (generator contract, not engine) — capped corpora are pair-linear,
# so the PAIR set runs at any factor
if [ "$FACTOR" -le 30 ] || [ "$CAP" -gt 0 ]; then SUBSET+=("${PAIR[@]}"); fi

# SCALE_FULL=1: sweep the ENTIRE declared surface instead of the
# scale-sensitive subset (round-14 completeness rung — "no query's
# semantics drift with volume" measured everywhere, not argued from
# the sf1 sweep). Only sensible on a bounded-clique corpus (pair
# family) — refuse otherwise. Verify with no query list runs all.
if [ "${SCALE_FULL:-0}" = "1" ]; then
  if [ "$FACTOR" -gt 30 ] && [ "$CAP" -eq 0 ]; then
    echo "SCALE_FULL needs SCALE_CLIQUE_CAP above 30x (pair family is generator-quadratic)"; exit 1
  fi
  SUBSET=()
fi

if [ ! -d "$DIR" ]; then
  echo "== generating $DIR (deterministic ${FACTOR}x of sf0.1, cliqueCap=$CAP) =="
  if [ "$CAP" -gt 0 ]; then
    SPARK_DRIVER_MEM=24g sbt -batch "runMain graft.ScaleGen /root/testdata/sf0.1 $DIR $FACTOR $CAP"
  else
    SPARK_DRIVER_MEM=24g sbt -batch "runMain graft.ScaleGen /root/testdata/sf0.1 $DIR $FACTOR"
  fi
fi

echo "== Verify leg A: local[16], ${#SUBSET[@]} queries =="
SPARK_GRAFT_CPUS=16 SPARK_DRIVER_MEM=48g \
  sbt -batch "runMain graft.Verify $DIR /tmp/${SF}_a ${SUBSET[*]}"
echo "== Verify leg B: local[32] (layout determinism) =="
SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
  sbt -batch "runMain graft.Verify $DIR /tmp/${SF}_b ${SUBSET[*]}"

echo "== cross-layout parity A vs B =="
python3 tools/verify_compare.py "/tmp/${SF}_a" "/tmp/${SF}_b"

if [ "${SCALE_SKIP_BENCH:-0}" != "1" ] && [ "${#SUBSET[@]}" -gt 0 ]; then
  echo "== bench subset at $SF =="
  SPARK_GRAFT_SF_DIR="$DIR" SPARK_DRIVER_MEM=48g \
    SPARK_GRAFT_BENCH_ONLY="$(IFS=,; echo "${SUBSET[*]}")" \
    SPARK_GRAFT_BENCH_OUT="/tmp/${SF}_bench.json" \
    SPARK_GRAFT_BENCH_FULL_OUT="/tmp/${SF}_bench_full.json" \
    sbt -batch "runMain graft.Bench" | tail -1
  echo "$SF bench record: /tmp/${SF}_bench_full.json (do NOT commit as BENCH_FULL.json)"
fi
echo "== $SF probe complete =="
