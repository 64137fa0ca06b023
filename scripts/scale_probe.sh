#!/usr/bin/env bash
# Empirical scale probe: bench the heavy tiers at 1x (the sf dir) and
# Nx (a ScaleProbe-derived fixture that replicates each table's
# workload shape with key-disjoint copies) on the same box, min-of-RUNS
# each, and write BENCH_SCALE.json with per-query scaling ratios. A
# query whose wall-clock grows faster than the data factor is flagged
# super_linear and needs a named cause (there is NO tolerance band: a
# ratio above the factor is never labeled linear — noise-suspect rows
# get re-probed on an idle box, not relabeled) — this is the run that
# tests the "one exchange / bounded collect" 100x claims with data
# instead of plan shapes.
#
# Usage: scripts/scale_probe.sh [factor=10] [runs=3] [queries-csv] [sfdir]
set -eu
cd "$(dirname "$0")/.."
FACTOR=${1:-10}
RUNS=${2:-3}
QUERIES=${3:-q_dedup_corpus,q_dedup_minhash,q_pagerank,q_kcore,q_weighted_quartiles,q_concurrency,q_linkage_score,q_dedup_embedding_lsh,q_ann_ivf,q_mutual_nn,q_semantic_dedup,q_ktruss,q_clustering_coeff,q_triangle_count,q_linkage_incremental,q_linkage_fuzzy,q_hits,q_pagerank_weighted,q_ks_test,q_neardup_incremental,q_dedup_substring,q_linkage_multiblock,q_linkage_sorted_nbhd,q_linkage_jw,q_auc,q_linkage_dl,q_linkage_star,q_ndcg,q_lead_time_percentiles,q_dedup_transitivity,q_label_prop,q_linkage_hybrid,q_linkage_sn_incremental,q_map,q_brier,q_calibration_bins,q_comparator_sql,q_ece,q_kendall_tau,q_community_quality,q_modularity,q_cliffs_delta,q_fairness_report,q_label_prop_weighted,q_louvain,q_louvain_gain,q_linkage_hybrid_incremental,q_isotonic,q_importance_weights}
SFDIR=${4:-/root/testdata/sf0.1}
OUT=/tmp/graft_scale/x$FACTOR
MAX_LOAD=${MAX_LOAD:-2}

# our OWN previous bench leg leaves the 1-min loadavg elevated for a
# minute or two, so the idle wait runs before EVERY leg, not just once
wait_idle() {
  for i in $(seq 1 60); do
    L=$(cut -d' ' -f1 /proc/loadavg)
    python3 -c "import sys; sys.exit(0 if float('$L') < float('$MAX_LOAD') else 1)" && return 0
    [ "$i" = 60 ] && { echo "box still loaded (loadavg $L); refusing"; exit 1; }
    echo "# loadavg $L >= $MAX_LOAD, waiting ($i)..."
    sleep 10
  done
}
wait_idle

echo "# building ${FACTOR}x fixture at $OUT (no-op if present)..."
sbt -batch "runMain graft.tools.ScaleProbe $SFDIR $OUT $FACTOR" \
  >/tmp/scale_probe_build.log 2>&1 \
  || { echo "FIXTURE BUILD FAILED"; tail -5 /tmp/scale_probe_build.log; exit 1; }

bench_at() {
  local dir="$1" out="$2"
  SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
  SPARK_GRAFT_BENCH_RUNS="$RUNS" SPARK_GRAFT_BENCH_ONLY="$QUERIES" \
  SPARK_GRAFT_BENCH_OUT="$out" SPARK_GRAFT_BENCH_REFUSE_LOADED=1 \
    sbt -batch "runMain graft.Bench" >/tmp/scale_probe_$(basename "$out").log 2>&1 \
    || { echo "BENCH at $dir FAILED"; tail -5 /tmp/scale_probe_$(basename "$out").log; exit 1; }
}

echo "# plan-offender sweep at ${FACTOR}x (PlanAuditSpec against the big fixture)..."
GRAFT_AUDIT_DIR="$OUT" sbt -batch "testOnly graft.PlanAuditSpec" \
  >/tmp/scale_probe_audit.log 2>&1 \
  && grep -q "All tests passed" /tmp/scale_probe_audit.log \
  || { echo "PLAN AUDIT at ${FACTOR}x FAILED"; tail -10 /tmp/scale_probe_audit.log; exit 1; }
echo "# plan audit green at ${FACTOR}x"
wait_idle
echo "# benching 1x ($SFDIR, min-of-$RUNS)..."
bench_at "$SFDIR" /tmp/scale_probe_base.json
wait_idle
echo "# benching ${FACTOR}x ($OUT, min-of-$RUNS)..."
bench_at "$OUT" /tmp/scale_probe_big.json

python3 - "$FACTOR" <<'EOF'
import json, sys
factor = int(sys.argv[1])
base = json.load(open('/tmp/scale_probe_base.json'))
big = json.load(open('/tmp/scale_probe_big.json'))
qb, qg = base['queries'], big['queries']
rows = {}
for k in sorted(set(qb) | set(qg)):
    t1, tn = qb.get(k), qg.get(k)
    ratio = round(tn / t1, 2) if t1 and tn else None
    # no tolerance band: anything above the data factor is flagged —
    # a noisy row gets RE-PROBED on an idle box, never relabeled
    verdict = (None if ratio is None else
               'super_linear' if ratio > factor else
               'linear' if ratio > 0.5 * factor else 'sub_linear')
    rows[k] = {'t_1x': t1, f't_{factor}x': tn, 'ratio': ratio,
               'verdict': verdict}
out = {'factor': factor,
       'load': {'base': base.get('load'), 'big': big.get('load')},
       'queries': rows}
json.dump(out, open('BENCH_SCALE.json', 'w'), indent=1)
print(f"{'query':26} {'1x':>8} {f'{factor}x':>8} {'ratio':>7}  verdict")
for k, r in rows.items():
    print(f"{k:26} {r['t_1x'] or float('nan'):8.2f} "
          f"{r[f't_{factor}x'] or float('nan'):8.2f} "
          f"{r['ratio'] or float('nan'):7.2f}  {r['verdict']}")
bad = [k for k, r in rows.items() if r['verdict'] == 'super_linear']
print("# wrote BENCH_SCALE.json" + (f" — SUPER-LINEAR: {','.join(bad)}" if bad else " — all <= linear"))
EOF
