#!/bin/bash
# Round-15 FULL-SUITE sf10 gate: every declared query at 100x bench scale,
# single repeat, split across fixtures exactly as SCALING_r14 prescribes:
#   - verbatim sf10: everything except the two bands below
#   - salted sf10s (--salt-docs): the doc-text pair-enumeration band, where
#     verbatim replication multiplies duplicate DENSITY (fixture artifact,
#     SCALING_r14 finding 1)
#   - verbatim sf1 (10x): the embedding pair-OUTPUT band (g3/g5/g15/g42/g44
#     list pairs within label/cluster blocks; 100x verbatim clones make the
#     OUTPUT quadratic — inherent to the brute-force baselines whose scale
#     paths are g4b/g5b/g15b)
set -e
cd /root/repo

# g30/g30b live in the PAIRS band since the r15 run: token-suffix salting
# decorrelates shingle sets but NOT prefix edit distance, so the fuzzy
# family's pair OUTPUT is quadratic in clone multiplicity under any
# clone-replicating fixture (SCALING_r15 finding 2)
SALTED="i23_stream_index_dedup,g2_dedup_near_jaccard,g2b_dedup_minhash_lsh,g2c_dedup_simhash,g72_dedup_lsh_recall,g17_contamination_ngram,g24_dedup_components,g25_dedup_pipeline,g27_contamination_bloom,g45_dedup_survivor,g49_incremental_dedup,g53_setsim_prefix,g53b_setsim_dict,g54_paragraph_dedup,g56_substring_dedup,g57_ngram_novelty,g60_containment_contamination,g62_dedup_source_matrix,g64_incremental_components"
PAIRS="g3_sim_cosine_pairs,g3b_sim_cosine_native,g5_knn_join,g5b_knn_lsh,g5c_knn_block,g15_dedup_embed_cosine,g15b_dedup_embed_lsh,g15c_dedup_embed_block,g42_kmeans_dedup,g44_graph_triangles,g30_fuzzy_pairs,g30b_fuzzy_pairs_banded"

# verbatim list = all queries minus the two bands (computed in-JVM via the
# NOT-form: Bench has no exclude flag, so generate the include list here)
ALL=$(python3 - <<'EOF'
import subprocess, json, re
# query names from the compiled SparkEntry via the last correctness run is
# stale; parse the operator sources instead (same regex Catalog uses)
import glob
names = []
for f in glob.glob('src/main/scala/graft/operators/*.scala'):
    names += re.findall(r'"([a-z][a-z0-9]+_[a-z0-9_]+)" -> \(\(', open(f).read())
print(','.join(sorted(set(names))))
EOF
)
python3 - "$ALL" "$SALTED" "$PAIRS" <<'EOF' > /tmp/r15_verbatim_list
import sys
allq = set(sys.argv[1].split(','))
drop = set(sys.argv[2].split(',')) | set(sys.argv[3].split(','))
print(','.join(sorted(allq - drop)))
EOF
VERBATIM=$(cat /tmp/r15_verbatim_list)
echo "verbatim n=$(echo $VERBATIM | tr ',' '\n' | wc -l)  salted n=$(echo $SALTED | tr ',' '\n' | wc -l)  pairs n=$(echo $PAIRS | tr ',' '\n' | wc -l)"

run_band () { # name sfdir only out
  echo "=== band $1 on $2 start $(date +%T)"
  SPARK_GRAFT_SF_DIR="$2" SPARK_GRAFT_ONLY="$3" \
  SPARK_GRAFT_CPUS=32 SPARK_GRAFT_REPEATS=1 SPARK_DRIVER_MEM=48g \
    sbt -batch "runMain graft.Bench" 2>/tmp/r15_sf10_$1.err | grep -F '"metric"' | head -1 || true
  cp bench_last.json "$4" 2>/dev/null || echo "band $1: no bench_last.json"
  echo "=== band $1 done $(date +%T)"
}

run_band verbatim /tmp/graft_sf10  "$VERBATIM" bench_r15_sf10.json
run_band salted   /tmp/graft_sf10s "$SALTED"   bench_r15_sf10s.json
run_band pairs    /tmp/graft_sf1   "$PAIRS"    bench_r15_sf1pairs.json
echo "ALL BANDS DONE"
