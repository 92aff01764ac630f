#!/bin/bash
# Constrained-heap resilience probe: run the heaviest queries at 30x
# under a deliberately small driver/executor heap (default 4g — the
# reference's production executor size, spark_config.sh.sample:6) and
# record finish-vs-OOM per query. Usage:
#   scripts/heapprobe.sh <sfDir> [heap] [query...]
set -u
DIR=${1:-/tmp/benchdata/sf3}
HEAP=${2:-4g}
shift 2 2>/dev/null || shift $# 2>/dev/null
QUERIES=${@:-"q189_stream_interval_join q125_dimsum_exact q80_als_recommend \
q139_incremental_neardup q145_dup_clusters q148_curation_pipeline \
q191_triangles q100_top_missed q179_bigram_hashed q101_similar_users"}
for q in $QUERIES; do
  out=$(SPARK_DRIVER_MEM=$HEAP sbt -batch "runMain graft.ProbeOne $q $DIR" 2>&1)
  line=$(echo "$out" | grep -oE "$q [^ ]+: [0-9.]+ s" | tail -1)
  if [ -n "$line" ]; then
    echo "OK   $HEAP $line"
  elif echo "$out" | grep -q "OutOfMemoryError"; then
    echo "OOM  $HEAP $q"
  else
    echo "FAIL $HEAP $q ($(echo "$out" | grep -m1 -oE 'Exception[^;]{0,80}'))"
  fi
done
