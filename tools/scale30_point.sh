#!/bin/bash
# One scale-study point: tools/scale30_point.sh <scale: 1|10|30> <pass: a|b>
# Protocol = SCALE.md round-6/7 (SPARK_GRAFT_BENCH_ONLY subset, NOWARM,
# min-of-two interleaved passes taken offline).
set -u
cd /root/repo
scale=$1; pass=$2
QS="q13_top1_similar,q153_exact_substr_spans,q211_setsim_join"
case $scale in
  1)  dir=/root/testdata/sf0.1 ;;
  10) dir=/tmp/scale10 ;;
  30) dir=/tmp/scale30 ;;
esac
out=/tmp/scale8_x${scale}_${pass}.json
SPARK_GRAFT_BENCH_ONLY="$QS" SPARK_GRAFT_BENCH_NOWARM=1 \
  SPARK_GRAFT_SF_DIR="$dir" \
  sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"metric"' > "$out"
cat "$out"
