#!/bin/bash
# 30x scale points for the three remaining heavy families (round-7
# verdict item 8): q13 dense argmax, q153 substr spans, q211 setsim.
# Protocol = SCALE.md round-6/7: SPARK_GRAFT_BENCH_ONLY subset,
# NOWARM, two interleaved passes per scale, min per point.
set -u
cd /root/repo
QS="q13_top1_similar,q153_exact_substr_spans,q211_setsim_join"
for pass in a b; do
  for scale in 1 10 30; do
    case $scale in
      1)  dir=/root/testdata/sf0.1 ;;
      10) dir=/tmp/scale10 ;;
      30) dir=/tmp/scale30 ;;
    esac
    out=/tmp/scale8_x${scale}_${pass}.json
    echo "=== pass $pass scale ${scale}x ($dir) -> $out"
    SPARK_GRAFT_BENCH_ONLY="$QS" SPARK_GRAFT_BENCH_NOWARM=1 \
      SPARK_GRAFT_SF_DIR="$dir" \
      sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"metric"' > "$out"
    cat "$out"
  done
done
