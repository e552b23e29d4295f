#!/bin/bash
# Round-14 third-batch scale points: the IVF-PQ lifecycle actuators —
# q264 retrain (audit -> decide -> refit quantizers on the live corpus
# -> re-encode -> re-audit; TWO full index generations inside the
# query) and q265 compaction policy (per-cluster stats -> two-trigger
# rule -> selective compact). These are the round-8/9 verdict's #2/#3
# items; their scale curves close the lifecycle record the way q263's
# did for the serving dial.
# Protocol = SCALE.md round-6/7/8: SPARK_GRAFT_BENCH_ONLY subset,
# NOWARM, two interleaved passes per scale, min per point.
set -u
cd /root/repo
QS="q264_ivfpq_retrain,q265_compaction_policy"
for pass in a b; do
  for scale in 1 10 30; do
    case $scale in
      1)  dir=/root/testdata/sf0.1 ;;
      10) dir=/tmp/scale10 ;;
      30) dir=/tmp/scale30 ;;
    esac
    out=/tmp/scale14c_x${scale}_${pass}.json
    echo "=== pass $pass scale ${scale}x ($dir) -> $out"
    SPARK_GRAFT_BENCH_ONLY="$QS" SPARK_GRAFT_BENCH_NOWARM=1 \
      SPARK_GRAFT_SF_DIR="$dir" \
      sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"metric"' > "$out"
    cat "$out"
  done
done
echo DONE
