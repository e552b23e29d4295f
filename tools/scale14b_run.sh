#!/bin/bash
# Round-14 second-batch scale points: q270 unigram decode (artifact
# decode + word-keyed corpus join) and q271 BM25 (k1, b) auto-dial
# (grid sweep + choice + serve), with q244 fixed-dial multi-BM25 as the
# single-point comparator for q271's 12-point sweep overhead.
# Protocol = SCALE.md round-6/7/8: SPARK_GRAFT_BENCH_ONLY subset,
# NOWARM, two interleaved passes per scale, min per point.
# NOTE q266 precedes q270 so the unigram model memo charges TRAINING
# to q266 and DECODE-ONLY to q270 (the q269 convention).
set -u
cd /root/repo
QS="q266_unigram_vocab,q270_unigram_decode,q244_multi_bm25,q271_bm25_params_auto"
for pass in a b; do
  for scale in 1 10 30; do
    case $scale in
      1)  dir=/root/testdata/sf0.1 ;;
      10) dir=/tmp/scale10 ;;
      30) dir=/tmp/scale30 ;;
    esac
    out=/tmp/scale14b_x${scale}_${pass}.json
    echo "=== pass $pass scale ${scale}x ($dir) -> $out"
    SPARK_GRAFT_BENCH_ONLY="$QS" SPARK_GRAFT_BENCH_NOWARM=1 \
      SPARK_GRAFT_SF_DIR="$dir" \
      sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"metric"' > "$out"
    cat "$out"
  done
done
echo DONE
