#!/bin/bash
# Round-14 scale points: the tokenizer lifecycle (q115 BPE comparator,
# q266 unigram train, q269 unigram encode) and the nprobe auto-dial
# (q263 = IVF-PQ build + sweep + serve). q268 banding auto is NOT here:
# like q16/q242/q243 it materializes the exact τ=0.7 pair set on the
# deliberately self-similar corpus (output volume, not operator cost —
# 333 s at sf0.1, the bench-exclusion class).
# Protocol = SCALE.md round-6/7/8: SPARK_GRAFT_BENCH_ONLY subset,
# NOWARM, two interleaved passes per scale, min per point.
# NOTE q266 is listed before q269 so within each pass's single JVM the
# unigram model memo charges TRAINING to q266 and ENCODE-ONLY to q269.
set -u
cd /root/repo
QS="q115_bpe_train,q266_unigram_vocab,q269_unigram_encode,q263_nprobe_auto"
for pass in a b; do
  for scale in 1 10 30; do
    case $scale in
      1)  dir=/root/testdata/sf0.1 ;;
      10) dir=/tmp/scale10 ;;
      30) dir=/tmp/scale30 ;;
    esac
    out=/tmp/scale14_x${scale}_${pass}.json
    echo "=== pass $pass scale ${scale}x ($dir) -> $out"
    SPARK_GRAFT_BENCH_ONLY="$QS" SPARK_GRAFT_BENCH_NOWARM=1 \
      SPARK_GRAFT_SF_DIR="$dir" \
      sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"metric"' > "$out"
    cat "$out"
  done
done
