#!/bin/bash
# Round-12 sequential benchmark pipeline (lock-free; run AFTER sbt test).
# Uses a classes snapshot so a concurrent recompile can't mix versions.
set -x
cd /root/repo
SNAP=/tmp/r12_bench_classes
rm -rf "$SNAP"; cp -r target/scala-2.13/classes "$SNAP"
run() { # run_main.sh against the snapshot
  CP="$SNAP:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
  SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
  java -Xmx96g $(for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio java.util java.util.concurrent java.util.concurrent.atomic jdk.internal.ref sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do echo --add-opens=java.base/$p=ALL-UNNAMED; done) \
    -cp "$CP" "$@"
}

# 1. ladders for the round-12 ops (x1 clean re-run + x4 + x16)
for f in 1 4 16; do
  SPARK_GRAFT_PASSES=3 run graft.ScaleReplay /root/testdata/sf0.1 $f \
    m10_keyframe_neardup,c7_curate_fert,es23_stream_quarantine,j13_stitch \
    2>/dev/null | grep -E '^\{' >> /tmp/r12_ladders.jsonl
done

# 2. x100 corpus (capstone)
run graft.ScaleReplay /root/testdata/sf0.1 100 2>/dev/null | grep -E '^\{'

# 3. capstone five at x100 (Bench: min-of-2+, memory/spill columns)
SPARK_GRAFT_ONLY=d19_substring_dedup,m6_phash_neardup,c4_curate_bp,es21_stream_cdf,s11_ann_recall \
SPARK_GRAFT_SF_DIR=/root/repo/target/scale_replay/sf0.1_x100 \
  run graft.Bench 2>/tmp/r12_x100.err | tail -1 > /tmp/r12_x100.json
cp /root/repo/BENCH_DETAIL.json /root/repo/BENCH_X100_DETAIL.json

# 4. full-set Bench on the 10x corpus -> BENCH_SF1 refresh (253 queries)
SPARK_GRAFT_SF_DIR=/root/repo/target/scale_replay/sf0.1_x10 \
  run graft.Bench 2>/tmp/r12_sf1.err | tail -1 > /root/repo/BENCH_SF1.json
cp /root/repo/BENCH_DETAIL.json /root/repo/BENCH_SF1_DETAIL.json

# 5. full-set Bench at 1x (sf0.1) for the DuckDB comparison + capstone 1x baselines
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  run graft.Bench 2>/tmp/r12_1x.err | tail -1 > /tmp/r12_1x.json
cp /root/repo/BENCH_DETAIL.json /tmp/r12_1x_detail.json

echo PIPELINE_DONE
