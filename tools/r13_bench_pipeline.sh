#!/bin/bash
# Round-13 sequential benchmark pipeline (lock-free; run on a QUIET box
# after correctness sweeps). Every number STATUS r13 quotes must come out
# of the artifacts this script writes (VERDICT r12 "what's wrong" #1).
# Uses a classes snapshot so a concurrent recompile can't mix versions.
set -x
cd /root/repo
SNAP=/tmp/r13_bench_classes
rm -rf "$SNAP"; cp -r target/scala-2.13/classes "$SNAP"
mkdir -p artifacts
run() { # run_main.sh against the snapshot
  CP="$SNAP:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
  SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
  java -Xmx96g $(for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio java.util java.util.concurrent java.util.concurrent.atomic jdk.internal.ref sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do echo --add-opens=java.base/$p=ALL-UNNAMED; done) \
    -cp "$CP" "$@"
}

echo "STAGE ladders $(date -u +%H:%M:%S)" >&2
# 1. ladders for the r12 ops whose STATUS numbers had no committed line
#    (j13/m10/c7/es23) plus the two new r13 ops (t38/m11). ScaleReplay is
#    now warmed (sf0.001 sweep before timing) and self-describing
#    ({factor,passes,corpus_dir} in the line) — VERDICT r12 #2/#3.
LADDER_QS=j13_stitch,m10_keyframe_neardup,c7_curate_fert,es23_stream_quarantine,t38_sequence_pack,m11_audio_neardup
: > /tmp/r13_ladders.jsonl
for f in 1 4 16; do
  SPARK_GRAFT_PASSES=4 run graft.ScaleReplay /root/testdata/sf0.1 $f \
    $LADDER_QS 2>/dev/null | grep -E '^\{' >> /tmp/r13_ladders.jsonl
done
# 64x capstone line for the two cheap new ops
SPARK_GRAFT_PASSES=3 run graft.ScaleReplay /root/testdata/sf0.1 64 \
  t38_sequence_pack,m11_audio_neardup 2>/dev/null | grep -E '^\{' >> /tmp/r13_ladders.jsonl
cp /tmp/r13_ladders.jsonl artifacts/ladders_r13.jsonl

echo "STAGE genomics-1x $(date -u +%H:%M:%S)" >&2
# 2. genomics capstone 1x reference (same-session linear base for #3)
SPARK_GRAFT_ONLY=a1,a2,a3,j13 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  run graft.Bench 2>/tmp/r13_gen1x.err | tail -1 > /tmp/r13_gen1x.json
cp /root/repo/BENCH_DETAIL.json artifacts/bench_genomics_1x_r13.json

echo "STAGE x100-corpus $(date -u +%H:%M:%S)" >&2
# 3. x100 corpus + genomics capstone at x100 (VERDICT r12 #1: the
#    reference's own domain at its "500GB De Bruijn graph" design point)
run graft.ScaleReplay /root/testdata/sf0.1 100 2>/dev/null | grep -E '^\{'
echo "STAGE genomics-x100 $(date -u +%H:%M:%S)" >&2
SPARK_GRAFT_ONLY=a1,a2,a3,j13 \
SPARK_GRAFT_SF_DIR=/root/repo/target/scale_replay/sf0.1_x100 \
  run graft.Bench 2>/tmp/r13_genx100.err | tail -1 > /tmp/r13_genx100.json
cp /root/repo/BENCH_DETAIL.json /root/repo/BENCH_X100_GENOMICS_DETAIL.json
cp /tmp/r13_genx100.json /root/repo/BENCH_X100_GENOMICS.json

echo "STAGE d19-partitions $(date -u +%H:%M:%S)" >&2
# 4. d19 x100 partition-count experiment (VERDICT r12 "what's wrong" #4:
#    the 128-partition peak-memory claim must live in an artifact).
#    SPARK_GRAFT_SHUFFLE decouples partitions from threads.
SPARK_GRAFT_ONLY=d19 SPARK_GRAFT_SHUFFLE=32 \
SPARK_GRAFT_SF_DIR=/root/repo/target/scale_replay/sf0.1_x100 \
  run graft.Bench 2>/tmp/r13_d19p32.err | tail -1 > /tmp/r13_d19p32.json
cp /root/repo/BENCH_DETAIL.json artifacts/d19_x100_p32_r13.json
SPARK_GRAFT_ONLY=d19 SPARK_GRAFT_SHUFFLE=128 \
SPARK_GRAFT_SF_DIR=/root/repo/target/scale_replay/sf0.1_x100 \
  run graft.Bench 2>/tmp/r13_d19p128.err | tail -1 > /tmp/r13_d19p128.json
cp /root/repo/BENCH_DETAIL.json artifacts/d19_x100_p128_r13.json

echo "STAGE sf1-refresh $(date -u +%H:%M:%S)" >&2
# 5. x10 corpus + full-set Bench -> BENCH_SF1 refresh (new queries
#    re-stale the old artifact)
run graft.ScaleReplay /root/testdata/sf0.1 10 2>/dev/null | grep -E '^\{'
SPARK_GRAFT_SF_DIR=/root/repo/target/scale_replay/sf0.1_x10 \
  run graft.Bench 2>/tmp/r13_sf1.err | tail -1 > /root/repo/BENCH_SF1.json
cp /root/repo/BENCH_DETAIL.json /root/repo/BENCH_SF1_DETAIL.json

echo "STAGE bench-1x $(date -u +%H:%M:%S)" >&2
# 6. full-set Bench at 1x (sf0.1) for the DuckDB comparison
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  run graft.Bench 2>/tmp/r13_1x.err | tail -1 > /tmp/r13_1x.json
cp /root/repo/BENCH_DETAIL.json artifacts/bench_1x_r13.json

echo "STAGE duckdb-compare $(date -u +%H:%M:%S)" >&2
# 7. Spark-vs-DuckDB on the same session's 1x numbers
python3 tools/bench_compare.py artifacts/bench_1x_r13.json \
  /tmp/v13_full_a /root/testdata/sf0.1 > artifacts/bench_cmp_r13.txt 2>&1

echo PIPELINE_DONE
