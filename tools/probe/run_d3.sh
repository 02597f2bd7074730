#!/bin/bash
# Decade-3 scale single: one JVM per (key, corpus), harness session
# confs matched to Relational.SessionDefaults, shuffle partitions sized
# to the corpus (32 at 10x, 256 at 100x - the SURVEY 6 discipline).
# Usage: run_d3.sh <key> <dir> <runs> <partitions> [driver-mem]
set -e
KEY=$1; DIR=$2; RUNS=$3; PARTS=$4; MEM=${5:-24g}
/opt/spark/bin/spark-shell \
  --master "local[32]" \
  --driver-memory "$MEM" \
  --driver-class-path /root/repo/target/scala-2.13/classes \
  --conf spark.ui.enabled=false \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.sql.shuffle.partitions="$PARTS" \
  --conf "spark.sql.optimizer.excludedRules=org.apache.spark.sql.catalyst.optimizer.EliminateWindowPartitions" \
  --conf spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold=67108864 \
  --conf spark.sql.adaptive.coalescePartitions.minPartitionSize=65536 \
  --driver-java-options "-Dgraft.key=$KEY -Dgraft.dir=$DIR -Dgraft.runs=$RUNS" \
  -i /root/repo/tools/probe/d3_key16.scala 2>/dev/null | grep '^\[d3\]'
