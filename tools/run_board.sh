#!/bin/bash
# Board run via plain java against a FROZEN classes copy (so concurrent sbt
# compiles can't swap class files mid-run), per the r13/r14 bench protocol.
# Usage: tools/run_board.sh <outfile> [extra env...]
set -e
OUT="${1:?usage: run_board.sh <outfile>}"
FROZEN=/tmp/graft_frozen_classes
rm -rf "$FROZEN"
cp -r /root/repo/target/scala-2.13/classes "$FROZEN"
ADDOPENS=$(cat /root/repo/target/addopens.txt)
cd /root/repo
SPARK_GRAFT_BENCH_OUT="$OUT" java $ADDOPENS -Xmx48g \
  -cp "$FROZEN:/opt/spark/jars/*" graft.Bench
