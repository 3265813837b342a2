#!/bin/bash
# Run a graft main (default graft.Bench) from the compiled classes dir
# WITHOUT sbt: no project-lock serialization, and -Dgraft.base is
# redirectable so replica Bench runs can't clobber the committed
# sf0.1 BENCH_FULL.json (the r13/r14 artifact-hygiene slips both came
# from Bench's fixed artifact name landing in the repo).
#
# Usage: SPARK_GRAFT_SF_DIR=... tools/run_bench.sh [outdir] [main] [args...]
#   outdir: where the raw artifact (BENCH_RAW_LAST.json) lands
#           (default: a fresh mktemp dir)
#   main:   graft.Bench (default) | graft.Verify | graft.tools.*
#
# Compile first (sbt -batch compile); this script does not compile.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
OUT="${1:-$(mktemp -d /tmp/graft_bench.XXXX)}"
MAIN="${2:-graft.Bench}"
shift $(( $# > 2 ? 2 : $# )) || true
mkdir -p "$OUT"
# graft mains default to local[4] without this (Bench.scala) — a bench
# accidentally run at 4 cores produces numbers that LOOK plausible at
# sf0.1 but understate kernel-stage parallelism 8x at the replicas
export SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}"
# pre-launch machine load: the in-JVM loadavg_start is self-inflated by
# the 32-thread warm-up, so Bench also records this untainted figure
export SPARK_GRAFT_LOADAVG_T0="$(cut -d' ' -f1-3 /proc/loadavg)"
CLASSES="$REPO/target/scala-2.13/classes"
[ -d "$CLASSES" ] || { echo "compile first: sbt -batch compile" >&2; exit 1; }
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent \
         java.util.concurrent.atomic sun.nio.ch sun.nio.cs \
         sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Dgraft.base="$OUT" \
  -cp "$CLASSES:/opt/spark/jars/*" "$MAIN" "$@"
