#!/bin/bash
# sf10 spot-probe launcher (VERDICT r10 task 4): one JVM config per
# invocation so the GC attribution is a clean A/B. Usage:
#   tools/spot_sf10.sh <tag> <gcFlag> <heap> <sfDir> <outJson> [plan]
# e.g. tools/spot_sf10.sh A -XX:+UseParallelGC 32g /tmp/sf10 \
#        BENCH_sf10_spotA.json 'cdc_e2e_replicate:3:0'
set -euo pipefail
TAG="$1"; GCFLAG="$2"; HEAP="$3"; SFDIR="$4"; OUT="$5"
PLAN="${6:-cdc_e2e_replicate:3:0,d_cluster_sizes:3:0,t_dedup_sweep:3:3}"
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java -Xmx"$HEAP" "$GCFLAG" $ADD_OPENS \
  -Xlog:gc:file=/tmp/gc_spot$TAG.log \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" graft.tools.SpotProbe "$SFDIR" "$OUT" "$PLAN"
