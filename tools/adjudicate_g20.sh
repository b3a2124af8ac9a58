#!/bin/bash
# g20 outlier adjudication — the q25 protocol (r14 verdict #3).
#
# BENCH_r14's headline carried g20_skew_components at 21.86 s vs
# 1.84/1.97/2.35 s in the three sibling same-day idle runs. Hypothesis
# space: (a) ambient/GC smear (the r13 g28 8.2 s outlier collapsed back
# symmetrically), (b) a genuine per-round plan flap in the iterative CC
# loop (strategy decided from AQE estimates on a shrinking edge set).
# Protocol: N fresh JVMs, each (1) times g20 alone through the Bench
# main (median of 3 + spread), (2) hashes the normalized post-AQE
# executed plan via the Explain main. Identical hashes + spread < 2x
# across idle runs rules the flap OUT; a differing hash pins it.
#
# Run on an IDLE box (load1 <= 0.3); results print as one JSON line per
# JVM plus a verdict line.
set -euo pipefail
cd "$(dirname "$0")/.."

SF=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}
N=${1:-3}
JAVA_ARGS=(
  --add-opens=java.base/java.lang=ALL-UNNAMED
  --add-opens=java.base/java.lang.invoke=ALL-UNNAMED
  --add-opens=java.base/java.lang.reflect=ALL-UNNAMED
  --add-opens=java.base/java.io=ALL-UNNAMED
  --add-opens=java.base/java.net=ALL-UNNAMED
  --add-opens=java.base/java.nio=ALL-UNNAMED
  --add-opens=java.base/java.util=ALL-UNNAMED
  --add-opens=java.base/java.util.concurrent=ALL-UNNAMED
  --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED
  --add-opens=java.base/sun.nio.ch=ALL-UNNAMED
  --add-opens=java.base/sun.nio.cs=ALL-UNNAMED
  --add-opens=java.base/sun.security.action=ALL-UNNAMED
  --add-opens=java.base/sun.util.calendar=ALL-UNNAMED
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx8g
  -cp "target/scala-2.13/classes:/opt/spark/jars/*"
)

hashes=()
medians=()
for i in $(seq 1 "$N"); do
  line=$(SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_BENCH_SUITES=1 \
    SPARK_GRAFT_BENCH_ONLY=g20_skew_components \
    java "${JAVA_ARGS[@]}" graft.Bench 2>/dev/null | tail -1)
  med=$(echo "$line" | python3 -c 'import json,sys; d=json.loads(sys.stdin.read()); print(d["queries"]["g20_skew_components"])')
  spread=$(echo "$line" | python3 -c 'import json,sys; d=json.loads(sys.stdin.read()); print(d.get("spread_outliers","{}"))')
  # normalized post-AQE executed plan: strip expression ids, plan ids,
  # runtime statistics, object addresses — the shape, not the instance
  h=$(java "${JAVA_ARGS[@]}" graft.Explain "$SF" --executed g20_skew_components 2>/dev/null \
    | sed -E 's/#[0-9]+[L]?//g; s/plan_id=[0-9]+//g; s/id=[0-9]+//g; s/@[0-9a-f]+//g; s/Statistics\([^)]*\)//g; s/exprId=[0-9]+//g' \
    | md5sum | cut -d' ' -f1)
  hashes+=("$h")
  medians+=("$med")
  echo "{\"jvm\":$i,\"g20_median_sec\":$med,\"plan_hash\":\"$h\",\"spread_outliers\":$spread,\"load\":\"$(cut -d' ' -f1,2 /proc/loadavg)\"}"
done

python3 - "${medians[@]}" -- "${hashes[@]}" <<'EOF'
import sys
argv = sys.argv[1:]
sep = argv.index("--")
meds = [float(x) for x in argv[:sep]]
hs = argv[sep+1:]
same = len(set(hs)) == 1
ratio = max(meds) / min(meds) if min(meds) > 0 else float("inf")
verdict = "ambient-noise (no plan flap)" if same and ratio < 2 else \
          ("PLAN FLAP: differing executed-plan hashes" if not same else
           f"identical plans but spread {ratio:.1f}x — scheduling/GC, rerun idle")
print(f'{{"adjudication":"g20","medians":{meds},"plan_hashes_identical":{str(same).lower()},'
      f'"max_over_min":{ratio:.2f},"verdict":"{verdict}"}}')
EOF
