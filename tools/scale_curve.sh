#!/usr/bin/env bash
# scale_curve.sh — measure per-family growth exponents (round-15
# verdict item 2): generate self-similar k× corpora from sf0.1
# (tools/ScaleFixture), time the scale-sensitive families at each k
# with the FROZEN Bench protocol (per-query min of 2, ownMemo cold
# epochs, scoped via SPARK_GRAFT_BENCH_ONLY), and fit the growth
# exponent per query:
#
#   global = least-squares slope of ln t vs ln k over all points
#   top    = ln(t_kmax / t_kprev) / ln(kmax / kprev)   <- the
#            extrapolation-relevant number: at small k the ~0.3-1 s
#            fixed plan/driver overhead flattens the curve, so the
#            top-end segment is where the DATA term dominates
#
# Families and the <=1.3 bar: the three designed exact faces
# (cosine_topk, knn_per_vector, embedding_cosine_dedup) are quadratic
# BY DECLARATION and excluded; everything timed here is a declared
# scale path and must grow <= ~linear (top exponent <= 1.3).
#
# Usage:
#   sbt compile && tools/scale_curve.sh          # full curve (k = 1 4 16 64)
#   SCALE_KS="1 4" tools/scale_curve.sh          # quick iteration
#   SCALE_QUERIES=near_dedup_groups tools/scale_curve.sh
#   SCALE_KEEP=1 tools/scale_curve.sh            # keep corpora + logs
#
# Corpora land under /tmp/graft_scale (~15 MB * sum(k)); bench JSON
# per k lands next to them; the fitted table prints to stdout.
# Runtime: generation is seconds; the k=64 bench pass dominates
# (~10-20 min all families on an idle host).

set -u
cd "$(dirname "$0")/.."

KS=(${SCALE_KS:-1 4 16 64})
# round-16: the round-15 kernel rewrites (cooccurrence_pmi,
# char_entropy, q_cdc_latest, assign_nearest_centroid; winnow already
# listed) joined the curve — their 100 TB story is "map-side kernel,
# ~linear growth", and this is the harness that proves it with numbers
QUERIES="${SCALE_QUERIES:-exact_dedup,minhash_near_dedup,near_dedup_groups,simhash_dedup,dedup_jaccard_histogram,exact_substring_dedup,winnow_fingerprint,doc_fingerprint,ann_ivf_topk,ann_lsh_topk,semdedup_embedding,q_sessionize,event_funnel,retention_cohort,cooccurrence_pmi,char_entropy,q_cdc_latest,assign_nearest_centroid}"
SRC="${SCALE_SRC:-/root/testdata/sf0.1}"
WORK="${SCALE_WORK:-/tmp/graft_scale}"
BAR="${SCALE_BAR:-1.3}"

CLASSES=target/scala-2.13/classes
if [ ! -f "$CLASSES/graft/Bench.class" ]; then
  echo "scale_curve: $CLASSES missing graft.Bench — run 'sbt compile' first" >&2
  exit 2
fi
CP="$CLASSES:/opt/spark/jars/*"
export LC_ALL=C.utf8
# explicit heap: without -Xmx the curve JVM runs at the JVM default and
# the bench warmup's pair-memo pre-touch OOMs (and kills the
# SparkContext) on the x64 corpus — 48g default because the curve runs
# up-to-64x corpora in one local JVM (the sf0.1 bench uses 24g)
JVM_OPTS="-Xmx${SPARK_DRIVER_MEM:-48g} -Dfile.encoding=UTF-8 -Dsun.jnu.encoding=UTF-8 \
  --add-opens=java.base/java.lang=ALL-UNNAMED \
  --add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
  --add-opens=java.base/java.lang.reflect=ALL-UNNAMED \
  --add-opens=java.base/java.io=ALL-UNNAMED \
  --add-opens=java.base/java.net=ALL-UNNAMED \
  --add-opens=java.base/java.nio=ALL-UNNAMED \
  --add-opens=java.base/java.util=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.cs=ALL-UNNAMED \
  --add-opens=java.base/sun.security.action=ALL-UNNAMED \
  --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
export SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}"

mkdir -p "$WORK"
if [ "${SCALE_KEEP:-0}" != "1" ]; then
  trap 'rm -rf "$WORK"' EXIT
else
  trap 'echo "scale_curve: corpora + logs kept under $WORK"' EXIT
fi

for k in "${KS[@]}"; do
  dir="$WORK/x$k"
  if [ ! -f "$dir/.done" ]; then
    echo "== generating x$k corpus =="
    # shellcheck disable=SC2086
    if ! java $JVM_OPTS -cp "$CP" graft.tools.ScaleFixture "$SRC" "$dir" "$k" \
         > "$WORK/gen_x$k.log" 2>&1; then
      echo "scale_curve: generation x$k FAILED:" >&2
      tail -5 "$WORK/gen_x$k.log" | sed 's/^/   | /' >&2
      exit 1
    fi
    grep '^\[scale-fixture\]' "$WORK/gen_x$k.log"
    touch "$dir/.done"
  fi
  echo "== bench x$k =="
  # shellcheck disable=SC2086
  SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_BENCH_ONLY="$QUERIES" \
    SPARK_GRAFT_BENCH_OUT="$WORK/bench_x$k.json" \
    java $JVM_OPTS -cp "$CP" graft.Bench > "$WORK/bench_x$k.log" 2>&1
  rc=$?
  if [ $rc -ne 0 ] || [ ! -f "$WORK/bench_x$k.json" ]; then
    echo "scale_curve: bench x$k FAILED (rc=$rc):" >&2
    tail -5 "$WORK/bench_x$k.log" | sed 's/^/   | /' >&2
    exit 1
  fi
  grep -oE '"value":[0-9.]+' "$WORK/bench_x$k.json" | head -1 \
    | sed "s/\"value\":/   total x$k: /"
done

python3 - "$WORK" "$BAR" "${KS[@]}" << 'PYEOF'
import json, math, sys
work, bar = sys.argv[1], float(sys.argv[2])
ks = [int(x) for x in sys.argv[3:]]
runs = {k: json.load(open(f"{work}/bench_x{k}.json"))["queries"] for k in ks}
names = sorted(runs[ks[0]])
print()
print(f"| query | " + " | ".join(f"x{k} (s)" for k in ks) + " | global exp | top exp |")
print("|---|" + "---|" * (len(ks) + 2))
worst = []
for n in names:
    ts = [runs[k].get(n, -1.0) for k in ks]
    if any(t <= 0 for t in ts):
        print(f"| {n} | " + " | ".join(f"{t:.3f}" for t in ts) + " | FAILED | FAILED |")
        worst.append((n, float("inf")))
        continue
    lk = [math.log(k) for k in ks]; lt = [math.log(t) for t in ts]
    mk, mt = sum(lk)/len(lk), sum(lt)/len(lt)
    g = sum((a-mk)*(b-mt) for a, b in zip(lk, lt)) / sum((a-mk)**2 for a in lk)
    top = (lt[-1]-lt[-2]) / (lk[-1]-lk[-2])
    flag = "  <-- > bar" if top > bar else ""
    print(f"| {n} | " + " | ".join(f"{t:.3f}" for t in ts)
          + f" | {g:.2f} | {top:.2f}{flag} |")
    if top > bar:
        worst.append((n, top))
print()
if worst:
    print(f"scale_curve: {len(worst)} quer{'y' if len(worst)==1 else 'ies'} above the {bar} top-exponent bar: "
          + ", ".join(f"{n}={e:.2f}" for n, e in worst))
    sys.exit(1)
print(f"scale_curve: all timed families at or below the {bar} top-exponent bar")
PYEOF
