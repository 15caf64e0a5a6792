#!/usr/bin/env bash
# Checked ScaleSmoke runner (VERDICT r13 Next #5): the ad-hoc
# `sbt ... | grep SMOKE` pipeline masked a crashed smoke run to exit 0
# (grep's status won, boruvka's 10x crash shipped unseen). This runner
# fails loudly: pipefail + an explicit assertion that the run printed
# at least one SMOKE row and ended with the SMOKE-DONE sentinel.
#
# Usage: scripts/smoke.sh [amplify] [only-substr,only-substr...]
#   scripts/smoke.sh            # full smoke at 10x
#   scripts/smoke.sh 10 boruvka # just the boruvka rows
set -euo pipefail

AMPLIFY="${1:-10}"
ONLY="${2:-}"

cd "$(dirname "$0")/.."
out="$(mktemp /tmp/smoke.XXXXXX.log)"
trap 'rm -f "$out"' EXIT

env_vars=(SPARK_GRAFT_AMPLIFY="$AMPLIFY")
[ -n "$ONLY" ] && env_vars+=(SPARK_GRAFT_SMOKE_ONLY="$ONLY")

# sbt's own exit code is the primary check. The grep guard (grep
# exits 1 when a crashed run printed no SMOKE rows) must live INSIDE
# the last pipeline segment: a trailing `|| true` on the pipeline
# itself binds to the WHOLE pipeline and defeats pipefail — the r14
# verdict caught exactly that swallow, where a nonzero sbt exit
# passed silently. With the guard inside, pipefail's verdict is
# sbt's own status. tee keeps the full log while SMOKE rows stream.
if ! env "${env_vars[@]}" sbt -batch "runMain graft.ScaleSmoke" 2>&1 \
    | tee "$out" | { grep --line-buffered -E 'SMOKE' || true; }; then
  echo "smoke.sh: FAILED — sbt exited nonzero" >&2
  tail -20 "$out" >&2
  exit 1
fi

# Narrow content scan for real failures sbt might soften: a main-thread
# crash or a nonzero forked exit. Broad '[error]' matching is WRONG
# here — sbt prefixes the forked JVM's stderr with [error], and Spark
# prints benign executor-shutdown races there AFTER SMOKE-DONE (the
# r14 false-FAIL). The sentinel + sbt exit code carry the verdict.
if grep -qE 'Exception in thread "main"|Nonzero exit code' "$out"; then
  echo "smoke.sh: FAILED — main-thread failure in log:" >&2
  grep -E 'Exception in thread "main"|Nonzero exit code' "$out" \
    | head -5 >&2
  exit 1
fi
n_rows=$(grep -c '^SMOKE ' "$out" || true)
if [ "$n_rows" -eq 0 ]; then
  echo "smoke.sh: FAILED — no SMOKE rows printed (crashed before first row?)" >&2
  tail -20 "$out" >&2
  exit 1
fi
if ! grep -q '^SMOKE-DONE' "$out"; then
  echo "smoke.sh: FAILED — run ended before the SMOKE-DONE sentinel" >&2
  tail -20 "$out" >&2
  exit 1
fi
echo "smoke.sh: OK — $n_rows SMOKE rows, zero errors"
