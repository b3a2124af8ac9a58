#!/usr/bin/env bash
# Gate-at-HEAD check (r11 verdict #2): refuse the end-of-round snapshot
# unless the tree at HEAD is covered by a full presnapshot certification.
#
#   tools/gate_check.sh
#
# PASS iff GATE_CERT.json exists AND either HEAD == the certified SHA, or
# every commit since it touched only artifact files (BENCH_*, CORRECTNESS_*,
# COVERAGE.md, GATE_CERT.json itself, ...) — i.e. nothing under src/ tools/
# build.sbt project/ changed after the gate ran — AND the working tree has
# no uncommitted engine changes. This makes the round-11 s10 sequence
# (operator lands after the gate, snapshot ships it untested) mechanically
# impossible: re-run tools/presnapshot.sh after ANY engine change.
set -uo pipefail
cd "$(dirname "$0")/.."
fail() { echo "GATE CHECK: FAIL — $1" >&2; exit 1; }

ENGINE_PATHS="src tools build.sbt project"
[ -f GATE_CERT.json ] || fail "no GATE_CERT.json — run tools/presnapshot.sh first"
CERT_SHA=$(python3 -c "import json; print(json.load(open('GATE_CERT.json'))['sha'])") \
  || fail "GATE_CERT.json unreadable"
MODE=$(python3 -c "import json; print(json.load(open('GATE_CERT.json')).get('mode',''))")
[ "$MODE" = "full" ] || fail "cert mode '$MODE' is not 'full' — re-run the full gate"
git cat-file -e "${CERT_SHA}^{commit}" 2>/dev/null \
  || fail "certified SHA $CERT_SHA is not a commit in this repo"

HEAD_SHA=$(git rev-parse HEAD)
if [ "$HEAD_SHA" != "$CERT_SHA" ]; then
  git merge-base --is-ancestor "$CERT_SHA" "$HEAD_SHA" \
    || fail "certified SHA $CERT_SHA is not an ancestor of HEAD $HEAD_SHA"
  CHANGED=$(git diff --name-only "$CERT_SHA" "$HEAD_SHA" -- $ENGINE_PATHS)
  [ -z "$CHANGED" ] || fail "engine changed after the gate ($CERT_SHA..$HEAD_SHA):
$CHANGED
re-run tools/presnapshot.sh at HEAD"
fi

DIRTY=$(git status --porcelain -- $ENGINE_PATHS)
[ -z "$DIRTY" ] || fail "uncommitted engine changes:
$DIRTY"

echo "GATE CHECK: PASS — HEAD $HEAD_SHA covered by full-gate cert $CERT_SHA"
