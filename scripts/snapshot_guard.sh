#!/usr/bin/env bash
# End-of-round snapshot guard (SURVEY §7): NEVER commit a snapshot that
# doesn't compile and pass its suite. Round 12 lost its entire driver
# verification budget (CORRECTNESS_r12 = {}, BENCH_r12 rc 1) to a
# one-line refactor committed uncompiled — this script is the mechanical
# fix. Usage:
#   scripts/snapshot_guard.sh                 # compile + full suite
#   scripts/snapshot_guard.sh compile-only    # compile gate only
# Exit 0 = safe to commit. Any other exit = DO NOT COMMIT; fix first,
# or commit only the last-known-green tree.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "[guard] sbt compile + Test/compile ..."
sbt -batch "compile" "Test/compile"

if [[ "${1:-}" != "compile-only" ]]; then
  echo "[guard] full suite ..."
  sbt -batch test
fi

echo "[guard] OK — tree compiles$([[ "${1:-}" == compile-only ]] || echo ' and suite is green'); safe to commit."
