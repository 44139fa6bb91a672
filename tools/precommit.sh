#!/usr/bin/env bash
# Pre-commit guard: never let an uncompilable tree into history.
# Installed as .git/hooks/pre-commit by: tools/install_hooks.sh
# Compiles only when staged changes touch Scala/sbt sources; skip with
# GRAFT_SKIP_COMPILE=1 for doc-only emergencies.
set -euo pipefail
[[ "${GRAFT_SKIP_COMPILE:-}" == "1" ]] && exit 0
if git diff --cached --name-only | grep -qE '\.(scala|sbt)$'; then
  echo "[pre-commit] staged Scala/sbt changes — running sbt Test/compile"
  sbt -batch Test/compile >/tmp/graft_precommit.log 2>&1 || {
    tail -30 /tmp/graft_precommit.log
    echo "[pre-commit] COMPILE FAILED — commit blocked (full log: /tmp/graft_precommit.log)"
    exit 1
  }
fi
exit 0
