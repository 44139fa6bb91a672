#!/usr/bin/env bash
# Install the repo's git hooks (pre-commit compile guard).
set -euo pipefail
cd "$(dirname "$0")/.."
cp tools/precommit.sh .git/hooks/pre-commit
chmod +x .git/hooks/pre-commit tools/precommit.sh tools/snapshot.sh
echo "[hooks] installed pre-commit compile guard"
