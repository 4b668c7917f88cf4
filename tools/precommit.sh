#!/usr/bin/env bash
# Pre-commit gate: a commit touching Scala sources must compile and pass
# tests. Round 4's final snapshot shipped a one-character type error that
# zeroed the whole round's official verification; this makes that class of
# breakage unrepeatable. Install: ln -sf ../../tools/precommit.sh .git/hooks/pre-commit
# Bypass (artifact-only commits, emergencies): git commit --no-verify
set -euo pipefail
cd "$(git rev-parse --show-toplevel)"

if git diff --cached --name-only | grep -q '^src/.*\.scala$'; then
  echo "[precommit] staged Scala sources detected - running sbt compile + test"
  sbt -batch 'set Test / testOptions += Tests.Argument("-oI")' compile test
else
  echo "[precommit] no staged Scala sources - skipping build gate"
fi
