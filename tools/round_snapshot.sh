#!/bin/bash
# Dev tooling (NOT part of the library): end-of-round artifact snapshot.
#
# Six consecutive verdicts flagged round artifacts (BENCH_r*.json,
# CORRECTNESS_r*.json, LEAKCHECK.json, BENCH_FULL.json,
# BENCH_CLEAN_r*.json, BENCH_X10_r*.json) left untracked or modified at
# round end. Ownership note: the DRIVER's round-boundary commit sweeps
# whatever the builder leaves (r12's d5283a0, r13's 1a2e6d5 did exactly
# that), so nothing is ever lost — but running this as the LAST builder
# action keeps `git status` clean and the artifact history attributable.
#
# Usage: tools/round_snapshot.sh [message]
set -eu
cd "$(dirname "$0")/.."
MSG=${1:-"round artifacts snapshot"}
# add only the known artifact families, never stray work files.
# One git-add PER family: a single multi-pathspec add aborts WHOLE if
# any one pathspec matches nothing (e.g. no COPYCHECK.json this round).
# Tolerate ONLY the no-match case (compgen glob probe); a real git
# failure (index.lock contention, disk full) propagates under set -e —
# the prior `2>/dev/null || true` swallowed those too and the script
# then reported 'nothing to snapshot' instead of failing (r16 ADVICE).
for spec in 'BENCH_r*.json' 'BENCH_CLEAN_r*.json' 'BENCH_X10_r*.json' \
  'BENCH_FULL.json' 'CORRECTNESS_r*.json' 'LEAKCHECK.json' 'COPYCHECK.json' \
  'SCALE.md' 'NOTES.md' 'NOTES-NEXT-ROUND.md'; do
  if compgen -G "$spec" >/dev/null; then
    # per-file: a .gitignore'd artifact (COPYCHECK.json on some rounds)
    # makes git add fail loudly under the no-swallow policy -- skipping
    # IGNORED files is correct (the driver owns them), while any other
    # git failure still propagates under set -e
    for f in $spec; do
      git check-ignore -q "$f" || git add -A -- "$f"
    done
  fi
done
if git diff --cached --quiet; then
  echo "[round_snapshot] nothing to snapshot; working tree clean for artifacts" >&2
else
  git commit -m "$MSG"
  echo "[round_snapshot] committed: $MSG" >&2
fi
