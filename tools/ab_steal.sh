#!/bin/sh
# Interleaved A/B profiler with a CPU-steal annotation per arm (r13).
# Usage: tools/ab_steal.sh ROUNDS query [query ...]
# Arm A = git stash (HEAD), arm B = working tree.  Each arm's line is
# suffixed with the steal-tick delta observed during that arm so
# polluted samples can be discarded before taking the per-arm min.
#
# Stash discipline (ADVICE r13): the tree MUST be dirty — on a clean
# tree `git stash` saves nothing and the later `pop` would destroy a
# pre-existing, unrelated stash entry.  set -e aborts the loop on any
# stash failure so no arm ever measures the wrong tree.
set -e
ROUNDS=$1; shift
if git diff --quiet && git diff --cached --quiet; then
  echo "ab_steal.sh: working tree is clean - nothing to A/B" >&2
  echo "(arm A = stashed HEAD, arm B = working tree; make a change first)" >&2
  exit 2
fi
steal() { awk '/^cpu /{print $9}' /proc/stat; }
for r in $(seq 1 "$ROUNDS"); do
  for arm in A B; do
    if [ "$arm" = A ]; then git stash -q; else git stash pop -q; fi
    s0=$(steal)
    PROFILE_SAMPLES=1 python tools/profile_r13.py "$@" 2>/dev/null \
      | grep "^==" | sed "s/^/$arm$r /" || true
    s1=$(steal)
    echo "$arm$r steal_ticks=$((s1 - s0))"
  done
done
