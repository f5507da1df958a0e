#!/bin/bash
# Archive the small, judge-relevant eval/bench artifacts from data_synth2/
# (which hard host resets wipe — it has happened five times this round) into
# the git-tracked artifacts_r3/ tree. Idempotent; run any time. Only text
# artifacts (CSV/JSON/txt) are copied — checkpoints and h5 stay untracked.
set -u
cd /root/repo
D=data_synth2
OUT=artifacts_r3
mkdir -p $OUT

copydir() {  # copydir SRC DST
  [ -d "$1" ] || return 0
  mkdir -p "$OUT/$2"
  find "$1" -maxdepth 1 -type f \
    \( -name '*.csv' -o -name '*.json' -o -name '*.txt' \) \
    -size -512k -exec cp -t "$OUT/$2" {} + 2>/dev/null
}

for d in "$D"/eval_out* "$D"/globalspfn_eval*; do
  [ -d "$d" ] && copydir "$d" "$(basename "$d")"
done
copydir "$D/perf_r3" perf_r3
# bench stderr tails carry the warmup timings for the cold-start experiment
for f in "$D"/perf_r3/*.err; do
  [ -f "$f" ] && tail -6 "$f" > "$OUT/perf_r3/$(basename "$f").tail" 2>/dev/null
done
# training curves (JSONL logs are small)
for d in "$D"/checkpoints*/; do
  for f in "$d"*/log.jsonl "$d"log.jsonl; do
    [ -f "$f" ] && { mkdir -p "$OUT/logs"; \
      cp "$f" "$OUT/logs/$(echo "$f" | sed "s|$D/||; s|/|_|g")"; }
  done
done
echo "archived: $(find $OUT -type f | wc -l) files"
