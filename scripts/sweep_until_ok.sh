#!/bin/sh
# Retry the refuse-gated record sweep until the phase gate passes.
# Usage: sweep_until_ok.sh <tag> [max_attempts] [sleep_s]
# Writes bench_<tag>_attemptN.{json,err} per try and stops on the first
# sweep the gate lets through (exit 0). Gate refusals (exit 3) are logged
# to bench_<tag>_refusals.log with the probe lines — the r14 protocol's
# refusal census needs them.
tag="${1:?tag}"; max="${2:-40}"; pause="${3:-300}"
i=0
while [ "$i" -lt "$max" ]; do
  i=$((i + 1))
  out="bench_${tag}_attempt${i}.json"
  err="bench_${tag}_attempt${i}.err"
  PYSPARKDB_BENCH_PHASE_GATE=refuse \
  PYSPARKDB_BENCH_TIMELINE="bench_timeline_${tag}_attempt${i}.json" \
    python bench.py > "$out" 2> "$err"
  rc=$?
  if [ "$rc" -eq 0 ] && [ -s "$out" ]; then
    echo "$(date -u +%FT%TZ) attempt $i: OK sweep -> $out" >> "bench_${tag}_refusals.log"
    exit 0
  fi
  echo "$(date -u +%FT%TZ) attempt $i: exit $rc $(grep 'phase gate' "$err" | tail -1)" \
    >> "bench_${tag}_refusals.log"
  rm -f "$out" "$err" "bench_timeline_${tag}_attempt${i}.json"
  sleep "$pause"
done
echo "$(date -u +%FT%TZ) gave up after $max attempts" >> "bench_${tag}_refusals.log"
exit 1
