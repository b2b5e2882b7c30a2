#!/usr/bin/env bash
# Wall-clock HTTP benchmark against a running server (reference: run_benchmark.sh).
# Usage: ./run_benchmark.sh [URL] [N]
set -euo pipefail
URL="${1:-http://127.0.0.1:8000}"
N="${2:-3}"
TEXT='{"text": "The quick brown fox jumps over the lazy dog while seventy six trombones led the big parade."}'

echo "health:"
curl -fsS "$URL/healthz" && echo
curl -fsS "$URL/readyz" && echo

echo "warmup:"
curl -fsS -o /dev/null -X POST -H 'Content-Type: application/json' -d "$TEXT" "$URL/tts"

total=0
for i in $(seq 1 "$N"); do
  t=$( { time -p curl -fsS -o "/tmp/bench_$i.wav" -X POST \
        -H 'Content-Type: application/json' -d "$TEXT" "$URL/tts"; } 2>&1 \
        | awk '/^real/ {print $2}')
  echo "run $i: ${t}s ($(stat -c%s "/tmp/bench_$i.wav") bytes)"
  total=$(echo "$total + $t" | bc)
done
echo "mean: $(echo "scale=3; $total / $N" | bc)s over $N runs"

echo "metrics:"
curl -fsS "$URL/metrics"
