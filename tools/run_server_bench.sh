#!/usr/bin/env bash
# Multi-client serving benchmark driver: runs the sequential and continuous
# modes (one process each — the engine owns the single TPU chip) and merges
# the JSON lines into BENCH_SERVER_r{N}.json at the repo root.
set -euo pipefail
cd "$(dirname "$0")/.."
N="${1:-03}"
CLIENTS="${CLIENTS:-4}"
REQUESTS="${REQUESTS:-3}"
SEGMENTS="${SEGMENTS:-4}"   # >1: streaming TTFB separates from total

seq_json=$(python tools/bench_server_concurrent.py --mode sequential \
    --clients "$CLIENTS" --requests "$REQUESTS" \
    --segments "$SEGMENTS" --blocking-pass | tail -1)
sleep 60  # let the tunnel release the chip claim
cont_json=$(TARS_CONTINUOUS_SLOTS="$CLIENTS" \
    python tools/bench_server_concurrent.py --mode continuous \
    --clients "$CLIENTS" --requests "$REQUESTS" \
    --segments "$SEGMENTS" --blocking-pass | tail -1)

python - "$N" "$seq_json" "$cont_json" <<'EOF'
import json, sys
n, seq, cont = sys.argv[1], json.loads(sys.argv[2]), json.loads(sys.argv[3])
out = {"sequential": seq, "continuous": cont,
       "speedup_aggregate": round(
           cont["aggregate_audio_s_per_s"] / seq["aggregate_audio_s_per_s"], 2
       )}
path = f"BENCH_SERVER_r{n}.json"
json.dump(out, open(path, "w"), indent=1)
print(path, "written:", json.dumps(out))
EOF
