#!/usr/bin/env bash
# Repeated-prefix serving benchmark: every request shares one long text
# prefix; measures the TTFB effect of cross-request text-prefix KV reuse
# (TARS_PREFIX_REUSE=1, engine text_prefix_prefill) against the same
# workload without it. Merges into BENCH_PREFIX_r{N}.json.
set -euo pipefail
cd "$(dirname "$0")/.."
N="${1:-03}"
CLIENTS="${CLIENTS:-2}"
REQUESTS="${REQUESTS:-4}"

off_json=$(TARS_PREFIX_REUSE=0 python tools/bench_server_concurrent.py \
    --mode sequential --clients "$CLIENTS" --requests "$REQUESTS" \
    --repeat-prefix --port 18655 | tail -1)
sleep 60  # let the tunnel release the chip claim
on_json=$(TARS_PREFIX_REUSE=1 python tools/bench_server_concurrent.py \
    --mode sequential --clients "$CLIENTS" --requests "$REQUESTS" \
    --repeat-prefix --port 18656 | tail -1)

python - "$N" "$off_json" "$on_json" <<'EOF'
import json, sys
n, off, on = sys.argv[1], json.loads(sys.argv[2]), json.loads(sys.argv[3])
out = {"prefix_reuse_off": off, "prefix_reuse_on": on,
       "ttfb_p50_delta_s": round(off["ttfb_p50_s"] - on["ttfb_p50_s"], 3)}
path = f"BENCH_PREFIX_r{n}.json"
json.dump(out, open(path, "w"), indent=1)
print(path, "written:", json.dumps(out))
EOF
