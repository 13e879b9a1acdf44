#!/bin/bash
# Full-registry parity sweep at sf1, chunked so each chunk gets a fresh
# JVM + DuckDB process (isolates one crash/od-spill to its chunk) and
# writes its own artifact; merge with tools/merge_parity.py afterwards.
#
# Excludes embedding_neardup_pairs: its contract is EXACT all-pairs
# cosine on BOTH sides (oracle included) — 200M pairs at sf1 is hours of
# DuckDB list_cosine_similarity by design, not a scale bug; the 100 TB
# path for that operator (embedding_lsh_topk / lsh_topk_recall /
# embedding_ivf_topk) IS in the sweep.
set -u
cd /root/repo
SF=${1:-/root/repo/testdata_gen/sf1}
OUT=${2:-/tmp/sf1_sweep}
mkdir -p "$OUT"
python - "$OUT" <<'EOF'
import sys, json
sys.path.insert(0, ".")
import __spark_entry__ as e
names = [n for n in e.queries() if n != "embedding_neardup_pairs"]
K = 12  # chunks
chunks = [names[i::K] for i in range(K)]
# i::K interleaves so each chunk mixes heavy and light queries
with open(sys.argv[1] + "/chunks.json", "w") as fh:
    json.dump(chunks, fh)
print(f"{len(names)} queries in {K} chunks")
EOF
N=$(python -c "import json;print(len(json.load(open('$OUT/chunks.json'))))")
for i in $(seq 0 $((N-1))); do
  Q=$(python -c "import json;print(' '.join(json.load(open('$OUT/chunks.json'))[$i]))")
  echo "=== chunk $i: starting $(date -u +%H:%M:%S) ==="
  timeout 7200 python tools/check_parity.py --json "$OUT/chunk$i.json" "$SF" $Q \
    > "$OUT/chunk$i.log" 2>&1
  echo "=== chunk $i: exit $? $(date -u +%H:%M:%S) ==="
done
echo "SWEEP DONE"
