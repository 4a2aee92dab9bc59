#!/bin/bash
# Round-5 session-2 campaign: ONLY the legs still unmeasured after the
# first round-5 session (ensemble serving already landed at N=8).
# Order: bench_full first (warms the flagship kernel programs into the
# persistent cache), then wide f32, then the two fit A/Bs.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="/root/repo:/root/.axon_site"

run() {
    name="$1"; shift
    echo "=== $name: $* (start $(date -u +%H:%M:%S)) ==="
    "$@" > "/tmp/r5_${name}.log" 2>&1
    echo "=== $name exit $? (end $(date -u +%H:%M:%S)) ==="
}

run bench_full env BENCH_FULL=1 python bench.py

run wide_f32 python scripts/wide_hidden_check.py --widths 1024 \
    --matmul-dtype float32

run ab_es python scripts/ab_interleaved.py --rounds 8 --discard-first \
    --base "scripts/fit_throughput.py --epochs 8 --epoch-block 8" \
    --arm plain=--warm --arm es=--early-stopping \
    --key steady_state_img_per_sec

run ab_reg python scripts/ab_interleaved.py --rounds 8 --discard-first \
    --base "scripts/fit_throughput.py --epochs 8 --epoch-block 8" \
    --arm unreg= --arm l1="--reg l1" \
    --key steady_state_img_per_sec

echo "campaign complete $(date -u +%H:%M:%S)"
