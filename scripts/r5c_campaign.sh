#!/bin/bash
# Round-5 final campaign: fused2 two-layer measurements + the A/B legs
# that session 2's CPU-contended run invalidated.  Run with NOTHING else
# on the box (single core: any concurrent pytest run poisons the
# host-side dispatch timing).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="/root/repo:/root/.axon_site"

run() {
    name="$1"; shift
    echo "=== $name: $* (start $(date -u +%H:%M:%S)) ==="
    "$@" > "/tmp/r5_${name}.log" 2>&1
    echo "=== $name exit $? (end $(date -u +%H:%M:%S)) ==="
}

# fused2 vs composed, interleaved in-process (compiles the T=100 pair).
run twolayer_bf16 python scripts/twolayer_throughput.py --windows 3
run twolayer_f32 python scripts/twolayer_throughput.py --windows 3 --f32

# BENCH_FULL rows on the new dispatch (warm from the legs above).
run bench_full2 env BENCH_FULL=1 python bench.py

# ES overhead + count-reg A/Bs, N=8 interleaved process pairs.
run ab_es python scripts/ab_interleaved.py --rounds 8 --discard-first \
    --base "scripts/fit_throughput.py --epochs 8 --epoch-block 8" \
    --arm plain=--warm --arm es=--early-stopping \
    --key steady_state_img_per_sec

run ab_reg python scripts/ab_interleaved.py --rounds 8 --discard-first \
    --base "scripts/fit_throughput.py --epochs 8 --epoch-block 8" \
    --arm unreg= --arm l1="--reg l1" \
    --key steady_state_img_per_sec

echo "campaign complete $(date -u +%H:%M:%S)"
