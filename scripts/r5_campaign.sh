#!/bin/bash
# Round-5 native measurement campaign (VERDICT items 3, 4, 7 + item-1
# BENCH_FULL row).  Runs each leg in sequence, tolerating failures, so a
# single background invocation rides out relay contention windows.
# Logs land in /tmp/r5_*.log; the driver-facing summary is assembled
# into PARITY.md by hand afterwards.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="/root/repo:/root/.axon_site"

run() {
    name="$1"; shift
    echo "=== $name: $* (start $(date -u +%H:%M:%S)) ==="
    "$@" > "/tmp/r5_${name}.log" 2>&1
    echo "=== $name exit $? (end $(date -u +%H:%M:%S)) ==="
}

# Item 4 + uint8-wire leg of item 7: ensemble + single serving, f32/u8.
run ens_serve python scripts/ensemble_serve_bench.py --rounds 8

# Item 3: f32 wide-recurrent fusion (H=1024 admitted this round).
run wide_f32 python scripts/wide_hidden_check.py --widths 1024 \
    --matmul-dtype float32
run wide_bf16 python scripts/wide_hidden_check.py --widths 1024 \
    --matmul-dtype bfloat16

# Item 7: early-stopping overhead A/B, N=8 interleaved process pairs.
run ab_es python scripts/ab_interleaved.py --rounds 8 --discard-first \
    --base "scripts/fit_throughput.py --epochs 8 --epoch-block 8" \
    --arm plain=--warm --arm es=--early-stopping \
    --key steady_state_img_per_sec

# Item 7: count-based reg vs unregularized, N=8 interleaved.
run ab_reg python scripts/ab_interleaved.py --rounds 8 --discard-first \
    --base "scripts/fit_throughput.py --epochs 8 --epoch-block 8" \
    --arm unreg= --arm l1="--reg l1" \
    --key steady_state_img_per_sec

# Item 1 done-criterion: deep-network BENCH_FULL row (twolayer on the
# flagship bf16 recipe via the new mid-head kernel) + headline.
run bench_full env BENCH_FULL=1 python bench.py

echo "campaign complete $(date -u +%H:%M:%S)"
