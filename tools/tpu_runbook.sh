#!/bin/bash
# TPU measurement runbook — the queued experiments that need the real chip.
# Run top-to-bottom when a TPU is attached (each is independently skippable).
# Context: docs/ROUND3.md "Int8 post-training quantization" + "Where the
# 5,000 target stands". Expected wall-clock ~1-2h total.
set -x
cd "$(dirname "$0")/.."

# 1. Headline sanity: fused single-program e2e (the BENCH_r{N} metric).
timeout 1200 python bench.py

# 2. Int8 PTQ net probe (2x MXU peak over bf16 on v5e): net-only rate +
#    argmax agreement vs the bf16 fast path.
BENCH_INT8=1 timeout 1200 python bench.py

# 3. Int8 fused e2e (inference_and_postprocess routed through quant_decode).
BENCH_INT8_E2E=1 timeout 1200 python bench.py

# 4. Conv layout/dtype probe: NHWC vs NCHW, bf16 vs int8 (the round-2
#    verdict's untried NCHW lever).
timeout 1200 python tools/probe_layout_dtype.py

# 5. Train-step roofline for the per-model SOL table.
timeout 1800 python tools/model_sol.py --train --models UNet

# 6. HoverNet jax-side parity catchup (seeds 2,3 @500; 0,1 @1000) — decides
#    the seed-0 bifurcation-vs-flake question in docs/PARITY.md.
for spec in "2 500" "3 500" "0 1000" "1 1000"; do
  set -- $spec
  timeout 10800 python tools/parity_study.py --model HoverNet --seed "$1" --steps "$2" \
    --side jax --out /tmp/parity_study.jsonl
done
python tools/parity_study.py --summarize /tmp/parity_study.jsonl
