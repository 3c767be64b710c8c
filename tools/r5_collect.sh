#!/bin/bash
# Collect the r5 demo run into committed artifacts (after train stops).
set -ex
cd /root/repo
mkdir -p docs/runs/demo_r5
cp _work/exp_demo_r5/metrics.jsonl docs/runs/demo_r5/
cp _work/exp_demo_r5/config.yaml docs/runs/demo_r5/
python tools/summarize_training.py _work/exp_demo_r5 > docs/runs/demo_r5/summary.md
tail -3 docs/runs/demo_r5/summary.md
