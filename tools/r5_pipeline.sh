#!/bin/bash
# Round-5 TPU pipeline: validate the fused stack kernel on real Mosaic,
# precompute the r5 corpus with the from-scratch TRAINED codec (real codes
# -> prior CE becomes learnable, VERDICT r4 demand #1), then run the
# long full-size training demo.
set -x
cd /root/repo
export PYTHONPATH=/root/.axon_site

echo "=== [1/3] stack kernel TPU parity ==="
timeout 900 python tools/check_stack_tpu.py 2>&1
echo "stack_check_rc=$?"

echo "=== [2/3] precompute corpus_npz_r5 with trained codec ==="
timeout 1500 python tools/precompute_dataset.py \
  --manifest _work/corpus_r5/fab_manifest.txt \
  --out-dir _work/corpus_npz_r5 \
  --codec-dir _work/codec_r5 --device tpu 2>&1
echo "precompute_rc=$?"
cp _work/corpus_r5/speakers.txt _work/corpus_npz_r5/ || exit 1

echo "=== [3/3] full-size training demo (real codes) ==="
python train.py --config-dir configs_demo --exp-dir _work/exp_demo_r5 \
  --max-steps 12000 --val-every 1000 --log-every 25 \
  --codec-dir _work/codec_r5 --audio-log-after 3000 2>&1 &
echo $! > /tmp/train_r5.pid
wait $(cat /tmp/train_r5.pid)
echo "train_rc=$?"
