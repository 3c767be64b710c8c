#!/bin/bash
# Round-5 phase 5: lower the ASR noise floor (VERDICT r4 demand #7) and
# re-run the quality eval with the phase-4 checkpoint + retrained ASR.
#
#  - merged-corpus dir (fab_manifest.txt + speakers.txt spanning both
#    fabrication batches) for load_corpus/dump_decoded
#  - decoded-audio cache via the trained codec (ASR trains on the exact
#    output domain it scores; resumable, bounded)
#  - retrain the 256x8 recognizer + speaker head, spk020-023 held out
#  - re-run tools/eval_discrimination.py with the new weights
set -x
cd /root/repo
export PYTHONPATH=/root/.axon_site
export FLAMED_NO_PALLAS=1

echo "=== [5a] merged-corpus dir ==="
mkdir -p _work/corpus_r5_merged
cat _work/corpus_r5/fab_manifest.txt _work/corpus_r5b/fab_manifest.txt \
  > _work/corpus_r5_merged/fab_manifest.txt
cat _work/corpus_r5/speakers.txt _work/corpus_r5b/speakers.txt \
  > _work/corpus_r5_merged/speakers.txt

echo "=== [5b] decoded-audio cache (resumable; bounded at 40 min) ==="
timeout 2400 python tools/dump_decoded.py \
  --corpus _work/corpus_r5_merged --codec-dir _work/codec_r5 \
  --out-dir _work/decoded_r5 --device tpu
echo "dump_rc=$? (timeout ok: featurize falls back to clean-only for
utterances missing from the cache)"

echo "=== [5c] retrain ASR (256x8, merged corpus, decoded+clean) ==="
timeout 3600 python tools/train_asr.py \
  --corpus _work/corpus_r5_merged --device tpu \
  --train-on decoded --decoded-cache _work/decoded_r5 \
  --holdout-speakers spk020,spk021,spk022,spk023 \
  --epochs 50 2>&1 | tee /tmp/train_asr_r5.log
echo "asr_rc=$?"

echo "=== [5d] re-run discrimination + WER eval with new ASR ==="
CKPT=$(python - <<'EOF'
import glob, re
best, bv = None, 1e9
for p in glob.glob("_work/exp_demo_r5b/checkpoints/step*-val*.npz"):
    v = float(re.search(r"val([0-9.]+)\.npz", p).group(1))
    if v < bv: bv, best = v, p
print(best or "_work/exp_demo_r5b/checkpoints/last.npz")
EOF
)
echo "eval ckpt: $CKPT"
timeout 2400 python tools/eval_discrimination.py \
  --corpus _work/corpus_r5 \
  --ckpt "$CKPT" \
  --cfg configs_demo \
  --codec-dir _work/codec_r5 \
  --holdout-speakers spk020,spk021,spk022,spk023 \
  --n-synth 12 --nsteps 32 \
  --out-dir _work/eval_synth_r5c \
  > /tmp/eval_disc_r5c.json
echo "eval_rc=$?"
tail -c 400 /tmp/eval_disc_r5c.json
