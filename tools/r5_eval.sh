#!/bin/bash
# Round-5 quality loop: discrimination eval (mel/codec/ASR-speaker
# margins, wer_synth, held-out-speaker zero-shot legs) against the r5
# demo checkpoint + trained codec.  JSON -> docs/runs/eval_disc_r5.json.
set -x
cd /root/repo
export PYTHONPATH=/root/.axon_site
export FLAMED_NO_PALLAS=1

CKPT=${CKPT:-_work/exp_demo_r5/checkpoints/last.npz}
timeout 1500 python tools/eval_discrimination.py \
  --corpus _work/corpus_r5 \
  --ckpt "$CKPT" \
  --cfg configs_demo \
  --codec-dir _work/codec_r5 \
  --holdout-speakers spk020,spk021,spk022,spk023 \
  --n-synth 12 --nsteps 32 \
  --out-dir _work/eval_synth_r5 \
  > docs/runs/eval_disc_r5.json
echo "eval_rc=$?"
python -c "import json;d=json.load(open('docs/runs/eval_disc_r5.json'));print(json.dumps({k:(v if not isinstance(v,dict) else {kk:vv for kk,vv in v.items() if not isinstance(vv,list)}) for k,v in d.items()},indent=1)[:2000])"
