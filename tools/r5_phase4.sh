#!/bin/bash
# Round-5 phase 4: scale the corpus ~4.7x to push past the 242-utt
# overfitting wall (val minimum at step 2000 in docs/runs/demo_r5).
# Fabricate a second batch (prefix uttb, same 24-voice pool), precompute
# everything through the trained codec (resume keeps the 300 done),
# drop the held-out speakers, train a fresh full-size 10k-step run,
# then re-run the discrimination+WER eval with the best-val checkpoint.
set -x
cd /root/repo
export PYTHONPATH=/root/.axon_site
export FLAMED_NO_PALLAS=1

echo "=== [4a] fabricate batch b (900 utts, seed 2, prefix uttb) ==="
if [ ! -f _work/corpus_r5b/fab_manifest.txt ]; then
  JAX_PLATFORMS=cpu timeout 2400 python tools/fabricate_corpus.py \
    --out-dir _work/corpus_r5b --n 900 --seed 2 --prefix uttb
fi
echo "fab_rc=$?"

echo "=== [4b] merged manifest + speakers ==="
cat _work/corpus_r5/fab_manifest.txt _work/corpus_r5b/fab_manifest.txt \
  > _work/corpus_r5/fab_manifest_merged.txt
cat _work/corpus_r5/speakers.txt _work/corpus_r5b/speakers.txt \
  > /tmp/speakers_merged.txt

echo "=== [4c] precompute merged corpus (resume past the 300 done) ==="
timeout 7200 python tools/precompute_dataset.py \
  --manifest _work/corpus_r5/fab_manifest_merged.txt \
  --out-dir _work/corpus_npz_r5 \
  --codec-dir _work/codec_r5 --device tpu --valid-n 40
echo "precompute_rc=$?"
cp /tmp/speakers_merged.txt _work/corpus_npz_r5/speakers.txt || exit 1
cp /tmp/speakers_merged.txt _work/corpus_r5/speakers_merged.txt

echo "=== [4d] drop held-out speakers from train/valid manifests ==="
python - <<'EOF'
import re
held = {"spk020", "spk021", "spk022", "spk023"}
spk = dict(l.strip().split("|") for l in open("_work/corpus_npz_r5/speakers.txt"))
for name in ("train_manifest.txt", "valid_manifest.txt"):
    p = "_work/corpus_npz_r5/" + name
    lines = open(p).read().splitlines()
    utt = lambda l: (re.search(r"(utt[b-z]?\d+)", l) or [""]).group(1)
    kept = [l for l in lines if spk.get(utt(l), "") not in held]
    open(p, "w").write("\n".join(kept) + "\n")
    print(name, len(lines), "->", len(kept))
EOF

echo "=== [4e] fresh full-size training run (10k steps, big corpus) ==="
python train.py --config-dir configs_demo --exp-dir _work/exp_demo_r5b \
  --max-steps 10000 --val-every 1000 --log-every 25 \
  --codec-dir _work/codec_r5 --audio-log-after 9000 &
echo $! > /tmp/train_r5b.pid
wait $(cat /tmp/train_r5b.pid)
echo "train_rc=$?"

echo "=== [4f] discrimination + WER eval with best-val checkpoint ==="
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
  --out-dir _work/eval_synth_r5b \
  > /tmp/eval_disc_r5b.json
echo "eval_rc=$?"
tail -c 400 /tmp/eval_disc_r5b.json
