#!/bin/bash
# Round-5 phase 2: precompute with the TRAINED codec, hold spk020-023 out
# of TTS training (already held out of codec training -> the zero-shot
# claim in tools/eval_discrimination.py --holdout-speakers is honest),
# retrain G2P with the proper-noun legs, then the long full-size demo.
set -x
cd /root/repo
export PYTHONPATH=/root/.axon_site
# Data jobs + demo training take the XLA codec path: correctness-equal
# (parity-tested), compiles in seconds vs minutes for Mosaic at these
# one-shot shapes.  bench.py keeps the Pallas path for the headline RTF.
export FLAMED_NO_PALLAS=1

echo "=== [2a] precompute corpus_npz_r5 with trained codec ==="
timeout 1800 python tools/precompute_dataset.py \
  --manifest _work/corpus_r5/fab_manifest.txt \
  --out-dir _work/corpus_npz_r5 \
  --codec-dir _work/codec_r5 --device tpu
echo "precompute_rc=$?"
cp _work/corpus_r5/speakers.txt _work/corpus_npz_r5/ || exit 1

echo "=== [2b] drop held-out speakers from the train/valid manifests ==="
python - <<'EOF'
held = {"spk020", "spk021", "spk022", "spk023"}
spk = {}
for line in open("_work/corpus_r5/speakers.txt"):
    u, s = line.strip().split("|")
    spk[u] = s
import re
for name in ("train_manifest.txt", "valid_manifest.txt"):
    p = "_work/corpus_npz_r5/" + name
    lines = open(p).read().splitlines()
    def utt(line):
        m = re.search(r"(utt\d+)", line)
        return m.group(1) if m else ""
    kept = [l for l in lines if spk.get(utt(l), "") not in held]
    open(p, "w").write("\n".join(kept) + "\n")
    print(name, len(lines), "->", len(kept))
EOF

echo "=== [2c] retrain G2P with proper-noun legs ==="
timeout 900 python tools/train_g2p.py --device tpu --epochs 120
echo "g2p_rc=$?"

echo "=== [2d] full-size training demo (real codes, 24-4 speakers) ==="
python train.py --config-dir configs_demo --exp-dir _work/exp_demo_r5 \
  --max-steps 12000 --val-every 1000 --log-every 25 \
  --codec-dir _work/codec_r5 --audio-log-after 3000 &
echo $! > /tmp/train_r5.pid
wait $(cat /tmp/train_r5.pid)
echo "train_rc=$?"
