#!/bin/bash
# Round-5 phase 3 (final chain): finish precompute on the 300-utt
# manifest (resumes past finished npz), drop held-out speakers from the
# train/valid manifests, then the long full-size training demo.
set -x
cd /root/repo
export PYTHONPATH=/root/.axon_site
export FLAMED_NO_PALLAS=1

echo "=== [3a] precompute (300 utts, resume) ==="
timeout 1800 python tools/precompute_dataset.py \
  --manifest _work/corpus_r5/fab_manifest_300.txt \
  --out-dir _work/corpus_npz_r5 \
  --codec-dir _work/codec_r5 --device tpu
echo "precompute_rc=$?"
cp _work/corpus_r5/speakers.txt _work/corpus_npz_r5/ || exit 1

echo "=== [3b] drop held-out speakers from train/valid manifests ==="
python - <<'EOF'
import re
held = {"spk020", "spk021", "spk022", "spk023"}
spk = dict(l.strip().split("|") for l in open("_work/corpus_r5/speakers.txt"))
for name in ("train_manifest.txt", "valid_manifest.txt"):
    p = "_work/corpus_npz_r5/" + name
    lines = open(p).read().splitlines()
    utt = lambda l: (re.search(r"(utt\d+)", l) or [""]).group(1)
    kept = [l for l in lines if spk.get(utt(l), "") not in held]
    open(p, "w").write("\n".join(kept) + "\n")
    print(name, len(lines), "->", len(kept))
EOF

echo "=== [3c] full-size training demo (real codes, 20 speakers) ==="
python train.py --config-dir configs_demo --exp-dir _work/exp_demo_r5 \
  --max-steps 12000 --val-every 1000 --log-every 25 \
  --codec-dir _work/codec_r5 --audio-log-after 3000 &
echo $! > /tmp/train_r5.pid
wait $(cat /tmp/train_r5.pid)
echo "train_rc=$?"
