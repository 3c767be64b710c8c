# Flamed-TTS-TPU make targets (reference-compatible surface: train /
# synth / eval / avg, reference Makefile:41-107) plus TPU extras.

PYTHON ?= python

# --- synthesis defaults (reference Makefile:27-30) ---
NSTEPS_DURGEN ?= 64
NSTEPS_DENOISER ?= 64
TEMP_DURGEN ?= 0.3
TEMP_DENOISER ?= 0.3
SYNTH_BATCH_SIZE ?= 4

CKPT ?= random
CFG ?= configs
CODEC_DIR ?= random
PROMPT_DIR ?= prompts
OUTPUT_DIR ?= outputs
TEXT ?= "Hello world, this is Flamed TTS on TPU."
PROMPT_LIST ?= prompt.wav
METADATA ?= metadata.txt

EXP_DIR ?= exp/run1
DEVICES ?=            # data,model mesh shape, e.g. 4,1 (default: all data)

.PHONY: train synth synth-meta eval avg test bench lint corpus train-g2p train-asr eval-disc train-codec

train:
	$(PYTHON) train.py --config-dir $(CFG) --exp-dir $(EXP_DIR) \
		$(if $(DEVICES),--devices $(DEVICES),)

synth:
	$(PYTHON) synthesize.py --ckpt-path $(CKPT) --cfg-path $(CFG) \
		--codec-dir $(CODEC_DIR) --text $(TEXT) \
		--prompt-list $(PROMPT_LIST) --prompt-dir $(PROMPT_DIR) \
		--output-dir $(OUTPUT_DIR) \
		--nsteps-durgen $(NSTEPS_DURGEN) --nsteps-denoiser $(NSTEPS_DENOISER) \
		--temp-durgen $(TEMP_DURGEN) --temp-denoiser $(TEMP_DENOISER)

synth-meta:
	$(PYTHON) synthesize.py --ckpt-path $(CKPT) --cfg-path $(CFG) \
		--codec-dir $(CODEC_DIR) --metadata-file $(METADATA) \
		--prompt-dir $(PROMPT_DIR) --output-dir $(OUTPUT_DIR) \
		--batch-size $(SYNTH_BATCH_SIZE) \
		--nsteps-durgen $(NSTEPS_DURGEN) --nsteps-denoiser $(NSTEPS_DENOISER) \
		--temp-durgen $(TEMP_DURGEN) --temp-denoiser $(TEMP_DENOISER)

eval:
	$(PYTHON) tools/evaluate.py --synth-dir $(OUTPUT_DIR)/nfe$(NSTEPS_DENOISER)-temp$(TEMP_DENOISER) \
		--metadata-file $(METADATA) --prompt-dir $(PROMPT_DIR) \
		$(if $(REF_DIR),--ref-dir $(REF_DIR),) --codec-dir $(CODEC_DIR)

pytest:
	$(PYTHON) -m pytest tests/ -q

avg:
	$(PYTHON) avg_weights.py $(OUT) $(INPUTS)

test:
	$(PYTHON) test.py --small --device cpu

bench:
	$(PYTHON) bench.py

# --- TPU extras: corpus fabrication, G2P/ASR training, discrimination eval ---
CORPUS ?= _work/corpus_r4
CORPUS_NPZ ?= _work/corpus_npz_r4

corpus:
	$(PYTHON) tools/fabricate_corpus.py --out-dir $(CORPUS) --n 300 --seed 1
	$(PYTHON) tools/precompute_dataset.py --manifest $(CORPUS)/fab_manifest.txt \
		--out-dir $(CORPUS_NPZ) --codec-dir random --device tpu
	cp $(CORPUS)/speakers.txt $(CORPUS_NPZ)/

CODEC_DIR ?= _work/codec_r5
HOLDOUT ?= spk020,spk021,spk022,spk023

train-codec:
	$(PYTHON) tools/train_codec.py --corpus $(CORPUS) --out-dir $(CODEC_DIR) \
		--steps 8000 --holdout-speakers $(HOLDOUT) --device tpu

train-g2p:
	$(PYTHON) tools/train_g2p.py --device tpu

train-asr:
	$(PYTHON) tools/train_asr.py --corpus $(CORPUS) --device tpu --train-on decoded

eval-disc:
	$(PYTHON) tools/eval_discrimination.py --corpus $(CORPUS) \
		--ckpt $(CKPT) --cfg $(CFG)
