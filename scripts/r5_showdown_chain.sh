#!/bin/bash
# Round-5 quality showdown chain (VERDICT r04 item 7): the tuned 250-epoch
# neurons=8 protocol on the HARD synthetic regime, both rules, both stacks.
# Torch runs first per rule (it writes the shared init weights) on the CPU;
# the jax arms run on the TPU like the round-2 protocol (results/showdown/
# artifacts record device "TPU v5 lite0" — B=1 parity-precision training is
# ~118 imgs/s there vs ~2 imgs/s on the 1-core CPU host). Runs are strictly
# sequential, so at most ONE process claims the relay at a time; logs +
# artifacts land incrementally in results/showdown_r5/ so a mid-round
# snapshot keeps everything measured so far.
#
# Usage: bash scripts/r5_showdown_chain.sh [epochs] [train] [val]
set -u
cd "$(dirname "$0")/.."
EPOCHS=${1:-250}
TRAIN=${2:-256}
VAL=${3:-64}
OUT=results/showdown_r5
mkdir -p "$OUT"
export PYTHONPATH=/root/repo:/root/.axon_site

note() { echo "[$(date -u +%H:%M:%S)] $*"; }

for rule in hebb oja; do
    for stack in torch jax; do
        f="$OUT/sd_${stack}_${rule}_${EPOCHS}h.json"
        if [ -s "$f" ]; then note "skip $stack/$rule: $f exists"; continue; fi
        extra=""
        plat=cpu
        if [ "$stack" = jax ]; then
            extra="--init $OUT/sd_torch_${rule}_${EPOCHS}h.json.init.pth"
            plat=""  # jax arm runs on the TPU (round-2 protocol)
        fi
        note "start $stack/$rule (epochs=$EPOCHS train=$TRAIN hard, platform=${plat:-tpu})"
        PLASTIC_UNET_PLATFORM=$plat timeout 14400 python3 scripts/quality_showdown.py "$stack" \
            --rule "$rule" --epochs "$EPOCHS" --train "$TRAIN" --val "$VAL" \
            --hard $extra --out "$f" \
            > "$OUT/sd_${stack}_${rule}_${EPOCHS}h.log" 2>&1
        note "$stack/$rule rc=$?"
    done
done
note "chain done"
python3 scripts/quality_showdown.py report "$OUT"/sd_*_${EPOCHS}h.json
