#!/bin/bash
# One-shot InEnv10 quality program (fires after TPU relay recovery).
#
# Stage 1: ESRNet training on the 10-source dataset (from scratch with
# elastic --resume auto: the two-photo warm start was lost to a machine
# reset; results/ is gitignored); eval on both held-out sets
# (vs docs/inenv10_baselines.json).
# Stage 2: GAN continuation with the trunk-feature perceptual loss
# (--content-backbone trunk, no VGG weights in-env); re-eval.
# Logs: /tmp/inenv10_*.log  Scores: /tmp/inenv10_scores.jsonl
set -u
cd "$(dirname "$0")/.."
SCORES=/tmp/inenv10_scores.jsonl
: > "$SCORES"

# Chip lock: bench.py refuses to record numbers while this run occupies the
# TPU (round 4's acceptance bench was captured mid-training and regressed).
LOCK=/tmp/tpu_busy.lock
echo "inenv10 $$ $(date +%s)" > "$LOCK"
trap 'rm -f "$LOCK"' EXIT

note() { echo "[inenv10 $(date +%H:%M:%S)] $*"; }

# run_stage <budget_s> <cmd...> — elastic restart loop.  The trainers are
# crash-recoverable by design (--resume auto / --resume-g auto picks up the
# newest checkpoint), and two non-fatal failure classes are EXPECTED on this
# machine: relay hiccups ("remote_compile: response body closed") and the
# rc=4 host-RAM failsafe (utils/hostmem.py).  Loop until the stage finishes
# (rc=0), declares divergence (rc=3, not retryable), or the budget runs out.
run_stage() {
  local deadline=$(( $(date +%s) + $1 )); shift
  local rc attempt=0
  while :; do
    attempt=$((attempt + 1))
    local left=$(( deadline - $(date +%s) ))
    if [ "$left" -le 120 ]; then note "stage budget exhausted"; return 124; fi
    timeout "$left" "$@"; rc=$?
    case $rc in
      0|3) return $rc ;;
      124) note "stage hit its wall-clock budget"; return 124 ;;
    esac
    note "trainer exited rc=$rc (attempt $attempt); elastic resume in 15s"
    sleep 15
  done
}

score() { # score <tag> <weights> [extra eval_pair args...]
  local tag=$1 weights=$2; shift 2
  for set in degraded clean; do
    local lr hr
    if [ $set = degraded ]; then
      lr=data/InEnv10/eval_degraded/LRx4; hr=data/InEnv10/eval_degraded/GTmod4
    else
      lr=data/InEnv10/eval/LRbicx4; hr=data/InEnv10/eval/GTmod4
    fi
    note "eval $tag ($set)"
    local line
    line=$(timeout 2400 python scripts/eval_pair.py --weights "$weights" \
        --lr-dir $lr --hr-dir $hr "$@" 2>/dev/null | tail -1)
    echo "{\"tag\": \"$tag\", \"set\": \"$set\", \"result\": $line}" >> "$SCORES"
    echo "$tag/$set: $line"
  done
}

# Uniform 256px validation tiles (single eval compile shape on the relay);
# the trainer's per-saving-epoch NIQE eval reads these.
if [ ! -d data/InEnv10/valid ]; then
  python - <<'PYEOF'
import cv2, os
src, dst = "data/InEnv10/eval_src", "data/InEnv10/valid"
os.makedirs(dst, exist_ok=True)
for f in sorted(os.listdir(src)):
    img = cv2.imread(os.path.join(src, f))
    h, w = img.shape[:2]
    if h < 256 or w < 256:
        continue
    t, l = (h - 256) // 2, (w - 256) // 2
    cv2.imwrite(os.path.join(dst, f), img[t:t+256, l:l+256])
PYEOF
fi

# Round-5 stage-1 regime (the divergence fixes, docs/ROUND4_NOTES.md):
#   train_clamp "none" (config default) — loss on the unclamped output, the
#     restoring force against trunk-gain explosion;
#   lr 1e-4 — bs16 carries 3x the reference's bs48 gradient noise at the
#     same lr, and every InEnv10 collapse happened at 2e-4/bs16;
#   warmup 500 steps (~18 epochs) — the measured cold-start divergence fired
#     at step 106;
#   abort-on-storm — a diverged run exits rc=3 instead of burning 4 hours.
note "stage 1: ESRNet from scratch on InEnv10 (elastic resume auto)"
run_stage "${S1_BUDGET:-14400}" python train_realesrnet.py \
    --train-dir data/InEnv10/train --valid-dir data/InEnv10/valid \
    --test-lr-dir data/InEnv10/eval/LRbicx4 \
    --test-hr-dir data/InEnv10/eval/GTmod4 \
    --exp-name RealESRNet_inenv10 \
    --resume auto --epochs "${S1_EPOCHS:-700}" --batch-size 16 \
    --lr 1e-4 --warmup-steps 500 --abort-on-storm \
    --checkpoint-frequency 25 --no-tensorboard \
    >> /tmp/inenv10_s1.log 2>&1
rc=$?
note "stage 1 rc=$rc (log tail below)"; tail -3 /tmp/inenv10_s1.log
if [ $rc -ne 0 ] && [ ! -e results/RealESRNet_inenv10/g_best ]; then
  note "stage 1 failed with no checkpoint; aborting"; exit 1
fi

score s1_ema results/RealESRNet_inenv10/g_best
score s1_params results/RealESRNet_inenv10/g_best --use-params
python scripts/snapshot_weights.py --checkpoint results/RealESRNet_inenv10/g_best \
    --output assets/inenv10_esrnet_ema.npz

note "stage 2: GAN with trunk-feature content loss"
# 70 epochs = 1,960 trunk-GAN steps (>= the 1.5k-step evidence target);
# elastic resume can extend the run later if wall clock allows.
run_stage "${S2_BUDGET:-9600}" python train_realesrgan.py \
    --train-dir data/InEnv10/train --valid-dir data/InEnv10/valid \
    --test-lr-dir data/InEnv10/eval/LRbicx4 \
    --test-hr-dir data/InEnv10/eval/GTmod4 \
    --exp-name RealESRGAN_inenv10 \
    --resume results/RealESRNet_inenv10/g_best --content-backbone trunk \
    --resume-g auto --resume-d auto \
    --lr 5e-5 --warmup-steps 200 --abort-on-storm \
    --epochs "${S2_EPOCHS:-70}" --batch-size 16 \
    --checkpoint-frequency 14 --no-tensorboard \
    >> /tmp/inenv10_s2.log 2>&1
rc=$?
note "stage 2 rc=$rc (log tail below)"; tail -3 /tmp/inenv10_s2.log
if [ $rc -ne 0 ] && [ ! -e results/RealESRGAN_inenv10/g_best ]; then
  note "stage 2 failed with no checkpoint; stopping before GAN evals"; exit 1
fi

score gan_ema results/RealESRGAN_inenv10/g_best
score gan_params results/RealESRGAN_inenv10/g_best --use-params
python scripts/snapshot_weights.py --checkpoint results/RealESRGAN_inenv10/g_best \
    --output assets/inenv10_esrgan_ema.npz

note "done; scores:"
cat "$SCORES"
