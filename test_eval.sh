#!/bin/bash
# Sampling + eval pipeline (counterpart of the reference's test_eval.sh):
# sample the test set, then compute SSIM/PSNR/LPIPS/FVD.
set -e
CKPT=${CKPT:?set CKPT}
MODE=${MODE:-autoreg}
OBS=${OBS:-36}
MAXF=${MAXF:-20}
STEP=${STEP:-1}
T=${T:-100}
python scripts/video_sample.py "$CKPT" --inference_mode "$MODE" \
  --obs_length "$OBS" --max_frames "$MAXF" --step_size "$STEP" --T "$T" "$@"
EVAL_DIR=$(python - "$CKPT" <<PYEOF
import sys, types
sys.path.insert(0, ".")
from video_diffusion_tpu.utils import eval_util
args = types.SimpleNamespace(checkpoint_path=sys.argv[1], eval_dir=None,
    use_ddim=False, timestep_respacing="", inference_mode="$MODE",
    optimality=None, max_frames=$MAXF, step_size=$STEP, T=$T, obs_length=$OBS)
print(eval_util.get_model_results_path(args) / eval_util.get_eval_run_identifier(args))
PYEOF
)
python scripts/video_eval.py --eval_dir "$EVAL_DIR" --obs_length "$OBS" --T "$T"
