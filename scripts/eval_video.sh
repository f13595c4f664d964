#!/bin/bash
# Render the exhibit-path videos (rgb/disp/sem/clus) for a trained run.
EXPNAME=${1:?usage: eval_video.sh EXPNAME [CONFIG]}
CONFIG=${2:-configs/flower_full.txt}
python -u run_nerf.py --expname $EXPNAME --config $CONFIG --eval_video --ret_cluster --clus_no_sfm
