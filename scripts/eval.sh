#!/bin/bash
# Full test-set evaluation of a trained run.
EXPNAME=${1:?usage: eval.sh EXPNAME [CONFIG]}
CONFIG=${2:-configs/flower_full.txt}
python -u run_nerf.py --expname $EXPNAME --config $CONFIG --eval --ret_cluster --clus_no_sfm
