#!/bin/bash
# CO3D scenes are processed as LLFF (poses_bounds.npy); this overrides the
# config's dataset_type explicitly (the reference had a dtu_colmap mismatch).
SCENE=${1:-co3d_apple_110}
python -m nerfsos_tpu.data.gen_dataset --config configs/${SCENE}.txt --data_type llff
