#!/bin/bash
# Offline ray generation for an LLFF scene.
SCENE=${1:-flower}
python -m nerfsos_tpu.data.gen_dataset --config configs/${SCENE}_full.txt --data_type llff
