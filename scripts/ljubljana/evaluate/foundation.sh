#!/bin/bash
# Sweep foundation checkpoints over the angiograms (init-only) and score
# (reference scripts/ljubljana/evaluate/foundation.sh -> host loop).
set -e
CKPTDIR=${CKPTDIR:-models/wbct}

for SUBJDIR in data/ljubljana/subject*/; do
    SUBJECT=$(basename "$SUBJDIR")
    for CKPTPATH in "$CKPTDIR"/*.ckpt; do
        CKPT_IDX=$(basename "$CKPTPATH" .ckpt)
        xvr register model \
            "data/ljubljana/$SUBJECT/xrays" \
            -v "data/ljubljana/$SUBJECT/volume.nii.gz" \
            -c "$CKPTPATH" \
            -o "results/ljubljana/evaluate/foundation/$SUBJECT/$CKPT_IDX" \
            --linearize \
            --subtract_background \
            --warp "data/ljubljana/$SUBJECT/warp2template.txt" \
            --init_only \
            --pattern '*[!_max].dcm' \
            --verbose 0
    done
done

python scripts/evaluate.py results/ljubljana/evaluate/foundation \
    --dataset ljubljana -o results/ljubljana/evaluate/foundation.csv
