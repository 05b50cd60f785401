#!/usr/bin/env bash
# In-the-wild demo: fit SMPL from scratch with the NN deformer, train the
# avatar, then render novel views + animation (reference run-neuman-demo.sh)
set -e
SEQUENCE=${1:-video}
python cli/fit.py --config-name SNARF_NGP_fitting dataset=custom/$SEQUENCE \
    deformer=smpl train.max_epochs=200
python cli/train.py --config-name demo dataset=custom/$SEQUENCE \
    train.max_epochs=200 sampler.dilate=8
python cli/novel_view.py --config-name demo dataset=custom/$SEQUENCE
python cli/animate.py --config-name demo dataset=custom/$SEQUENCE
