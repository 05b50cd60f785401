#!/usr/bin/env bash
# Demo: train male-3-casual then animate with the AIST dance sequence
# (reference bash/run-demo.sh parity)
set -e
SUBJECT=${1:-male-3-casual}
python cli/train.py --config-name SNARF_NGP dataset=peoplesnapshot/$SUBJECT
python cli/animate.py --config-name SNARF_NGP dataset=peoplesnapshot/$SUBJECT
