#!/bin/bash
# Train on a single category (reference train_one_category.sh).
# Usage: ./scripts/train_one_category.sh "python scripts/train.py --cfg_file CFG" Bottle
CMD=$1
CATEGORY=$2
eval "$CMD --category $CATEGORY"
