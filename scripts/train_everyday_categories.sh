#!/bin/bash
# Train one model per category of the Breaking-Bad everyday subset
# (reference train_everyday_categories.sh: copies the config per category,
# substitutes CATEGORY into the command template, appends --category).
#
# Usage:
#   ./scripts/train_everyday_categories.sh \
#       "REPEAT=3 ./scripts/dup_run.sh scripts/train.py job-CATEGORY CFG.py [args]" CFG.py
#
# CATEGORIES env overrides the category list (synthetic sweeps / smoke runs).
CMD=$1
CFG=$2
CATEGORIES=${CATEGORIES:-"BeerBottle Bottle Bowl Cookie Cup DrinkBottle \
DrinkingUtensil Mirror Mug PillBottle Plate Ring Spoon Statue Teacup Teapot \
ToyFigure Vase WineBottle WineGlass"}

for cat in $CATEGORIES; do
    cfg="${CFG:0:(-3)}-$cat.py"
    cp "$CFG" "$cfg"
    cmd="${CMD/$CFG/$cfg}"
    cmd="${cmd/CATEGORY/$cat}"
    cmd="$cmd --category $cat"
    eval $cmd
done
