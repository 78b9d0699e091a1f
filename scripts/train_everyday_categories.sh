#!/bin/bash
# Train one model per category of the Breaking-Bad everyday subset
# (reference train_everyday_categories.sh). Usage:
#   ./scripts/train_everyday_categories.sh "python scripts/train.py --cfg_file CFG" 
CMD=$1
CATEGORIES=(BeerBottle Bowl Cup DrinkingUtensil Mug Plate Spoon Teacup \
    ToyFigure WineBottle Bottle Cookie DrinkBottle Mirror PillBottle Ring \
    Statue Teapot Vase WineGlass)
for CATEGORY in "${CATEGORIES[@]}"; do
    eval "$CMD --category $CATEGORY"
done
