#!/bin/bash
# End-to-end synthetic run of the reference's research workflow
# (reference docs/model.md:100-103 protocol, scaled to the synthetic data
# this container can generate):
#   1. multi-category Breaking-Bad-format tree (held-out val split)
#   2. per-category training x REPEAT seed dups
#      (scripts/train_everyday_categories.sh -> scripts/dup_run.sh, the
#       reference's train_everyday_categories.sh + dup_run_sbatch.sh)
#   3. scripts/test.py --category all over the per-category checkpoints
#      (reference scripts/test.py:33-62 LaTeX row)
#   4. scripts/collect_test.py aggregation over categories x dups
#      (reference scripts/collect_test.py:118-145)
#
# Usage: ./scripts/run_synth_sweep.sh [WORKDIR]
# Env: REPEAT (default 2), EPOCHS (default 400), N_SHAPES (default 16),
#      CATEGORIES (default "BeerBottle Bowl Mug"), MPA_PLATFORM (cpu).
set -e
cd "$(dirname "$0")/.."

WORK=${1:-/tmp/mpa_sweep}
REPEAT=${REPEAT:-2}
EPOCHS=${EPOCHS:-400}
N_SHAPES=${N_SHAPES:-16}
CATEGORIES=${CATEGORIES:-"BeerBottle Bowl Mug"}
export MPA_PLATFORM=${MPA_PLATFORM:-cpu}
CFG=configs/pn_transformer/pn_transformer/pn_transformer-32x1-cosine_400e-everyday.py
CFG_BASE=$(basename ${CFG%.py})
DATA="$WORK/data"
CATS_CSV=$(echo $CATEGORIES | tr ' ' ',')

mkdir -p "$WORK"

# 1) data: per-category synthetic everyday tree with a held-out val split
if [ ! -f "$DATA/everyday.train.txt" ]; then
    python scripts/make_synthetic_data.py --out "$DATA" \
        --n_shapes "$N_SHAPES" --min_parts 2 --max_parts 3 --seed 3 \
        --holdout_val --categories "$CATS_CSV"
fi

# small-budget overrides shared by every stage (recipe as in e2e_check.py;
# bounded rotations keep the tiny budget learnable)
OPTS="data.data_dir $DATA data.num_pc_points 256 data.max_num_part 3 \
exp.batch_size 8 exp.num_epochs $EPOCHS exp.val_every $((EPOCHS / 4)) \
exp.num_workers 0 loss.sample_iter 1 loss.trans_loss_w 10. \
data.rot_range 15. data.all_category $CATS_CSV"

# 2) per-category training x REPEAT dups (checkpoints land in
#    checkpoint/${CFG_BASE}-{category}-dup{i})
CATEGORIES="$CATEGORIES" ./scripts/train_everyday_categories.sh \
    "REPEAT=$REPEAT ./scripts/dup_run.sh scripts/train.py $WORK/job-CATEGORY $CFG --opts $OPTS" \
    "$CFG"

# 3) per-category LaTeX row from dup1's checkpoints
python scripts/test.py --cfg_file "$CFG" --category all \
    --weight "checkpoint/${CFG_BASE}-{}-dup1" --opts $OPTS

# 4) aggregate across categories AND dups
DUP_DIRS=""
for i in $(seq 1 "$REPEAT"); do
    DUP_DIRS="$DUP_DIRS checkpoint/${CFG_BASE}-{}-dup${i}"
done
python scripts/collect_test.py --cfg_file "$CFG" --ckp_dirs $DUP_DIRS \
    --category all --opts $OPTS
