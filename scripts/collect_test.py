"""Aggregate test results over per-category / per-seed checkpoints
(reference scripts/collect_test.py): finds the newest checkpoint per run
dir, means over duplicate seeds, prints per-category LaTeX tables."""

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

METRIC_ORDER = ['test/rot_rmse', 'test/rot_mae', 'test/trans_rmse',
                'test/trans_mae', 'test/transform_pt_cd_loss',
                'test/part_acc', 'test/connectivity_acc']
SCALE = {'test/rot_rmse': 1, 'test/rot_mae': 1, 'test/trans_rmse': 100,
         'test/trans_mae': 100, 'test/transform_pt_cd_loss': 1000,
         'test/part_acc': 100, 'test/connectivity_acc': 100}


def find_last_ckp(ckp_dir):
    """Newest checkpoint step dir by mtime (reference collect_test.py:18-27)."""
    cands = glob.glob(os.path.join(ckp_dir, 'models', '*'))
    cands = [c for c in cands if os.path.isdir(c) and
             os.path.basename(c).isdigit()]
    if not cands:
        return None
    return max(cands, key=os.path.getmtime)


def main():
    parser = argparse.ArgumentParser(description='Collect test results')
    parser.add_argument('--cfg_file', required=True, type=str)
    parser.add_argument('--ckp_dirs', required=True, nargs='+',
                        help='run dirs; may contain {} for category')
    parser.add_argument('--category', type=str, default='all')
    parser.add_argument('--opts', nargs='*', default=[],
                        help='config overrides: key value [key value ...]')
    args = parser.parse_args()

    from multi_part_assembly_tpu.parallel import init_distributed
    init_distributed()  # honors MPA_PLATFORM / MPA_NUM_CPU_DEVICES
    from multi_part_assembly_tpu.train.trainer import Trainer
    from multi_part_assembly_tpu.utils import load_cfg_file

    cfg = load_cfg_file(args.cfg_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    categories = list(cfg.data.all_category) if args.category == 'all' \
        else [args.category]

    per_cat = {}
    for cat in categories:
        dup_results = []
        for ckp_dir in args.ckp_dirs:
            d = ckp_dir.format(cat) if '{}' in ckp_dir else ckp_dir
            ckp = find_last_ckp(d)
            if ckp is None:
                print(f'no checkpoint in {d}')
                continue
            cat_cfg = cfg.clone()
            cat_cfg.data.category = cat
            cat_cfg.freeze()
            trainer = Trainer(cat_cfg, ckp_dir=d, resume=True, quiet=True)
            dup_results.append(trainer.test())
            trainer.close()
        if dup_results:
            per_cat[cat] = {
                k: float(np.mean([r[k] for r in dup_results]))
                for k in dup_results[0]
            }

    if not per_cat:
        print('no results found')
        return
    keys = [k for k in METRIC_ORDER if k in next(iter(per_cat.values()))]
    print('category | ' + ' | '.join(keys))
    for cat, res in per_cat.items():
        row = ' & '.join(f'{res[k] * SCALE.get(k, 1):.2f}' for k in keys)
        print(f'{cat} & {row} \\\\')
    mean_row = ' & '.join(
        f'{np.mean([res[k] for res in per_cat.values()]) * SCALE.get(k, 1):.2f}'
        for k in keys)
    print(f'mean & {mean_row} \\\\')


if __name__ == '__main__':
    main()
