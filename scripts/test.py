"""Testing entry point (reference scripts/test.py:22-98).

    python scripts/test.py --cfg_file configs/...py --weight path
        [--category X | all]

`--category all` loops all categories, collects per-category results and
prints the LaTeX-formatted row exactly like the reference (test.py:33-62).
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _resolve_weight(path):
    """Accept a checkpoint STEP dir, a run dir, or a run dir's models/:
    run dirs resolve to the newest step (reference test.py builds the
    exact model path by string substitution; resolving here makes
    `--weight checkpoint/run-{}-dup1` work for `--category all` sweeps
    where the best step differs per category)."""
    if not path or os.path.basename(path.rstrip('/')).isdigit():
        return path
    from collect_test import find_last_ckp
    for cand in (path, os.path.dirname(path.rstrip('/'))):
        ckp = find_last_ckp(cand)
        if ckp:
            return ckp
    return path


def _test_one(cfg, weight):
    from multi_part_assembly_tpu.train.trainer import Trainer
    trainer = Trainer(cfg, ckp_dir=os.path.join(
        cfg.exp.ckp_dir, '_test_tmp'), resume=False, quiet=True)
    if weight:
        trainer.load_weights(weight)
    results = trainer.test()
    trainer.close()
    return results


def main():
    parser = argparse.ArgumentParser(description='Testing script')
    parser.add_argument('--cfg_file', required=True, type=str)
    parser.add_argument('--category', type=str, default='')
    parser.add_argument('--weight', type=str, default='')
    parser.add_argument('--opts', nargs='*', default=[],
                        help='config overrides: key value [key value ...]')
    parser.add_argument('--min_num_part', type=int, default=-1)
    parser.add_argument('--max_num_part', type=int, default=-1)
    args = parser.parse_args()

    from multi_part_assembly_tpu.parallel import init_distributed
    init_distributed()  # honors MPA_PLATFORM / MPA_NUM_CPU_DEVICES
    from multi_part_assembly_tpu.utils import load_cfg_file

    cfg = load_cfg_file(args.cfg_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    if args.min_num_part > 0:
        cfg.data.min_num_part = args.min_num_part
    if args.max_num_part > 0:
        cfg.data.max_num_part = args.max_num_part

    if args.category != 'all':
        if args.category:
            cfg.data.category = args.category
        cfg.freeze()
        _test_one(cfg, _resolve_weight(args.weight))
        return

    # loop over all categories, average, print LaTeX row
    # (reference test.py:33-62, scaling rot x1, trans x100, CD x1000, acc x100)
    # ONE Trainer for the whole sweep: loaders swap per category but the
    # compiled eval step is shape-invariant across categories, so the
    # minutes-level TPU compile is paid once, not 20x.
    from multi_part_assembly_tpu.train.trainer import Trainer
    all_category = list(cfg.data.all_category)
    all_results = {}
    trainer = None
    for cat in all_category:
        cat_cfg = cfg.clone()
        cat_cfg.data.category = cat
        cat_cfg.freeze()
        weight = args.weight.format(cat) if '{}' in args.weight else \
            args.weight
        weight = _resolve_weight(weight)
        if trainer is None:
            trainer = Trainer(cat_cfg, ckp_dir=os.path.join(
                cfg.exp.ckp_dir, '_test_tmp'), resume=False, quiet=True)
        else:
            trainer.swap_loaders(cat_cfg)
        if weight:
            trainer.load_weights(weight)
        results = trainer.test()
        for k, v in results.items():
            all_results.setdefault(k, []).append(v)
    if trainer is not None:
        trainer.close()

    metric_order = ['test/rot_rmse', 'test/rot_mae', 'test/trans_rmse',
                    'test/trans_mae', 'test/transform_pt_cd_loss',
                    'test/part_acc']
    scale = {'test/rot_rmse': 1, 'test/rot_mae': 1, 'test/trans_rmse': 100,
             'test/trans_mae': 100, 'test/transform_pt_cd_loss': 1000,
             'test/part_acc': 100}
    print('categories:', all_category)
    rows = []
    for k in metric_order:
        if k not in all_results:
            continue
        vals = np.asarray(all_results[k]) * scale[k]
        print(f'{k}: ' + ' '.join(f'{v:.2f}' for v in vals) +
              f' | mean {vals.mean():.2f}')
        rows.append(f'{vals.mean():.2f}')
    print('LaTeX row: ' + ' & '.join(rows) + ' \\\\')


if __name__ == '__main__':
    main()
