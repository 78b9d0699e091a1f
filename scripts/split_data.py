"""Per-category train/val split for Breaking-Bad data
(reference scripts/split_data.py: writes {subset}.{train,val}.txt with
val_ratio 0.2)."""

import argparse
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(description='Split dataset')
    parser.add_argument('--data_dir', required=True, type=str)
    parser.add_argument('--subset', required=True, type=str,
                        help='e.g. everyday / artifact / other')
    parser.add_argument('--val_ratio', type=float, default=0.2)
    parser.add_argument('--seed', type=int, default=0)
    args = parser.parse_args()

    random.seed(args.seed)
    subset_dir = os.path.join(args.data_dir, args.subset)
    train_lines, val_lines = [], []
    for category in sorted(os.listdir(subset_dir)):
        cat_dir = os.path.join(subset_dir, category)
        if not os.path.isdir(cat_dir):
            continue
        objs = sorted(os.listdir(cat_dir))
        random.shuffle(objs)
        n_val = int(len(objs) * args.val_ratio)
        for i, obj in enumerate(objs):
            line = f'{args.subset}/{category}/{obj}'
            (val_lines if i < n_val else train_lines).append(line)

    for split, lines in [('train', train_lines), ('val', val_lines)]:
        path = os.path.join(args.data_dir, f'{args.subset}.{split}.txt')
        with open(path, 'w') as f:
            f.write('\n'.join(lines) + '\n')
        print(f'{path}: {len(lines)} shapes')


if __name__ == '__main__':
    main()
