"""Training entry point.

Mirrors the reference CLI (reference scripts/train.py:126-156):
    python scripts/train.py --cfg_file configs/...py [--category X]
        [--weight ckpt] [--ckp_dir dir] [--overfit N] [--bf16]

Differences from the reference, by design:
  - no --gpus: the data-parallel mesh spans every visible TPU chip (set
    JAX_COORDINATOR_ADDRESS etc. for multi-host; reference used Lightning
    DDP, train.py:85)
  - --fp16/--cudnn become --bf16 (TPU-native mixed precision)
  - auto-resume from the newest checkpoint in ckp_dir is built into the
    Trainer (reference train.py:97-106)
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(description='Training script')
    parser.add_argument('--cfg_file', required=True, type=str)
    parser.add_argument('--category', type=str, default='',
                        help='dataset category override')
    parser.add_argument('--weight', type=str, default='',
                        help='load weights (auto-resume wins if ckpts exist)')
    parser.add_argument('--opts', nargs='*', default=[],
                        help='config overrides: key value [key value ...]')
    parser.add_argument('--ckp_dir', type=str, default='')
    parser.add_argument('--overfit', type=int, default=-1)
    parser.add_argument('--bf16', action=argparse.BooleanOptionalAction,
                        default=None,
                        help='bf16 matmuls in encoders/transformer/'
                             'regressors (default: cfg.exp.bf16, which '
                             'defaults to True; --no-bf16 forces full f32)')
    parser.add_argument('--no_resume', action='store_true')
    parser.add_argument('--vis', type=int, default=-1,
                        help='samples to visualize per val epoch')
    parser.add_argument('--profile', type=str, default='',
                        help='capture a jax.profiler trace of the first '
                             'epoch into this directory')
    args = parser.parse_args()

    from multi_part_assembly_tpu.parallel import init_distributed
    init_distributed()

    from multi_part_assembly_tpu.train.trainer import Trainer
    from multi_part_assembly_tpu.utils import load_cfg_file

    cfg = load_cfg_file(args.cfg_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    if args.category:
        cfg.data.category = args.category
    if args.overfit > 0:
        cfg.data.overfit = args.overfit
    if args.bf16 is not None:
        cfg.exp.bf16 = args.bf16
    if args.vis >= 0:
        cfg.exp.val_sample_vis = args.vis
    if os.environ.get('MPA_SEED'):
        # per-dup seed from scripts/dup_run.sh (env, not --opts, so it
        # composes with a caller's own --opts overrides)
        cfg.exp.seed = int(os.environ['MPA_SEED'])

    cfg_name = os.path.splitext(os.path.basename(args.cfg_file))[0]
    ckp_dir = args.ckp_dir or os.path.join(
        cfg.exp.ckp_dir, cfg_name,
        cfg.data.category if cfg.data.category else 'all', 'models')
    cfg.exp.ckp_dir = ckp_dir
    cfg.freeze()
    print(cfg)

    trainer = Trainer(cfg, ckp_dir=ckp_dir, resume=not args.no_resume)
    if args.weight and trainer.start_epoch == 0:
        trainer.load_weights(args.weight)
    if args.profile:
        # trace one epoch for bottleneck analysis (the reference enabled
        # Lightning's profiler='simple' for the same purpose, train.py:93)
        import jax
        with jax.profiler.trace(args.profile):
            trainer.train_epoch(trainer.start_epoch)
        print(f'profile trace written to {args.profile}')
    trainer.fit()
    trainer.close()
    print('Done training!')


if __name__ == '__main__':
    main()
