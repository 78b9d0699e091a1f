"""Dump a composed config (reference scripts/print_cfg.py)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multi_part_assembly_tpu.utils import load_cfg_file  # noqa: E402

if __name__ == '__main__':
    parser = argparse.ArgumentParser(description='Print config')
    parser.add_argument('--cfg_file', required=True, type=str)
    args = parser.parse_args()
    print(load_cfg_file(args.cfg_file))
