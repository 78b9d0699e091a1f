"""Summarize a jax.profiler trace directory into a top-ops table.

Companion to `scripts/train.py --profile` (which wraps the first epoch in
`jax.profiler.trace`): parses the Chrome-trace JSON that the TPU runtime
writes under <dir>/plugins/profile/*/ and prints total duration and call
count per device op, split by device/host.

Usage: python scripts/profile_summary.py <trace_dir> [--top 30]
"""

import argparse
import collections
import glob
import gzip
import json
import os


def load_events(trace_dir):
    pats = [os.path.join(trace_dir, 'plugins', 'profile', '*',
                         '*.trace.json.gz'),
            os.path.join(trace_dir, '*.trace.json.gz')]
    files = sorted(sum((glob.glob(p) for p in pats), []))
    if not files:
        raise SystemExit(f'no *.trace.json.gz under {trace_dir}')
    data = json.load(gzip.open(files[-1]))
    return data.get('traceEvents', [])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('trace_dir')
    ap.add_argument('--top', type=int, default=30)
    ap.add_argument('--host', action='store_true',
                    help='include host-side (python) events')
    args = ap.parse_args()

    events = load_events(args.trace_dir)
    pids = {}
    for e in events:
        if e.get('ph') == 'M' and e.get('name') == 'process_name':
            pids[e['pid']] = e['args'].get('name', '')

    dur = collections.Counter()
    cnt = collections.Counter()
    for e in events:
        if e.get('ph') != 'X' or 'dur' not in e:
            continue
        proc = pids.get(e['pid'], '')
        if not args.host and 'TPU' not in proc and 'GPU' not in proc:
            continue
        key = (proc, e['name'][:70])
        dur[key] += e['dur']
        cnt[key] += 1

    total = sum(d for (p, _), d in dur.items() if 'TPU' in p or 'GPU' in p)
    print(f'{"total_ms":>10} {"calls":>6} {"%dev":>6}  op')
    for (proc, name), d in dur.most_common(args.top):
        pct = 100.0 * d / total if total and ('TPU' in proc or 'GPU' in proc) \
            else 0.0
        print(f'{d / 1e3:10.2f} {cnt[(proc, name)]:6d} {pct:6.1f}  '
              f'[{proc.split("/")[-1]}] {name}')


if __name__ == '__main__':
    main()
