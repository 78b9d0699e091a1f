"""One-process bench grid over pipeline knobs (real TPU).

Runs bench.bench_one for the primary model under a grid of env-tunable
pipeline configurations (steps_per_call grouping, execution-kick cadence,
threaded kicks) and prints one JSON line per cell.  Batching the grid
into ONE process amortizes the minutes-level remote compile (one compile
per distinct spc) and survives tunnel flakiness better than N separate
bench invocations.

Usage:
    python scripts/bench_grid.py [--model pn_transformer_everyday]
        [--iters 48] [--cells spc8,spc8_thr,...]

Each cell's knobs ride the same env vars bench.py documents
(MPA_BENCH_SPC / MPA_BENCH_KICK / MPA_BENCH_LAG / MPA_BENCH_KICK_THREAD),
set per cell before bench_one re-reads them.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

# knob -> env assignment per cell; '' unsets
CELLS = {
    # round-3 default: spc=8, blocking kicks every 2 dispatches, lag 2
    'spc8': {'MPA_BENCH_SPC': '8', 'MPA_BENCH_KICK': '2',
             'MPA_BENCH_LAG': '2', 'MPA_BENCH_KICK_THREAD': ''},
    # threaded kicks: fetch on a worker thread, same cadence
    'spc8_thr': {'MPA_BENCH_SPC': '8', 'MPA_BENCH_KICK': '2',
                 'MPA_BENCH_LAG': '2', 'MPA_BENCH_KICK_THREAD': '1'},
    # threaded + kick every dispatch (non-blocking, so cadence may be free)
    'spc8_thr_k1': {'MPA_BENCH_SPC': '8', 'MPA_BENCH_KICK': '1',
                    'MPA_BENCH_LAG': '2', 'MPA_BENCH_KICK_THREAD': '1'},
    # threaded + sparser kicks (if runtime-side flush overhead dominates)
    'spc8_thr_k4': {'MPA_BENCH_SPC': '8', 'MPA_BENCH_KICK': '4',
                    'MPA_BENCH_LAG': '1', 'MPA_BENCH_KICK_THREAD': '1'},
    # deeper grouping: halves dispatches+flushes per step (new compile)
    'spc16': {'MPA_BENCH_SPC': '16', 'MPA_BENCH_KICK': '2',
              'MPA_BENCH_LAG': '2', 'MPA_BENCH_KICK_THREAD': ''},
    'spc16_thr': {'MPA_BENCH_SPC': '16', 'MPA_BENCH_KICK': '2',
                  'MPA_BENCH_LAG': '2', 'MPA_BENCH_KICK_THREAD': '1'},
    'spc16_thr_k1': {'MPA_BENCH_SPC': '16', 'MPA_BENCH_KICK': '1',
                     'MPA_BENCH_LAG': '2', 'MPA_BENCH_KICK_THREAD': '1'},
    # deeper lag under threading: the worker absorbs the wait, so more
    # handles can stay in flight without stalling dispatch
    'spc8_thr_lag4': {'MPA_BENCH_SPC': '8', 'MPA_BENCH_KICK': '2',
                      'MPA_BENCH_LAG': '4', 'MPA_BENCH_KICK_THREAD': '1'},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--model', default='pn_transformer_everyday')
    ap.add_argument('--iters', type=int, default=48)
    ap.add_argument('--cells', default=','.join(CELLS))
    args = ap.parse_args()

    from multi_part_assembly_tpu.parallel import init_distributed
    init_distributed()
    import bench

    os.environ['MPA_BENCH_ITERS'] = str(args.iters)
    results = {}
    for cell in args.cells.split(','):
        knobs = CELLS[cell]
        for k, v in knobs.items():
            # always set explicitly ('' = off): bench falls back to the
            # Trainer class defaults when a knob is ABSENT, and those now
            # default to threaded kicks (round-4 flip)
            os.environ[k] = v
        t0 = time.perf_counter()
        try:
            row = bench.bench_one(args.model, bench.BENCH_MODELS[args.model])
        except Exception as e:  # noqa: BLE001
            import traceback
            traceback.print_exc()
            row = {'error': f'{type(e).__name__}: {e}'}
        row['wall_s'] = round(time.perf_counter() - t0, 1)
        results[cell] = row
        print('CELL ' + json.dumps({cell: row}), flush=True)
    print('GRID ' + json.dumps(results), flush=True)


if __name__ == '__main__':
    main()
