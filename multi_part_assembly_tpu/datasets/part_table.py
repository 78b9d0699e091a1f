"""Resident-HBM point table for semantic (PartNet) datasets.

The PartNet part point clouds are STATIC (loaded from per-shape npy,
reference partnet_data.py:66); the round-3 packed-f16 wire still shipped
~3.8MB of them per batch through the remote-runtime tunnel (measured as
low as ~90MB/s, ROADMAP gotchas).  Here every part cloud is uploaded ONCE
into a resident device table and the per-batch wire carries only
`part_slots [B, P] int32` -- the same design as the geometry datasets'
device-side mesh sampling, but simpler: no sampling, just a gather
(VERDICT r3 next-2a).

The gather is a single DEFAULT-precision bf16 one-hot matmul that is
nevertheless EXACT at f16 precision: the table stores each f16-quantized
coordinate as two bf16 split planes (hi = bf16(v), lo = bf16(v - hi); an
11-bit f16 significand splits exactly across two 8-bit bf16 significands),
the MXU accumulates in f32, and a one-hot row has a single nonzero so no
rounding ever happens in the sum.  Same trick as the chamfer kernel's
K-packed splits (ops/chamfer.py _split3) -- 6x cheaper than a HIGHEST
f32 gather matmul.

Multi-chip: the table is REPLICATED (PartitionSpec()); slots/valids ride
the batch 'data' axis, so the partitioner splits the one-hot matmul rows
across devices comms-free -- no shard_map needed.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ['PartPointTable', 'build_part_table', 'gather_part_table',
           'gather_part_table_multi']


class PartPointTable:
    """Resident split-plane point table + host slot map.

    table: [T, 2*N*3] bf16 device array (hi plane || lo plane)
    slot_base: np [n_items] int64 -- first slot of each dataset item
    """

    def __init__(self, table, slot_base, n_points):
        self.table = table
        self.slot_base = slot_base
        self.n_points = n_points

    @property
    def nbytes(self):
        return self.table.size * 2


def _split_planes(pcs_f32):
    """[K, N, 3] f32 -> ([K, N*3] bf16 hi, lo) with hi+lo == f16(v) exactly."""
    import ml_dtypes
    flat = pcs_f32.reshape(pcs_f32.shape[0], -1)
    # quantize to the f16 wire grid first (parity class of the f16 host
    # wire, tests/test_datasets.py::test_f16_wire_metric_parity)
    flat = flat.astype(np.float16).astype(np.float32)
    hi = flat.astype(ml_dtypes.bfloat16)
    lo = (flat - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
    assert ((hi.astype(np.float32) + lo.astype(np.float32))
            == flat).all(), 'split planes must reconstruct f16 exactly'
    return hi, lo


def build_part_table(dataset, put=None, budget_bytes=4 << 30):
    """Build + upload the resident table for a PartNetPartDataset.

    Iterates the dataset's shapes once (the raw npy dicts go through its
    LRU), packs all valid parts' clouds contiguously, and uploads the
    split-plane table.  Returns a PartPointTable, or None when the table
    would exceed `budget_bytes` of HBM (the packed f16 host wire then
    stays in effect)."""
    import ml_dtypes
    counts = []
    for i in range(len(dataset)):
        raw = dataset._load_raw(dataset.shape_ids[i])
        counts.append(raw['part_pcs'].shape[0])
    total = int(np.sum(counts))
    if total == 0:
        return None
    probe = dataset._load_raw(dataset.shape_ids[0])['part_pcs']
    n_points = probe.shape[1]
    if total * n_points * 3 * 2 * 2 > budget_bytes:
        return None
    hi_lo = np.zeros((total, 2 * n_points * 3), ml_dtypes.bfloat16)
    slot_base = np.zeros(len(dataset), np.int64)
    off = 0
    for i in range(len(dataset)):
        raw = dataset._load_raw(dataset.shape_ids[i])
        pcs = np.asarray(raw['part_pcs'], np.float32)
        hi, lo = _split_planes(pcs)
        slot_base[i] = off
        hi_lo[off:off + len(pcs), :n_points * 3] = hi
        hi_lo[off:off + len(pcs), n_points * 3:] = lo
        off += len(pcs)
    table = jnp.asarray(hi_lo) if put is None else put(hi_lo)
    return PartPointTable(table, slot_base, n_points)


# Above this many table rows the one-hot contraction (whose FLOPs/bytes
# scale linearly with TOTAL dataset parts T, not batch size) loses to a
# plain row gather: at B*P=640, T=350k, N=1024 the matmul is ~2.7 TFLOP
# (multiple ms) while the gather moves only B*P rows (~8MB).  Both paths
# are bit-identical (a one-hot row has a single nonzero; a gather selects
# the same bf16 planes -- the hi+lo sum happens in f32 either way).
_ONEHOT_MAX_ROWS = int(__import__('os').environ.get(
    'MPA_TABLE_ONEHOT_MAX', 8192))


def _sum_planes(planes_f32, B, P):
    half = planes_f32.shape[-1] // 2
    pcs = planes_f32[:, :half] + planes_f32[:, half:]
    return pcs.reshape(B, P, half // 3, 3)


def _gather_onehot(table, part_slots, part_valids):
    T = table.shape[0]
    B, P = part_slots.shape
    onehot = (part_slots.reshape(B * P, 1) ==
              jnp.arange(T, dtype=part_slots.dtype)).astype(jnp.bfloat16)
    onehot = onehot * part_valids.reshape(B * P, 1).astype(jnp.bfloat16)
    planes = jax.lax.dot_general(
        onehot, table, (((1, ), (0, )), ((), ())),
        preferred_element_type=jnp.float32)  # [B*P, 2*N*3]
    return _sum_planes(planes, B, P)


def _gather_rows(table, part_slots, part_valids):
    B, P = part_slots.shape
    rows = jnp.take(table, part_slots.reshape(B * P), axis=0)
    planes = rows.astype(jnp.float32) * part_valids.reshape(B * P, 1)
    return _sum_planes(planes, B, P)


@jax.jit
def gather_part_table(table, part_slots, part_valids):
    """[T, 2*N*3] split-plane table + [B, P] slots -> [B, P, N, 3] f32.

    Small tables: one-hot bf16 matmul with f32 accumulation -- exact f16
    selection (see module docstring).  Large tables (> _ONEHOT_MAX_ROWS,
    env MPA_TABLE_ONEHOT_MAX): bit-identical XLA row gather, whose cost is
    bounded by the batch instead of the table.  Invalid slots (valids ==
    0) come out zero."""
    if table.shape[0] > _ONEHOT_MAX_ROWS:
        return _gather_rows(table, part_slots, part_valids)
    return _gather_onehot(table, part_slots, part_valids)


@jax.jit
def gather_part_table_multi(table, part_slots, part_valids):
    """Grouped gather: [G, B, P] slots -> [G, B, P, N, 3] (one dispatch
    per steps_per_call group, see trainer.install_device_prep)."""
    return jax.vmap(lambda s, v: gather_part_table(table, s, v))(
        part_slots, part_valids)


def warm_gather_cache(tables, batch_size, max_parts, mesh=None,
                      group_size=1):
    """Pre-compile the gather for the real input shardings (jit caches key
    on shardings; see geometry.warm_unpack_cache)."""
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import put_sharded
    if mesh is None:
        put1 = putg = lambda x: jnp.asarray(x)  # noqa: E731
    else:
        put1 = functools.partial(put_sharded, mesh=mesh, spec=P('data'))
        putg = functools.partial(put_sharded, mesh=mesh, spec=P(None, 'data'))
    # put_sharded takes LOCAL shards in multi-process runs
    batch_size //= jax.process_count()
    slots = np.zeros((batch_size, max_parts), np.int32)
    valids = np.ones((batch_size, max_parts), np.float32)
    out = gather_part_table(tables.table, put1(slots), put1(valids))
    jax.block_until_ready(out)
    if group_size > 1:
        gs = np.zeros((group_size, batch_size, max_parts), np.int32)
        gv = np.ones((group_size, batch_size, max_parts), np.float32)
        out = gather_part_table_multi(tables.table, putg(gs), putg(gv))
        jax.block_until_ready(out)
