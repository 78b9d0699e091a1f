"""Device-side mesh sampling tests (datasets/device_sampler.py).

CPU surface: interpret-mode pallas kernel vs the pure-jnp gather oracle,
alias-table export parity, distribution checks, and the slot-wire loader
integration (single + grouped producer paths).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from test_datasets import _write_cube, bb_tree  # noqa: F401 (fixture)

from multi_part_assembly_tpu.datasets import DataLoader, GeometryPartDataset
from multi_part_assembly_tpu.datasets import device_sampler as dsmp
from multi_part_assembly_tpu.datasets.geometry import enable_device_sampling
from multi_part_assembly_tpu.datasets.mesh_io import (MeshSampler,
                                                      build_alias_table,
                                                      load_obj_numpy)


def _tables_from_cubes(tmp_path, n=3):
    s = MeshSampler()
    paths = []
    for i in range(n):
        p = str(tmp_path / f'cube{i}.obj')
        _write_cube(p, scale=0.5 + 0.25 * i, offset=0.3 * i)
        paths.append(p)
    return dsmp.build_device_tables(paths, s), paths, s


def test_export_tables_native_matches_numpy(tmp_path):
    p = str(tmp_path / 'cube.obj')
    _write_cube(p)
    s = MeshSampler()
    assert s.is_native
    tri, prob, alias, nf = s.export_tables(p, 128)
    s2 = MeshSampler()
    s2._lib = None
    tri2, prob2, alias2, nf2 = s2.export_tables(p, 128)
    assert nf == nf2 == 12
    np.testing.assert_array_equal(tri, tri2)
    np.testing.assert_array_equal(prob, prob2)
    np.testing.assert_array_equal(alias, alias2)
    # padding: prob 1, alias self (floor(u*nf) can never land there)
    assert prob[nf:].min() == 1.0
    np.testing.assert_array_equal(alias[nf:], np.arange(nf, 128))


def test_alias_table_reconstructs_area_mass():
    areas = np.array([1.0, 3.0, 0.5, 10.0, 0.25])
    prob, alias = build_alias_table(areas)
    mass = prob.astype(np.float64).copy()
    np.add.at(mass, alias.astype(np.int64), 1.0 - prob.astype(np.float64))
    np.testing.assert_allclose(mass / len(areas), areas / areas.sum(),
                               atol=1e-7)


def test_kernel_matches_oracle(tmp_path):
    tables, _, _ = _tables_from_cubes(tmp_path)
    rng = np.random.default_rng(0)
    K, N = 5, 128
    slots = jnp.asarray(rng.integers(0, 3, K), jnp.int32)
    uniforms = jnp.asarray(rng.random((K, 8, N), np.float32))
    ref = dsmp.sample_packed_ref(tables.table, tables.n_faces, slots,
                                 uniforms, N)
    ker = dsmp._sample_points(tables.table, tables.n_faces, slots, uniforms,
                              N, interpret=True)
    # the HIGHEST one-hot matmul reconstructs table values to f32 rounding
    np.testing.assert_allclose(np.asarray(ker), np.asarray(ref), atol=1e-6)


def test_kernel_matches_oracle_ragged_tables():
    """Synthetic tables with non-uniform face counts (smaller and larger
    than the 128 lane width, alias indices up to nf-1): the kernel's
    one-hot matmul face selection must match the gather oracle exactly
    even at the Fmax edge (the f32-encoded alias index of face 255 is the
    largest reconstruction the HIGHEST matmul must return bit-exactly)."""
    rng = np.random.default_rng(0)
    n_pieces, fmax, npad = 3, 256, 128
    table = np.zeros((n_pieces, 16, fmax), np.float32)
    nf = np.array([200, 37, 256], np.int32)
    for i in range(n_pieces):
        table[i, 0:9, :nf[i]] = rng.normal(size=(9, nf[i]))
        table[i, dsmp._ROW_PROB, :nf[i]] = rng.uniform(size=nf[i])
        table[i, dsmp._ROW_PROB, nf[i]:] = 1.0
        table[i, dsmp._ROW_ALIAS, :nf[i]] = \
            rng.integers(0, nf[i], nf[i]).astype(np.float32)
        table[i, dsmp._ROW_ALIAS, nf[i]:] = np.arange(nf[i], fmax)
    t, f = jnp.asarray(table), jnp.asarray(nf)
    uniforms = jnp.asarray(rng.uniform(size=(6, 8, npad)).astype(np.float32))
    slots = jnp.asarray([0, 2, 1, 2, 0, 1], jnp.int32)
    ref = dsmp.sample_packed_ref(t, f, slots, uniforms, 100)
    ker = dsmp._sample_points(t, f, slots, uniforms, 100, interpret=True)
    np.testing.assert_allclose(np.asarray(ker), np.asarray(ref), atol=1e-6)


def _write_soup(path, n_faces, seed):
    """Random triangle soup OBJ with an exact face count (spans chunk
    boundaries in ways the 12-face cube fixtures cannot)."""
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n_faces * 3, 3)).astype(np.float32)
    lines = [f'v {x} {y} {z}' for x, y, z in v]
    lines += [f'f {3 * i + 1} {3 * i + 2} {3 * i + 3}'
              for i in range(n_faces)]
    with open(path, 'w') as f:
        f.write('\n'.join(lines) + '\n')


def test_chunked_matches_dense(tmp_path):
    """Chunked tables (Fc=128) draw BIT-IDENTICAL points to the dense
    layout on ragged multi-chunk pieces: 300 faces (3 chunks, ragged
    last), 128 (exactly one), 37 (sub-chunk), 520 (5 chunks).  The alias
    face of a draw can live in any chunk -- the inlined alias-triangle
    rows must reproduce the dense kernel's second fetch exactly."""
    s = MeshSampler()
    paths = []
    for i, nf in enumerate([300, 128, 37, 520]):
        p = str(tmp_path / f'soup{i}.obj')
        _write_soup(p, nf, seed=i)
        paths.append(p)
    dense = dsmp.build_device_tables(paths, s, layout='dense')
    chunk = dsmp.build_device_tables(paths, s, layout='chunked',
                                     chunk_f=128)
    assert dense.table.shape[1] == dsmp._N_ROWS
    assert chunk.table.shape[1] == dsmp._N_ROWS_C
    # memory: chunked rows = sum(ceil(F/128)) = 3+1+1+5
    assert chunk.table.shape[0] == 10
    assert chunk.n_faces.shape == (3 + 5, 4)  # meta, Cmax=5 in the shape
    slots = jnp.asarray([0, 3, 1, 2, 3, 0], jnp.int32)
    key = jax.random.PRNGKey(7)
    out_d = dsmp.sample_packed(dense.table, dense.n_faces, slots, key,
                               200, interpret=True)
    out_c = dsmp.sample_packed(chunk.table, chunk.n_faces, slots, key,
                               200, interpret=True)
    np.testing.assert_array_equal(np.asarray(out_c), np.asarray(out_d))
    # and the chunked gather oracle agrees with the chunked kernel
    rng = np.random.default_rng(1)
    uniforms = jnp.asarray(rng.random((6, 8, 256), np.float32))
    ref = dsmp.sample_packed_ref(chunk.table, chunk.n_faces, slots,
                                 uniforms, 200)
    ker = dsmp._sample_points(chunk.table, chunk.n_faces, slots, uniforms,
                              200, interpret=True)
    np.testing.assert_allclose(np.asarray(ker), np.asarray(ref), atol=1e-6)


def test_chunked_budget_auto(tmp_path):
    """layout=None auto-picks by measured kernel cost among the layouts
    that fit the budget (cols scanned per row: dense 2 x Fmax, chunked
    mean_chunks x Fc -- calibrated in scripts/bench_chunked_sampler.py),
    else None."""
    s = MeshSampler()
    paths = []
    for i, nf in enumerate([600, 20, 20, 20]):
        p = str(tmp_path / f'soup{i}.obj')
        _write_soup(p, nf, seed=10 + i)
        paths.append(p)
    # dense needs 4 pieces x 16 x 640 x 4 = 163840 B; chunked at Fc=128
    # needs (5+1+1+1) x 24 x 128 x 4 = 98304 B
    # both fit, but the skew makes chunked far cheaper on-chip: dense
    # scans 2 x 640 cols/row, chunked mean 2 x 128 -> chunked
    t = dsmp.build_device_tables(paths, s, budget_bytes=200_000,
                                 chunk_f=128)
    assert t.table.shape[1] == dsmp._N_ROWS_C
    t = dsmp.build_device_tables(paths, s, budget_bytes=120_000,
                                 chunk_f=128)
    assert t.table.shape[1] == dsmp._N_ROWS_C  # only chunked fits
    assert dsmp.build_device_tables(paths, s, budget_bytes=50_000,
                                    chunk_f=128) is None
    # uniform small pieces at the default Fc: dense scans fewer cols
    # (2 x 128 vs 1 x 512) AND is smaller -> dense
    small = paths[1:]
    t = dsmp.build_device_tables(small, s, budget_bytes=250_000)
    assert t.table.shape[1] == dsmp._N_ROWS
    # dense over budget but chunked (~ total faces) within it -> chunked
    # even though dense would scan fewer cols
    big = str(tmp_path / 'soup_big.obj')
    _write_soup(big, 1200, seed=20)
    skew = small + [big]
    # dense: 4 x 16 x 1280 x 4 = 327680 B; chunked Fc=512:
    # (1+1+1+3) x 24 x 512 x 4 = 294912 B
    t = dsmp.build_device_tables(skew, s, budget_bytes=300_000)
    assert t.table.shape[1] == dsmp._N_ROWS_C


def test_chunked_slot_wire_integration(bb_tree):
    """enable_device_sampling(layout='chunked') runs the full slot wire
    through the chunked kernel and lands on the same surfaces."""
    from multi_part_assembly_tpu.utils.config_utils import CfgNode
    loader = _slot_loader(bb_tree)
    cfg = CfgNode({'data': {}})
    tables = enable_device_sampling(loader, cfg, layout='chunked')
    assert tables is not None
    assert tables.table.shape[1] == dsmp._N_ROWS_C
    batch = next(iter(loader))
    assert 'part_slots__packed' in batch
    out = dsmp.sample_and_expand(
        tables.table, tables.n_faces,
        jnp.asarray(batch['part_slots__packed']),
        jnp.asarray(batch['part_counts']),
        jnp.asarray(batch['sample_seed']), n_points=64, max_parts=8,
        data_keys=('part_ids', 'valid_matrix'), interpret=True)
    pcs = np.asarray(out['part_pcs_raw'])
    assert pcs.shape == (2, 8, 64, 3)
    valid = np.asarray(batch['part_counts'])
    # valid parts sample real geometry; padded parts zero
    for b in range(2):
        assert np.abs(pcs[b, :valid[b]]).max() > 0
        assert np.abs(pcs[b, valid[b]:]).max() == 0


def test_sampling_distribution_matches_host(tmp_path):
    """Device draws land on the same surface with the same area weighting
    as the host sampler (same alias tables; jax-threefry uniforms)."""
    tables, paths, s = _tables_from_cubes(tmp_path, n=1)
    N = 4096
    out = dsmp.sample_packed(tables.table, tables.n_faces,
                             jnp.zeros((2, ), jnp.int32),
                             jax.random.PRNGKey(3), N, interpret=True)
    host = s.sample(paths[0], N, 3)
    dev = np.asarray(out[0])
    np.testing.assert_allclose(dev.mean(0), host.mean(0), atol=0.02)
    np.testing.assert_allclose(dev.var(0), host.var(0), atol=0.02)
    # on the cube surface: every point has one coordinate at a face plane
    lo, hi = host.min(), host.max()
    at_face = np.isclose(dev, lo, atol=1e-5) | np.isclose(dev, hi, atol=1e-5)
    assert at_face.any(axis=1).all()
    # different keys -> different draws; same key -> identical
    out2 = dsmp.sample_packed(tables.table, tables.n_faces,
                              jnp.zeros((2, ), jnp.int32),
                              jax.random.PRNGKey(4), N, interpret=True)
    assert not np.allclose(np.asarray(out2[0]), dev)
    out3 = dsmp.sample_packed(tables.table, tables.n_faces,
                              jnp.zeros((2, ), jnp.int32),
                              jax.random.PRNGKey(3), N, interpret=True)
    np.testing.assert_array_equal(np.asarray(out3[0]), dev)


def test_area_weighted_face_frequencies():
    """Two triangles with area ratio 1:3 -> ~25/75 point split."""
    table = np.zeros((1, 16, 128), np.float32)
    # tri0: legs (1, 1) in xy (area 0.5); tri1: legs (1, 3), z offset 5
    table[0, 3, 0] = 1.0
    table[0, 7, 0] = 1.0
    table[0, 3, 1] = 1.0
    table[0, 7, 1] = 3.0
    table[0, 2, 1] = 5.0
    prob, alias = build_alias_table(np.array([0.5, 1.5]))
    table[0, dsmp._ROW_PROB, :2] = prob
    table[0, dsmp._ROW_PROB, 2:] = 1.0
    table[0, dsmp._ROW_ALIAS, :2] = alias
    table[0, dsmp._ROW_ALIAS, 2:] = np.arange(2, 128)
    out = dsmp.sample_packed(jnp.asarray(table), jnp.asarray([2], jnp.int32),
                             jnp.zeros((3, ), jnp.int32),
                             jax.random.PRNGKey(1), 1024, interpret=True)
    frac = float((np.asarray(out)[..., 2] > 2.0).mean())
    assert 0.70 < frac < 0.80
    # barycentric support: all xy draws inside the triangles
    xy = np.asarray(out)[..., :2].reshape(-1, 2)
    assert (xy >= -1e-6).all()


def _slot_loader(bb_tree, batch_size=2, num_points=64):
    ds = GeometryPartDataset(
        data_dir=bb_tree, data_fn='everyday.train.txt',
        data_keys=('part_ids', 'valid_matrix'), num_points=num_points,
        min_num_part=2, max_num_part=8)
    return DataLoader(ds, batch_size=batch_size, shuffle=False,
                      drop_last=False, num_workers=1, batch_collate=True)


def test_slot_wire_loader_integration(bb_tree):
    from multi_part_assembly_tpu.parallel import make_mesh
    from multi_part_assembly_tpu.train.trainer import _prep_batch
    from multi_part_assembly_tpu.utils import CN
    loader = _slot_loader(bb_tree)
    cfg = CN({'data': CN({'dataset': 'geometry', 'max_num_part': 8,
                          'num_pc_points': 64,
                          'data_keys': ('part_ids', 'valid_matrix')}),
              'exp': CN({'batch_size': 2})})
    mesh = make_mesh(jax.devices()[:1], batch_size=2)
    tables = enable_device_sampling(loader, cfg, mesh=mesh)
    assert tables is not None and tables.interpret
    loader.set_epoch(0)
    host = next(iter(loader))
    assert set(host) >= {'part_slots__packed', 'part_counts', 'sample_seed'}
    assert host['part_slots__packed'].nbytes < 1024  # the point of it all
    batch, bs = _prep_batch(host, cfg, mesh, jax.random.PRNGKey(0),
                            augment=False)
    assert bs == 2
    assert batch['part_pcs_raw'].shape == (2, 8, 64, 3)
    valids = np.asarray(batch['part_valids'])
    np.testing.assert_array_equal(valids.sum(1), [2, 3])
    pcs = np.asarray(batch['part_pcs_raw'])
    assert np.abs(pcs[valids == 0]).max() == 0  # padded parts zeroed
    assert np.abs(pcs[valids > 0]).max() > 0
    # structure parity with the host-wire path (same derived small keys)
    loader.dataset._device_tables = None
    host2 = next(iter(loader))
    batch2, _ = _prep_batch(host2, cfg, mesh, jax.random.PRNGKey(0),
                            augment=False)
    for k in ('part_valids', 'part_ids', 'valid_matrix'):
        np.testing.assert_array_equal(np.asarray(batch[k]),
                                      np.asarray(batch2[k]))
    # same pieces, different RNG stream: matching bounding boxes per part
    pcs2 = np.asarray(batch2['part_pcs_raw'])
    for b in range(2):
        for p in range(int(valids[b].sum())):
            np.testing.assert_allclose(pcs[b, p].min(0), pcs2[b, p].min(0),
                                       atol=0.05)
            np.testing.assert_allclose(pcs[b, p].max(0), pcs2[b, p].max(0),
                                       atol=0.05)


def test_slot_wire_grouped_prep(bb_tree):
    from multi_part_assembly_tpu.parallel import make_mesh
    from multi_part_assembly_tpu.train.trainer import (_prep_batch,
                                                       install_device_prep)
    from multi_part_assembly_tpu.utils import CN
    loader = _slot_loader(bb_tree, batch_size=1, num_points=64)
    cfg = CN({'data': CN({'dataset': 'geometry', 'max_num_part': 8,
                          'num_pc_points': 64,
                          'data_keys': ('part_ids', 'valid_matrix')}),
              'exp': CN({'batch_size': 1})})
    mesh = make_mesh(jax.devices()[:1], batch_size=1)
    assert enable_device_sampling(loader, cfg, mesh=mesh) is not None
    install_device_prep(loader, cfg, mesh, group_size=2)
    loader.set_epoch(0)
    batches = list(loader)
    groups = [b for b in batches if b.get('__group__')]
    assert groups, 'expected at least one grouped dispatch'
    g = groups[0]
    assert g['part_pcs_raw'].shape == (2, 1, 8, 64, 3)
    batch, bs = _prep_batch(g, cfg, mesh, jax.random.PRNGKey(0),
                            augment=False)
    assert bs == 1 and batch['part_pcs_raw'].shape[0] == 2


def test_budget_fallback(tmp_path):
    s = MeshSampler()
    p = str(tmp_path / 'cube.obj')
    _write_cube(p)
    assert dsmp.build_device_tables([p], s, budget_bytes=64) is None
    assert dsmp.build_device_tables([], s) is None
