"""Data pipeline tests: native sampler, datasets, loader, device augment."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from multi_part_assembly_tpu.datasets import (DataLoader,
                                              GeometryPartDataset,
                                              PartNetPartDataset,
                                              augment_geometry_batch)
from multi_part_assembly_tpu.datasets.mesh_io import (MeshSampler,
                                                      load_obj_numpy,
                                                      sample_surface_numpy)

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


def _write_cube(path, scale=1.0, offset=0.0):
    verts, faces = [], []
    for line in CUBE_OBJ.splitlines():
        if line.startswith('v '):
            x, y, z = map(float, line.split()[1:])
            verts.append(
                f'v {x * scale + offset} {y * scale + offset} '
                f'{z * scale + offset}')
        else:
            faces.append(line)
    with open(path, 'w') as f:
        f.write('\n'.join(verts + faces) + '\n')


@pytest.fixture
def bb_tree(tmp_path):
    """Synthetic Breaking-Bad directory tree with 3 fractures."""
    root = tmp_path / 'breaking_bad'
    lines = []
    for i, n_parts in enumerate([2, 3, 5]):
        obj_dir = root / 'Bottle' / f'obj{i}'
        frac = obj_dir / 'fractured_0'
        frac.mkdir(parents=True)
        for p in range(n_parts):
            _write_cube(str(frac / f'piece_{p}.obj'), scale=0.5 + 0.1 * p,
                        offset=0.2 * p)
        lines.append(f'Bottle/obj{i}')
    # one shape with too many parts -> filtered out
    big = root / 'Bottle' / 'objbig' / 'fractured_0'
    big.mkdir(parents=True)
    for p in range(9):
        _write_cube(str(big / f'piece_{p}.obj'))
    lines.append('Bottle/objbig')
    for split in ['train', 'val']:
        (root / f'everyday.{split}.txt').write_text('\n'.join(lines))
    return str(root)


def test_native_matches_numpy_distribution(tmp_path):
    path = str(tmp_path / 'cube.obj')
    _write_cube(path)
    s = MeshSampler()
    assert s.is_native
    pts = s.sample(path, 20000, 7)
    v, f = load_obj_numpy(path)
    ref = sample_surface_numpy(v, f, 20000, np.random.default_rng(7))
    # same surface: per-face fractions within tolerance
    np.testing.assert_allclose(pts.mean(0), ref.mean(0), atol=0.02)
    np.testing.assert_allclose(pts.var(0), ref.var(0), atol=0.02)
    # determinism: same seed -> same points
    np.testing.assert_array_equal(pts, s.sample(path, 20000, 7))
    assert not np.array_equal(pts, s.sample(path, 20000, 8))


def test_geometry_dataset(bb_tree):
    ds = GeometryPartDataset(
        data_dir=bb_tree, data_fn='everyday.train.txt',
        data_keys=('part_ids', 'valid_matrix'), category='', num_points=100,
        min_num_part=2, max_num_part=8)
    assert len(ds) == 3  # 9-part shape filtered out
    item = ds[2]
    assert item['part_pcs_raw'].shape == (8, 100, 3)
    assert item['part_valids'].sum() == 5
    assert item['valid_matrix'].sum() == 25
    # padded parts are zeros
    assert np.abs(item['part_pcs_raw'][5:]).max() == 0
    # epoch reseeding changes the sampled points
    ds.set_epoch(1)
    item2 = ds[2]
    assert not np.allclose(item['part_pcs_raw'][:5], item2['part_pcs_raw'][:5])


def test_geometry_category_filter(bb_tree):
    ds = GeometryPartDataset(
        data_dir=bb_tree, data_fn='everyday.train.txt', data_keys=(),
        category='Mug', num_points=16, min_num_part=2, max_num_part=8)
    assert len(ds) == 0


def test_loader_batching(bb_tree):
    ds = GeometryPartDataset(
        data_dir=bb_tree, data_fn='everyday.train.txt', data_keys=(),
        num_points=32, min_num_part=2, max_num_part=8)
    loader = DataLoader(ds, batch_size=2, shuffle=True, drop_last=True,
                        num_workers=2)
    batches = list(loader)
    assert len(batches) == 1
    assert batches[0]['part_pcs_raw'].shape == (2, 8, 32, 3)
    # no drop_last keeps the remainder
    loader2 = DataLoader(ds, batch_size=2, shuffle=False, drop_last=False)
    batches2 = list(loader2)
    assert sum(b['part_pcs_raw'].shape[0] for b in batches2) == 3


def test_packed_collate_matches_items(bb_tree):
    """collate_batch (one native call, minimal wire) reproduces the
    per-item path exactly after the device-side expand."""
    import jax.numpy as jnp

    from multi_part_assembly_tpu.datasets.geometry import \
        expand_geometry_batch

    ds = GeometryPartDataset(
        data_dir=bb_tree, data_fn='everyday.train.txt',
        data_keys=('part_ids', 'valid_matrix'), num_points=32,
        min_num_part=2, max_num_part=8, wire_dtype='float32')
    idx = [0, 2]
    batch = ds.collate_batch(idx)
    assert batch['part_pcs_raw__packed'].shape[1:] == (32, 3)
    assert batch['part_counts'].tolist() == [2, 5]
    expanded = jax.tree_util.tree_map(np.asarray, expand_geometry_batch(
        jnp.asarray(batch['part_pcs_raw__packed']),
        jnp.asarray(batch['part_counts']), max_parts=8,
        data_keys=('part_ids', 'valid_matrix')))
    for row, i in enumerate(idx):
        item = ds[i]
        np.testing.assert_allclose(expanded['part_pcs_raw'][row],
                                   item['part_pcs_raw'], atol=0)
        np.testing.assert_array_equal(expanded['part_valids'][row],
                                      item['part_valids'])
        np.testing.assert_array_equal(expanded['part_ids'][row],
                                      item['part_ids'])
        np.testing.assert_array_equal(expanded['valid_matrix'][row],
                                      item['valid_matrix'])
    # Kpad bucketing: dense 16 -> smallest of {2, 4, 8, 16} that fits
    assert batch['part_pcs_raw__packed'].shape[0] == \
        GeometryPartDataset._kpad(
            int(batch['part_counts'].sum()), 2 * 8)


def test_f16_wire_matches_f32_rounding(bb_tree):
    """The f16 wire path (default) emits exactly f16(round(f32 sample)):
    the native sampler shares the RNG stream and rounds on store."""
    mk = lambda dt: GeometryPartDataset(
        data_dir=bb_tree, data_fn='everyday.train.txt', data_keys=(),
        num_points=32, min_num_part=2, max_num_part=8, wire_dtype=dt)
    b16 = mk('float16').collate_batch([0, 2])
    b32 = mk('float32').collate_batch([0, 2])
    assert b16['part_pcs_raw__packed'].dtype == np.float16
    np.testing.assert_array_equal(
        b16['part_pcs_raw__packed'],
        b32['part_pcs_raw__packed'].astype(np.float16))
    # quantization error bound at unit scale
    assert np.abs(b16['part_pcs_raw__packed'].astype(np.float32) -
                  b32['part_pcs_raw__packed']).max() < 2e-3


def test_loader_batch_collate(bb_tree):
    ds = GeometryPartDataset(
        data_dir=bb_tree, data_fn='everyday.train.txt', data_keys=(),
        num_points=32, min_num_part=2, max_num_part=8)
    loader = DataLoader(ds, batch_size=2, shuffle=False, drop_last=False,
                        batch_collate=True)
    batches = list(loader)
    assert all('part_pcs_raw__packed' in b for b in batches)
    assert sum(b['part_counts'].shape[0] for b in batches) == 3
    # loader without the flag keeps the per-item contract
    loader2 = DataLoader(ds, batch_size=2, shuffle=False, drop_last=False)
    assert 'part_pcs_raw' in next(iter(loader2))


def test_augment_geometry_batch(rng):
    B, P, N = 2, 4, 128
    raw = np.zeros((B, P, N, 3), np.float32)
    valids = np.zeros((B, P), np.float32)
    raw[0, :2] = rng.randn(2, N, 3) + np.array([1.0, 2.0, 3.0])
    valids[0, :2] = 1
    raw[1, :3] = rng.randn(3, N, 3)
    valids[1, :3] = 1
    out = augment_geometry_batch(
        jnp.asarray(raw), jnp.asarray(valids), jax.random.PRNGKey(0))
    pcs = np.asarray(out['part_pcs'])
    quat = np.asarray(out['part_quat'])
    trans = np.asarray(out['part_trans'])
    # recenter: augmented parts are zero-centroid
    np.testing.assert_allclose(pcs[0, 0].mean(0), 0.0, atol=1e-5)
    # gt_trans = original centroid
    np.testing.assert_allclose(trans[0, 0], raw[0, 0].mean(0), atol=1e-5)
    # applying GT quat to the augmented pc recovers the centered original
    # (up to the point shuffle): check via sorted distances from origin
    q = quat[0, 0]
    rec = R.from_quat(np.r_[q[1:], q[:1]]).apply(pcs[0, 0])
    orig = raw[0, 0] - raw[0, 0].mean(0)
    np.testing.assert_allclose(
        np.sort(np.linalg.norm(rec, axis=1)),
        np.sort(np.linalg.norm(orig, axis=1)), atol=1e-4)
    # moments match (rotation of the same point set)
    np.testing.assert_allclose(np.sort(rec.sum(0)), np.sort(orig.sum(0)),
                               atol=1e-3)
    # padded parts all zero
    assert np.abs(pcs[0, 2:]).max() == 0
    assert np.abs(quat[0, 2:]).max() == 0


def test_augment_rot_range(rng):
    """Bounded rotation: recovered euler angles within range."""
    B, P, N = 1, 2, 64
    raw = rng.randn(B, P, N, 3).astype(np.float32)
    valids = np.ones((B, P), np.float32)
    out = augment_geometry_batch(
        jnp.asarray(raw), jnp.asarray(valids), jax.random.PRNGKey(3),
        rot_range=10.0)
    q = np.asarray(out['part_quat']).reshape(-1, 4)
    for qi in q:
        angles = R.from_quat(np.r_[qi[1:], qi[:1]]).as_euler(
            'xyz', degrees=True)
        assert np.all(np.abs(angles) < 11.0), angles


def test_device_prep_pipeline(bb_tree):
    """Producer-thread device prep on a single-device mesh: the loader
    yields device-ready batches that match the per-item host path."""
    from multi_part_assembly_tpu.parallel import make_mesh
    from multi_part_assembly_tpu.train.trainer import (_prep_batch,
                                                       install_device_prep)
    from multi_part_assembly_tpu.utils import CN

    cfg = CN()
    cfg.data = CN({'dataset': 'geometry', 'max_num_part': 8,
                   'data_keys': ('part_ids', 'valid_matrix'),
                   'rot_range': -1., 'num_pc_points': 32})
    mesh = make_mesh(devices=jax.devices()[:1])
    ds = GeometryPartDataset(
        data_dir=bb_tree, data_fn='everyday.train.txt',
        data_keys=('part_ids', 'valid_matrix'), num_points=32,
        min_num_part=2, max_num_part=8, wire_dtype='float32')
    loader = DataLoader(ds, batch_size=3, shuffle=False, drop_last=False,
                        batch_collate=True)
    install_device_prep(loader, cfg, mesh)
    batch = next(iter(loader))
    assert '__real_bs__' in batch
    device_batch, bs = _prep_batch(batch, cfg, mesh, None, augment=False)
    assert bs == 3
    assert device_batch['part_pcs_raw'].shape == (3, 8, 32, 3)
    for row in range(3):
        item = ds[row]
        np.testing.assert_allclose(
            np.asarray(device_batch['part_pcs_raw'][row]),
            item['part_pcs_raw'], atol=0)
        np.testing.assert_array_equal(
            np.asarray(device_batch['part_valids'][row]),
            item['part_valids'])
        np.testing.assert_array_equal(
            np.asarray(device_batch['valid_matrix'][row]),
            item['valid_matrix'])


def test_f16_wire_metric_parity(rng):
    """Eval metrics computed from f16-quantized clouds track the f32 ones
    to ~1e-3: the basis for defaulting the wire format to float16."""
    from multi_part_assembly_tpu.utils.eval_utils import calc_part_acc
    from multi_part_assembly_tpu.utils.loss import shape_cd_loss
    from multi_part_assembly_tpu.utils.rotation import Rotation3D

    B, P, N = 4, 6, 256
    pts32 = rng.randn(B, P, N, 3).astype(np.float32) * 0.5
    pts16 = pts32.astype(np.float16).astype(np.float32)
    valids = np.ones((B, P), np.float32)
    valids[:, 4:] = 0.0
    trans1 = rng.randn(B, P, 3).astype(np.float32) * 0.1
    trans2 = trans1 + rng.randn(B, P, 3).astype(np.float32) * 0.05
    q = rng.randn(B, P, 4).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    rot = Rotation3D(jnp.asarray(q), rot_type='quat')
    acc32 = np.asarray(calc_part_acc(
        jnp.asarray(pts32), jnp.asarray(trans1), jnp.asarray(trans2),
        rot, rot, jnp.asarray(valids)))
    acc16 = np.asarray(calc_part_acc(
        jnp.asarray(pts16), jnp.asarray(trans1), jnp.asarray(trans2),
        rot, rot, jnp.asarray(valids)))
    np.testing.assert_allclose(acc16, acc32, atol=1e-6)
    cd32 = np.asarray(shape_cd_loss(
        jnp.asarray(pts32), jnp.asarray(trans1), jnp.asarray(trans2),
        rot, rot, jnp.asarray(valids)))
    cd16 = np.asarray(shape_cd_loss(
        jnp.asarray(pts16), jnp.asarray(trans1), jnp.asarray(trans2),
        rot, rot, jnp.asarray(valids)))
    np.testing.assert_allclose(cd16, cd32, rtol=5e-3, atol=1e-4)


@pytest.fixture
def partnet_tree(tmp_path):
    root = tmp_path / 'partnet'
    (root / 'shape_data').mkdir(parents=True)
    (root / 'contact_points').mkdir()
    rng = np.random.default_rng(0)
    ids = []
    for shape_id, n_parts in [(101, 3), (102, 2), (103, 9)]:
        data = {
            'part_pcs': rng.normal(size=(n_parts, 20, 3)).astype(np.float32),
            'part_poses': np.concatenate(
                [rng.normal(size=(n_parts, 3)),
                 np.tile([1, 0, 0, 0], (n_parts, 1))], 1).astype(np.float32),
            'part_ids': np.arange(1, n_parts + 1),
            'geo_part_ids': [1, 1, 2][:n_parts] if n_parts <= 3 else
                list(range(n_parts)),
            'sym': np.zeros((n_parts, 3), np.float32),
        }
        np.save(root / 'shape_data' / f'{shape_id}_level3.npy', data,
                allow_pickle=True)
        np.save(
            root / 'contact_points' /
            f'pairs_with_contact_points_{shape_id}_level3.npy',
            np.zeros((n_parts, n_parts, 4), np.float32), allow_pickle=True)
        ids.append(shape_id)
    for split in ['train', 'val']:
        np.save(root / f'Chair.{split}.npy', np.asarray(ids))
    # numpy can't auto-append .npy twice; ensure file names right
    return str(root)


def test_partnet_dataset(partnet_tree):
    ds = PartNetPartDataset(
        data_dir=partnet_tree, data_fn='Chair.train.npy',
        data_keys=('part_ids', 'match_ids', 'contact_points',
                   'valid_matrix'),
        num_part_category=20, min_num_part=2, max_num_part=5)
    assert len(ds) == 2  # 9-part shape filtered
    item = ds[0]
    assert item['part_pcs'].shape == (5, 20, 3)
    assert item['part_quat'].shape == (5, 4)
    assert item['part_valids'].sum() == 3
    # geo_part_ids [1, 1, 2]: parts 0, 1 equivalent -> match group 1; part 2
    # unique -> 0
    np.testing.assert_array_equal(item['match_ids'], [1, 1, 0, 0, 0])
    # instance_label: first/second instance of class 1, first of class 2
    assert item['instance_label'][0, 0] == 1
    assert item['instance_label'][1, 1] == 1
    assert item['instance_label'][2, 0] == 1
    assert item['contact_points'].shape == (5, 5, 4)


def test_partnet_packed_collate(partnet_tree):
    """PartNet collate_batch packs part_pcs; everything else matches the
    per-item path exactly (shuffle off so draws align)."""
    import jax.numpy as jnp

    from multi_part_assembly_tpu.datasets.geometry import unpack_parts

    ds = PartNetPartDataset(
        data_dir=partnet_tree, data_fn='Chair.train.npy',
        data_keys=('part_ids', 'match_ids', 'contact_points',
                   'valid_matrix'),
        num_part_category=20, min_num_part=2, max_num_part=5,
        wire_dtype='float32')
    batch = ds.collate_batch([0, 1])
    assert 'part_pcs__packed' in batch and 'part_pcs' not in batch
    unpacked = np.asarray(unpack_parts(
        jnp.asarray(batch['part_pcs__packed']),
        jnp.asarray(batch['pack_index']),
        jnp.asarray(batch['part_valids'])))
    for row, i in enumerate([0, 1]):
        item = ds[i]
        np.testing.assert_allclose(unpacked[row], item['part_pcs'], atol=0)
        for k in ('part_trans', 'part_quat', 'part_valids', 'match_ids',
                  'instance_label', 'contact_points', 'valid_matrix'):
            np.testing.assert_array_equal(batch[k][row], item[k])
    # default f16 wire: packed rows == f16 rounding of the f32 items
    ds16 = PartNetPartDataset(
        data_dir=partnet_tree, data_fn='Chair.train.npy',
        data_keys=('part_ids', 'match_ids', 'contact_points',
                   'valid_matrix'),
        num_part_category=20, min_num_part=2, max_num_part=5)
    b16 = ds16.collate_batch([0, 1])
    assert b16['part_pcs__packed'].dtype == np.float16
    np.testing.assert_array_equal(
        b16['part_pcs__packed'],
        batch['part_pcs__packed'].astype(np.float16))


def test_persistent_mesh_cache_roundtrip(tmp_path):
    """On-disk parsed-mesh sidecars: a cold reload (fresh sampler, RAM
    registry empty) serves the IDENTICAL sample stream and device tables
    from one binary read, and a changed source invalidates the sidecar
    (keyed on size + mtime_ns)."""
    import time

    from multi_part_assembly_tpu.datasets.mesh_io import mesh_cache_path
    p = str(tmp_path / 'cube.obj')
    _write_cube(p)
    s = MeshSampler()
    assert s.is_native
    s.load(p)
    a = s.sample(p, 100, 7)
    tri, prob, alias, nf = s.export_tables(p, 128)
    cpath = mesh_cache_path(p)
    assert os.path.exists(cpath), 'cache sidecar not written'
    s.close()

    s2 = MeshSampler()  # cold: RAM registry empty -> sidecar hit
    s2.load(p)
    np.testing.assert_array_equal(s2.sample(p, 100, 7), a)
    tri2, prob2, alias2, nf2 = s2.export_tables(p, 128)
    np.testing.assert_array_equal(tri, tri2)
    np.testing.assert_array_equal(prob, prob2)
    np.testing.assert_array_equal(alias, alias2)
    assert nf == nf2 == 12 and s2.n_faces(p) == 12
    s2.close()

    time.sleep(0.01)
    _write_cube(p, scale=2.0)  # stale source -> must re-parse
    s3 = MeshSampler()
    s3.load(p)
    c = s3.sample(p, 100, 7)
    np.testing.assert_allclose(c, a * 2.0, atol=1e-5)
    s3.close()


def test_load_batch_threaded(tmp_path):
    """The threaded native batch load yields the SAME handles-backed
    sample stream as sequential per-mesh loads, dedups repeated paths,
    and raises on a missing file without leaking good handles."""
    paths = []
    for i in range(5):
        p = str(tmp_path / f'cube{i}.obj')
        _write_cube(p, scale=1.0 + 0.25 * i)
        paths.append(p)

    s = MeshSampler()
    assert s.is_native
    for p in paths:
        s.load(p)
    seq = [s.sample(p, 64, 3) for p in paths]
    s.close()

    s2 = MeshSampler()
    s2.load_batch(paths + paths[:2])  # dupes must dedup, not double-load
    assert all(p in s2._handles for p in paths)
    for p, a in zip(paths, seq):
        np.testing.assert_array_equal(s2.sample(p, 64, 3), a)
    s2.close()

    s3 = MeshSampler()
    bad = paths[:2] + [str(tmp_path / 'missing.obj')] + paths[2:]
    try:
        s3.load_batch(bad)
        raised = False
    except IOError:
        raised = True
    assert raised
    # good meshes are still individually loadable afterwards
    s3.load_batch(paths)
    np.testing.assert_array_equal(s3.sample(paths[0], 64, 3), seq[0])
    s3.close()


def test_mesh_cache_disable_env(tmp_path, monkeypatch):
    from multi_part_assembly_tpu.datasets.mesh_io import mesh_cache_path
    monkeypatch.setenv('MPA_MESH_CACHE', '0')
    p = str(tmp_path / 'cube.obj')
    _write_cube(p)
    assert mesh_cache_path(p) is None
    s = MeshSampler()
    s.load(p)
    assert not os.path.exists(p + '.mpac')
    s.close()
