"""Miscellaneous host-side helpers (IO, colorization, param filtering).

Counterpart of reference multi_part_assembly/utils/utils.py.  `save_pc`
writes PLY directly (the reference used pyntcloud, utils.py:37-46).
"""

import pickle

import numpy as np

__all__ = [
    'pickle_load', 'pickle_dump', 'save_pc', 'save_obj', 'apply_pmat',
    'colorize_part_pc', 'wd_param_mask',
]


def save_obj(verts, faces, file):
    """Write a triangle mesh as OBJ (replaces trimesh.export,
    reference scripts/vis.py:79-97)."""
    verts = np.asarray(verts)
    faces = np.asarray(faces)
    with open(file, 'w') as f:
        for x, y, z in verts:
            f.write(f'v {x:.6f} {y:.6f} {z:.6f}\n')
        for tri in faces:
            f.write('f ' + ' '.join(str(int(i) + 1) for i in tri) + '\n')


def apply_pmat(verts, pmat):
    """Apply a homogeneous 4x4 transform to [N, 3] points (trimesh
    apply_transform equivalent, reference scripts/vis.py:86,97)."""
    verts = np.asarray(verts)
    pmat = np.asarray(pmat)
    return verts @ pmat[:3, :3].T + pmat[:3, 3]


def pickle_load(file, **kwargs):
    """Load a pickle from a path or file object (reference utils.py:13-21)."""
    if isinstance(file, str):
        with open(file, 'rb') as f:
            return pickle.load(f, **kwargs)
    if hasattr(file, 'read'):
        return pickle.load(file, **kwargs)
    raise TypeError('"file" must be a filename str or a file-object')


def pickle_dump(obj, file=None, **kwargs):
    """Dump a pickle to a path / file object / bytes (reference utils.py:24-34)."""
    kwargs.setdefault('protocol', 2)
    if file is None:
        return pickle.dumps(obj, **kwargs)
    if isinstance(file, str):
        with open(file, 'wb') as f:
            pickle.dump(obj, f, **kwargs)
    elif hasattr(file, 'write'):
        pickle.dump(obj, file, **kwargs)
    else:
        raise TypeError('"file" must be a filename str or a file-object')


def save_pc(pc, file):
    """Save a point cloud [N, 3] or [N, 6] (xyz + rgb) as binary-less PLY.

    Replaces the reference's pyntcloud dependency (utils.py:37-46) with a
    direct ASCII PLY writer.
    """
    pc = np.asarray(pc)
    assert pc.ndim == 2 and pc.shape[1] in (3, 6)
    has_color = pc.shape[1] == 6
    with open(file, 'w') as f:
        f.write('ply\nformat ascii 1.0\n')
        f.write(f'element vertex {pc.shape[0]}\n')
        f.write('property float x\nproperty float y\nproperty float z\n')
        if has_color:
            f.write('property uchar red\nproperty uchar green\n'
                    'property uchar blue\n')
        f.write('end_header\n')
        for row in pc:
            if has_color:
                f.write(f'{row[0]:.6f} {row[1]:.6f} {row[2]:.6f} '
                        f'{int(row[3])} {int(row[4])} {int(row[5])}\n')
            else:
                f.write(f'{row[0]:.6f} {row[1]:.6f} {row[2]:.6f}\n')


def colorize_part_pc(part_pc, colors):
    """Attach an RGB color per part: [P, N, 3] -> [P, N, 6] (utils.py:49-64)."""
    part_pc = np.asarray(part_pc)
    colors = np.asarray(colors)
    P, N, _ = part_pc.shape
    colored_pc = np.zeros((P, N, 6))
    colored_pc[:, :, :3] = part_pc
    colored_pc[:, :, 3:] = colors[:P, None, :3]
    return colored_pc


def wd_param_mask(params):
    """Pytree mask: True for params that should receive weight decay.

    Mirrors the reference's `filter_wd_parameters` (utils.py:90-125): biases
    and normalization scales/offsets are excluded from decay.  In a flax
    param tree this is decided by leaf path name.
    """
    import jax

    def _decay(path):
        names = [
            str(getattr(p, 'key', getattr(p, 'name', ''))).lower()
            for p in path
        ]
        leaf = names[-1] if names else ''
        if leaf in ('bias', 'b', 'scale', 'offset'):
            return False
        if any('norm' in n or n.startswith('bn') for n in names):
            return False
        return True

    return jax.tree_util.tree_map_with_path(lambda p, _: _decay(p), params)
