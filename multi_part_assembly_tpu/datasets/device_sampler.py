"""Device-side mesh surface sampling: the data pipeline as a TPU program.

The host wire for geometry (Breaking-Bad) batches used to carry sampled
point clouds (`[Kpad, N, 3]` float16, ~2MB/batch).  Through the remote
runtime tunnel this wire is the pipeline's binding resource whenever the
tunnel is slow (measured this round: ~90MB/s sustained with ~28ms/RPC
fixed cost -> ~20ms/step of wire wait at batch 32, vs a 25ms device
floor).  This module moves the SAMPLING onto the device instead:

  * one-time: every mesh piece's triangle table (a, b-a, c-a, from the
    native parser) + Walker alias table over triangle areas is packed into
    a resident `[n_pieces, 16, Fmax]` f32 array in HBM;
  * per batch: the wire carries only `part_slots__packed [Kpad] i32`
    (which piece each packed row is) + `part_counts [B]` + one seed --
    a few KB instead of megabytes;
  * a pallas kernel (grid = packed rows) draws N area-weighted surface
    points per part: the alias-method face draw and the triangle fetch
    are each ONE one-hot MXU matmul against the piece's table tile
    (random per-point gathers do not vectorize on TPU; iota-compare
    one-hot selection is the TPU idiom, see ops/chamfer.py backward),
    then the barycentric mix is 6 VPU fmas per point -- the same math as
    the native sampler's inner loop (mesh_sampler.cpp sample_mesh_t) and
    trimesh.sample_surface (reference geometry_data.py:109-131).

Sampling distribution is identical to the host path (same alias tables,
f32 draw math); the RNG stream is jax threefry keyed per (epoch, batch)
instead of PCG32 per (epoch, item, part) -- a documented stream change,
like the round-2 alias-table switch (ROADMAP "Known deviations").

Table layouts (both behind the same `tables.table / tables.n_faces` wire
signature, dispatched on static shapes inside `_sample_points`):

  * DENSE `[n_pieces, 16, Fmax]`: one block per piece, Fmax = the largest
    face count.  Memory scales with n_pieces x Fmax -- wasteful when face
    counts are skewed (real Breaking-Bad fracture sets).
  * CHUNKED `[total_chunks, 24, Fc]` (round 4): every piece is split into
    ceil(F / Fc) chunks of Fc faces, so memory scales with the TOTAL face
    count instead of n_pieces x max(F).  The Walker alias draw needs
    prob(f0) and then the ALIAS face's triangle -- which can live in a
    different chunk -- so the chunked rows inline the alias triangle
    (rows 10-18 = tri(alias(f))) next to prob; ONE one-hot matmul against
    f0's chunk then yields everything and the kernel stays single-pass.
    The grid grows a chunk axis (K, Cmax); blocks past a piece's chunk
    count clamp to its last chunk (same block index -> Mosaic skips the
    re-fetch) and the kernel body is `when`-gated off, so cost tracks the
    piece's ACTUAL chunk count, not Cmax.

Fallbacks: anything without meshes (PartNet npy), multi-device data axes,
or a table that would blow the HBM budget keeps the packed f16 host wire.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # pltpu only resolves on TPU builds; tests run in interpret mode
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

__all__ = ['DeviceTables', 'build_device_tables', 'sample_packed',
           'sample_packed_ref', 'sample_and_expand', 'sample_and_expand_multi',
           'sample_and_expand_sharded', 'sample_and_expand_multi_sharded',
           'warm_sample_cache']

# dense table row layout (per piece, [16, Fmax] f32)
_ROW_TRI = 0      # rows 0-8: a.xyz, (b-a).xyz, (c-a).xyz, component-major
_ROW_PROB = 9     # alias acceptance threshold
_ROW_ALIAS = 10   # alias face index (f32-encoded, exact below 2^24)
_N_ROWS = 16

# chunked table row layout (per chunk, [24, Fc] f32): the alias face's
# triangle is inlined so the draw never needs a second (cross-chunk) fetch
_CROW_TRI = 0     # rows 0-8: tri(f), same component-major layout
_CROW_PROB = 9    # alias acceptance threshold
_CROW_ATRI = 10   # rows 10-18: tri(alias(f)); rows 19-23 sublane padding
_N_ROWS_C = 24
_CHUNK_F = 512    # default chunk width (faces; multiple of 128)

# chunked meta rows ([3 + Cmax, n_pieces] i32; rows 3+ are zero padding
# whose only job is to encode the STATIC Cmax in the array shape, so the
# jitted wire fns need no extra static argument)
_META_NF = 0      # face count
_META_BASE = 1    # first chunk row in the table
_META_NCH = 2     # chunk count (= ceil(nf / Fc))


def _round_up(x, m):
    return -(-x // m) * m


def _on_tpu():
    return jax.default_backend() == 'tpu' or \
        jax.default_backend() not in ('cpu', 'gpu')


class DeviceTables:
    """Device-resident sampling tables + the host path->slot map."""

    def __init__(self, table, n_faces, slot_of, fmax, interpret=False):
        # dense: table [n_pieces, 16, Fmax] f32, n_faces [n_pieces] i32;
        # chunked: table [total_chunks, 24, Fc], n_faces = the
        # [3 + Cmax, n_pieces] i32 meta array (kept under the same
        # attribute so every wire signature is layout-agnostic)
        self.table = table
        self.n_faces = n_faces
        self.slot_of = slot_of  # mesh path -> slot
        self.fmax = fmax        # dense Fmax / chunked Fc
        # interpret-mode pallas (CPU tests); set by the enabling caller
        self.interpret = interpret

    @property
    def nbytes(self):
        return self.table.size * 4 + self.n_faces.size * 4


def build_device_tables(paths, sampler, put=None,
                        budget_bytes=4 * 1024 ** 3, fmax=None,
                        chunk_f=_CHUNK_F, layout=None):
    """Assemble + upload the sampling tables for `paths` (one-time).

    `sampler` is a mesh_io.MeshSampler (native or numpy fallback); `put`
    places the finished arrays (e.g. a replicated NamedSharding put).
    `layout` picks the table format: 'dense' (one [16, Fmax] block per
    piece), 'chunked' ([24, chunk_f] blocks, memory ~ total face count),
    or None = auto -- the cheaper KERNEL among the layouts that fit
    `budget_bytes`, else None (callers keep the host wire).

    Auto cost model (calibrated on the real chip,
    scripts/bench_chunked_sampler.py): per-row kernel time tracks the
    one-hot columns scanned -- dense scans 2 x Fmax (two matmuls over the
    piece's full padded face axis), chunked scans mean_chunks x Fc (one
    matmul per actual chunk; the alias triangle is inlined).  Measured on
    the uniform-768-face bench set: chunked 0.59x dense at the production
    row count (0.68 vs 1.16 ms/call, K=240) at 2x the table bytes; skewed
    real fracture sets tilt further toward chunked on BOTH axes (dense
    pads every piece to the global max face count)."""
    paths = list(dict.fromkeys(paths))  # stable unique order
    if not paths:
        return None
    counts = [sampler.n_faces(p) for p in paths]
    n_pieces = len(paths)
    slot_of = {p: i for i, p in enumerate(paths)}
    put = put or jax.device_put

    if layout is None:
        fmax_a = fmax if fmax is not None else \
            max(128, _round_up(max(counts), 128))
        dense_fits = max(counts) <= fmax_a and \
            n_pieces * _N_ROWS * fmax_a * 4 <= budget_bytes
        nch_a = [max(1, -(-f // chunk_f)) for f in counts]
        chunk_fits = sum(nch_a) * _N_ROWS_C * chunk_f * 4 <= budget_bytes
        dense_cols = 2 * fmax_a                          # two matmuls/row
        chunk_cols = sum(nch_a) / n_pieces * chunk_f     # one per chunk
        if dense_fits and (not chunk_fits or dense_cols <= chunk_cols):
            layout = 'dense'
        elif chunk_fits:
            layout = 'chunked'
        else:
            return None

    if layout == 'dense':
        fmax_d = fmax if fmax is not None else \
            max(128, _round_up(max(counts), 128))
        if max(counts) <= fmax_d and \
                n_pieces * _N_ROWS * fmax_d * 4 <= budget_bytes:
            table = np.zeros((n_pieces, _N_ROWS, fmax_d), np.float32)
            for i, p in enumerate(paths):
                tri9, prob, alias, _ = sampler.export_tables(p, fmax_d)
                table[i, _ROW_TRI:_ROW_TRI + 9] = tri9
                table[i, _ROW_PROB] = prob
                table[i, _ROW_ALIAS] = alias
            return DeviceTables(put(jnp.asarray(table)),
                                put(jnp.asarray(counts, jnp.int32)),
                                slot_of, fmax_d)
        return None

    # chunked: memory ~ sum(ceil(F_i / chunk_f)) * 24 * chunk_f
    nch = [max(1, -(-f // chunk_f)) for f in counts]
    total = sum(nch)
    if total * _N_ROWS_C * chunk_f * 4 > budget_bytes:
        return None
    cmax = max(nch)
    base = np.zeros(n_pieces, np.int64)
    base[1:] = np.cumsum(nch)[:-1]
    meta = np.zeros((3 + cmax, n_pieces), np.int32)
    meta[_META_NF] = counts
    meta[_META_BASE] = base
    meta[_META_NCH] = nch
    table = np.zeros((total, _N_ROWS_C, chunk_f), np.float32)
    for i, p in enumerate(paths):
        fpad = nch[i] * chunk_f
        tri9, prob, alias, _ = sampler.export_tables(p, fpad)
        # alias indices are f32-encoded exact ints (padding aliases self,
        # which stays inside fpad); +0.5 guards the int cast like the
        # kernel's round (advisor round 3)
        atri = tri9[:, (alias + 0.5).astype(np.int64)]
        for c in range(nch[i]):
            sl = slice(c * chunk_f, (c + 1) * chunk_f)
            table[base[i] + c, _CROW_TRI:_CROW_TRI + 9] = tri9[:, sl]
            table[base[i] + c, _CROW_PROB] = prob[sl]
            table[base[i] + c, _CROW_ATRI:_CROW_ATRI + 9] = atri[:, sl]
    return DeviceTables(put(jnp.asarray(table)), put(jnp.asarray(meta)),
                        slot_of, chunk_f)


def _sample_kernel(slots_ref, fs_ref, tbl_ref, u_ref, out_ref, *, fmax,
                   npad):
    """One program per packed part row.

    tbl_ref: [1, 16, Fmax] f32, the piece's table (block index rides the
    scalar-prefetched slot array).  u_ref: [1, 8, Npad] f32 uniforms, rows
    0 = face draw, 1 = sqrt arg, 2 = barycentric mix (rows 3-7 unused
    sublane padding).  out_ref: [1, 8, Npad] f32, rows 0-2 = xyz.

    The alias-method face draw (mesh_sampler.cpp sample_mesh_t): the draw
    needs prob[f0], alias[f0] and then the alias face's triangle -- all
    per-point random access.  Each is extracted with an iota-compare
    one-hot and ONE [16, Fmax] @ [Fmax, Npad] MXU matmul (HIGHEST: the
    operand split reconstructs the f32 table values exactly under a 0/1
    selector), so the whole draw is two matmuls + VPU selects.
    """
    k = pl.program_id(0)
    t = tbl_ref[0]                      # [16, Fmax]
    u = u_ref[0]                        # [8, Npad]
    # n_faces is indexed by PIECE SLOT, not by grid row: fs_ref[k] would
    # read an unrelated piece's face count (and clamp out of bounds past
    # n_pieces), drawing faces over the wrong range -- caught by the
    # ragged-table oracle test (equal-face-count fixtures masked it)
    F = fs_ref[slots_ref[k]].astype(jnp.float32)

    rf = u[0:1, :] * F                  # [1, Npad]
    f0 = jnp.minimum(jnp.floor(rf), F - 1.0)
    frac = rf - f0

    # Mosaic only lowers integer iota; face ids are exact below 2^24 so
    # the int32 compare is lossless.
    iota = jax.lax.broadcasted_iota(jnp.int32, (fmax, npad), 0)
    oh0 = (iota == f0.astype(jnp.int32)).astype(jnp.float32)  # [Fmax, Npad]
    sel0 = jax.lax.dot_general(
        t, oh0, (((1, ), (0, )), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)        # [16, Npad] rows at f0
    accept = frac < sel0[_ROW_PROB:_ROW_PROB + 1, :]
    f1 = sel0[_ROW_ALIAS:_ROW_ALIAS + 1, :]         # alias face (f32 ints)
    # round, don't truncate: f1 rides the HIGHEST one-hot matmul, which
    # reconstructs the stored integer exactly, but a one-ULP wobble under
    # truncation would silently select the previous face (f1 >= 0 always)
    oh1 = (iota == (f1 + 0.5).astype(jnp.int32)).astype(jnp.float32)
    sel1 = jax.lax.dot_general(
        t, oh1, (((1, ), (0, )), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)        # [16, Npad] rows at f1
    sel = jnp.where(accept, sel0, sel1)

    su = jnp.sqrt(u[1:2, :])
    b1 = su * (1.0 - u[2:3, :])
    b2 = su * u[2:3, :]
    pts = sel[0:3, :] + b1 * sel[3:6, :] + b2 * sel[6:9, :]
    out_ref[0, 0:3, :] = pts
    out_ref[0, 3:8, :] = jnp.zeros((5, npad), jnp.float32)


def _sample_kernel_chunked(slots_ref, meta_ref, tbl_ref, u_ref, out_ref, *,
                           fc, npad):
    """One program per (packed part row, face chunk).

    tbl_ref: [1, 24, Fc] f32, ONE chunk of the piece's table (block index
    = chunk_base[slot] + min(c, n_chunks-1): past-the-end chunks repeat
    the last block index so Mosaic skips the re-fetch, and the body is
    `when`-gated off).  Only the chunk containing a point's drawn face f0
    contributes: the one-hot matmul is all-zero elsewhere, making prob 0,
    accept False, and the inlined alias-triangle rows zero -- so the
    cross-chunk accumulation into out_ref is exact.  The alias triangle
    (which may live in ANY chunk) rides rows 10-18 of f0's own column, so
    the draw is ONE matmul here vs the dense kernel's two."""
    k = pl.program_id(0)
    c = pl.program_id(1)
    slot = slots_ref[k]
    nch = meta_ref[_META_NCH, slot]

    @pl.when(c < nch)
    def _():
        t = tbl_ref[0]                      # [24, Fc]
        u = u_ref[0]                        # [8, Npad]
        F = meta_ref[_META_NF, slot].astype(jnp.float32)
        rf = u[0:1, :] * F                  # [1, Npad]
        f0 = jnp.minimum(jnp.floor(rf), F - 1.0)
        frac = rf - f0
        iota = jax.lax.broadcasted_iota(jnp.int32, (fc, npad), 0) + c * fc
        oh = (iota == f0.astype(jnp.int32)).astype(jnp.float32)
        sel = jax.lax.dot_general(
            t, oh, (((1, ), (0, )), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)    # [24, Npad] at f0
        accept = frac < sel[_CROW_PROB:_CROW_PROB + 1, :]
        tri = jnp.where(accept, sel[_CROW_TRI:_CROW_TRI + 9, :],
                        sel[_CROW_ATRI:_CROW_ATRI + 9, :])
        su = jnp.sqrt(u[1:2, :])
        b1 = su * (1.0 - u[2:3, :])
        b2 = su * u[2:3, :]
        pts = tri[0:3, :] + b1 * tri[3:6, :] + b2 * tri[6:9, :]

        @pl.when(c == 0)
        def _():
            out_ref[0, 0:3, :] = pts
            out_ref[0, 3:8, :] = jnp.zeros((5, npad), jnp.float32)

        @pl.when(c > 0)
        def _():
            out_ref[0, 0:3, :] = out_ref[0, 0:3, :] + pts


def _sample_points_chunked(table, meta, slots, uniforms, n_points,
                           interpret=False):
    """Chunked-table variant of `_sample_points` (same contract)."""
    K = slots.shape[0]
    fc = table.shape[2]
    npad = uniforms.shape[2]
    cmax = meta.shape[0] - 3  # static Cmax rides the meta array's shape
    if not _HAS_PLTPU:  # pragma: no cover - CPU-only jax builds
        return sample_packed_ref(table, meta, slots, uniforms, n_points)
    kwargs = {} if interpret else {
        'compiler_params': pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024)}

    def _tbl_index(k, c, slots, meta):
        slot = slots[k]
        last = meta[_META_NCH, slot] - 1
        return (meta[_META_BASE, slot] + jnp.minimum(c, last), 0, 0)

    out = pl.pallas_call(
        functools.partial(_sample_kernel_chunked, fc=fc, npad=npad),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # slots, meta
            grid=(K, cmax),
            in_specs=[
                pl.BlockSpec((1, _N_ROWS_C, fc), _tbl_index),
                pl.BlockSpec((1, 8, npad),
                             lambda k, c, slots, meta: (k, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 8, npad),
                                   lambda k, c, slots, meta: (k, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((K, 8, npad), jnp.float32),
        interpret=interpret,
        **kwargs,
    )(slots.astype(jnp.int32), meta.astype(jnp.int32), table, uniforms)
    return jnp.transpose(out[:, 0:3, :n_points], (0, 2, 1))


def _sample_points(table, n_faces, slots, uniforms, n_points,
                   interpret=False):
    """[K] slots + [K, 8, Npad] uniforms -> [K, n_points, 3] f32.

    Dispatches on the table's STATIC row extent: 16 rows = dense layout
    (n_faces is [n_pieces] face counts), 24 rows = chunked layout
    (n_faces is the [3 + Cmax, n_pieces] meta array)."""
    if table.shape[1] == _N_ROWS_C:
        return _sample_points_chunked(table, n_faces, slots, uniforms,
                                      n_points, interpret=interpret)
    K = slots.shape[0]
    fmax = table.shape[2]
    npad = uniforms.shape[2]
    if not _HAS_PLTPU:  # pragma: no cover - CPU-only jax builds
        return sample_packed_ref(table, n_faces, slots, uniforms, n_points)
    kwargs = {} if interpret else {
        'compiler_params': pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024)}
    out = pl.pallas_call(
        functools.partial(_sample_kernel, fmax=fmax, npad=npad),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # slots (block index), n_faces
            grid=(K, ),
            in_specs=[
                pl.BlockSpec((1, _N_ROWS, fmax),
                             lambda k, slots, fs: (slots[k], 0, 0)),
                pl.BlockSpec((1, 8, npad), lambda k, slots, fs: (k, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 8, npad),
                                   lambda k, slots, fs: (k, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((K, 8, npad), jnp.float32),
        interpret=interpret,
        **kwargs,
    )(slots.astype(jnp.int32), n_faces.astype(jnp.int32), table, uniforms)
    return jnp.transpose(out[:, 0:3, :n_points], (0, 2, 1))


def sample_packed(table, n_faces, slots, key, n_points, interpret=False):
    """Draw [K, n_points, 3] area-weighted surface samples on device."""
    K = slots.shape[0]
    npad = _round_up(n_points, 128)
    uniforms = jax.random.uniform(key, (K, 8, npad), jnp.float32)
    return _sample_points(table, n_faces, slots, uniforms, n_points,
                          interpret=interpret)


def _sample_chunked_ref(table, meta, slots, uniforms, n_points):
    """Pure-jnp gather oracle for the CHUNKED kernel's exact math."""
    t = jnp.asarray(table)                          # [total, 24, Fc]
    m = jnp.asarray(meta)
    slots = jnp.asarray(slots)
    u = jnp.asarray(uniforms)                       # [K, 8, Npad]
    fc = t.shape[2]
    F = m[_META_NF, slots].astype(jnp.float32)      # [K]
    base = m[_META_BASE, slots]                     # [K]
    rf = u[:, 0, :] * F[:, None]
    f0 = jnp.minimum(jnp.floor(rf), F[:, None] - 1.0)
    frac = rf - f0
    f0i = f0.astype(jnp.int32)
    row = base[:, None] + f0i // fc                 # [K, Npad] chunk row
    col = f0i % fc
    flat = ((row[..., None] * t.shape[1]
             + jnp.arange(_CROW_ATRI + 9)[None, None, :]) * fc
            + col[..., None])
    g = t.reshape(-1)[flat]                         # [K, Npad, 19]
    accept = frac < g[..., _CROW_PROB]
    tri = jnp.where(accept[..., None], g[..., _CROW_TRI:_CROW_TRI + 9],
                    g[..., _CROW_ATRI:_CROW_ATRI + 9])
    su = jnp.sqrt(u[:, 1, :])
    b1 = su * (1.0 - u[:, 2, :])
    b2 = su * u[:, 2, :]
    pts = tri[..., 0:3] + b1[..., None] * tri[..., 3:6] + \
        b2[..., None] * tri[..., 6:9]
    return pts[:, :n_points, :]


def sample_packed_ref(table, n_faces, slots, uniforms, n_points):
    """Pure-jnp oracle (gather-based) for the kernel's exact math."""
    if table.shape[1] == _N_ROWS_C:
        return _sample_chunked_ref(table, n_faces, slots, uniforms,
                                   n_points)
    t = jnp.asarray(table)[jnp.asarray(slots)]      # [K, 16, Fmax]
    u = jnp.asarray(uniforms)                       # [K, 8, Npad]
    F = jnp.asarray(n_faces)[jnp.asarray(slots)].astype(jnp.float32)
    rf = u[:, 0, :] * F[:, None]                    # [K, Npad]
    f0 = jnp.minimum(jnp.floor(rf), F[:, None] - 1.0)
    frac = rf - f0
    f0i = f0.astype(jnp.int32)
    prob0 = jnp.take_along_axis(t[:, _ROW_PROB], f0i, axis=1)
    alias0 = jnp.take_along_axis(t[:, _ROW_ALIAS], f0i, axis=1)
    # +0.5 before trunc == round for these non-negative exact-int floats
    # (keeps the oracle's face selection identical to the kernel's)
    f = (jnp.where(frac < prob0, f0, alias0) + 0.5).astype(jnp.int32)
    tri = jnp.take_along_axis(
        t[:, _ROW_TRI:_ROW_TRI + 9], f[:, None, :], axis=2)  # [K, 9, Npad]
    su = jnp.sqrt(u[:, 1, :])
    b1 = su * (1.0 - u[:, 2, :])
    b2 = su * u[:, 2, :]
    pts = tri[:, 0:3] + b1[:, None, :] * tri[:, 3:6] + \
        b2[:, None, :] * tri[:, 6:9]
    return jnp.transpose(pts[:, :, :n_points], (0, 2, 1))


_BASE_KEY = 0x5e1ec7ab  # sampling stream domain separator


@functools.partial(jax.jit, static_argnames=('n_points', 'max_parts',
                                             'data_keys', 'interpret'))
def sample_and_expand(table, n_faces, slots, counts, seed, n_points,
                      max_parts, data_keys, interpret=False):
    """Slot wire -> full dense batch, entirely on device.

    Drop-in for the f16 packed wire's `expand_geometry_batch` hop
    (datasets/geometry.py): sample, then the same derive-on-device
    expansion."""
    from .geometry import expand_geometry_batch
    key = jax.random.fold_in(jax.random.PRNGKey(_BASE_KEY), seed)
    packed = sample_packed(table, n_faces, slots, key, n_points,
                           interpret=interpret)
    return expand_geometry_batch(packed, counts, max_parts=max_parts,
                                 data_keys=data_keys)


@functools.partial(jax.jit, static_argnames=('n_points', 'max_parts',
                                             'data_keys', 'interpret'))
def sample_and_expand_multi(table, n_faces, slots, counts, seeds, n_points,
                            max_parts, data_keys, interpret=False):
    """Grouped slot wire ([G, Kpad] slots, [G, B] counts, [G] seeds) ->
    stacked dense batches in ONE device dispatch (one pallas call over the
    flattened G*Kpad rows; uniform streams stay keyed per (seed_g))."""
    from .geometry import expand_geometry_batch_multi
    G, K = slots.shape
    npad = _round_up(n_points, 128)
    keys = jax.vmap(
        lambda s: jax.random.fold_in(jax.random.PRNGKey(_BASE_KEY), s))(seeds)
    uniforms = jax.vmap(
        lambda k: jax.random.uniform(k, (K, 8, npad), jnp.float32))(keys)
    packed = _sample_points(table, n_faces, slots.reshape(G * K),
                            uniforms.reshape(G * K, 8, npad), n_points,
                            interpret=interpret)
    packed = packed.reshape(G, K, n_points, 3)
    return expand_geometry_batch_multi(packed, counts, max_parts=max_parts,
                                       data_keys=tuple(data_keys))


@functools.partial(jax.jit, static_argnames=('mesh', 'n_points', 'max_parts',
                                              'data_keys', 'interpret'))
def sample_and_expand_sharded(table, n_faces, slots, counts, seeds, mesh,
                              n_points, max_parts, data_keys,
                              interpret=False):
    """Multi-device slot wire: each device samples only its own rows.

    slots [D, Kpad], counts [D, Bs], seeds [D] arrive sharded on the
    mesh's `data` axis (D = mesh.shape['data']); the tables are
    replicated.  A shard_map runs the pallas sampler per device shard (an
    XLA-partitioned pallas custom call would otherwise be replicated with
    an all-gather), and the per-shard dense batches concatenate back into
    a global [D*Bs, ...] batch sharded on `data` -- the exact input
    contract of the compiled train/eval steps.  No collectives anywhere:
    the wire is embarrassingly parallel over the data axis.
    """
    from jax.sharding import PartitionSpec as P
    D, Bs = counts.shape

    def _local(table, n_faces, slots, counts, seeds):
        out = sample_and_expand(
            table, n_faces, slots[0], counts[0], seeds[0],
            n_points=n_points, max_parts=max_parts, data_keys=data_keys,
            interpret=interpret)
        return jax.tree_util.tree_map(lambda x: x[None], out)

    fn = jax.shard_map(
        _local, mesh=mesh,
        in_specs=(P(), P(), P('data'), P('data'), P('data')),
        out_specs=P('data'), check_vma=False)
    out = fn(table, n_faces, slots, counts, seeds)
    return jax.tree_util.tree_map(
        lambda x: x.reshape((D * Bs, ) + x.shape[2:]), out)


@functools.partial(jax.jit, static_argnames=('mesh', 'n_points', 'max_parts',
                                              'data_keys', 'interpret'))
def sample_and_expand_multi_sharded(table, n_faces, slots, counts, seeds,
                                    mesh, n_points, max_parts, data_keys,
                                    interpret=False):
    """Grouped multi-device slot wire: [G, D, Kpad] slots, [G, D, Bs]
    counts, [G, D] seeds -> stacked dense batches [G, D*Bs, ...] in ONE
    dispatch (each device runs one pallas call over its G*Kpad rows)."""
    from jax.sharding import PartitionSpec as P
    G, D, _ = slots.shape
    Bs = counts.shape[2]

    def _local(table, n_faces, slots, counts, seeds):
        out = sample_and_expand_multi(
            table, n_faces, slots[:, 0], counts[:, 0], seeds[:, 0],
            n_points=n_points, max_parts=max_parts, data_keys=data_keys,
            interpret=interpret)
        return jax.tree_util.tree_map(lambda x: x[:, None], out)

    fn = jax.shard_map(
        _local, mesh=mesh,
        in_specs=(P(), P(), P(None, 'data'), P(None, 'data'),
                  P(None, 'data')),
        out_specs=P(None, 'data'), check_vma=False)
    out = fn(table, n_faces, slots, counts, seeds)
    return jax.tree_util.tree_map(
        lambda x: x.reshape((G, D * Bs) + x.shape[3:]), out)


def warm_sample_cache(tables, batch_size, max_parts, n_points, mesh=None,
                      data_keys=('part_ids', 'valid_matrix'), group_size=1,
                      interpret=False, shards=1, fixed_kpad=False):
    """Pre-compile the slot-wire device hop for every Kpad bucket (same
    rationale as geometry.warm_unpack_cache: remote compiles are
    minutes-level and must not land mid-epoch).

    With shards > 1 the sharded variants are warmed instead, with inputs
    placed exactly like the real pipeline's (`shard_batch` -> data-axis
    NamedSharding; jit caches key on input shardings).  `batch_size` is
    the GLOBAL batch; per-shard rows are batch_size/shards wide.
    fixed_kpad warms only the dense bucket (the multi-process wire)."""
    rep = (lambda x: x) if mesh is None else functools.partial(
        jax.device_put,
        device=jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec()))
    if shards > 1:
        from jax.sharding import PartitionSpec as P
        from ..parallel.mesh import put_sharded
        n_local = shards // jax.process_count()  # local shards per host
        bs = batch_size // shards
        dense = bs * max_parts
        step = max(1, -(-dense // 8))
        seen = set()
        for mult in range(1, 9):
            k = min(dense, step * mult)
            if k in seen or (fixed_kpad and k != dense):
                continue
            seen.add(k)
            dev = put_sharded({
                'slots': np.zeros((n_local, k), np.int32),
                'counts': np.ones((n_local, bs), np.int32),
                'seeds': np.zeros((n_local, ), np.int32)}, mesh, P('data'))
            out = sample_and_expand_sharded(
                tables.table, tables.n_faces, dev['slots'], dev['counts'],
                dev['seeds'], mesh, n_points=n_points, max_parts=max_parts,
                data_keys=tuple(data_keys), interpret=interpret)
            jax.block_until_ready(out)
            if group_size > 1:
                gdev = put_sharded({
                    'slots': np.zeros((group_size, n_local, k), np.int32),
                    'counts': np.ones((group_size, n_local, bs), np.int32),
                    'seeds': np.zeros((group_size, n_local), np.int32)},
                    mesh, P(None, 'data'))
                out2 = sample_and_expand_multi_sharded(
                    tables.table, tables.n_faces, gdev['slots'],
                    gdev['counts'], gdev['seeds'], mesh,
                    n_points=n_points, max_parts=max_parts,
                    data_keys=tuple(data_keys), interpret=interpret)
                jax.block_until_ready(out2)
        return
    dense = batch_size * max_parts
    step = max(1, -(-dense // 8))
    seen = set()
    for mult in range(1, 9):
        k = min(dense, step * mult)
        if k in seen:
            continue
        seen.add(k)
        out = sample_and_expand(
            tables.table, tables.n_faces,
            rep(jnp.zeros((k, ), jnp.int32)),
            rep(jnp.ones((batch_size, ), jnp.int32)),
            rep(jnp.zeros((), jnp.int32)),
            n_points=n_points, max_parts=max_parts,
            data_keys=tuple(data_keys), interpret=interpret)
        jax.block_until_ready(out)
        if group_size > 1:
            out2 = sample_and_expand_multi(
                tables.table, tables.n_faces,
                rep(jnp.zeros((group_size, k), jnp.int32)),
                rep(jnp.ones((group_size, batch_size), jnp.int32)),
                rep(jnp.zeros((group_size, ), jnp.int32)),
                n_points=n_points, max_parts=max_parts,
                data_keys=tuple(data_keys), interpret=interpret)
            jax.block_until_ready(out2)
