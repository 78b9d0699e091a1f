import numpy as np, jax, jax.numpy as jnp, time
from multi_part_assembly_tpu.datasets import device_sampler as ds

rng = np.random.default_rng(0)
n_pieces, fmax, npad = 3, 256, 128
table = np.zeros((n_pieces, 16, fmax), np.float32)
nf = np.array([200, 37, 256], np.int32)
for i in range(n_pieces):
    table[i, 0:9, :nf[i]] = rng.normal(size=(9, nf[i])).astype(np.float32)
    table[i, 9, :nf[i]] = rng.uniform(size=nf[i]).astype(np.float32)
    table[i, 10, :nf[i]] = rng.integers(0, nf[i], nf[i]).astype(np.float32)
t, f = jnp.asarray(table), jnp.asarray(nf)
u = jnp.asarray(rng.uniform(size=(3, 8, npad)).astype(np.float32))
slots = jnp.asarray([0, 2, 1], jnp.int32)
t0=time.time(); out = np.asarray(ds._sample_points(t, f, slots, u, 100))
print('kernel compile+run', time.time()-t0, flush=True)
for s in range(3):
    ref = np.asarray(ds.sample_packed_ref(t, f, jnp.full((3,), s, jnp.int32), u, 100))
    for k in range(3):
        print(f'kernel row{k} vs oracle-slot{s}:', np.abs(out[k]-ref[k]).max(), flush=True)
