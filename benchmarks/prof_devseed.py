import sys, time, functools
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp

N, L = 2048, 1024
WTOT = 512*1024; AMAX = 512*1024; GMAX = 8192; CAP = 32
rng = np.random.default_rng(0)
codes = rng.integers(0, 4, (N, L)).astype(np.int8)
qlens = np.full(N, 1000, np.int32)
keys = np.sort(rng.integers(0, 2**30, 545_000).astype(np.int32))
pos_t = rng.integers(0, 300_000, 545_000).astype(np.int32)
pos_ss = rng.integers(0, 20, 545_000).astype(np.int32)

from megapath_nano_tpu.align.device_seed import sketch_device, build_groups_device

def t(fn, *a, n=3, **kw):
    r = fn(*a, **kw); jax.tree_util.tree_map(lambda x: x.block_until_ready(), r)
    t0 = time.time()
    for _ in range(n):
        r = fn(*a, **kw); jax.tree_util.tree_map(lambda x: x.block_until_ready(), r)
    return (time.time()-t0)/n*1000

sk = jax.jit(functools.partial(sketch_device, k=15, w=10))
print("sketch:", round(t(sk, codes, qlens),1), "ms", flush=True)

bg = jax.jit(functools.partial(build_groups_device, k=15, w=10, max_occ=64,
    min_group_anchors=3, gap_break=5000, cap=CAP, seq_bits=4,
    wtot_max=WTOT, a_max=AMAX, g_max=GMAX))
print("build_groups (incl sketch):", round(t(bg, codes, qlens, keys, pos_t, pos_ss),1), "ms", flush=True)

a = rng.integers(0, 2**30, AMAX).astype(np.int32)
b = rng.integers(0, 2**30, AMAX).astype(np.int32)
c = rng.integers(0, 2**30, AMAX).astype(np.int32)
srt = jax.jit(lambda x,y,z: jax.lax.sort((x,y,z), num_keys=3))
print("lax.sort 512k x3keys:", round(t(srt, a,b,c),1), "ms", flush=True)
srt1 = jax.jit(lambda x: jnp.sort(x))
print("jnp.sort 512k:", round(t(srt1, a),1), "ms", flush=True)
woff = np.sort(rng.integers(0, 2**29, N*L)).astype(np.int32)
q = rng.integers(0, 2**29, WTOT).astype(np.int32)
ss = jax.jit(lambda t_,q_: jnp.searchsorted(t_, q_, side="right"))
print("searchsorted 512k into 2M:", round(t(ss, woff, q),1), "ms", flush=True)
ss2 = jax.jit(lambda t_,q_: jnp.searchsorted(t_, q_, side="left"))
print("searchsorted 512k into 545k:", round(t(ss2, keys, q),1), "ms", flush=True)
cs = jax.jit(lambda x: jnp.cumsum(x))
w32 = rng.integers(0, 2, N*L).astype(np.int32)
print("cumsum 2M:", round(t(cs, w32),1), "ms", flush=True)
# gather 512k from 2M
g = jax.jit(lambda tbl, ix: tbl[ix])
ix = rng.integers(0, N*L, WTOT).astype(np.int32)
print("gather 512k from 2M:", round(t(g, w32, ix),1), "ms", flush=True)
