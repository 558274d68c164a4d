import time, sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
import numpy as np

def log(m): print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)

b,h,nq,nk = 1,24,900,901
rng = jax.random.PRNGKey(0)
probs = jax.nn.softmax(jax.random.normal(rng,(b,h,nq,nk)), axis=-1)
p_remain, floor = 0.3, 180

def timed(f,*a,n=5):
    out=f(*a); jax.tree_util.tree_map(lambda x: float(jnp.sum(x.astype(jnp.float32))), out)
    t0=time.perf_counter()
    for _ in range(n):
        out=f(*a); jax.tree_util.tree_map(lambda x: float(jnp.sum(x.astype(jnp.float32))), out)
    return (time.perf_counter()-t0)/n

# A: current (argsort + inverse argsort)
@jax.jit
def variant_a(probs):
    order = jnp.argsort(-probs, axis=-1)
    sp = jnp.take_along_axis(probs, order, axis=-1)
    csum = jnp.cumsum(sp, axis=-1)
    counts = jnp.sum(csum <= p_remain, -1).astype(jnp.int32)+1
    counts = jnp.maximum(counts, floor)
    rank = jnp.argsort(order, axis=-1)
    onehot = rank < counts[...,None]
    return onehot, counts

# B: sort values only + threshold select
@jax.jit
def variant_b(probs):
    sp = jnp.sort(probs, axis=-1)[..., ::-1]
    csum = jnp.cumsum(sp, axis=-1)
    counts = jnp.sum(csum <= p_remain, -1).astype(jnp.int32)+1
    counts = jnp.maximum(counts, floor)
    thresh = jnp.take_along_axis(sp, (counts-1)[...,None].astype(jnp.int32), axis=-1)
    onehot = probs >= thresh
    return onehot, counts

# C: put_along_axis scatter for rank
@jax.jit
def variant_c(probs):
    order = jnp.argsort(-probs, axis=-1)
    sp = jnp.take_along_axis(probs, order, axis=-1)
    csum = jnp.cumsum(sp, axis=-1)
    counts = jnp.sum(csum <= p_remain, -1).astype(jnp.int32)+1
    counts = jnp.maximum(counts, floor)
    iota = jnp.broadcast_to(jnp.arange(nk, dtype=jnp.int32), order.shape)
    rank = jnp.put_along_axis(jnp.zeros_like(order), order, iota, axis=-1, inplace=False)
    onehot = rank < counts[...,None]
    return onehot, counts

# final index sort cost
mask = variant_a(probs)[0]
@jax.jit
def idx_sort(mask):
    col = jnp.arange(mask.shape[-1], dtype=jnp.int32)
    key = jnp.where(mask, col, col + mask.shape[-1])
    return jnp.sort(key, axis=-1)

log(f"A (2 argsorts): {timed(variant_a,probs)*1e3:.1f} ms")
log(f"B (1 sort + threshold): {timed(variant_b,probs)*1e3:.1f} ms")
log(f"C (argsort + scatter-rank): {timed(variant_c,probs)*1e3:.1f} ms")
log(f"index-compaction sort: {timed(idx_sort,mask)*1e3:.1f} ms")
oa,ca = variant_a(probs); ob,cb = variant_b(probs); oc,cc = variant_c(probs)
print("A==C:", bool(jnp.all(oa==oc)), " A~B mask diff:", int(jnp.sum(oa!=ob)), "counts equal:", bool(jnp.all(ca==cb)))
