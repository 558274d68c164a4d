import time, sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from rectified_spaattn_tpu.sparse import SparseConfig, select_block_num
from rectified_spaattn_tpu.curves import cached_curve
from rectified_spaattn_tpu.attention import rectified_sparse_attention

def log(m): print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)

b,h,d = 1,24,128
lt,lh,lw = 32,45,80
text_len = 256
sv = lt*lh*lw; s = sv + text_len
l2h,h2l,neighbors = cached_curve(lt,lh,lw,block_size=128)
neighbors = jnp.asarray(neighbors)
cfg = SparseConfig(top_k_floor=select_block_num(0.8, sv//128), p_remain=0.3, layout="joint", text_len=text_len)
rng = jax.random.PRNGKey(0)
q = jax.random.normal(rng,(b,h,s,d),jnp.bfloat16)
k = jax.random.normal(rng,(b,h,s,d),jnp.bfloat16)
v = jax.random.normal(rng,(b,h,s,d),jnp.bfloat16)
tlen = jnp.full((b,),text_len,jnp.int32)
log("full rectified path (kernel-based text rows)...")
ffn = jax.jit(lambda q,k,v: rectified_sparse_attention(q,k,v,cfg,neighbors,visual_len=sv,text_len_rt=tlen))
out = ffn(q,k,v); float(jnp.sum(out.astype(jnp.float32)))
log("compiled+first run done")
t0=time.perf_counter()
for _ in range(3): out = ffn(q,k,v); float(jnp.sum(out.astype(jnp.float32)))
log(f"full sparse path: {(time.perf_counter()-t0)/3*1e3:.1f} ms  (dense flash baseline ~2090 ms)")
