"""Multi-device sharding tests on the virtual 8-CPU mesh (SURVEY §2.6:
no reference semantics to match — validate our dp/tp/sp plans compile,
execute, and keep results equal to the unsharded computation)."""

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from rectified_spaattn_tpu.parallel import (
    make_mesh, param_shardings, shard_params, shard_prompts)

# whole-module: multi-minute 8-device equality runs (pyproject addopts)
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(dp=2, tp=4, sp=1)


class MiniAttn(nn.Module):
    dim: int = 32
    heads: int = 4

    @nn.compact
    def __call__(self, x):
        b, s, _ = x.shape
        hd = self.dim // self.heads
        q = nn.Dense(self.dim, name="to_q")(x)
        k = nn.Dense(self.dim, name="to_k")(x)
        v = nn.Dense(self.dim, name="to_v")(x)
        split = lambda t: t.reshape(b, s, self.heads, hd).transpose(0, 2, 1, 3)
        q, k, v = split(q), split(k), split(v)
        a = jax.nn.softmax(jnp.einsum("bhqd,bhkd->bhqk", q, k), -1)
        o = jnp.einsum("bhqk,bhkd->bhqd", a, v)
        o = o.transpose(0, 2, 1, 3).reshape(b, s, self.dim)
        return nn.Dense(self.dim, name="to_out")(o)


def test_tp_sharded_attention_matches_unsharded(mesh):
    model = MiniAttn()
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 16, 32))
    params = model.init(rng, x)
    want = np.asarray(model.apply(params, x))

    sharded = shard_params(mesh, params)
    xs = jax.device_put(x, NamedSharding(mesh, P("dp", None, None)))
    with mesh:
        got = jax.jit(model.apply)(sharded, xs)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_param_shardings_classify_kernels(mesh):
    model = MiniAttn()
    params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 4, 32)))
    sh = param_shardings(mesh, params)
    flat = dict(jax.tree_util.tree_flatten_with_path(sh)[0])
    def spec_of(name):
        for path, s in flat.items():
            if name in jax.tree_util.keystr(path):
                return s.spec
        raise KeyError(name)
    assert spec_of("to_q']['kernel") == P(None, "tp")
    assert spec_of("to_out']['kernel") == P("tp", None)


def test_shard_prompts_matches_reference_interleaving():
    prompts = list("abcdefg")
    assert shard_prompts(prompts, 0, 2) == ["a", "c", "e", "g"]
    assert shard_prompts(prompts, 1, 2) == ["b", "d", "f"]


def test_head_parallel_sparse_attention_matches_single_device(mesh):
    """Head-sharded rectified attention == single-device result (the mask
    pipeline is per-head, so tp sharding is collective-free)."""
    from rectified_spaattn_tpu.sparse import SparseConfig
    from rectified_spaattn_tpu.attention import rectified_sparse_attention
    from rectified_spaattn_tpu.attention.sharded import (
        head_parallel_rectified_attention)

    b, h, d, nq = 2, 4, 32, 2
    s = nq * 128
    cfg = SparseConfig(top_k_floor=1, p_remain=0.4, layout="visual")
    g = np.random.default_rng(12)
    q, k, v = [jnp.asarray(g.normal(size=(b, h, s, d)).astype(np.float32))
               for _ in range(3)]
    want = np.asarray(rectified_sparse_attention(
        q, k, v, cfg, None, visual_len=s, interpret=True))
    got = np.asarray(head_parallel_rectified_attention(
        mesh, q, k, v, cfg, None, visual_len=s, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_ring_sequence_parallel_matches_single_device(mesh):
    """Ring sp attention == single-device rectified output: the global
    mask plan is rebuilt identically from all-gathered pooled stats and the
    partial softmaxes merge exactly."""
    from rectified_spaattn_tpu.sparse import SparseConfig
    from rectified_spaattn_tpu.attention import rectified_sparse_attention
    from rectified_spaattn_tpu.attention.ring import (
        ring_rectified_sparse_attention)
    from rectified_spaattn_tpu.parallel import make_mesh

    ring_mesh = make_mesh(dp=1, tp=2, sp=4)
    b, h, d = 1, 2, 32
    s = 8 * 128                    # 2 blocks per sp shard
    cfg = SparseConfig(top_k_floor=1, p_remain=0.4, layout="visual",
                       first_frame_blocks=1)
    g = np.random.default_rng(13)
    q, k, v = [jnp.asarray(g.normal(size=(b, h, s, d)).astype(np.float32))
               for _ in range(3)]
    nb = s // 128
    neighbors = jnp.asarray(np.eye(nb, dtype=bool))

    want = np.asarray(rectified_sparse_attention(
        q, k, v, cfg, neighbors, visual_len=s, interpret=True))
    got = np.asarray(ring_rectified_sparse_attention(
        ring_mesh, q, k, v, cfg, neighbors, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("ffb", [0, 1])
def test_ring_joint_layout_matches_single_device(mesh, ffb):
    """Joint-layout ring sp (VERDICT r2 item 5): visual tokens sharded,
    text tail replicated — visual rows ring + local text pass, text rows
    exact via ring-merged full-list passes.  Must equal the single-device
    joint rectified output (same plan from all-gathered stats, exact
    m/l merges), including a runtime text window shorter than the padded
    tail."""
    from rectified_spaattn_tpu.sparse import SparseConfig
    from rectified_spaattn_tpu.attention import rectified_sparse_attention
    from rectified_spaattn_tpu.attention.ring import (
        ring_rectified_sparse_attention)
    from rectified_spaattn_tpu.parallel import make_mesh

    ring_mesh = make_mesh(dp=1, tp=2, sp=4)
    b, h, d = 1, 2, 32
    sv = 8 * 128                   # 2 visual blocks per sp shard
    tlen_pad = 128
    cfg = SparseConfig(top_k_floor=1, p_remain=0.4, layout="joint",
                       text_len=tlen_pad, topp_impl="sort",
                       first_frame_blocks=ffb)  # code-review r3: ffb must
                                                # apply in the joint ring too
    g = np.random.default_rng(17)
    qv, kv_, vv = [jnp.asarray(
        g.normal(size=(b, h, sv, d)).astype(np.float32)) for _ in range(3)]
    qt, kt, vt = [jnp.asarray(
        g.normal(size=(b, h, tlen_pad, d)).astype(np.float32))
        for _ in range(3)]
    nb = sv // 128
    neighbors = jnp.asarray(np.eye(nb, dtype=bool))
    tlen = jnp.asarray([90], jnp.int32)     # runtime window < padded tail

    q = jnp.concatenate([qv, qt], axis=2)
    k = jnp.concatenate([kv_, kt], axis=2)
    v = jnp.concatenate([vv, vt], axis=2)
    want = np.asarray(rectified_sparse_attention(
        q, k, v, cfg, neighbors, visual_len=sv, text_len_rt=tlen,
        interpret=True))

    got_vis, got_txt = ring_rectified_sparse_attention(
        ring_mesh, qv, kv_, vv, cfg, neighbors, interpret=True,
        q_text=qt, k_text=kt, v_text=vt, text_len_rt=tlen)
    np.testing.assert_allclose(np.asarray(got_vis), want[:, :, :sv],
                               rtol=2e-3, atol=2e-3)
    # text rows: exact attention (only the valid window is meaningful for
    # keys; all text QUERY rows are real here)
    np.testing.assert_allclose(np.asarray(got_txt), want[:, :, sv:],
                               rtol=2e-3, atol=2e-3)


def test_ring_composes_with_packed_kv_and_row_chunk(mesh):
    """Ring SP × the long-context levers (VERDICT r4 #8): the same ring
    result must come out with (a) the plan built in row tiles
    (cfg.plan_row_chunk) and (b) ONE producer-packed [K|V] buffer
    rotating the ring instead of two — both pure execution-strategy
    knobs, so outputs match the unlevered ring bit-for-bit."""
    import dataclasses
    from rectified_spaattn_tpu.sparse import SparseConfig
    from rectified_spaattn_tpu.attention.ring import (
        ring_rectified_sparse_attention)
    from rectified_spaattn_tpu.parallel import make_mesh

    ring_mesh = make_mesh(dp=1, tp=2, sp=4)
    b, h, d = 1, 2, 32
    s = 8 * 128                    # 2 blocks per sp shard
    base = SparseConfig(top_k_floor=1, p_remain=0.4, layout="visual",
                        first_frame_blocks=1)
    g = np.random.default_rng(23)
    q, k, v = [jnp.asarray(g.normal(size=(b, h, s, d)).astype(np.float32))
               for _ in range(3)]
    nb = s // 128
    neighbors = jnp.asarray(np.eye(nb, dtype=bool))

    want = np.asarray(ring_rectified_sparse_attention(
        ring_mesh, q, k, v, base, neighbors, interpret=True))
    cfg = dataclasses.replace(base, plan_row_chunk=1)
    kv = jnp.concatenate([k, v], axis=-1)
    got = np.asarray(ring_rectified_sparse_attention(
        ring_mesh, q, kv[..., :d], kv[..., d:], cfg, neighbors,
        interpret=True, kv_packed=kv))
    # row-tiled softmax fusion can reorder fp32 reductions by 1 ulp
    # (measured 5.96e-08 on the joint path) — tight allclose, not
    # bit-equality
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)

    # joint layout: same composition through the visual ring + text passes
    tlen_pad = 128
    basej = SparseConfig(top_k_floor=1, p_remain=0.4, layout="joint",
                         text_len=tlen_pad, topp_impl="sort")
    qt, kt, vt = [jnp.asarray(
        g.normal(size=(b, h, tlen_pad, d)).astype(np.float32))
        for _ in range(3)]
    tlen = jnp.asarray([90], jnp.int32)
    want_v, want_t = ring_rectified_sparse_attention(
        ring_mesh, q, k, v, basej, neighbors, interpret=True,
        q_text=qt, k_text=kt, v_text=vt, text_len_rt=tlen)
    cfgj = dataclasses.replace(basej, plan_row_chunk=1)
    got_v, got_t = ring_rectified_sparse_attention(
        ring_mesh, q, kv[..., :d], kv[..., d:], cfgj, neighbors,
        interpret=True, q_text=qt, k_text=kt, v_text=vt,
        text_len_rt=tlen, kv_packed=kv)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v),
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_t), np.asarray(want_t),
                               rtol=0, atol=1e-6)


def test_graft_dryrun_multichip():
    """The driver's multi-chip validation path."""
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_multihost_eval_launcher_injects_shards(monkeypatch, tmp_path):
    """VERDICT r2 item 10: the jax.distributed eval entry maps
    (process_index, process_count) onto run_eval's --shard_index /
    --num_shards, preserving the reference's interleaving contract."""
    from rectified_spaattn_tpu.parallel import multihost
    from rectified_spaattn_tpu.eval import run_eval

    seen = {}
    monkeypatch.setattr(run_eval, "main", lambda argv: seen.update(
        argv=list(argv)))
    idx, cnt = multihost.launch_eval([
        "--process_id", "1", "--num_processes", "4",
        "--prompts", str(tmp_path / "p.json"), "--model", "hunyuan"])
    assert (idx, cnt) == (1, 4)
    a = seen["argv"]
    assert a[a.index("--shard_index") + 1] == "1"
    assert a[a.index("--num_shards") + 1] == "4"
    # passthrough args preserved
    assert "--model" in a and "hunyuan" in a

    # single-process default
    idx, cnt = multihost.launch_eval(["--prompts", "x.json"])
    assert (idx, cnt) == (0, 1)


def test_hunyuan_pipeline_mesh_matches_single_device(mesh):
    """Pipeline-level multi-chip (round 3): HunyuanVideoPipeline with a
    dp x tp mesh shards params + runs the sparse path head-parallel; the
    full denoise must equal the unsharded pipeline."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_pipelines import make_hunyuan_pipe
    from rectified_spaattn_tpu.pipelines import HunyuanVideoPipeline
    from jax.sharding import Mesh

    # tiny model: batch 1, heads 2 -> a 2-device tp-only mesh subset
    mesh = Mesh(np.array(jax.devices()[:2]).reshape(1, 2, 1),
                ("dp", "tp", "sp"))
    pipe, text, mask = make_hunyuan_pipe("sparse", steps=2)
    want = np.asarray(pipe(text, mask, seed=5))

    sharded = HunyuanVideoPipeline(
        model=pipe.model, params=pipe.params, height=pipe.height,
        width=pipe.width, frames=pipe.frames, num_steps=2,
        sa_drop_rate=pipe.sa_drop_rate, p_remain_rates=pipe.p_remain_rates,
        mode="sparse", text_len=pipe.text_len, interpret=True, mesh=mesh)
    got = np.asarray(sharded(text, mask, seed=5))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_wan_pipeline_mesh_matches_single_device(mesh):
    """WanPipeline with a tp mesh (visual layout, warm dense layers mixed
    with head-parallel sparse layers) equals the unsharded pipeline."""
    from jax.sharding import Mesh
    from rectified_spaattn_tpu.models.wan import WanConfig, WanDiT
    from rectified_spaattn_tpu.pipelines import WanPipeline

    cfg = WanConfig.tiny()
    model = WanDiT(cfg)
    rng = jax.random.PRNGKey(9)
    text_c = jax.random.normal(rng, (1, 16, cfg.text_dim))
    text_u = jnp.zeros_like(text_c)
    lat = jnp.zeros((1, cfg.in_channels, 2, 4, 4))
    params = model.init(rng, lat, jnp.array([0.0]), text_c)

    def mk(mesh_arg):
        return WanPipeline(model=model, params=params, height=64, width=64,
                           frames=5, num_steps=2, sa_drop_rate=0.5,
                           warm_layers=1, warm_calls=0, mode="sparse",
                           interpret=True, mesh=mesh_arg)
    want = np.asarray(mk(None)(text_c, text_u, seed=4))
    tp2 = Mesh(np.array(jax.devices()[:2]).reshape(1, 2, 1),
               ("dp", "tp", "sp"))
    got = np.asarray(mk(tp2)(text_c, text_u, seed=4))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_cogvideox_pipeline_mesh_matches_single_device(mesh):
    """CogVideoXPipeline with a tp mesh (joint layout, CFG dual calls,
    sparse after warm calls) equals the unsharded pipeline."""
    from jax.sharding import Mesh
    from rectified_spaattn_tpu.models.cogvideox import (CogVideoXConfig,
                                                        CogVideoXDiT)
    from rectified_spaattn_tpu.pipelines import CogVideoXPipeline

    cfg = CogVideoXConfig.tiny()
    model = CogVideoXDiT(cfg)
    rng = jax.random.PRNGKey(11)
    text_c = jax.random.normal(rng, (1, 128, cfg.text_dim))
    text_u = jnp.zeros_like(text_c)
    lat = jnp.zeros((1, cfg.in_channels, 2, 8, 8))
    params = model.init(rng, lat, jnp.array([0.0]), text_c)

    def mk(mesh_arg):
        return CogVideoXPipeline(
            model=model, params=params, height=64, width=64, frames=9,
            num_steps=2, sa_drop_rate=0.5, mode="sparse", text_len=128,
            sparse_warm_calls=1, interpret=True, mesh=mesh_arg)
    want = np.asarray(mk(None)(text_c, text_u, seed=7))
    tp2 = Mesh(np.array(jax.devices()[:2]).reshape(1, 2, 1),
               ("dp", "tp", "sp"))
    got = np.asarray(mk(tp2)(text_c, text_u, seed=7))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_param_shardings_stacked_and_quantized(mesh):
    """Sharding specs generalize to stacked [L, in, out] scan leaves and
    quantized layouts: kernels shard on trailing feature axes (scan axis
    replicated), int4 group scales follow their kernel's role, int8
    row-layer scales and non-divisible axes stay replicated."""
    tree = {"scan": {"attn": {
        "to_q": {"kernel": np.zeros((3, 8, 16))},
        "to_k": {"kernel_q": np.zeros((3, 8, 16), np.int8),
                 "kernel_scale": np.zeros((3, 16), np.float32)},
        "to_out": {"kernel_q4": np.zeros((3, 4, 16), np.uint8),
                   "kernel_scale": np.zeros((3, 4, 16), np.float32)},
        "fc2": {"kernel_q": np.zeros((3, 8, 16), np.int8),
                "kernel_scale": np.zeros((3, 16), np.float32)},
        "fc1": {"kernel": np.zeros((3, 8, 18))},     # 18 % tp(4) != 0
    }}}
    sh = param_shardings(mesh, tree)["scan"]["attn"]
    assert sh["to_q"]["kernel"].spec == P(None, None, "tp")
    assert sh["to_k"]["kernel_q"].spec == P(None, None, "tp")
    assert sh["to_k"]["kernel_scale"].spec == P(None, "tp")
    assert sh["to_out"]["kernel_q4"].spec == P(None, "tp", None)
    assert sh["to_out"]["kernel_scale"].spec == P(None, "tp", None)
    assert sh["fc2"]["kernel_q"].spec == P(None, "tp", None)
    assert sh["fc2"]["kernel_scale"].spec == P()      # int8 row: replicated
    assert sh["fc1"]["kernel"].spec == P()            # non-divisible


@pytest.mark.parametrize("quant_bits", [None, 4])
def test_hunyuan_scan_pipeline_mesh_matches_single_device(mesh, quant_bits):
    """scan_blocks + mesh (was NotImplementedError): stacked (and
    quantized) param trees shard over tp and the scanned sparse blocks
    run head-parallel inside lax.scan; the denoise must equal the
    unsharded scan pipeline bit-for-bit in interpret mode."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_scan import _mk_pipe
    from jax.sharding import Mesh

    pipe, text, mask = _mk_pipe(scan=True, quant_bits=quant_bits,
                                mode="sparse")
    want = np.asarray(pipe(text, mask, seed=3))
    tp2 = Mesh(np.array(jax.devices()[:2]).reshape(1, 2, 1),
               ("dp", "tp", "sp"))
    pipe_m, _, _ = _mk_pipe(scan=True, quant_bits=quant_bits,
                            mode="sparse", mesh=tp2)
    got = np.asarray(pipe_m(text, mask, seed=3))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_flux_pipeline_mesh_matches_single_device(mesh):
    """FluxPipeline with a tp mesh (joint layout, per-layer sparse gate)
    equals the unsharded pipeline."""
    from jax.sharding import Mesh
    from rectified_spaattn_tpu.models.flux import FluxConfig, FluxDiT
    from rectified_spaattn_tpu.pipelines import FluxPipeline

    cfg = FluxConfig.tiny()
    model = FluxDiT(cfg)
    rng = jax.random.PRNGKey(12)
    text = jax.random.normal(rng, (1, 128, cfg.text_dim))
    mask = jnp.zeros((1, 128), bool).at[:, :7].set(True)
    pooled = jax.random.normal(rng, (1, cfg.pooled_dim))
    tokens = jnp.zeros((1, 64, cfg.in_channels))
    params = model.init(rng, tokens, jnp.array([0.5]), text, pooled,
                        jnp.array([3.5]), 8, 8)

    def mk(mesh_arg):
        return FluxPipeline(
            model=model, params=params, height=256, width=256, num_steps=2,
            sa_drop_rate=0.5, mode="sparse", text_len=128, interpret=True,
            mesh=mesh_arg)
    want = np.asarray(mk(None)(text, mask, pooled, seed=2))
    tp2 = Mesh(np.array(jax.devices()[:2]).reshape(1, 2, 1),
               ("dp", "tp", "sp"))
    got = np.asarray(mk(tp2)(text, mask, pooled, seed=2))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
