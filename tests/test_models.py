"""Model-zoo tests: shapes, structure, dtype plumbing, sparse-fusion semantics.

Structural checks on the full-depth network use ``jax.eval_shape`` (no FLOPs);
numerical forwards use shallow (1,1,1,1)-depth variants — same layer types, tiny
compute — to stay fast on the single-core CI host.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_classification_tpu.config import get_cfg
from video_classification_tpu.models import (
    Res3D,
    ResNet50_2D,
    SlowFast,
    SparseModel,
    init_my_slowfast,
    init_res2d,
    init_res3d,
)

SHALLOW = (1, 1, 1, 1)


def _shape_init(model, xs):
    return jax.eval_shape(
        lambda k, x: model.init(k, x, train=False), jax.random.PRNGKey(0), xs
    )


@pytest.fixture(scope="module")
def sf_shapes():
    model = SlowFast(num_classes=11)
    xs = [jnp.zeros((1, 4, 64, 64, 5)), jnp.zeros((1, 4, 64, 64, 15))]
    return _shape_init(model, xs)


def test_slowfast_channel_plan(sf_shapes):
    """Verify the exact channel dims of the reference network (SURVEY.md §2.1)."""
    p = sf_shapes["params"]
    # Stems: 5->64 slow, 15->8 fast, conv (1,7,7).
    assert p["blocks_0_pathway_0"]["conv"]["kernel"].shape == (1, 7, 7, 5, 64)
    assert p["blocks_0_pathway_1"]["conv"]["kernel"].shape == (1, 7, 7, 15, 8)
    # Stem fusion: fast 8 -> 16 via (3,1,1) conv.
    assert p["blocks_0_fuse"]["conv_fast_to_slow"]["kernel"].shape == (3, 1, 1, 8, 16)
    # Stage 1 slow block 0: in 64+16=80, inner 64, out 256; conv_a (1,1,1).
    rb = p["blocks_1_pathway_0"]["res_block_0"]
    assert rb["branch2"]["conv_a"]["kernel"].shape == (1, 1, 1, 80, 64)
    assert rb["branch2"]["conv_b"]["kernel"].shape == (1, 3, 3, 64, 64)
    assert rb["branch2"]["conv_c"]["kernel"].shape == (1, 1, 1, 64, 256)
    assert rb["branch1_conv"]["kernel"].shape == (1, 1, 1, 80, 256)
    # Blocks 1,2 of a stage have no branch1 projection.
    assert "branch1_conv" not in p["blocks_1_pathway_0"]["res_block_1"]
    # Stage 3 slow conv_a is temporal (3,1,1): in 512+128=640, inner 256.
    rb3 = p["blocks_3_pathway_0"]["res_block_0"]
    assert rb3["branch2"]["conv_a"]["kernel"].shape == (3, 1, 1, 640, 256)
    # Stage 4 fast: in 128, inner 64, out 256.
    rb4f = p["blocks_4_pathway_1"]["res_block_0"]
    assert rb4f["branch2"]["conv_a"]["kernel"].shape == (3, 1, 1, 128, 64)
    # No fusion after stage 4 (max_stage_idx=3).
    assert "blocks_4_fuse" not in p
    # Head: 2048 + 256 = 2304 -> num_classes.
    assert p["head"]["proj"]["kernel"].shape == (2304, 11)
    # Stage depths 3,4,6,3.
    assert len(p["blocks_2_pathway_0"]) == 4
    assert len(p["blocks_3_pathway_0"]) == 6
    assert len(p["blocks_4_pathway_0"]) == 3


def test_slowfast_forward_finite():
    model = SlowFast(num_classes=11, depths=SHALLOW)
    xs = [jnp.ones((2, 4, 64, 64, 5)), jnp.ones((2, 4, 64, 64, 15))]
    variables = model.init(jax.random.PRNGKey(0), xs, train=False)
    y = model.apply(variables, xs, train=False)
    assert y.shape == (2, 11)
    assert y.dtype == jnp.float32
    assert np.all(np.isfinite(np.asarray(y)))


def test_slowfast_no_fuse():
    model = SlowFast(num_classes=11, fuse=False)
    xs = [jnp.zeros((1, 4, 64, 64, 5)), jnp.zeros((1, 4, 64, 64, 15))]
    shapes = _shape_init(model, xs)
    p = shapes["params"]
    assert "blocks_0_fuse" not in p
    # Without fusion, slow stage 1 input stays 64 (fusion_ratio 0, my_slowfast.py:92).
    assert p["blocks_1_pathway_0"]["res_block_0"]["branch2"]["conv_a"]["kernel"].shape \
        == (1, 1, 1, 64, 64)


@pytest.mark.parametrize("mode", ["C123", "R"])
def test_slowfast_fusion_modes(mode):
    model = SlowFast(num_classes=11, depths=SHALLOW, fusion_mode=mode)
    xs = [jnp.ones((1, 4, 64, 64, 5)), jnp.ones((1, 4, 64, 64, 15))]
    variables = model.init(jax.random.PRNGKey(0), xs, train=False)
    fuse = variables["params"]["blocks_0_fuse"]
    assert "residual_conv" in fuse
    # residual: slow 64 -> fuse_out 80, 1x1x1 with bias (my_slowfast.py:204-213).
    assert fuse["residual_conv"]["kernel"].shape == (1, 1, 1, 64, 80)
    assert "bias" in fuse["residual_conv"]
    if mode == "C123":
        # res_unit bottleneck dims: 80 -> 20 -> 20 -> 80 (my_slowfast.py:228-236).
        assert fuse["res_unit_conv1"]["kernel"].shape == (1, 1, 1, 80, 20)
        assert fuse["res_unit_conv2"]["kernel"].shape == (1, 3, 3, 20, 20)
        assert fuse["res_unit_conv3"]["kernel"].shape == (1, 1, 1, 20, 80)
    else:
        assert "res_unit_conv1" not in fuse
    y = model.apply(variables, xs, train=False)
    assert y.shape == (1, 11)
    assert np.all(np.isfinite(np.asarray(y)))


def test_slowfast_train_mode_updates_batch_stats():
    model = SlowFast(num_classes=11, depths=SHALLOW)
    xs = [jnp.ones((2, 4, 64, 64, 5)) * 0.5, jnp.ones((2, 4, 64, 64, 15)) * 0.5]
    variables = model.init(jax.random.PRNGKey(0), xs, train=False)
    y, mutated = model.apply(
        variables, xs, train=True,
        mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(1)},
    )
    assert y.shape == (2, 11)
    old = variables["batch_stats"]["blocks_0_pathway_0"]["norm"]["mean"]
    new = mutated["batch_stats"]["blocks_0_pathway_0"]["norm"]["mean"]
    assert not np.allclose(np.asarray(old), np.asarray(new))
    assert np.all(np.isfinite(np.asarray(new)))


def test_slowfast_bfloat16_compute():
    model = SlowFast(num_classes=11, depths=SHALLOW, dtype=jnp.bfloat16)
    xs = [jnp.ones((1, 4, 64, 64, 5)), jnp.ones((1, 4, 64, 64, 15))]
    variables = model.init(jax.random.PRNGKey(0), xs, train=False)
    # Params stay float32.
    k = variables["params"]["blocks_0_pathway_0"]["conv"]["kernel"]
    assert k.dtype == jnp.float32
    y = model.apply(variables, xs, train=False)
    assert y.dtype == jnp.float32
    assert np.all(np.isfinite(np.asarray(y)))


def test_init_factories():
    cfg = get_cfg()
    cfg.CHALEARN.NUM_CLASS = 5
    sf = init_my_slowfast(cfg)
    assert sf.num_classes == 5 and sf.fuse is True
    assert sf.dtype == jnp.bfloat16
    assert init_res2d(cfg).num_classes == 5
    assert init_res3d(cfg).num_classes == 5


def test_res2d_structure_and_forward():
    x = jnp.zeros((2, 64, 64, 50))  # T=10 x C=5 stacked into channels (train.py:70-76)
    shapes = _shape_init(ResNet50_2D(num_classes=7), x)
    assert shapes["params"]["conv1"]["kernel"].shape == (7, 7, 50, 64)
    assert shapes["params"]["fc"]["kernel"].shape == (2048, 7)
    assert shapes["params"]["layer1_0"]["downsample_conv"]["kernel"].shape == (1, 1, 64, 256)
    assert "downsample_conv" not in shapes["params"]["layer1_1"]

    model = ResNet50_2D(num_classes=7, depths=SHALLOW)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    y = model.apply(variables, x, train=False)
    assert y.shape == (2, 7)
    assert np.all(np.isfinite(np.asarray(y)))


def test_res3d_structure_and_forward():
    x = jnp.zeros((2, 4, 64, 64, 5))
    shapes = _shape_init(Res3D(num_classes=7), x)
    assert shapes["params"]["stem"]["conv"]["kernel"].shape == (1, 7, 7, 5, 64)
    assert shapes["params"]["proj"]["kernel"].shape == (2048, 7)

    model = Res3D(num_classes=7, depths=SHALLOW)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    y = model.apply(variables, x, train=False)
    assert y.shape == (2, 7)
    assert np.all(np.isfinite(np.asarray(y)))


def test_sparse_model_matches_reference_semantics():
    """SparseModel einsum == per-class Linear(P->1) loop (train_sparse.py:97-105)."""
    n, p_parts, c = 4, 5, 9
    model = SparseModel(num_class=c, num_part=p_parts)
    x = jnp.asarray(np.random.RandomState(0).rand(n, p_parts, c).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    y = np.asarray(model.apply(variables, x))
    w = np.asarray(variables["params"]["weight"])
    b = np.asarray(variables["params"]["bias"])
    want = np.zeros((n, c), np.float32)
    for ci in range(c):
        want[:, ci] = np.asarray(x)[:, :, ci] @ w[ci] + b[ci]
    np.testing.assert_allclose(y, want, rtol=1e-5, atol=1e-6)


def test_space_to_depth_stem_matches_strided_conv():
    """SpaceToDepthConv == the (1,7,7)/(1,2,2) strided conv it replaces, on
    even and odd spatial sizes, with the canonical (1,7,7,Cin,Cout) param."""
    from video_classification_tpu.models.layers import SpaceToDepthConv

    rng = np.random.RandomState(0)
    for h, w in [(32, 32), (16, 24), (17, 24)]:
        x = jnp.asarray(rng.randn(2, 3, h, w, 15).astype(np.float32))
        m = SpaceToDepthConv(8)
        v = m.init(jax.random.PRNGKey(0), x)
        assert v["params"]["kernel"].shape == (1, 7, 7, 15, 8)
        got = m.apply(v, x)
        want = jax.lax.conv_general_dilated(
            x, v["params"]["kernel"], (1, 2, 2), [(0, 0), (3, 3), (3, 3)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-5)


def test_slowfast_accepts_prepacked_s2d_input():
    """Forward on s2d-prepacked pathway inputs == forward on plain inputs
    (same variables): the crop matmul emits the stem's packed layout
    directly (ops/image.random_crop_batch_mxu space_to_depth=True)."""
    from video_classification_tpu.models.slowfast import SlowFast

    model = SlowFast(num_classes=5, input_channels=(5, 15),
                     depths=SHALLOW, head_pool_kernels=((2, 2, 2), (2, 2, 2)))
    rng = np.random.RandomState(3)
    xs = [jnp.asarray(rng.randn(2, 4, 32, 32, 5).astype(np.float32)),
          jnp.asarray(rng.randn(2, 4, 32, 32, 15).astype(np.float32))]

    def pack(x):
        n, t, h, w, c = x.shape
        return x.reshape(n, t, h // 2, 2, w // 2, 2, c).transpose(
            0, 1, 2, 4, 3, 5, 6).reshape(n, t, h // 2, w // 2, 4 * c)

    variables = model.init(jax.random.PRNGKey(0), xs, train=False)
    want = np.asarray(model.apply(variables, xs, train=False))
    got = np.asarray(model.apply(variables, [pack(x) for x in xs], train=False))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_slowfast_packed_fast_pathway_matches_unpacked():
    """pack_fast=True (fast stages in the 2x2 s2d domain, layers.PackedConv3d +
    grouped-stat BN) == pack_fast=False: identical variable tree, same forward
    up to float reassociation, same batch-stats updates."""
    from video_classification_tpu.models.slowfast import SlowFast

    kw = dict(num_classes=5, input_channels=(5, 15),
              depths=SHALLOW, head_pool_kernels=((2, 2, 2), (2, 2, 2)))
    rng = np.random.RandomState(4)
    xs = [jnp.asarray(rng.randn(2, 4, 16, 16, 5).astype(np.float32)),
          jnp.asarray(rng.randn(2, 4, 16, 16, 15).astype(np.float32))]
    m0 = SlowFast(pack_fast=False, **kw)
    m1 = SlowFast(pack_fast=True, **kw)
    v = m0.init(jax.random.PRNGKey(0), xs, train=False)
    v1 = m1.init(jax.random.PRNGKey(0), xs, train=False)
    assert jax.tree.map(lambda a: a.shape, v) == jax.tree.map(lambda a: a.shape, v1)
    # eval forward
    want = np.asarray(m0.apply(v, xs, train=False))
    got = np.asarray(m1.apply(v, xs, train=False))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    # train forward + batch stats
    want_t, ws = m0.apply(v, xs, train=True, mutable=["batch_stats"],
                          rngs={"dropout": jax.random.PRNGKey(1)})
    got_t, gs = m1.apply(v, xs, train=True, mutable=["batch_stats"],
                         rngs={"dropout": jax.random.PRNGKey(1)})
    np.testing.assert_allclose(np.asarray(got_t), np.asarray(want_t),
                               rtol=1e-4, atol=1e-4)
    for a, b in zip(jax.tree.leaves(ws), jax.tree.leaves(gs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)

    # gradient parity (params): same loss surface either way
    def loss(mod, params):
        out, _ = mod.apply({"params": params, "batch_stats": v["batch_stats"]},
                           xs, train=True, mutable=["batch_stats"],
                           rngs={"dropout": jax.random.PRNGKey(1)})
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g0 = jax.grad(lambda p: loss(m0, p))(v["params"])
    g1 = jax.grad(lambda p: loss(m1, p))(v["params"])
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        # f32 reassociation through a deep net; grads are O(1-10)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-3)


def test_packed_stage_odd_cell_count_falls_back():
    """With spatial_stride=2 and H % 4 != 0, the packed path would emit one
    extra output row vs the unpacked conv (stride-2 packed conv rounds the odd
    cell count up); the guard must fall back to unpacked and match shapes."""
    from video_classification_tpu.models.slowfast import ResStage

    x = jnp.asarray(np.random.RandomState(0).randn(1, 2, 18, 18, 8).astype(np.float32))
    kw = dict(depth=1, dim_inner=8, dim_out=32, conv_a_kernel=(3, 1, 1),
              spatial_stride=2)
    ref = ResStage(packed=False, **kw)
    v = ref.init(jax.random.PRNGKey(0), x, train=False)
    want = ref.apply(v, x, train=False)
    got = ResStage(packed=True, **kw).apply(v, x, train=False)
    assert got.shape == want.shape == (1, 2, 9, 9, 32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
