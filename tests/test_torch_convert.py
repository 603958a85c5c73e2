"""Weight-converter tests.

Numerical parity is checked against real torch modules (torch-cpu is available):
a Conv3d/BN bottleneck assembled with the reference's layer settings must produce
identical outputs after conversion. Key-grammar coverage is checked by round-tripping
our own models through the torch naming scheme.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn

from video_classification_tpu.models import (
    MISMATCH_LAYERS,
    SlowFast,
    ResNet50_2D,
    delete_mismatch,
    flax_to_torch,
    torch_to_flax,
)
from video_classification_tpu.models.slowfast import BottleneckBlock

SHALLOW = (1, 1, 1, 1)


def test_bottleneck_matches_torch():
    """conv_a/BN/ReLU -> conv_b/BN/ReLU -> conv_c/BN vs torch, converted weights."""
    dim_in, dim_inner, dim_out = 8, 4, 16

    class TorchBottleneck(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv_a = nn.Conv3d(dim_in, dim_inner, (3, 1, 1), padding=(1, 0, 0), bias=False)
            self.norm_a = nn.BatchNorm3d(dim_inner)
            self.conv_b = nn.Conv3d(dim_inner, dim_inner, (1, 3, 3), stride=(1, 2, 2),
                                    padding=(0, 1, 1), bias=False)
            self.norm_b = nn.BatchNorm3d(dim_inner)
            self.conv_c = nn.Conv3d(dim_inner, dim_out, (1, 1, 1), bias=False)
            self.norm_c = nn.BatchNorm3d(dim_out)

        def forward(self, x):
            x = torch.relu(self.norm_a(self.conv_a(x)))
            x = torch.relu(self.norm_b(self.conv_b(x)))
            return self.norm_c(self.conv_c(x))

    tm = TorchBottleneck().eval()
    # Randomize BN stats so eval-mode normalization is non-trivial.
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, nn.BatchNorm3d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.normal_(1, 0.2)
                m.bias.normal_(0, 0.2)

    x = torch.randn(2, dim_in, 4, 8, 8)
    with torch.no_grad():
        want = tm(x).numpy()

    # Convert through the slowfast key grammar by faking the module prefix.
    prefix = "blocks.1.multipathway_blocks.0.res_blocks.0.branch2."
    sd = {prefix + k: v.numpy() for k, v in tm.state_dict().items()}
    variables = torch_to_flax(sd, arch="slowfast")
    bparams = variables["params"]["blocks_1_pathway_0"]["res_block_0"]["branch2"]
    bstats = variables["batch_stats"]["blocks_1_pathway_0"]["res_block_0"]["branch2"]

    model = BottleneckBlock(dim_inner, dim_out, (3, 1, 1), spatial_stride=2)
    x_jax = jnp.asarray(x.numpy().transpose(0, 2, 3, 4, 1))  # NCTHW -> NTHWC
    y = model.apply({"params": bparams, "batch_stats": bstats}, x_jax, False)
    got = np.asarray(y).transpose(0, 4, 1, 2, 3)  # back to NCTHW
    # torch-cpu (oneDNN) and XLA accumulate convs in different orders; a layout
    # or mapping bug would show as O(1) error, not ~1e-3.
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=5e-3)


def test_linear_and_conv2d_layouts():
    tl = nn.Linear(6, 3)
    sd = {"blocks.6.proj.weight": tl.weight.detach().numpy(),
          "blocks.6.proj.bias": tl.bias.detach().numpy()}
    v = torch_to_flax(sd, arch="slowfast")
    k = v["params"]["head"]["proj"]["kernel"]
    assert k.shape == (6, 3)
    x = np.random.RandomState(0).randn(2, 6).astype(np.float32)
    np.testing.assert_allclose(
        x @ k + v["params"]["head"]["proj"]["bias"],
        tl(torch.from_numpy(x)).detach().numpy(),
        atol=1e-6,
    )


def test_delete_mismatch():
    sd = {k: np.zeros(1) for k in MISMATCH_LAYERS}
    sd["blocks.5.something"] = np.zeros(1)
    out = delete_mismatch(dict(sd))
    assert list(out) == ["blocks.5.something"]


def _tree_paths(tree, prefix=()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _tree_paths(v, prefix + (k,))
        else:
            yield prefix + (k,), v


def test_slowfast_roundtrip():
    """flax -> torch keys -> flax must be the identity on the full param tree."""
    model = SlowFast(num_classes=5, depths=SHALLOW)
    xs = [jnp.zeros((1, 4, 64, 64, 5)), jnp.zeros((1, 4, 64, 64, 15))]
    variables = jax.tree.map(
        np.asarray, model.init(jax.random.PRNGKey(0), xs, train=False)
    )
    sd = flax_to_torch(variables, arch="slowfast")
    # Every torch key must parse under the pytorchvideo grammar.
    assert all(k.startswith("blocks.") for k in sd)
    back = torch_to_flax(sd, arch="slowfast")
    for coll in ("params", "batch_stats"):
        want = dict(_tree_paths(variables[coll]))
        got = dict(_tree_paths(back[coll]))
        assert set(want) == set(got), (
            set(want) ^ set(got)
        )
        for path in want:
            np.testing.assert_array_equal(got[path], want[path], err_msg=str(path))


def test_res2d_roundtrip():
    model = ResNet50_2D(num_classes=5, depths=SHALLOW)
    x = jnp.zeros((1, 64, 64, 50))
    variables = jax.tree.map(
        np.asarray, model.init(jax.random.PRNGKey(0), x, train=False)
    )
    sd = flax_to_torch(variables, arch="res2d")
    assert "conv1.weight" in sd and "fc.weight" in sd
    assert "layer1.0.downsample.0.weight" in sd
    back = torch_to_flax(sd, arch="res2d")
    for coll in ("params", "batch_stats"):
        want = dict(_tree_paths(variables[coll]))
        got = dict(_tree_paths(back[coll]))
        assert set(want) == set(got)
        for path in want:
            np.testing.assert_array_equal(got[path], want[path], err_msg=str(path))


def test_fusion_matches_torch_default_and_c123():
    """FuseFastToSlow vs a torch replica of the reference's module
    (my_slowfast.py:136-344), weights converted through the fusion key grammar.
    Covers the default path and C123 (res_unit with its ReLU-before-BN quirk)."""
    from video_classification_tpu.models.slowfast import FuseFastToSlow

    dim_in, ratio, conv_ratio = 16, 8, 2
    fast_in = dim_in // ratio           # 2
    fast_out = fast_in * conv_ratio     # 4
    fuse_out = dim_in + fast_out        # 20

    torch.manual_seed(0)
    conv_f2s = nn.Conv3d(fast_in, fast_out, (3, 1, 1), padding=(1, 0, 0), bias=False)
    norm = nn.BatchNorm3d(fast_out).eval()
    residual = nn.Conv3d(dim_in, fuse_out, 1, bias=True)
    ru_conv1 = nn.Conv3d(fuse_out, fuse_out // 4, 1, bias=True)
    ru_norm1 = nn.BatchNorm3d(fuse_out // 4).eval()
    ru_conv2 = nn.Conv3d(fuse_out // 4, fuse_out // 4, (1, 3, 3),
                         padding=(0, 1, 1), bias=True)
    ru_norm2 = nn.BatchNorm3d(fuse_out // 4).eval()
    ru_conv3 = nn.Conv3d(fuse_out // 4, fuse_out, 1, bias=True)
    with torch.no_grad():
        for m in (norm, ru_norm1, ru_norm2):
            m.running_mean.normal_(0, 0.5)
            m.running_var.uniform_(0.5, 1.5)
            m.weight.normal_(1, 0.2)
            m.bias.normal_(0, 0.2)

    x_s = torch.randn(2, dim_in, 4, 6, 6)
    x_f = torch.randn(2, fast_in, 4, 6, 6)
    with torch.no_grad():
        fuse = torch.relu(norm(conv_f2s(x_f)))
        cat = torch.cat([x_s, fuse], dim=1)
        want_default = cat.numpy()
        res = torch.relu(residual(x_s))
        u = ru_norm1(torch.relu(ru_conv1(cat)))
        u = ru_norm2(torch.relu(ru_conv2(u)))
        u = ru_conv3(u)
        want_c123 = (u + res).numpy()

    prefix = "blocks.1.multipathway_fusion."
    sd = {}
    for k, v in conv_f2s.state_dict().items():
        sd[prefix + "conv_fast_to_slow.0." + k] = v.numpy()
    for k, v in norm.state_dict().items():
        sd[prefix + "norm.0." + k] = v.numpy()
    for k, v in residual.state_dict().items():
        sd[prefix + "residual.0." + k] = v.numpy()
    for idx, mod in (("0", ru_conv1), ("2", ru_norm1), ("3", ru_conv2),
                     ("5", ru_norm2), ("6", ru_conv3)):
        for k, v in mod.state_dict().items():
            sd[prefix + f"res_unit.{idx}." + k] = v.numpy()
    variables = torch_to_flax(sd, arch="slowfast")
    fparams = variables["params"]["blocks_1_fuse"]
    fstats = variables["batch_stats"]["blocks_1_fuse"]

    xs = [jnp.asarray(x_s.numpy().transpose(0, 2, 3, 4, 1)),
          jnp.asarray(x_f.numpy().transpose(0, 2, 3, 4, 1))]

    for mode, want in (("default", want_default), ("C123", want_c123)):
        model = FuseFastToSlow(fusion_dim_in=dim_in, reduction_ratio=ratio,
                               conv_ratio=conv_ratio, mode=mode)
        # default mode materializes no residual/res_unit params: filter them.
        if mode == "default":
            p = {k: v for k, v in fparams.items()
                 if k in ("conv_fast_to_slow", "norm")}
            s = {k: v for k, v in fstats.items() if k == "norm"}
        else:
            p, s = fparams, fstats
        out, _ = model.apply({"params": p, "batch_stats": s}, xs, False)
        got = np.asarray(out).transpose(0, 4, 1, 2, 3)
        np.testing.assert_allclose(got, want, atol=5e-3, rtol=5e-3)
