"""Block-level torch numeric parity for the SlowFast trunk and the DensePose
backbone (VERDICT r3 item 4).

torch 2.x (cpu) is installed, so hand-built torch replicas of the exact
configured reference blocks are feasible without pytorchvideo/detectron2:

  * SlowFast stem — `create_res_basic_stem` as configured at
    /root/reference/model/my_slowfast.py:63-68: Conv3d (1,7,7)/(1,2,2)/pad
    (0,3,3) no-bias -> BN -> ReLU -> MaxPool3d (1,3,3)/(1,2,2)/pad (0,1,1).
    This additionally pins the SpaceToDepthConv reformulation (stride-2 conv
    re-expressed over a 2x2 space-to-depth packing) against the plain torch
    strided conv, through the weight converter.
  * SlowFast res stage — `create_res_stage`/`create_bottleneck_block` as
    configured at my_slowfast.py:69-75: branch1 1x1x1 projection on block 0,
    bottleneck conv_a (temporal k)/conv_b (1,3,3) spatial-stride/conv_c,
    ReLU(branch1 + branch2). Both slow-stage conv_a variants ((1,1,1) stages
    1-2, (3,1,1) stages 3-4) are covered.
  * DensePose ResNet-FPN backbone — detectron2 `build_resnet_fpn_backbone`
    for the R_50/101_FPN_DL family (/root/reference/chalearn_padded_to_iuv.py:
    25-26): caffe2 stride-in-1x1 bottlenecks, FrozenBN, nearest top-down FPN,
    LastLevelMaxPool P6. The FULL backbone (every stage + every FPN level) is
    compared, weights flowing through d2_convert's synthesized state_dict.

All comparisons run converted weights: torch state_dict -> converter -> flax
apply, so a layout or key-grammar bug shows as O(1) error, not ~1e-3 (conv
accumulation-order noise between oneDNN and XLA).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from video_classification_tpu.detect.d2_convert import (
    d2_to_flax, synthesize_state_dict)
from video_classification_tpu.detect.densepose import ResNetFPN
from video_classification_tpu.models import torch_to_flax
from video_classification_tpu.models.slowfast import ResBasicStem, ResStage


def _randomize_bn(*mods):
    with torch.no_grad():
        for m in mods:
            for sub in m.modules():
                if isinstance(sub, (nn.BatchNorm2d, nn.BatchNorm3d)):
                    sub.running_mean.normal_(0, 0.5)
                    sub.running_var.uniform_(0.5, 1.5)
                    sub.weight.normal_(1, 0.2)
                    sub.bias.normal_(0, 0.2)


def test_slowfast_stem_matches_torch():
    """Torch stem (exact my_slowfast.py:63-68 config) == ResBasicStem with
    converted weights — including the space-to-depth stride-2 reformulation."""
    torch.manual_seed(0)
    cin, cout = 5, 8

    class TorchStem(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv = nn.Conv3d(cin, cout, (1, 7, 7), stride=(1, 2, 2),
                                  padding=(0, 3, 3), bias=False)
            self.norm = nn.BatchNorm3d(cout)
            self.pool = nn.MaxPool3d((1, 3, 3), stride=(1, 2, 2),
                                     padding=(0, 1, 1))

        def forward(self, x):
            return self.pool(torch.relu(self.norm(self.conv(x))))

    tm = TorchStem().eval()
    _randomize_bn(tm)
    x = torch.randn(2, cin, 4, 16, 16)
    with torch.no_grad():
        want = tm(x).numpy()

    prefix = "blocks.0.multipathway_blocks.0."
    sd = {prefix + k: v.numpy() for k, v in tm.state_dict().items()}
    variables = torch_to_flax(sd, arch="slowfast")
    p = variables["params"]["blocks_0_pathway_0"]
    s = variables["batch_stats"]["blocks_0_pathway_0"]

    model = ResBasicStem(cout, in_channels=cin)
    x_jax = jnp.asarray(x.numpy().transpose(0, 2, 3, 4, 1))  # NCTHW -> NTHWC
    y = model.apply({"params": p, "batch_stats": s}, x_jax, False)
    got = np.asarray(y).transpose(0, 4, 1, 2, 3)
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=5e-3)


@pytest.mark.parametrize("conv_a_kernel", [(1, 1, 1), (3, 1, 1)])
def test_slowfast_stage_matches_torch(conv_a_kernel):
    """Torch replica of the configured create_res_stage (depth 2, spatial
    stride 2, branch1 projection on block 0) == ResStage, converted weights."""
    torch.manual_seed(1)
    dim_in, dim_inner, dim_out, depth, stride = 8, 4, 16, 2, 2
    ka = conv_a_kernel

    class TorchBottleneck(nn.Module):
        def __init__(self, cin, s):
            super().__init__()
            self.conv_a = nn.Conv3d(cin, dim_inner, ka,
                                    padding=tuple(k // 2 for k in ka), bias=False)
            self.norm_a = nn.BatchNorm3d(dim_inner)
            self.conv_b = nn.Conv3d(dim_inner, dim_inner, (1, 3, 3),
                                    stride=(1, s, s), padding=(0, 1, 1), bias=False)
            self.norm_b = nn.BatchNorm3d(dim_inner)
            self.conv_c = nn.Conv3d(dim_inner, dim_out, 1, bias=False)
            self.norm_c = nn.BatchNorm3d(dim_out)

        def forward(self, x):
            x = torch.relu(self.norm_a(self.conv_a(x)))
            x = torch.relu(self.norm_b(self.conv_b(x)))
            return self.norm_c(self.conv_c(x))

    class TorchResBlock(nn.Module):
        def __init__(self, cin, s, project):
            super().__init__()
            if project:
                self.branch1_conv = nn.Conv3d(cin, dim_out, 1,
                                              stride=(1, s, s), bias=False)
                self.branch1_norm = nn.BatchNorm3d(dim_out)
            self.branch2 = TorchBottleneck(cin, s)
            self.project = project

        def forward(self, x):
            shortcut = (self.branch1_norm(self.branch1_conv(x))
                        if self.project else x)
            return torch.relu(shortcut + self.branch2(x))

    class TorchStage(nn.Module):
        def __init__(self):
            super().__init__()
            self.res_blocks = nn.ModuleList(
                [TorchResBlock(dim_in if j == 0 else dim_out,
                               stride if j == 0 else 1, j == 0)
                 for j in range(depth)])

        def forward(self, x):
            for blk in self.res_blocks:
                x = blk(x)
            return x

    tm = TorchStage().eval()
    _randomize_bn(tm)
    x = torch.randn(2, dim_in, 4, 8, 8)
    with torch.no_grad():
        want = tm(x).numpy()

    prefix = "blocks.2.multipathway_blocks.0."
    sd = {prefix + k: v.numpy() for k, v in tm.state_dict().items()}
    variables = torch_to_flax(sd, arch="slowfast")
    p = variables["params"]["blocks_2_pathway_0"]
    s = variables["batch_stats"]["blocks_2_pathway_0"]

    model = ResStage(depth, dim_inner, dim_out, ka, spatial_stride=stride)
    x_jax = jnp.asarray(x.numpy().transpose(0, 2, 3, 4, 1))
    y = model.apply({"params": p, "batch_stats": s}, x_jax, False)
    got = np.asarray(y).transpose(0, 4, 1, 2, 3)
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=5e-3)


class _TorchD2Bottleneck(nn.Module):
    """detectron2 caffe2-style bottleneck: stride lives on the FIRST 1x1."""

    def __init__(self, cin, inner, cout, stride, shortcut):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, inner, 1, stride=stride, bias=False)
        self.bn1 = nn.BatchNorm2d(inner)
        self.conv2 = nn.Conv2d(inner, inner, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(inner)
        self.conv3 = nn.Conv2d(inner, cout, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(cout)
        if shortcut:
            self.shortcut = nn.Conv2d(cin, cout, 1, stride=stride, bias=False)
            self.shortcut_norm = nn.BatchNorm2d(cout)
        self.has_shortcut = shortcut

    def forward(self, x):
        s = self.shortcut_norm(self.shortcut(x)) if self.has_shortcut else x
        y = torch.relu(self.bn1(self.conv1(x)))
        y = torch.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return torch.relu(s + y)


class _TorchResNetFPN(nn.Module):
    """detectron2 build_resnet_fpn_backbone replica (R-50, FrozenBN as eval BN)."""

    def __init__(self, depths=(3, 4, 6, 3)):
        super().__init__()
        self.stem_conv = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.stem_norm = nn.BatchNorm2d(64)
        stages = []
        cin, inner, cout = 64, 64, 256
        for stage, d in enumerate(depths):
            blocks = []
            for j in range(d):
                stride = 2 if (stage > 0 and j == 0) else 1
                blocks.append(_TorchD2Bottleneck(
                    cin if j == 0 else cout, inner, cout, stride, j == 0))
            stages.append(nn.ModuleList(blocks))
            cin, inner, cout = cout, inner * 2, cout * 2
        self.stages = nn.ModuleList(stages)
        self.laterals = nn.ModuleList(
            [nn.Conv2d(256 * 2 ** i, 256, 1) for i in range(4)])
        self.outputs = nn.ModuleList(
            [nn.Conv2d(256, 256, 3, padding=1) for _ in range(4)])

    def forward(self, x):
        x = F.max_pool2d(torch.relu(self.stem_norm(self.stem_conv(x))),
                         3, stride=2, padding=1)
        cs = []
        for blocks in self.stages:
            for blk in blocks:
                x = blk(x)
            cs.append(x)
        laterals = [lat(c) for lat, c in zip(self.laterals, cs)]
        ps = [laterals[-1]]
        for lat in laterals[-2::-1]:
            ps.insert(0, lat + F.interpolate(ps[0], scale_factor=2,
                                             mode="nearest"))
        ps = [out(p) for out, p in zip(self.outputs, ps)]
        ps.append(F.max_pool2d(ps[-1], 1, stride=2))
        return ps  # [P2..P6]

    def load_d2(self, sd):
        """Load a detectron2-grammar state_dict (d2_convert.d2_key_shapes)."""
        t = lambda a: torch.from_numpy(np.asarray(a))
        with torch.no_grad():
            self.stem_conv.weight.copy_(t(sd["backbone.bottom_up.stem.conv1.weight"]))
            _load_bn(self.stem_norm, sd, "backbone.bottom_up.stem.conv1.norm")
            for stage, blocks in enumerate(self.stages):
                for j, blk in enumerate(blocks):
                    p = f"backbone.bottom_up.res{stage + 2}.{j}"
                    for ci in (1, 2, 3):
                        getattr(blk, f"conv{ci}").weight.copy_(
                            t(sd[f"{p}.conv{ci}.weight"]))
                        _load_bn(getattr(blk, f"bn{ci}"), sd, f"{p}.conv{ci}.norm")
                    if blk.has_shortcut:
                        blk.shortcut.weight.copy_(t(sd[f"{p}.shortcut.weight"]))
                        _load_bn(blk.shortcut_norm, sd, f"{p}.shortcut.norm")
            for i in range(4):
                self.laterals[i].weight.copy_(
                    t(sd[f"backbone.fpn_lateral{i + 2}.weight"]))
                self.laterals[i].bias.copy_(
                    t(sd[f"backbone.fpn_lateral{i + 2}.bias"]))
                self.outputs[i].weight.copy_(
                    t(sd[f"backbone.fpn_output{i + 2}.weight"]))
                self.outputs[i].bias.copy_(
                    t(sd[f"backbone.fpn_output{i + 2}.bias"]))


def _load_bn(bn, sd, prefix):
    t = lambda a: torch.from_numpy(np.asarray(a))
    bn.weight.copy_(t(sd[f"{prefix}.weight"]))
    bn.bias.copy_(t(sd[f"{prefix}.bias"]))
    bn.running_mean.copy_(t(sd[f"{prefix}.running_mean"]))
    bn.running_var.copy_(t(sd[f"{prefix}.running_var"]))


def test_densepose_backbone_matches_torch():
    """FULL R-50 FPN backbone (every stage + every FPN level + P6) vs a torch
    detectron2 replica, weights flowing through d2_convert. The strongest
    detector-accuracy-parity evidence available under zero egress: a layout,
    stride-in-1x1, upsample, or key-grammar bug in ANY stage/level fails here."""
    sd = synthesize_state_dict(depth=50, seed=3)
    tm = _TorchResNetFPN().eval()
    tm.load_d2(sd)

    x = torch.randn(1, 3, 64, 64)
    with torch.no_grad():
        want = [p.numpy() for p in tm(x)]

    variables = d2_to_flax(sd)
    backbone_vars = {
        "params": variables["params"]["backbone"],
        "batch_stats": variables["batch_stats"]["backbone"],
    }
    model = ResNetFPN(depth=50)
    x_jax = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    got = model.apply(backbone_vars, x_jax, False)
    assert len(got) == len(want) == 5
    for lvl, (g, w) in enumerate(zip(got, want)):
        g = np.asarray(g).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(
            g, w, atol=5e-3, rtol=5e-3, err_msg=f"P{lvl + 2}")
