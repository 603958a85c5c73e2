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


# ---------------------------------------------------------------------------
# Whole-head replicas (VERDICT r4 task 3): with the full-backbone test above,
# these cover every learned weight the converter touches — RPN head, box
# head + predictor, Panoptic-FPN decoder, DeepLab chart head (ASPP + 8 GN
# convs), and the 4-deconv chart predictor. A layout bug inside ASPP's
# dilated/pooled branches or the 112-px upsample chain fails here, not in
# production (/root/reference/chalearn_padded_to_iuv.py:25-26's model).
# ---------------------------------------------------------------------------

from video_classification_tpu.detect.densepose import (  # noqa: E402
    NUM_CHARTS, BoxHead, ChartPredictor, Decoder, DensePoseDeepLabHead,
    RPNHead)


def _t(sd, key):
    return torch.from_numpy(np.asarray(sd[key]))


def test_rpn_head_matches_torch():
    """Shared 3x3 conv + objectness/deltas 1x1s over 5 FPN levels."""
    sd = synthesize_state_dict(depth=50, seed=11)

    class TorchRPN(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv = nn.Conv2d(256, 256, 3, padding=1)
            self.objectness = nn.Conv2d(256, 3, 1)
            self.deltas = nn.Conv2d(256, 12, 1)

        def forward(self, feats):
            out = []
            for f in feats:
                t = torch.relu(self.conv(f))
                out.append((self.objectness(t), self.deltas(t)))
            return out

    tm = TorchRPN().eval()
    rh = "proposal_generator.rpn_head"
    with torch.no_grad():
        tm.conv.weight.copy_(_t(sd, f"{rh}.conv.weight"))
        tm.conv.bias.copy_(_t(sd, f"{rh}.conv.bias"))
        tm.objectness.weight.copy_(_t(sd, f"{rh}.objectness_logits.weight"))
        tm.objectness.bias.copy_(_t(sd, f"{rh}.objectness_logits.bias"))
        tm.deltas.weight.copy_(_t(sd, f"{rh}.anchor_deltas.weight"))
        tm.deltas.bias.copy_(_t(sd, f"{rh}.anchor_deltas.bias"))

    torch.manual_seed(1)
    feats = [torch.randn(1, 256, s, s) for s in (32, 16, 8, 4, 2)]
    with torch.no_grad():
        want = tm(feats)

    variables = d2_to_flax(sd)
    feats_jax = [jnp.asarray(f.numpy().transpose(0, 2, 3, 1)) for f in feats]
    got = RPNHead().apply({"params": variables["params"]["rpn"]}, feats_jax)
    for lvl, ((go, gd), (wo, wd)) in enumerate(zip(got, want)):
        np.testing.assert_allclose(np.asarray(go).transpose(0, 3, 1, 2),
                                   wo.numpy(), atol=2e-4, rtol=2e-4,
                                   err_msg=f"objectness P{lvl + 2}")
        np.testing.assert_allclose(np.asarray(gd).transpose(0, 3, 1, 2),
                                   wd.numpy(), atol=2e-4, rtol=2e-4,
                                   err_msg=f"deltas P{lvl + 2}")


def test_box_head_matches_torch():
    """2-FC box head + cls/box predictors, including the fc1 re-layout from
    torch's flatten(N, C*7*7) (CHW) to flax's NHWC flatten."""
    sd = synthesize_state_dict(depth=50, seed=12)

    class TorchBoxHead(nn.Module):
        def __init__(self):
            super().__init__()
            self.fc1 = nn.Linear(256 * 49, 1024)
            self.fc2 = nn.Linear(1024, 1024)
            self.cls = nn.Linear(1024, 2)
            self.box = nn.Linear(1024, 4)

        def forward(self, x):  # (N, 256, 7, 7)
            x = torch.relu(self.fc1(x.flatten(1)))
            x = torch.relu(self.fc2(x))
            return self.cls(x), self.box(x)

    tm = TorchBoxHead().eval()
    with torch.no_grad():
        tm.fc1.weight.copy_(_t(sd, "roi_heads.box_head.fc1.weight"))
        tm.fc1.bias.copy_(_t(sd, "roi_heads.box_head.fc1.bias"))
        tm.fc2.weight.copy_(_t(sd, "roi_heads.box_head.fc2.weight"))
        tm.fc2.bias.copy_(_t(sd, "roi_heads.box_head.fc2.bias"))
        tm.cls.weight.copy_(_t(sd, "roi_heads.box_predictor.cls_score.weight"))
        tm.cls.bias.copy_(_t(sd, "roi_heads.box_predictor.cls_score.bias"))
        tm.box.weight.copy_(_t(sd, "roi_heads.box_predictor.bbox_pred.weight"))
        tm.box.bias.copy_(_t(sd, "roi_heads.box_predictor.bbox_pred.bias"))

    torch.manual_seed(2)
    rois = torch.randn(5, 256, 7, 7)
    with torch.no_grad():
        want_s, want_d = tm(rois)

    variables = d2_to_flax(sd)
    got_s, got_d = BoxHead().apply(
        {"params": variables["params"]["box_head"]},
        jnp.asarray(rois.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got_s), want_s.numpy(),
                               atol=5e-4, rtol=5e-4)
    np.testing.assert_allclose(np.asarray(got_d), want_d.numpy(),
                               atol=5e-4, rtol=5e-4)


def test_decoder_matches_torch():
    """Panoptic-FPN decoder: per-level conv/relu/upsample chains summed at
    stride 4, then the 1x1 predictor (roi_head Decoder, 256 classes)."""
    sd = synthesize_state_dict(depth=50, seed=13)

    class TorchDecoder(nn.Module):
        def __init__(self):
            super().__init__()
            self.stages = nn.ModuleList()
            for lvl in range(4):
                ops = []
                for _ in range(max(1, lvl)):
                    ops += [nn.Conv2d(256, 256, 3, padding=1), nn.ReLU()]
                    if lvl > 0:
                        ops += [nn.Upsample(scale_factor=2, mode="bilinear",
                                            align_corners=False)]
                self.stages.append(nn.Sequential(*ops))
            self.predictor = nn.Conv2d(256, 256, 1)

        def forward(self, feats):
            total = sum(stage(f) for stage, f in zip(self.stages, feats))
            return self.predictor(total)

    tm = TorchDecoder().eval()
    with torch.no_grad():
        for lvl in range(4):
            convs = [m for m in tm.stages[lvl] if isinstance(m, nn.Conv2d)]
            for k, conv in enumerate(convs):
                d2k = f"roi_heads.decoder.p{lvl + 2}.{2 * k if lvl + 2 > 2 else k}"
                conv.weight.copy_(_t(sd, f"{d2k}.weight"))
                conv.bias.copy_(_t(sd, f"{d2k}.bias"))
        tm.predictor.weight.copy_(_t(sd, "roi_heads.decoder.predictor.weight"))
        tm.predictor.bias.copy_(_t(sd, "roi_heads.decoder.predictor.bias"))

    torch.manual_seed(3)
    feats = [torch.randn(1, 256, s, s) for s in (32, 16, 8, 4)]
    with torch.no_grad():
        want = tm(feats).numpy()

    variables = d2_to_flax(sd)
    feats_jax = [jnp.asarray(f.numpy().transpose(0, 2, 3, 1)) for f in feats]
    got = Decoder().apply({"params": variables["params"]["decoder"]}, feats_jax)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               atol=1e-3, rtol=1e-3)


class _TorchASPP(nn.Module):
    """DensePose deeplab.py ASPP: 1x1 + three dilated 3x3 + image pooling,
    each bias-free conv + GroupNorm(32) + ReLU, concat, 1x1 project + ReLU."""

    def __init__(self, rates=(6, 12, 56)):
        super().__init__()
        self.branch0 = nn.Sequential(nn.Conv2d(256, 256, 1, bias=False),
                                     nn.GroupNorm(32, 256), nn.ReLU())
        self.dilated = nn.ModuleList(
            nn.Sequential(nn.Conv2d(256, 256, 3, padding=r, dilation=r,
                                    bias=False),
                          nn.GroupNorm(32, 256), nn.ReLU()) for r in rates)
        self.pool_conv = nn.Sequential(nn.Conv2d(256, 256, 1, bias=False),
                                       nn.GroupNorm(32, 256), nn.ReLU())
        self.project = nn.Conv2d(5 * 256, 256, 1, bias=False)

    def forward(self, x):
        n, c, h, w = x.shape
        branches = [self.branch0(x)] + [m(x) for m in self.dilated]
        pooled = self.pool_conv(x.mean((2, 3), keepdim=True))
        branches.append(pooled.expand(n, 256, h, w))
        return torch.relu(self.project(torch.cat(branches, 1)))


def test_deeplab_chart_head_matches_torch():
    """FULL DeepLab chart head: ASPP (6/12/56 dilations + pooled branch) + 8
    stacked bias-free GN convs at 512 — where IUV accuracy lives."""
    sd = synthesize_state_dict(depth=50, seed=14)

    class TorchDeepLab(nn.Module):
        def __init__(self):
            super().__init__()
            self.aspp = _TorchASPP()
            self.body = nn.ModuleList()
            for i in range(8):
                cin = 256 if i == 0 else 512
                self.body.append(nn.Sequential(
                    nn.Conv2d(cin, 512, 3, padding=1, bias=False),
                    nn.GroupNorm(32, 512), nn.ReLU()))

        def forward(self, x):
            x = self.aspp(x)
            for m in self.body:
                x = m(x)
            return x

    tm = TorchDeepLab().eval()
    dh = "roi_heads.densepose_head"
    with torch.no_grad():
        tm.aspp.branch0[0].weight.copy_(_t(sd, f"{dh}.ASPP.convs.0.0.weight"))
        tm.aspp.branch0[1].weight.copy_(_t(sd, f"{dh}.ASPP.convs.0.1.weight"))
        tm.aspp.branch0[1].bias.copy_(_t(sd, f"{dh}.ASPP.convs.0.1.bias"))
        for b in range(1, 4):
            tm.aspp.dilated[b - 1][0].weight.copy_(
                _t(sd, f"{dh}.ASPP.convs.{b}.0.weight"))
            tm.aspp.dilated[b - 1][1].weight.copy_(
                _t(sd, f"{dh}.ASPP.convs.{b}.1.weight"))
            tm.aspp.dilated[b - 1][1].bias.copy_(
                _t(sd, f"{dh}.ASPP.convs.{b}.1.bias"))
        tm.aspp.pool_conv[0].weight.copy_(_t(sd, f"{dh}.ASPP.convs.4.1.weight"))
        tm.aspp.pool_conv[1].weight.copy_(_t(sd, f"{dh}.ASPP.convs.4.2.weight"))
        tm.aspp.pool_conv[1].bias.copy_(_t(sd, f"{dh}.ASPP.convs.4.2.bias"))
        tm.aspp.project.weight.copy_(_t(sd, f"{dh}.ASPP.project.0.weight"))
        for i in range(8):
            tm.body[i][0].weight.copy_(
                _t(sd, f"{dh}.body_conv_fcn{i + 1}.weight"))
            tm.body[i][1].weight.copy_(
                _t(sd, f"{dh}.body_conv_fcn{i + 1}.norm.weight"))
            tm.body[i][1].bias.copy_(
                _t(sd, f"{dh}.body_conv_fcn{i + 1}.norm.bias"))

    torch.manual_seed(4)
    rois = torch.randn(2, 256, 28, 28)
    with torch.no_grad():
        want = tm(rois).numpy()

    variables = d2_to_flax(sd)
    got = DensePoseDeepLabHead().apply(
        {"params": variables["params"]["densepose_head"]},
        jnp.asarray(rois.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               atol=2e-3, rtol=2e-3)


def test_chart_predictor_matches_torch():
    """4 ConvTranspose2d(4,2,1) heads + 2x bilinear to the 112-px heatmap."""
    sd = synthesize_state_dict(depth=50, seed=15)

    class TorchPredictor(nn.Module):
        def __init__(self):
            super().__init__()
            self.heads = nn.ModuleDict({
                name: nn.ConvTranspose2d(512, ch, 4, stride=2, padding=1)
                for name, ch in (("ann_index_lowres", 2),
                                 ("index_uv_lowres", NUM_CHARTS + 1),
                                 ("u_lowres", NUM_CHARTS + 1),
                                 ("v_lowres", NUM_CHARTS + 1))})

        def forward(self, x):
            return tuple(
                F.interpolate(self.heads[n](x), scale_factor=2,
                              mode="bilinear", align_corners=False)
                for n in ("ann_index_lowres", "index_uv_lowres",
                          "u_lowres", "v_lowres"))

    tm = TorchPredictor().eval()
    dp = "roi_heads.densepose_predictor"
    with torch.no_grad():
        for name in tm.heads:
            tm.heads[name].weight.copy_(_t(sd, f"{dp}.{name}.weight"))
            tm.heads[name].bias.copy_(_t(sd, f"{dp}.{name}.bias"))

    torch.manual_seed(5)
    x = torch.randn(2, 512, 28, 28)
    with torch.no_grad():
        want = tm(x)

    variables = d2_to_flax(sd)
    got = ChartPredictor().apply(
        {"params": variables["params"]["densepose_predictor"]},
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    for name, g, w in zip(("coarse", "fine", "u", "v"), got, want):
        np.testing.assert_allclose(np.asarray(g).transpose(0, 3, 1, 2),
                                   w.numpy(), atol=1e-3, rtol=1e-3,
                                   err_msg=name)
