"""DensePose R-CNN (``densepose_rcnn_R_101_FPN_DL_s1x``) as one XLA program.

A TPU-native (flax/XLA) counterpart of the detectron2 DensePose R-CNN the
reference shells out to (`chalearn_padded_to_iuv.py:25-26,42-45`). The
architecture mirrors the released model family so its checkpoint
(``model_final_844d15.pkl``) converts weight-for-weight (detect/d2_convert.py):

  * ResNet-101 (stride-in-1x1 bottlenecks, frozen-BN semantics at inference)
    + FPN P2..P5 with a parameter-free P6 max-pool level for the RPN.
  * RPN: shared 3x3 head over 5 levels, anchors 32..512 at ratios (0.5, 1, 2)
    anchored at cell corners (detectron2 offset 0.0), per-level pre-NMS top-k,
    per-level NMS 0.7 (realized as one fixed-trip NMS on level-offset boxes),
    post-NMS top-k overall — the detectron2 test budget (1000/1000) by default.
  * Box head: 7x7 ROIAlign over P2..P5 (FPN level assignment), 2 FC -> person
    score (class 0; background last, detectron2 convention) + class-specific
    box deltas decoded with weights (10, 10, 5, 5); NMS 0.5, score 0.05,
    up to 100 detections.
  * DensePose branch: Panoptic-FPN style Decoder (sum of per-level scale heads
    at stride 4) -> 28x28 ROIAlign on the decoded map -> DeepLab chart head
    (ASPP rates 6/12/56 + 8 GN convs, 512 wide) -> chart predictor (4x4/2
    deconvs to 56 + 2x bilinear to the 112 heatmap) -> per-pixel part labels
    I = argmax(fine) * (argmax(coarse) > 0) and chart-gathered U/V.

Everything — anchors, decode, NMS, ROIAlign, heads — compiles into one XLA
program with static shapes (fixed proposal/detection counts), no host
round-trips. Weight conversion from the released pkl lives in d2_convert.py;
in this zero-egress environment the graph runs from random init (architecture
and contract exercised; accuracy parity needs the converted weights).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..models.layers import batch_norm
from ..models.resnet2d import Bottleneck2d, _conv2d
from .ops import apply_deltas, clip_boxes, multilevel_roi_align, nms, roi_align

NUM_CHARTS = 24  # DensePose body charts 1..24; 0 = background
RESNET_DEPTHS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}

# detectron2 Box2BoxTransform weights (Base-RCNN-FPN defaults).
RPN_DELTA_WEIGHTS = (1.0, 1.0, 1.0, 1.0)
BOX_DELTA_WEIGHTS = (10.0, 10.0, 5.0, 5.0)


def _upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """2x bilinear upsample, align_corners=False (torch F.interpolate parity)."""
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, 2 * h, 2 * w, c), "linear")


class ResNetFPN(nn.Module):
    """ResNet bottleneck backbone + FPN (P2..P5 strides 4..32, P6 max-pool 64).

    detectron2 ``build_resnet_fpn_backbone``: caffe2-style stride-in-1x1
    bottlenecks, nearest top-down upsampling, LastLevelMaxPool P6.
    """

    depth: int = 101
    fpn_channels: int = 256
    stride_in_1x1: bool = True
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        depths = RESNET_DEPTHS[self.depth]
        x = x.astype(self.dtype)
        x = _conv2d(64, (7, 7), (2, 2), name="stem_conv", **kw)(x)
        x = batch_norm(train, name="stem_norm", param_dtype=self.param_dtype)(x)
        x = nn.relu(x).astype(self.dtype)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        cs = []
        dim_inner, dim_out = 64, 256
        for stage, d in enumerate(depths):
            for j in range(d):
                stride = 2 if (stage > 0 and j == 0) else 1
                x = Bottleneck2d(dim_inner, dim_out, stride=stride,
                                 use_downsample=(j == 0),
                                 stride_in_1x1=self.stride_in_1x1,
                                 name=f"res{stage + 2}_{j}", **kw)(x, train)
            cs.append(x)
            dim_inner *= 2
            dim_out *= 2

        # FPN top-down with lateral 1x1s and output 3x3s (biased, detectron2).
        laterals = [
            _conv2d(self.fpn_channels, (1, 1), name=f"fpn_lateral{i + 2}",
                    use_bias=True, **kw)(c)
            for i, c in enumerate(cs)
        ]
        ps = [laterals[-1]]
        for lat in laterals[-2::-1]:
            up = jax.image.resize(ps[0], lat.shape, "nearest")
            ps.insert(0, lat + up)
        ps = [
            _conv2d(self.fpn_channels, (3, 3), name=f"fpn_output{i + 2}",
                    use_bias=True, **kw)(p)
            for i, p in enumerate(ps)
        ]
        p6 = nn.max_pool(ps[-1], (1, 1), strides=(2, 2))  # LastLevelMaxPool
        return ps + [p6]  # [P2..P6], strides [4, 8, 16, 32, 64]


class RPNHead(nn.Module):
    """Shared 3x3 conv -> per-anchor objectness + box deltas (per FPN level)."""

    num_anchors: int = 3
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        conv = _conv2d(feats[0].shape[-1], (3, 3), name="conv", use_bias=True, **kw)
        obj_conv = _conv2d(self.num_anchors, (1, 1), name="objectness",
                           use_bias=True, **kw)
        delta_conv = _conv2d(self.num_anchors * 4, (1, 1), name="deltas",
                             use_bias=True, **kw)
        out = []
        for f in feats:
            t = nn.relu(conv(f)).astype(self.dtype)
            out.append((obj_conv(t), delta_conv(t)))
        return out


class BoxHead(nn.Module):
    """ROI features -> 2 FC -> (class scores, box deltas).

    detectron2 FastRCNNOutputLayers: ``cls`` emits num_classes+1 logits with
    background LAST (person = column 0), ``box`` is class-specific 4-vector.
    """

    hidden: int = 1024
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, rois):  # (N, 7, 7, C)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = rois.reshape(rois.shape[0], -1)
        x = nn.relu(nn.Dense(self.hidden, name="fc1", **kw)(x)).astype(self.dtype)
        x = nn.relu(nn.Dense(self.hidden, name="fc2", **kw)(x)).astype(self.dtype)
        scores = nn.Dense(2, name="cls", **kw)(x)       # (person, bg)
        deltas = nn.Dense(4, name="box", **kw)(x)
        return scores, deltas


class Decoder(nn.Module):
    """DensePose Decoder: Panoptic-FPN semantic head over P2..P5.

    Per level, log2(stride/4) repetitions of [3x3 conv 256 + ReLU (+ 2x bilinear
    upsample when the level is above stride 4)] (at least one conv for P2); the
    per-level outputs are summed and passed through a 1x1 predictor to 256
    channels at stride 4 (densepose roi_head Decoder; DECODER_NUM_CLASSES=256).
    """

    conv_dims: int = 256
    num_classes: int = 256
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):  # [P2..P5]
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        total = None
        for lvl, f in enumerate(feats):
            x = f
            for k in range(max(1, lvl)):
                x = _conv2d(self.conv_dims, (3, 3), name=f"p{lvl + 2}_conv{k}",
                            use_bias=True, **kw)(x)
                x = nn.relu(x).astype(self.dtype)
                if lvl > 0:
                    x = _upsample2x(x)
            total = x if total is None else total + x
        return _conv2d(self.num_classes, (1, 1), name="predictor",
                       use_bias=True, **kw)(total)


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling (DensePose deeplab.py ASPP).

    Five parallel branches on the input: 1x1 conv, three 3x3 convs at the given
    dilation rates, and image-level pooling — each conv bias-free + GroupNorm(32)
    + ReLU — concatenated and projected back with a bias-free 1x1 + ReLU.
    """

    out_channels: int = 256
    rates: Tuple[int, int, int] = (6, 12, 56)
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # (N, H, W, C)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)

        def gn(name):
            return nn.GroupNorm(num_groups=32, epsilon=1e-5,
                                dtype=self.dtype, param_dtype=self.param_dtype,
                                name=name)

        branches = []
        b = _conv2d(self.out_channels, (1, 1), name="aspp_conv1", **kw)(x)
        branches.append(nn.relu(gn("aspp_gn1")(b)).astype(self.dtype))
        for i, r in enumerate(self.rates):
            b = nn.Conv(self.out_channels, (3, 3), padding=((r, r), (r, r)),
                        kernel_dilation=(r, r), use_bias=False,
                        name=f"aspp_conv{i + 2}", **kw)(x)
            branches.append(nn.relu(gn(f"aspp_gn{i + 2}")(b)).astype(self.dtype))
        # Image pooling branch: global average -> 1x1 -> GN -> ReLU -> broadcast.
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        b = _conv2d(self.out_channels, (1, 1), name="aspp_pool_conv", **kw)(pooled)
        b = nn.relu(gn("aspp_pool_gn")(b)).astype(self.dtype)
        branches.append(jnp.broadcast_to(b, branches[0].shape))
        y = jnp.concatenate(branches, axis=-1)
        y = _conv2d(self.out_channels, (1, 1), name="aspp_project", **kw)(y)
        return nn.relu(y).astype(self.dtype)


class DensePoseDeepLabHead(nn.Module):
    """DeepLab chart head: ASPP + 8 stacked 3x3 GN convs, 512 wide.

    DensePose ``DensePoseDeepLabHead`` (deeplab.py): ASPP keeps the input width
    (256 from the Decoder), each stacked conv is bias-free with GroupNorm(32)
    and external ReLU (NONLOCAL off, as in the released DL_s1x config).
    """

    hidden: int = 512
    num_convs: int = 8
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, rois):  # (N, S, S, C)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = ASPP(out_channels=rois.shape[-1], name="ASPP", **kw)(rois)
        for i in range(self.num_convs):
            x = nn.Conv(self.hidden, (3, 3), padding=((1, 1), (1, 1)),
                        use_bias=False, name=f"conv{i + 1}", **kw)(x)
            x = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype,
                             param_dtype=self.param_dtype, name=f"gn{i + 1}")(x)
            x = nn.relu(x).astype(self.dtype)
        return x


class TorchConvTranspose(nn.Module):
    """torch ConvTranspose2d(k=4, s=2, p=1) — exact 2x learned upsampling.

    Expressed as an input-dilated conv: zeros between pixels (lhs_dilation=s),
    pad k-1-p, then cross-correlate. The converter pre-flips the torch kernel
    spatially so this module's HWIO cross-correlation matches torch's adjoint
    convolution bit-for-bit (verified vs torch in tests/test_d2_convert.py).
    """

    features: int
    kernel: int = 4
    stride: int = 2
    pad: int = 1
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # (N, H, W, C) -> (N, s*H, s*W, features)
        k, s, p = self.kernel, self.stride, self.pad
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, k, x.shape[-1], self.features),
            self.param_dtype,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          self.param_dtype)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            window_strides=(1, 1),
            padding=((k - 1 - p, k - 1 - p), (k - 1 - p, k - 1 - p)),
            lhs_dilation=(s, s),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bias.astype(self.dtype)


class ChartPredictor(nn.Module):
    """DensePoseChartPredictor: 4 deconvs + 2x bilinear to the heatmap size.

    Emits coarse fg/bg segmentation (2ch), fine chart logits (25ch) and the
    per-chart U/V fields, each ConvTranspose2d(4, 2, 1)-upsampled from the head
    resolution S to 2S, then interp2d to 4S (HEATMAP_SIZE=112 for S=28).
    """

    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # (N, S, S, 512)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        coarse = TorchConvTranspose(2, name="ann_index_lowres", **kw)(x)
        fine = TorchConvTranspose(NUM_CHARTS + 1, name="index_uv_lowres", **kw)(x)
        u = TorchConvTranspose(NUM_CHARTS + 1, name="u_lowres", **kw)(x)
        v = TorchConvTranspose(NUM_CHARTS + 1, name="v_lowres", **kw)(x)
        return tuple(_upsample2x(t) for t in (coarse, fine, u, v))


def generate_anchors(hw: Tuple[int, int], stride: int, scale: float,
                     ratios=(0.5, 1.0, 2.0)) -> jnp.ndarray:
    """(H*W*A, 4) xyxy anchors for one level.

    detectron2 DefaultAnchorGenerator: cell anchors [-w/2, -h/2, w/2, h/2] with
    w = scale/sqrt(r), h = scale*sqrt(r), shifted by x*stride (offset 0.0 — the
    anchor centers sit on cell corners, not cell centers).
    """
    h, w = hw
    cy = jnp.arange(h, dtype=jnp.float32) * stride
    cx = jnp.arange(w, dtype=jnp.float32) * stride
    anchors = []
    for r in ratios:
        aw = scale * (r ** -0.5)
        ah = scale * (r ** 0.5)
        a = jnp.stack(
            jnp.broadcast_arrays(
                cx[None, :] - aw / 2, cy[:, None] - ah / 2,
                cx[None, :] + aw / 2, cy[:, None] + ah / 2,
            ),
            axis=-1,
        )  # (H, W, 4)
        anchors.append(a)
    return jnp.stack(anchors, axis=2).reshape(-1, 4)  # (H*W*A, 4)


class DensePoseRCNN(nn.Module):
    """End-to-end inference graph. Static proposal/detection counts.

    Defaults are the detectron2 test-time budget of the reference model
    (PRE_NMS_TOPK_TEST=1000/level, POST_NMS_TOPK_TEST=1000,
    DETECTIONS_PER_IMAGE=100, chart pooler 28 -> heatmap 112); shrink them for
    cheap single-person contracts like the ChaLearn stage.
    """

    depth: int = 101
    pre_nms_topk: int = 1000
    post_nms_topk: int = 1000
    max_detections: int = 100
    chart_pooler_size: int = 28
    score_threshold: float = 0.05
    # Run the DensePose chart branch for only the top-K detections (0 = all).
    # NMS keep order is score-descending (detect/ops.nms: greedy argmax), so
    # detections [0:K) ARE the K best — 'charts'/'u'/'v' then have leading
    # dim K while boxes/scores keep max_detections. The chart head is the
    # dominant per-ROI cost (ASPP + 8 512-wide convs, ~30 GFLOP per ROI);
    # both shipped consumers (detect/provider, pipeline/online) use only the
    # best detection's chart, so they set chart_topk=1.
    chart_topk: int = 0
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @property
    def heatmap_size(self) -> int:
        return self.chart_pooler_size * 4  # deconv 2x + interp 2x

    def setup(self):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.backbone = ResNetFPN(depth=self.depth, name="backbone", **kw)
        self.rpn = RPNHead(name="rpn", **kw)
        self.box_head = BoxHead(name="box_head", **kw)
        self.decoder = Decoder(name="decoder", **kw)
        self.densepose_head = DensePoseDeepLabHead(name="densepose_head", **kw)
        self.chart_predictor = ChartPredictor(name="densepose_predictor", **kw)

    def __call__(self, image, train: bool = False):
        """image: (H, W, 3) float32 (BGR, mean-subtracted). Returns detections."""
        h, w = image.shape[:2]
        # detectron2 ImageList.from_tensors pads bottom-right to the backbone's
        # size divisibility (64 with P6) so FPN/decoder 2x up-sums align at any
        # input size; detections are clipped back to the true (h, w) below.
        ph, pw = -h % 64, -w % 64
        if ph or pw:
            image = jnp.pad(image, ((0, ph), (0, pw), (0, 0)))
        feats = self.backbone(image[None], train)  # [P2..P6]
        strides = [4, 8, 16, 32, 64]
        scales = [32.0, 64.0, 128.0, 256.0, 512.0]

        # -- RPN: score anchors, decode, top-k per level, per-level NMS.
        rpn_out = self.rpn(feats)
        all_boxes, all_scores, all_levels = [], [], []
        for lvl, ((obj, deltas), f, stride, scale) in enumerate(
                zip(rpn_out, feats, strides, scales)):
            fh, fw = f.shape[1:3]
            anchors = generate_anchors((fh, fw), stride, scale)
            obj = obj[0].reshape(-1).astype(jnp.float32)
            deltas = deltas[0].reshape(-1, 4).astype(jnp.float32)
            k = min(self.pre_nms_topk, obj.shape[0])
            top_scores, top_idx = jax.lax.top_k(obj, k)
            boxes = apply_deltas(anchors[top_idx], deltas[top_idx],
                                 weights=RPN_DELTA_WEIGHTS)
            all_boxes.append(clip_boxes(boxes, (h, w)))
            all_scores.append(top_scores)
            all_levels.append(jnp.full((k,), lvl, jnp.float32))
        boxes = jnp.concatenate(all_boxes)
        scores = jnp.concatenate(all_scores)
        levels = jnp.concatenate(all_levels)
        # Per-level NMS (detectron2 batched_nms): offset each level's boxes to a
        # disjoint coordinate range so one fixed-trip NMS never crosses levels.
        offset = levels[:, None] * (float(max(h, w)) + 2.0)
        keep_idx, keep_mask = nms(boxes + offset, scores, self.post_nms_topk, 0.7)
        proposals = boxes[keep_idx]
        proposal_mask = keep_mask

        # -- Box head on multi-level ROIAlign over P2..P5.
        rois7 = self._multilevel_roi(feats[:4], proposals, 7)
        cls_scores, box_deltas = self.box_head(rois7)
        # detectron2 convention: background logit is LAST; person = column 0.
        person_prob = jax.nn.softmax(cls_scores.astype(jnp.float32), -1)[:, 0]
        person_prob = jnp.where(proposal_mask, person_prob, 0.0)
        det_boxes = clip_boxes(
            apply_deltas(proposals, box_deltas.astype(jnp.float32),
                         weights=BOX_DELTA_WEIGHTS), (h, w))
        person_prob = jnp.where(person_prob > self.score_threshold,
                                person_prob, 0.0)
        det_idx, det_mask = nms(det_boxes, person_prob, self.max_detections, 0.5)
        final_boxes = det_boxes[det_idx]
        final_scores = person_prob[det_idx]
        det_mask = det_mask & (final_scores > self.score_threshold)

        # -- DensePose branch: decoder map (stride 4) -> chart head on the boxes
        # (top chart_topk only when configured; keep order is score-sorted).
        chart_boxes = final_boxes
        if self.chart_topk and self.chart_topk < final_boxes.shape[0]:
            chart_boxes = final_boxes[: self.chart_topk]
        decoded = self.decoder(feats[:4])
        rois28 = roi_align(decoded[0], chart_boxes, self.chart_pooler_size, 0.25)
        head_out = self.densepose_head(rois28)
        coarse, fine, u, v = self.chart_predictor(head_out)
        coarse = coarse.astype(jnp.float32)
        fine = fine.astype(jnp.float32)
        # ToChartResultConverter: fine label where coarse says foreground.
        fg = (jnp.argmax(coarse, axis=-1) > 0)
        charts = jnp.where(fg, jnp.argmax(fine, axis=-1), 0).astype(jnp.int32)
        hm = self.heatmap_size
        # Per-pixel chart-channel selection as a one-hot dot: the
        # take_along_axis gather this replaces ran at ~2 GB/s on v5e
        # (0.16 ms/frame each for u and v) — a 25-way select is VPU work.
        onehot = (charts[..., None]
                  == jnp.arange(NUM_CHARTS + 1, dtype=jnp.int32))
        u_sel = jnp.sum(jnp.where(onehot, u.astype(jnp.float32), 0.0), axis=-1)
        v_sel = jnp.sum(jnp.where(onehot, v.astype(jnp.float32), 0.0), axis=-1)
        return {
            "boxes": final_boxes,                     # (D, 4) xyxy
            "scores": jnp.where(det_mask, final_scores, 0.0),  # (D,)
            "valid": det_mask,                        # (D,) bool
            # K = chart_topk if set else D; row i belongs to detection i.
            "charts": charts,                         # (K, hm, hm) 0..24
            "u": jnp.clip(u_sel, 0.0, 1.0),           # (K, hm, hm)
            "v": jnp.clip(v_sel, 0.0, 1.0),
        }

    def _multilevel_roi(self, feats, boxes, out_size: int) -> jnp.ndarray:
        """FPN level assignment (Lin et al.: k = k0 + log2(sqrt(wh)/224)):
        each box pools only its assigned level via the flattened-pyramid
        ROIAlign (detect/ops.multilevel_roi_align) — 4x fewer gathered bytes
        than pooling every level and selecting."""
        return multilevel_roi_align(feats, boxes, out_size)
