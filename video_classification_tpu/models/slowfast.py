"""Dual-pathway SlowFast 3D-CNN with the reference's custom lateral fusion.

A from-scratch flax reimplementation of the exact network the reference instantiates
through pytorchvideo's ``create_slowfast`` (`/root/reference/model/my_slowfast.py:44-126`):

  * 2 pathways, ``input_channels=(5, 15)`` — BGR+UV on slow, 5x3-channel optical-flow
    stack on fast (caller `train.py:114`); stem dims (64, 8) => channel reduction 8.
  * ResNet-50 depths (3, 4, 6, 3); stem conv (1,7,7) stride (1,2,2) + max-pool
    (1,3,3)/(1,2,2); slow conv_a kernels ((1,1,1),(1,1,1),(3,1,1),(3,1,1)), fast all
    (3,1,1); conv_b (1,3,3); spatial strides (1,2,2,2); temporal strides all 1
    (`my_slowfast.py:63-75`).
  * Custom ``FuseFastToSlow`` after the stem and stages 1-3 (max_stage_idx=3):
    fast->slow conv (3,1,1) with 2x channel ratio + BN + ReLU + concat — the default
    forward (`my_slowfast.py:334-344`); the alternative 'C123' (concat -> bottleneck
    res_unit -> + 1x1x1-conv residual, :285-308) and 'R' (concat -> + residual,
    :310-332) forwards are selectable via ``fusion_mode``.
  * Head: per-pathway AvgPool3d (4,2,2) stride 1, channel concat (2048+256=2304),
    dropout 0.5, linear projection, global average (pytorchvideo head semantics).

Layout is (N, T, H, W, C); the reference's NCTHW tensors map via a transpose in the
data-prep step. Slow-pathway stage input dims with fusion: 80/320/640/1280
(= dim + dim*2//8); without fusion (MODEL.FUSE=False): 64/256/512/1024.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .layers import (PackedConv3d, SpaceToDepthConv, avg_pool_3d, batch_norm,
                     conv3d, max_pool_3d, pack_2x2, unpack_2x2)

STAGE_DEPTHS_50 = (3, 4, 6, 3)
# pytorchvideo _MODEL_STAGE_DEPTH (my_slowfast.py:129-134).
MODEL_STAGE_DEPTH = {
    18: (1, 1, 1, 1),
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
    152: (3, 8, 36, 3),
}
# conv_a (temporal) kernels per stage: slow pathway, then fast pathway
# (my_slowfast.py:69).
SLOW_CONV_A = ((1, 1, 1), (1, 1, 1), (3, 1, 1), (3, 1, 1))
FAST_CONV_A = ((3, 1, 1), (3, 1, 1), (3, 1, 1), (3, 1, 1))
SPATIAL_STRIDES = (1, 2, 2, 2)
TEMPORAL_STRIDES = (1, 1, 1, 1)


class ResBasicStem(nn.Module):
    """conv(1,7,7)/(1,2,2) -> BN -> ReLU -> max-pool(1,3,3)/(1,2,2).

    Mirrors pytorchvideo ``create_res_basic_stem`` as configured at
    my_slowfast.py:63-68.
    """

    out_channels: int
    in_channels: int | None = None  # set => accepts s2d-prepacked input too
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        # Space-to-depth formulation of the (1,7,7)/(1,2,2) conv: same math,
        # stride-1 in both directions (see layers.SpaceToDepthConv — the
        # strided conv's transposed-conv backward dominated the train step).
        x = SpaceToDepthConv(self.out_channels, in_channels=self.in_channels,
                             name="conv",
                             dtype=self.dtype, param_dtype=self.param_dtype)(x)
        x = batch_norm(train, name="norm", param_dtype=self.param_dtype)(x)
        x = nn.relu(x).astype(self.dtype)
        return max_pool_3d(x, (1, 3, 3), (1, 2, 2), (0, 1, 1))


class BottleneckBlock(nn.Module):
    """conv_a(k_a)/BN/ReLU -> conv_b(1,3,3, spatial stride)/BN/ReLU -> conv_c(1,1,1)/BN.

    pytorchvideo ``create_bottleneck_block`` semantics: temporal stride rides conv_a,
    spatial stride rides conv_b.
    """

    dim_inner: int
    dim_out: int
    conv_a_kernel: Tuple[int, int, int]
    temporal_stride: int = 1
    spatial_stride: int = 1
    packed: bool = False  # compute in the 2x2 s2d domain (layers.PackedConv3d)
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        g = 4 if self.packed else 1

        def conv(features, kernel, strides, name):
            if self.packed:
                return PackedConv3d(features, tuple(kernel), tuple(strides),
                                    name=name, **kw)
            return conv3d(features, kernel, strides, name=name, **kw)

        x = conv(self.dim_inner, self.conv_a_kernel,
                 (self.temporal_stride, 1, 1), "conv_a")(x)
        x = batch_norm(train, name="norm_a", param_dtype=self.param_dtype,
                       phase_groups=g)(x)
        x = nn.relu(x).astype(self.dtype)
        x = conv(self.dim_inner, (1, 3, 3),
                 (1, self.spatial_stride, self.spatial_stride), "conv_b")(x)
        x = batch_norm(train, name="norm_b", param_dtype=self.param_dtype,
                       phase_groups=g)(x)
        x = nn.relu(x).astype(self.dtype)
        x = conv(self.dim_out, (1, 1, 1), (1, 1, 1), "conv_c")(x)
        x = batch_norm(train, name="norm_c", param_dtype=self.param_dtype,
                       phase_groups=g)(x)
        return x


class ResBlock(nn.Module):
    """Residual block: branch1 (1x1x1 projection, only when shape changes) + bottleneck."""

    dim_inner: int
    dim_out: int
    conv_a_kernel: Tuple[int, int, int]
    temporal_stride: int = 1
    spatial_stride: int = 1
    use_branch1: bool = False
    packed: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        shortcut = x
        if self.use_branch1:
            stride = (self.temporal_stride, self.spatial_stride, self.spatial_stride)
            if self.packed:
                shortcut = PackedConv3d(self.dim_out, (1, 1, 1), stride,
                                        name="branch1_conv", dtype=self.dtype,
                                        param_dtype=self.param_dtype)(x)
            else:
                shortcut = conv3d(self.dim_out, (1, 1, 1), stride, name="branch1_conv",
                                  dtype=self.dtype, param_dtype=self.param_dtype)(x)
            shortcut = batch_norm(train, name="branch1_norm",
                                  param_dtype=self.param_dtype,
                                  phase_groups=4 if self.packed else 1)(shortcut)
        branch2 = BottleneckBlock(
            self.dim_inner, self.dim_out, self.conv_a_kernel,
            self.temporal_stride, self.spatial_stride, packed=self.packed,
            dtype=self.dtype, param_dtype=self.param_dtype, name="branch2",
        )(x, train)
        # Residual add + relu stay in the compute dtype: both operands are already
        # bf16 and relu is exact in any dtype, so an f32 round-trip here only
        # doubled the HBM traffic of the largest elementwise op in the model.
        return nn.relu(shortcut + branch2)


class ResStage(nn.Module):
    """Stack of ResBlocks; stride + projection on block 0 only."""

    depth: int
    dim_inner: int
    dim_out: int
    conv_a_kernel: Tuple[int, int, int]
    temporal_stride: int = 1
    spatial_stride: int = 1
    packed: bool = False  # run the whole stage in the 2x2 s2d domain: pack at
    # entry, unpack at exit. Worthwhile when 4*dim_out <= ~256: small-channel
    # (fast-pathway) tensors otherwise pad to the 128-lane tile, wasting up to
    # 16x HBM bytes and MXU occupancy per conv (profiled 1-5 TFLOP/s).
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        # Pack only when the packed cell count stays divisible through the
        # stage's spatial stride: with stride 2 and an odd cell count the
        # strided packed conv rounds up and unpack emits one extra row/col
        # vs the unpacked path (needs H, W % (2 * stride) == 0).
        div = 2 * self.spatial_stride
        packed = self.packed and x.shape[-3] % div == 0 and x.shape[-2] % div == 0
        if packed:
            x = pack_2x2(x)
        for j in range(self.depth):
            x = ResBlock(
                self.dim_inner,
                self.dim_out,
                self.conv_a_kernel,
                temporal_stride=self.temporal_stride if j == 0 else 1,
                spatial_stride=self.spatial_stride if j == 0 else 1,
                use_branch1=(j == 0),
                packed=packed,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"res_block_{j}",
            )(x, train)
        if packed:
            x = unpack_2x2(x, self.dim_out)
        return x


class FuseFastToSlow(nn.Module):
    """Custom lateral fusion (my_slowfast.py:136-344).

    default: fast -> conv(3,1,1, 2x channels) -> BN -> ReLU, concat onto slow.
    C123:    concat -> bottleneck res_unit -> + residual(1x1x1 conv + ReLU on slow).
    R:       concat -> + residual.

    The reference's torch module also *creates* the residual/res_unit parameters in
    default mode but never runs them (no grads => frozen at init); here they are only
    materialized for the modes that use them — behaviorally identical.
    """

    fusion_dim_in: int  # slow channel count entering the fusion
    reduction_ratio: int = 8
    conv_ratio: int = 2
    mode: str = "default"
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool):
        x_s, x_f = xs[0], xs[1]
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        fast_in = self.fusion_dim_in // self.reduction_ratio
        fast_out = fast_in * self.conv_ratio
        fuse_out_channels = self.fusion_dim_in + fast_out

        fuse = conv3d(fast_out, (3, 1, 1), name="conv_fast_to_slow", **kw)(x_f)
        fuse = batch_norm(train, name="norm", param_dtype=self.param_dtype)(fuse)
        fuse = nn.relu(fuse).astype(self.dtype)
        x_s_fuse = jnp.concatenate([x_s, fuse], axis=-1)

        if self.mode == "default":
            return [x_s_fuse, x_f]

        # residual path: 1x1x1 conv (with bias) + ReLU on slow (my_slowfast.py:204-213)
        residual = conv3d(fuse_out_channels, (1, 1, 1), use_bias=True,
                          name="residual_conv", **kw)(x_s)
        residual = nn.relu(residual).astype(self.dtype)

        if self.mode == "C123":
            # res_unit: 1x1x1 -> ReLU -> BN -> 1x3x3 -> ReLU -> BN -> 1x1x1
            # (my_slowfast.py:228-236; note the unconventional ReLU-before-BN order).
            u = conv3d(fuse_out_channels // 4, (1, 1, 1), use_bias=True,
                       name="res_unit_conv1", **kw)(x_s_fuse)
            u = nn.relu(u).astype(self.dtype)
            u = batch_norm(train, name="res_unit_norm1", param_dtype=self.param_dtype)(u)
            u = conv3d(fuse_out_channels // 4, (1, 3, 3), use_bias=True,
                       name="res_unit_conv2", **kw)(u)
            u = nn.relu(u).astype(self.dtype)
            u = batch_norm(train, name="res_unit_norm2", param_dtype=self.param_dtype)(u)
            u = conv3d(fuse_out_channels, (1, 1, 1), use_bias=True,
                       name="res_unit_conv3", **kw)(u)
            x_s_fuse = u

        if self.mode in ("C123", "R"):
            return [(x_s_fuse + residual).astype(self.dtype), x_f]
        raise ValueError(f"unknown fusion mode {self.mode!r}")


class PoolConcatHead(nn.Module):
    """Per-pathway AvgPool3d + concat + dropout + projection + global average.

    pytorchvideo ``PoolConcatPathway`` + ``ResNetBasicHead`` as configured with
    head_pool_kernel_sizes=((4,2,2),(4,2,2)) (my_slowfast.py:75) and dropout 0.5.
    """

    num_classes: int
    pool_kernels: Tuple[Tuple[int, int, int], ...] = ((4, 2, 2), (4, 2, 2))
    dropout_rate: float = 0.5
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool):
        # Clamp windows to the feature extent so tiny inputs stay valid (the
        # reference's crops are always >=64 px, where the window fits untouched).
        kernels = [
            tuple(min(k, d) for k, d in zip(kern, x.shape[1:4]))
            for x, kern in zip(xs, self.pool_kernels)
        ]
        pooled = [avg_pool_3d(x, k) for x, k in zip(xs, kernels)]
        x = jnp.concatenate(pooled, axis=-1)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = nn.Dense(self.num_classes, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="proj")(x)
        # Global average over (T, H, W) -> (N, num_classes).
        return jnp.mean(x.astype(jnp.float32), axis=(1, 2, 3))


class SlowFast(nn.Module):
    """The full network. Input: list of (N, T, H, W, C_p) arrays, one per pathway."""

    num_classes: int
    input_channels: Tuple[int, int] = (5, 15)
    stem_dim_outs: Tuple[int, int] = (64, 8)
    depths: Tuple[int, ...] = STAGE_DEPTHS_50
    fuse: bool = True
    fusion_mode: str = "default"  # cfg.MODEL.FUSION_MODE
    head_pool_kernels: Tuple[Tuple[int, int, int], ...] = ((4, 2, 2), (4, 2, 2))
    dropout_rate: float = 0.5
    remat: bool = False  # jax.checkpoint each stage: trade FLOPs for HBM (cfg.TPU.REMAT)
    remat_policy: str = ""  # "conv": save conv outputs, recompute BN/ReLU only
    pack_fast: bool = True  # run small-channel fast-pathway stages in the 2x2
    # s2d domain (cfg.TPU.PACK_FAST; see ResStage.packed)
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], train: bool = False):
        assert len(xs) == 2, "two pathways (slow, fast)"
        for p, x in enumerate(xs):
            # 4x channels = space-to-depth-prepacked input (half spatial size;
            # ops/image.random_crop_batch_mxu space_to_depth=True).
            assert x.shape[-1] in (self.input_channels[p],
                                   4 * self.input_channels[p]), (
                f"pathway {p}: got {x.shape[-1]} channels, "
                f"expected {self.input_channels[p]} (or 4x prepacked)"
            )
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        slow_dim, fast_dim = self.stem_dim_outs
        reduction = slow_dim // fast_dim  # 8
        # slowfast_conv_channel_fusion_ratio (my_slowfast.py:89): 2 with fusion, 0 without.
        fusion_ratio = 2 if self.fuse else 0

        xs = [x.astype(self.dtype) for x in xs]
        # Block 0: stems + fusion.
        xs = [
            ResBasicStem(self.stem_dim_outs[p],
                         in_channels=self.input_channels[p],
                         name=f"blocks_0_pathway_{p}", **kw)(
                xs[p], train
            )
            for p in range(2)
        ]
        if self.fuse:
            xs = FuseFastToSlow(
                slow_dim, reduction, mode=self.fusion_mode,
                name="blocks_0_fuse", **kw,
            )(xs, train)

        # Blocks 1..4: stages + fusion (fusion after stages 1..3 only:
        # max_stage_idx == 3 in my_slowfast.py:256).
        # With remat, each stage's activations are recomputed in the backward
        # pass instead of living in HBM — larger batches at ~1.3x FLOPs.
        if self.remat:
            # policy="conv" keeps every conv output resident and recomputes
            # only the elementwise BN/ReLU/add chains between convs in the
            # backward pass — a fraction of full-stage recompute cost for most
            # of the peak-HBM relief (the stored-activation count per
            # bottleneck chain drops ~3x: conv/BN/ReLU -> conv only).
            policy = (
                (lambda prim, *_, **__: prim.name == "conv_general_dilated")
                if self.remat_policy == "conv" else None
            )
            Stage = nn.remat(ResStage, static_argnums=(2,), policy=policy)
        else:
            Stage = ResStage
        stage_dim_in = slow_dim       # 64
        stage_dim_out = slow_dim * 4  # 256
        for idx in range(len(self.depths)):
            dims_in_slow = stage_dim_in + stage_dim_in * fusion_ratio // reduction
            del dims_in_slow  # input dim implied by the incoming tensor; kept for clarity
            slow = Stage(
                self.depths[idx],
                dim_inner=stage_dim_out // 4,
                dim_out=stage_dim_out,
                conv_a_kernel=SLOW_CONV_A[idx],
                temporal_stride=TEMPORAL_STRIDES[idx],
                spatial_stride=SPATIAL_STRIDES[idx],
                name=f"blocks_{idx + 1}_pathway_0",
                **kw,
            )(xs[0], train)
            fast = Stage(
                self.depths[idx],
                dim_inner=stage_dim_out // 4 // reduction,
                dim_out=stage_dim_out // reduction,
                conv_a_kernel=FAST_CONV_A[idx],
                temporal_stride=TEMPORAL_STRIDES[idx],
                spatial_stride=SPATIAL_STRIDES[idx],
                packed=self.pack_fast and (stage_dim_out // reduction) * 4 <= 256,
                name=f"blocks_{idx + 1}_pathway_1",
                **kw,
            )(xs[1], train)
            xs = [slow, fast]
            if self.fuse and idx + 1 <= 3:
                xs = FuseFastToSlow(
                    stage_dim_out, reduction, mode=self.fusion_mode,
                    name=f"blocks_{idx + 1}_fuse", **kw,
                )(xs, train)
            stage_dim_in = stage_dim_out
            stage_dim_out = stage_dim_out * 2

        return PoolConcatHead(
            self.num_classes,
            self.head_pool_kernels,
            self.dropout_rate,
            name="head",
            **kw,
        )(xs, train)


def init_my_slowfast(cfg, input_channels=(5, 15), stem_dim_outs=(64, 8)) -> SlowFast:
    """Factory matching the reference entry point `init_my_slowfast`
    (my_slowfast.py:44) — same signature, returns the flax module."""
    return SlowFast(
        num_classes=cfg.CHALEARN.NUM_CLASS,
        input_channels=tuple(input_channels),
        stem_dim_outs=tuple(stem_dim_outs),
        depths=MODEL_STAGE_DEPTH[int(cfg.MODEL.DEPTH)],
        fuse=bool(cfg.MODEL.FUSE),
        fusion_mode=str(cfg.MODEL.FUSION_MODE),
        remat=bool(cfg.TPU.REMAT),
        remat_policy=str(cfg.TPU.REMAT_POLICY),
        pack_fast=bool(cfg.TPU.PACK_FAST),
        dtype=jnp.dtype(cfg.TPU.COMPUTE_DTYPE),
        param_dtype=jnp.dtype(cfg.TPU.PARAM_DTYPE),
    )
