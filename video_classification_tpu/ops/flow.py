"""Coarse-to-fine variational optical flow, batched on device.

Replaces pyflow (Ce Liu's C++ Coarse2Fine solver driven from
`/root/reference/chalearn_video_to_flow.py:21-40`) with a TPU-native formulation of
the same algorithm family:

  * Gaussian pyramid with downsample ``ratio`` (0.75) down to ``min_width`` (20);
  * per level, ``n_outer`` (7) fixed-point relinearizations: bilinear-warp im2 by the
    current flow, robust (Charbonnier) data + smoothness weights (IRLS), then
    ``n_inner`` (1) x ``n_sor`` (30) **red-black SOR** sweeps for the (du, dv)
    increments. Lexicographic SOR is inherently sequential per pixel — the classic
    GPU/TPU reformulation is checkerboard (red-black) ordering, which updates half
    the pixels in parallel per half-sweep and converges equivalently;
  * data term summed over channels, alpha (0.012) weighting the smoothness term.

The parameter surface matches the reference call exactly
(alpha/ratio/min_width/n_outer/n_inner/n_sor, chalearn_video_to_flow.py:27-37). The
solver is fully batched over frame pairs: one jit call computes flow for an entire
clip/video, which is how the pipeline replaces the reference's
multiprocessing.Pool-over-videos CPU fan-out (chalearn_video_to_flow.py:127-128).

``encode_flow_uint8`` reproduces the on-disk encoding bit-for-bit
(chalearn_video_to_flow.py:79-101): U,V clipped to ±5 -> [0,1], magnitude
sqrt((U/5)^2+(V/5)^2)/sqrt(2), all x255 as uint8 (BGR channel order: U, V, mag).
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp



class FlowParams(NamedTuple):
    alpha: float = 0.012
    ratio: float = 0.75
    min_width: int = 20
    n_outer: int = 7
    n_inner: int = 1
    n_sor: int = 30
    omega: float = 1.8        # SOR over-relaxation (Liu's solver uses 1.8)
    eps: float = 1e-6         # Charbonnier epsilon^2
    # SOR backend: 'auto' = Pallas VMEM-resident kernel on TPU when the frame
    # fits the VMEM budget, XLA loop otherwise; 'xla' | 'pallas' |
    # 'pallas_interpret' force a choice (the latter for CPU testing).
    backend: str = "auto"
    # Warp backend: 'auto' = Pallas select-shift kernel on TPU at levels that
    # fit VMEM with min(h, w) >= 64 (95% of warp rows), gather elsewhere;
    # 'gather' forces the XLA gather; 'shift' / 'shift_interpret' force the
    # kernel (the latter interpreted, for CPU testing). The kernel path is a
    # RADIUS CASCADE (lax.switch on the batch's actual max |flow|): the
    # cheapest exact kernel handles the batch — cost scales with
    # (2R+2)^2 selects, so small-motion batches (consecutive raw frames are
    # typically <= 2-3 px apart) run ~7x cheaper than the R=8 tier — and
    # batches exceeding ``warp_radius`` fall back to the gather, so results
    # are exact for ALL inputs (see pallas_flow.warp_select_shift_pallas).
    warp: str = "auto"
    warp_radius: int = 8
    warp_tiers: Tuple[int, ...] = (2, 5)
    # Fused-level backend: 'auto' = run each ENTIRE pyramid level (n_outer x
    # warp+gradients+IRLS+SOR) as one Pallas program on TPU when it fits VMEM
    # and n_inner == 1 — the r4 profile showed ~70% of flow time was warp
    # dispatch (coarse-level gathers, radius-cascade conds) and inter-kernel
    # glue, not compute (benchmarks/profile_preprocess.py). 'off' = per-op
    # path above; 'on' / 'interpret' force the kernel (the latter interpreted,
    # for CPU testing). In-kernel warp offsets clamp at +-warp_radius px (see
    # pallas_flow._flow_level_kernel for why that is outside any golden's or
    # real consecutive-frame footage's range).
    fuse_level: str = "auto"
    # Static warp radius for the fused-level kernel (0 = per-outer dynamic
    # radius). A compile-time radius lets the kernel fully unroll the
    # (2r+2)^2 shift loop — no traced-trip fori_loops (~4.3 us/trip Mosaic
    # floor, benchmarks/probe_roll.py), every roll a single static shuffle.
    # Pairs whose motion ever exceeds the radius (mx_out) are rerun through
    # the dynamic kernel, so results are exact for ALL inputs; within the
    # radius the static kernel is bit-identical to the dynamic one. OFF by
    # default: measured on both the natural-statistics golden (2.3 px) and
    # the bench blob fixture (2.9 px), mid-solve overshoot past the radius
    # triggers enough dynamic reruns that the static tier loses end-to-end
    # (15.5 vs 11.0 ms/pair golden; 7.3 vs 7.0 bench) — see
    # benchmarks/probe_static_warp.py. Kept as an opt-in for small-motion
    # deployments (every shift static, ~40% fewer warp ops per outer).
    fuse_warp_radius: int = 0
    # Outer-loop convergence early exit for the fused kernel (0 = always run
    # n_outer iterations). Stops a level's outer loop once an iteration's
    # max |du, dv| <= this (px). Consumers see the /255-quantized uint8
    # encoding (step ~0.039 px), so iterating far below the step is wasted;
    # 0.005 measured output-IDENTICAL (bit-level uint8) to the full 7 outers
    # on the natural-statistics golden while cutting ~25% of solve time
    # (benchmarks/probe_static_warp.py); golden-gated at
    # tests/test_flow_golden.py.
    fuse_outer_tol: float = 0.005
    # Pair stacking for the fused kernel: small pyramid levels stack S frame
    # pairs on the sublane axis and solve them in ONE program, amortizing the
    # ~4.3 us/trip Mosaic loop floor that otherwise makes a 24x32 level cost
    # nearly as much per pair as 240x320 (pallas_flow._flow_level_kernel,
    # PAIR STACKING). 0 = auto (largest batch divisor that fits VMEM),
    # 1 = off, n = cap at n. DEFAULT OFF: measured on the bench fixture the
    # stacked kernels run at par with unstacked (the per-trip floor scales
    # with the carried-state bytes, so S pairs per trip cost ~S x as much)
    # while costing ~430 s of extra Mosaic compile across the pyramid.
    fuse_stack: int = 1


DEFAULT_PARAMS = FlowParams()


def _gaussian_blur(x: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Separable Gaussian blur over (B, H, W, C)."""
    radius = max(1, int(math.ceil(2.0 * sigma)))
    offsets = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (offsets / sigma) ** 2)
    k = k / jnp.sum(k)

    def blur_axis(v, axis):
        pad = [(0, 0)] * v.ndim
        pad[axis] = (radius, radius)
        vp = jnp.pad(v, pad, mode="edge")
        out = jnp.zeros_like(v)
        for i in range(2 * radius + 1):
            sl = [slice(None)] * v.ndim
            sl[axis] = slice(i, i + v.shape[axis])
            out = out + k[i] * vp[tuple(sl)]
        return out

    return blur_axis(blur_axis(x, 1), 2)


def _resize_bilinear(x: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
    return jax.image.resize(x, (x.shape[0], hw[0], hw[1]) + x.shape[3:], "linear")


def _pyramid_shapes(h: int, w: int, ratio: float, min_width: int):
    """Level shapes, finest first (level 0 = original)."""
    shapes = [(h, w)]
    while True:
        nh, nw = int(round(shapes[-1][0] * ratio)), int(round(shapes[-1][1] * ratio))
        if min(nh, nw) < min_width:
            break
        shapes.append((nh, nw))
    return shapes


def _warp_bilinear(im: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Sample im (B,H,W,C) at (x+u, y+v), clamped to the border.

    TPU formulation: pack each pixel's 2x2 corner patch into the channel dim
    (cheap VPU shifts) and fetch it with ONE contiguous take_along_axis gather
    instead of four arbitrary-index gathers — XLA lowers per-pixel fancy
    indexing to a slow generic gather, which profiling showed dominated the
    whole solver (11.7 ms -> 3.3 ms per (4,240,320,3) warp on v5e).

    This is the measured hardware floor (round 3, benchmarks/bench_warp.py):
    v5e gathers ~150M rows/s regardless of slice width (<=16 f32), dtype, or
    index order, and an exact warp needs one gathered row per output pixel.
    Refuted alternatives: two axis-aligned gathers / one-hot row matmuls are
    NOT equivalent (the composition evaluates y0 at the gathered column:
    y0[y, x0] != y0[y, x]), and (2R+2)^2 select-shift masked accumulation is
    slower than the gather already at R=7 (5.0 vs 3.5 ms/warp).
    """
    b, h, w, c = im.shape
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None] + v
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :] + u
    ys = jnp.clip(ys, 0.0, h - 1.0)
    xs = jnp.clip(xs, 0.0, w - 1.0)
    # Clamp the base corner to h-2/w-2: at the exact border the fractional
    # weight becomes 1 and selects the last row/col — identical to the
    # min(y0+1, h-1) convention.
    y0 = jnp.minimum(jnp.floor(ys).astype(jnp.int32), h - 2)
    x0 = jnp.minimum(jnp.floor(xs).astype(jnp.int32), w - 2)
    wy = (ys - y0)[..., None]
    wx = (xs - x0)[..., None]

    right = jnp.concatenate([im[:, :, 1:], im[:, :, -1:]], axis=2)
    down = jnp.concatenate([im[:, 1:], im[:, -1:]], axis=1)
    down_right = jnp.concatenate([right[:, 1:], right[:, -1:]], axis=1)
    packed = jnp.concatenate([im, right, down, down_right], axis=-1)
    flat = (y0 * w + x0).reshape(b, h * w)
    g = jnp.take_along_axis(
        packed.reshape(b, h * w, 4 * c), flat[..., None], axis=1
    ).reshape(b, h, w, 4, c)
    v00, v01, v10, v11 = g[..., 0, :], g[..., 1, :], g[..., 2, :], g[..., 3, :]
    return (
        v00 * (1 - wy) * (1 - wx)
        + v01 * (1 - wy) * wx
        + v10 * wy * (1 - wx)
        + v11 * wy * wx
    )


def _use_pallas_warp(p: FlowParams, h: int, w: int, c: int) -> bool:
    from .pallas_flow import fits_vmem_warp

    if p.warp in ("shift", "shift_interpret"):
        return True
    if p.warp == "gather":
        return False
    # 'auto': the select-shift kernel wins only where gather rows are
    # plentiful — the finest pyramid levels. Coarse levels (min dim < 64,
    # ~5% of gathered rows) keep the gather.
    return (jax.default_backend() == "tpu" and fits_vmem_warp(h, w, c)
            and min(h, w) >= 64)


def _warp(im: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray,
          p: FlowParams) -> jnp.ndarray:
    """Warp with the fastest exact backend (see FlowParams.warp)."""
    b, h, w, c = im.shape
    if not _use_pallas_warp(p, h, w, c):
        return _warp_bilinear(im, u, v)
    from .pallas_flow import warp_select_shift_pallas

    tiers = tuple(sorted(t for t in p.warp_tiers if t < p.warp_radius))
    tiers = tiers + (p.warp_radius,)
    interpret = p.warp == "shift_interpret"

    def make_kernel(radius):
        return lambda a, uu, vv: warp_select_shift_pallas(
            a, uu, vv, radius, interpret=interpret)

    branches = [make_kernel(r) for r in tiers] + [_warp_bilinear]
    m = jnp.maximum(jnp.max(jnp.abs(u)), jnp.max(jnp.abs(v)))
    # Index of the first tier >= the batch max (== number of tiers exceeded);
    # past the last tier the switch clamps onto the gather fallback.
    idx = sum((m > float(r)).astype(jnp.int32) for r in tiers)
    return jax.lax.switch(idx, branches, im, u, v)


def _grad_xy(im: jnp.ndarray):
    """Central differences with replicated borders over (B,H,W,C)."""
    px = jnp.pad(im, ((0, 0), (0, 0), (1, 1), (0, 0)), mode="edge")
    py = jnp.pad(im, ((0, 0), (1, 1), (0, 0), (0, 0)), mode="edge")
    ix = 0.5 * (px[:, :, 2:] - px[:, :, :-2])
    iy = 0.5 * (py[:, 2:] - py[:, :-2])
    return ix, iy


def _edge_weights(x: jnp.ndarray):
    """(w_up, w_down, w_left, w_right) half-point smoothness weights from phi'."""
    pad = jnp.pad(x, ((0, 0), (1, 1), (1, 1)), mode="edge")
    up = 0.5 * (x + pad[:, :-2, 1:-1])
    down = 0.5 * (x + pad[:, 2:, 1:-1])
    left = 0.5 * (x + pad[:, 1:-1, :-2])
    right = 0.5 * (x + pad[:, 1:-1, 2:])
    # Zero-out weights across the image border (no neighbor there).
    b, h, w = x.shape
    row = jnp.arange(h)[None, :, None]
    col = jnp.arange(w)[None, None, :]
    up = jnp.where(row == 0, 0.0, up)
    down = jnp.where(row == h - 1, 0.0, down)
    left = jnp.where(col == 0, 0.0, left)
    right = jnp.where(col == w - 1, 0.0, right)
    return up, down, left, right


def _weighted_neighbor_apply(f, wu, wd, wl, wr):
    """sum_q w_pq * f_q over the 4-neighborhood (weights live at p)."""
    p = jnp.pad(f, ((0, 0), (1, 1), (1, 1)))
    return (
        wu * p[:, :-2, 1:-1]
        + wd * p[:, 2:, 1:-1]
        + wl * p[:, 1:-1, :-2]
        + wr * p[:, 1:-1, 2:]
    )


def _checkerboard(h: int, w: int) -> jnp.ndarray:
    r = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    return ((r + c) % 2 == 0)[None]  # (1, H, W) bool, True = red


def _use_pallas_sor(p: FlowParams, h: int, w: int) -> bool:
    from .pallas_flow import fits_vmem

    if p.backend in ("pallas", "pallas_interpret"):
        return True
    if p.backend == "xla":
        return False
    return jax.default_backend() == "tpu" and fits_vmem(h, w)


def _use_fused_level(p: FlowParams, h: int, w: int, c: int) -> bool:
    from .pallas_flow import fits_vmem_level

    if p.n_inner != 1:
        return False  # the fused kernel implements the n_inner == 1 case
    if p.fuse_level in ("on", "interpret"):
        return True
    if p.fuse_level != "auto":
        return False
    return jax.default_backend() == "tpu" and fits_vmem_level(h, w, c)


def _flow_level(im1, im2, u, v, p: FlowParams):
    """Refine flow at one pyramid level. im*: (B,H,W,C) float32; u,v: (B,H,W)."""
    b, h, w, _ = im1.shape
    if _use_fused_level(p, h, w, im1.shape[-1]):
        from .pallas_flow import flow_level_fused_pallas

        interpret = p.fuse_level == "interpret"
        r_s = p.fuse_warp_radius
        p_dyn = p._replace(fuse_warp_radius=0)
        if r_s <= 0 or r_s >= p.warp_radius:
            uo, vo, _ = flow_level_fused_pallas(im1, im2, u, v, p,
                                                interpret=interpret)
            return uo, vo

        def dynamic(uv0):
            u0, v0 = uv0
            u_d, v_d, _ = flow_level_fused_pallas(im1, im2, u0, v0, p_dyn,
                                                  interpret=interpret)
            return u_d, v_d

        def static(uv0):
            # Static-radius fast kernel; exact iff each pair's motion stayed
            # within r_s at every outer (pallas_flow._flow_level_kernel).
            # The rare pair whose flow GREW past r_s mid-level reruns through
            # the dynamic kernel (cond skips that program when none did).
            u0, v0 = uv0
            u_s, v_s, mx = flow_level_fused_pallas(im1, im2, u0, v0, p,
                                                   interpret=interpret)
            exceeded = mx > float(r_s)

            def rerun(uv1):
                u_d, v_d = dynamic(uv1)
                keep = exceeded[:, None, None]
                return jnp.where(keep, u_d, u_s), jnp.where(keep, v_d, v_s)

            return jax.lax.cond(jnp.any(exceeded), rerun,
                                lambda _uv: (u_s, v_s), uv0)

        # Pre-dispatch on the INCOMING flow (the coarse-level estimate): a
        # level whose motion already exceeds r_s goes straight to the dynamic
        # kernel instead of paying the static attempt and then rerunning —
        # at the finest levels of large-motion pairs that attempt is pure
        # waste. Within-level growth past r_s is still caught by mx above.
        incoming = jnp.maximum(jnp.max(jnp.abs(u)), jnp.max(jnp.abs(v)))
        return jax.lax.cond(incoming <= float(r_s), static, dynamic, (u, v))
    red = _checkerboard(h, w)

    for _outer in range(p.n_outer):
        warped = _warp(im2, u, v, p)
        ix2, iy2 = _grad_xy(warped)
        ix1, iy1 = _grad_xy(im1)
        ix = 0.5 * (ix1 + ix2)
        iy = 0.5 * (iy1 + iy2)
        it = warped - im1

        du = jnp.zeros_like(u)
        dv = jnp.zeros_like(v)
        for _inner in range(p.n_inner):
            # Robust data weight (IRLS / Charbonnier).
            rho = it + ix * du[..., None] + iy * dv[..., None]
            psi = 1.0 / jnp.sqrt(rho * rho + p.eps)
            a11 = jnp.sum(psi * ix * ix, -1)
            a12 = jnp.sum(psi * ix * iy, -1)
            a22 = jnp.sum(psi * iy * iy, -1)
            b1 = -jnp.sum(psi * ix * it, -1)
            b2 = -jnp.sum(psi * iy * it, -1)

            # Robust smoothness weight on the current total flow.
            ux, uy = _grad_xy((u + du)[..., None])
            vx, vy = _grad_xy((v + dv)[..., None])
            mag = ux[..., 0] ** 2 + uy[..., 0] ** 2 + vx[..., 0] ** 2 + vy[..., 0] ** 2
            phi = 1.0 / jnp.sqrt(mag + p.eps)
            wu_, wd_, wl_, wr_ = _edge_weights(phi)
            wsum = wu_ + wd_ + wl_ + wr_

            # Hoisted across the 30 x 2 half-sweeps: diagonal reciprocals
            # (divide -> multiply) and the constant total-flow smoothness term
            # (neighbor(u) - wsum*u). <= 1 ulp per sweep vs the unhoisted
            # forms; the Pallas kernel makes the identical transformation.
            inv_diag_u = 1.0 / (a11 + p.alpha * wsum)
            inv_diag_v = 1.0 / (a22 + p.alpha * wsum)

            if _use_pallas_sor(p, h, w):
                from .pallas_flow import sor_solve_pallas

                du, dv = sor_solve_pallas(
                    a11, a12, a22, b1, b2, wu_, wd_, wl_, wr_, u, v,
                    p.n_sor, p.alpha, p.omega,
                    interpret=(p.backend == "pallas_interpret"),
                    du0=du, dv0=dv,
                )
            else:
                # total-flow smoothness term: sum w_pq ((u_q+du_q) - u_p),
                # split as (neighbor(u) - wsum*u) + neighbor(du) with the
                # first part constant across sweeps.
                nu_const = _weighted_neighbor_apply(u, wu_, wd_, wl_, wr_) - wsum * u
                nv_const = _weighted_neighbor_apply(v, wu_, wd_, wl_, wr_) - wsum * v

                def half_sweep(du, dv, mask):
                    su = nu_const + _weighted_neighbor_apply(du, wu_, wd_, wl_, wr_)
                    new_du = (b1 - a12 * dv + p.alpha * su) * inv_diag_u
                    du = jnp.where(mask, (1 - p.omega) * du + p.omega * new_du, du)
                    sv = nv_const + _weighted_neighbor_apply(dv, wu_, wd_, wl_, wr_)
                    new_dv = (b2 - a12 * du + p.alpha * sv) * inv_diag_v
                    dv = jnp.where(mask, (1 - p.omega) * dv + p.omega * new_dv, dv)
                    return du, dv

                def sor_body(_, carry):
                    du, dv = carry
                    du, dv = half_sweep(du, dv, red)
                    du, dv = half_sweep(du, dv, ~red)
                    return du, dv

                du, dv = jax.lax.fori_loop(0, p.n_sor, sor_body, (du, dv))

        u = u + du
        v = v + dv
    return u, v


@functools.partial(jax.jit, static_argnums=(2,))
def coarse2fine_flow(
    im1: jnp.ndarray, im2: jnp.ndarray, params: FlowParams = DEFAULT_PARAMS
):
    """Dense flow for a batch of frame pairs.

    im1, im2: (B, H, W, C) float32 in [0, 1] (the reference divides by 255 before
    calling pyflow, chalearn_video_to_flow.py:23-24).
    Returns (u, v): (B, H, W) float32 each, in pixels.
    """
    im1 = im1.astype(jnp.float32)
    im2 = im2.astype(jnp.float32)
    b, h, w, c = im1.shape
    shapes = _pyramid_shapes(h, w, params.ratio, params.min_width)

    # Pyramids, coarsest last; smooth before each downsample.
    sigma = (1.0 / params.ratio - 1.0) + 0.3
    pyr1, pyr2 = [im1], [im2]
    for hw in shapes[1:]:
        pyr1.append(_resize_bilinear(_gaussian_blur(pyr1[-1], sigma), hw))
        pyr2.append(_resize_bilinear(_gaussian_blur(pyr2[-1], sigma), hw))

    ch, cw = shapes[-1]
    u = jnp.zeros((b, ch, cw), jnp.float32)
    v = jnp.zeros((b, ch, cw), jnp.float32)
    for lvl in range(len(shapes) - 1, -1, -1):
        th, tw = shapes[lvl]
        if (u.shape[1], u.shape[2]) != (th, tw):
            scale_x = tw / u.shape[2]
            scale_y = th / u.shape[1]
            u = _resize_bilinear(u[..., None], (th, tw))[..., 0] * scale_x
            v = _resize_bilinear(v[..., None], (th, tw))[..., 0] * scale_y
        u, v = _flow_level(pyr1[lvl], pyr2[lvl], u, v, params)
    return u, v


def encode_flow_uint8(u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """uint8 (B, H, W, 3) flow image: [U, V, magnitude] channels.

    Bit-compatible with chalearn_video_to_flow.py:79-93: U,V clipped to [-5, 5]
    mapped to [0, 1]; magnitude sqrt((U/5)^2 + (V/5)^2)/sqrt(2) clipped to [0, 1];
    all scaled x255 and truncated to uint8 (numpy astype truncates, so no rounding).
    """
    uc = jnp.clip(u, -5.0, 5.0)
    vc = jnp.clip(v, -5.0, 5.0)
    mag = jnp.sqrt(jnp.square(uc / 5.0) + jnp.square(vc / 5.0)) / jnp.sqrt(2.0)
    mag = jnp.clip(mag, 0.0, 1.0)
    f01 = jnp.stack([(uc + 5.0) / 10.0, (vc + 5.0) / 10.0, mag], axis=-1)
    return (f01 * 255.0).astype(jnp.uint8)


def video_flow_uint8(
    frames: jnp.ndarray, params: FlowParams = DEFAULT_PARAMS,
    pair_chunk: int = 0,
) -> jnp.ndarray:
    """Per-frame flow images for a video (T, H, W, C) uint8/float.

    Frame t's flow is computed against frame t-1; frame 0 flows against itself
    (zero motion) — the reference's first-frame convention
    (chalearn_video_to_flow.py:62-66). Returns (T, H, W, 3) uint8.

    ``pair_chunk > 0`` solves the T frame pairs in sequential chunks of that
    size (lax.map) instead of one batch: peak memory for the solver state drops
    from O(T * levels) to O(pair_chunk * levels). Full-resolution (240x320)
    all-pairs programs have crashed the remote TPU worker at batch >= 8 — chunked
    execution keeps the per-program footprint below that regime.
    """
    x = frames.astype(jnp.float32) / 255.0
    prev = jnp.concatenate([x[:1], x[:-1]], axis=0)
    t = x.shape[0]
    if pair_chunk and pair_chunk < t:
        n_chunks = -(-t // pair_chunk)
        pad = n_chunks * pair_chunk - t
        xp = jnp.concatenate([x, jnp.repeat(x[-1:], pad, 0)]) if pad else x
        pp = jnp.concatenate([prev, jnp.repeat(prev[-1:], pad, 0)]) if pad else prev
        xp = xp.reshape((n_chunks, pair_chunk) + x.shape[1:])
        pp = pp.reshape((n_chunks, pair_chunk) + x.shape[1:])
        u, v = jax.lax.map(
            lambda ab: coarse2fine_flow(ab[0], ab[1], params), (pp, xp)
        )
        u = u.reshape((n_chunks * pair_chunk,) + u.shape[2:])[:t]
        v = v.reshape((n_chunks * pair_chunk,) + v.shape[2:])[:t]
    else:
        u, v = coarse2fine_flow(prev, x, params)
    return encode_flow_uint8(u, v)


def flow_energy_filter(
    flow_images: jnp.ndarray, keep_fraction: float = 0.3, min_keep: int = 8
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Select the top-energy frames (chalearn_filter_img_by_flow.py:43-66).

    energy = mean of the flow image's magnitude channel. (The reference's
    ``flow[2]`` indexes *row* 2 instead of the magnitude channel — a bug noted in
    SURVEY.md §2.1; the intent, and what this implements, is the magnitude
    channel.) Keeps max(min_keep, floor(T*keep_fraction)) frames, capped at T.

    Returns (keep_indices sorted ascending, energies). Static output shape:
    keep count is computed from the static T.
    """
    t = flow_images.shape[0]
    num_keep = int(t * keep_fraction)
    num_keep = max(min_keep, num_keep)
    num_keep = min(t, num_keep)
    energy = jnp.mean(flow_images[..., 2].astype(jnp.float32), axis=(1, 2))
    _, top_idx = jax.lax.top_k(energy, num_keep)
    return jnp.sort(top_idx), energy
