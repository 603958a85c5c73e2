"""Pallas SOR / warp kernels vs the XLA reference paths (interpret on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from video_classification_tpu.ops.flow import (
    FlowParams, _flow_level, _warp, _warp_bilinear, coarse2fine_flow)
from video_classification_tpu.ops.pallas_flow import (
    fits_vmem, fits_vmem_level, fits_vmem_warp, sor_solve_pallas,
    warp_select_shift_pallas)


def test_fits_vmem():
    assert fits_vmem(240, 320)
    assert not fits_vmem(2000, 2000)


def test_sor_kernel_matches_xla_loop():
    """Full flow solve with the Pallas backend (interpret) == XLA backend."""
    rng = np.random.RandomState(0)
    import cv2

    base = cv2.GaussianBlur(rng.rand(40, 48, 3).astype(np.float32), (0, 0), 2.0)
    m = np.float32([[1, 0, 1.5], [0, 1, -1.0]])
    shifted = cv2.warpAffine(base, m, (48, 40), borderMode=cv2.BORDER_REFLECT)

    params_xla = FlowParams(n_outer=2, n_sor=10, backend="xla")
    params_pl = FlowParams(n_outer=2, n_sor=10, backend="pallas_interpret")
    u1, v1 = coarse2fine_flow(jnp.asarray(base[None]), jnp.asarray(shifted[None]), params_xla)
    u2, v2 = coarse2fine_flow(jnp.asarray(base[None]), jnp.asarray(shifted[None]), params_pl)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u2), atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-4, rtol=1e-3)


def test_sor_solve_direct():
    """Direct kernel call solves the linear system it claims to solve."""
    rng = np.random.RandomState(1)
    b, h, w = 2, 16, 24
    a11 = jnp.asarray(1.0 + rng.rand(b, h, w).astype(np.float32))
    a22 = jnp.asarray(1.0 + rng.rand(b, h, w).astype(np.float32))
    a12 = jnp.zeros((b, h, w), jnp.float32)
    b1 = jnp.asarray(rng.randn(b, h, w).astype(np.float32))
    b2 = jnp.asarray(rng.randn(b, h, w).astype(np.float32))
    zeros = jnp.zeros((b, h, w), jnp.float32)
    # No smoothness coupling (all weights 0): closed form du = b1/a11.
    # omega=1.0 (plain Gauss-Seidel) converges in one sweep for the decoupled
    # system; over-relaxation would oscillate toward it instead.
    du, dv = sor_solve_pallas(
        a11, a12, a22, b1, b2, zeros, zeros, zeros, zeros, zeros, zeros,
        8, 0.012, 1.0, True,
    )
    np.testing.assert_allclose(np.asarray(du), np.asarray(b1 / a11), atol=1e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(b2 / a22), atol=1e-4)


def _warp_case(b=2, h=24, w=40, c=3, seed=0, scale=3.0):
    rng = np.random.RandomState(seed)
    im = jnp.asarray(rng.rand(b, h, w, c).astype(np.float32))
    u = jnp.asarray((rng.rand(b, h, w).astype(np.float32) - 0.5) * 2 * scale)
    v = jnp.asarray((rng.rand(b, h, w).astype(np.float32) - 0.5) * 2 * scale)
    return im, u, v


def test_warp_kernel_matches_gather():
    """Select-shift warp == gather warp, bit-for-bit, for in-range flows."""
    im, u, v = _warp_case()
    want = np.asarray(_warp_bilinear(im, u, v))
    got = np.asarray(warp_select_shift_pallas(im, u, v, 4, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=0)
    # Identical association order: exact on matching compiler fma choices.
    assert float(np.abs(got - want).max()) <= 1e-6


def test_warp_kernel_loop_variant_bit_identical():
    """fori_loop/roll kernel == unrolled kernel == gather, bit-for-bit."""
    im, u, v = _warp_case(seed=11)
    want = np.asarray(_warp_bilinear(im, u, v))
    unrolled = np.asarray(
        warp_select_shift_pallas(im, u, v, 4, interpret=True, unroll=True))
    looped = np.asarray(
        warp_select_shift_pallas(im, u, v, 4, interpret=True, unroll=False))
    assert (looped == unrolled).all()
    np.testing.assert_allclose(looped, want, atol=1e-6, rtol=0)


def test_warp_kernel_integer_and_border_flows():
    """Integer displacements (wy = wx = 0) and clamped borders are exact."""
    b, h, w, c = 1, 16, 32, 2
    rng = np.random.RandomState(3)
    im = jnp.asarray(rng.rand(b, h, w, c).astype(np.float32))
    # Constant +3 integer flow pushes the bottom/right edges past the border
    # (the clip + corner-clamp path), plus a -2.0 row to hit the other side.
    u = jnp.full((b, h, w), 3.0, jnp.float32).at[:, :4].set(-2.0)
    v = jnp.full((b, h, w), 3.0, jnp.float32).at[:, :, :6].set(-2.0)
    want = np.asarray(_warp_bilinear(im, u, v))
    got = np.asarray(warp_select_shift_pallas(im, u, v, 3, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=0)


def test_warp_dispatch_out_of_range_falls_back():
    """_warp with the kernel backend routes |flow| > radius to the gather."""
    im, u, v = _warp_case(seed=5, scale=2.0)
    p = FlowParams(warp="shift_interpret", warp_radius=4)
    # In-range: kernel path (exact vs gather).
    got_in = np.asarray(jax.jit(lambda *a: _warp(*a, p))(im, u, v))
    np.testing.assert_allclose(got_in, np.asarray(_warp_bilinear(im, u, v)),
                               atol=1e-6, rtol=0)
    # Out-of-range flow (one pixel at 3x radius): cond must take the gather
    # branch and still be exact.
    u_big = u.at[0, 3, 7].set(12.0)
    got_out = np.asarray(jax.jit(lambda *a: _warp(*a, p))(im, u_big, v))
    np.testing.assert_allclose(
        got_out, np.asarray(_warp_bilinear(im, u_big, v)), atol=1e-6, rtol=0)


def test_warp_cascade_every_tier_exact():
    """Each radius tier of the cascade (and the gather fallback) is exact.

    _warp dispatches on the batch's max |flow| via lax.switch over
    ``warp_tiers + (warp_radius,)`` then the gather; scale the same random
    flow field so its max lands inside tier 2, between 2 and 5, between 5
    and the radius 8, and past the radius — all four branches must equal the
    gather reference bit-for-bit.
    """
    p = FlowParams(warp="shift_interpret", warp_radius=8, warp_tiers=(2, 5))
    im, u, v = _warp_case(seed=9, scale=1.0)  # max |flow| <= 1
    for scale in (1.5, 4.0, 7.0, 30.0):
        us, vs = u * scale, v * scale
        want = np.asarray(_warp_bilinear(im, us, vs))
        got = np.asarray(jax.jit(lambda *a: _warp(*a, p))(im, us, vs))
        np.testing.assert_allclose(got, want, atol=1e-6, rtol=0,
                                   err_msg=f"scale={scale}")


def test_flow_solve_with_shift_warp_matches_gather_warp():
    """Full coarse2fine solve with the kernel warp == gather warp solve."""
    rng = np.random.RandomState(7)
    import cv2

    base = cv2.GaussianBlur(rng.rand(40, 48, 3).astype(np.float32), (0, 0), 2.0)
    m = np.float32([[1, 0, 1.5], [0, 1, -1.0]])
    shifted = cv2.warpAffine(base, m, (48, 40), borderMode=cv2.BORDER_REFLECT)
    p_gather = FlowParams(n_outer=2, n_sor=10, backend="xla", warp="gather")
    p_shift = FlowParams(n_outer=2, n_sor=10, backend="xla",
                         warp="shift_interpret", warp_radius=6)
    u1, v1 = coarse2fine_flow(jnp.asarray(base[None]),
                              jnp.asarray(shifted[None]), p_gather)
    u2, v2 = coarse2fine_flow(jnp.asarray(base[None]),
                              jnp.asarray(shifted[None]), p_shift)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-5)


def test_fits_vmem_warp():
    assert fits_vmem_warp(240, 320, 3)
    assert not fits_vmem_warp(1200, 1600, 3)


def _smooth_pair(h=40, w=48, seed=0):
    rng = np.random.RandomState(seed)
    import cv2

    base = cv2.GaussianBlur(rng.rand(h, w, 3).astype(np.float32), (0, 0), 2.0)
    m = np.float32([[1, 0, 1.5], [0, 1, -1.0]])
    shifted = cv2.warpAffine(base, m, (w, h), borderMode=cv2.BORDER_REFLECT)
    return jnp.asarray(base[None]), jnp.asarray(shifted[None])


def test_fused_level_matches_xla_level():
    """One fully-fused pyramid level (warp+IRLS+SOR in one Pallas program,
    interpret) == the per-op XLA path, on a non-tile-aligned shape so the
    pad-to-(8,128) poison-control paths are exercised."""
    im1, im2 = _smooth_pair()
    u = jnp.zeros((1, 40, 48), jnp.float32)
    v = jnp.zeros_like(u)
    p_off = FlowParams(n_outer=3, n_sor=10, backend="xla", warp="gather",
                       fuse_level="off")
    p_fused = FlowParams(n_outer=3, n_sor=10, fuse_level="interpret")
    u1, v1 = jax.jit(lambda *a: _flow_level(*a, p_off))(im1, im2, u, v)
    u2, v2 = jax.jit(lambda *a: _flow_level(*a, p_fused))(im1, im2, u, v)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u2), atol=1e-4)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-4)


def test_fused_level_nonzero_init_flow():
    """The dynamic warp radius + offset clamp is a no-op for |flow| within
    warp_radius: start from a nonzero flow field (what upsampled coarse levels
    hand in) and require agreement with the gather-warp XLA path."""
    im1, im2 = _smooth_pair(seed=3)
    rng = np.random.RandomState(4)
    u = jnp.asarray((rng.rand(1, 40, 48).astype(np.float32) - 0.5) * 5.0)
    v = jnp.asarray((rng.rand(1, 40, 48).astype(np.float32) - 0.5) * 5.0)
    p_off = FlowParams(n_outer=2, n_sor=10, backend="xla", warp="gather",
                       fuse_level="off")
    p_fused = FlowParams(n_outer=2, n_sor=10, fuse_level="interpret")
    u1, v1 = jax.jit(lambda *a: _flow_level(*a, p_off))(im1, im2, u, v)
    u2, v2 = jax.jit(lambda *a: _flow_level(*a, p_fused))(im1, im2, u, v)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u2), atol=1e-4)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-4)


def test_flow_solve_fused_level_matches():
    """Full coarse2fine with every level fused == the per-op solve."""
    im1, im2 = _smooth_pair(seed=7)
    p_off = FlowParams(n_outer=2, n_sor=10, backend="xla", warp="gather",
                       fuse_level="off")
    p_fused = FlowParams(n_outer=2, n_sor=10, fuse_level="interpret")
    u1, v1 = coarse2fine_flow(im1, im2, p_off)
    u2, v2 = coarse2fine_flow(im1, im2, p_fused)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u2), atol=1e-4)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-4)


def test_fits_vmem_level():
    assert fits_vmem_level(240, 320, 3)
    assert not fits_vmem_level(960, 1280, 3)


def test_fused_level_pair_stacking_bit_identical():
    """Pair-stacked fused kernel (S pairs solved in one program) ==
    unstacked, bit for bit, at outer_tol 0 — including mixed per-pair motion
    (the shared r_dyn/early-exit scalars coarsen to the group max, which must
    only add exact zero terms / fixed-point re-runs)."""
    from video_classification_tpu.ops.pallas_flow import (
        _pick_stack, flow_level_fused_pallas)

    rng = np.random.RandomState(11)
    import cv2

    b, h, w = 4, 24, 40
    im1s, im2s = [], []
    for k in range(b):  # different magnitude per pair: group-max paths hit
        base = cv2.GaussianBlur(rng.rand(h, w, 3).astype(np.float32),
                                (0, 0), 2.0)
        m = np.float32([[1, 0, 0.4 * (k + 1)], [0, 1, -0.3 * k]])
        im1s.append(base)
        im2s.append(cv2.warpAffine(base, m, (w, h),
                                   borderMode=cv2.BORDER_REFLECT))
    im1 = jnp.asarray(np.stack(im1s))
    im2 = jnp.asarray(np.stack(im2s))
    u = jnp.asarray(rng.randn(b, h, w).astype(np.float32) * 0.3)
    v = jnp.asarray(rng.randn(b, h, w).astype(np.float32) * 0.3)

    base_p = FlowParams(n_outer=3, n_sor=8, fuse_outer_tol=0.0)
    assert _pick_stack(b, 24, 128, 3, 0) > 1  # auto really stacks here
    u1, v1, mx1 = flow_level_fused_pallas(
        im1, im2, u, v, base_p._replace(fuse_stack=1), True)
    u2, v2, mx2 = flow_level_fused_pallas(
        im1, im2, u, v, base_p._replace(fuse_stack=0), True)
    assert (np.asarray(u1) == np.asarray(u2)).all()
    assert (np.asarray(v1) == np.asarray(v2)).all()
    # Group mx is the max over each group's pairs: >= the per-pair value.
    assert (np.asarray(mx2) >= np.asarray(mx1) - 1e-6).all()
