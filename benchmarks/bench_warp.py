"""Microbench: exact reformulations of the bilinear warp gather on TPU.

The flow solver's warp is the dominant e2e preprocessing cost (622 ms/clip of
gather fusions at 22 GB/s, benchmarks/profile_preprocess.py). The exact
variants here compute the SAME values (v00..v11 bilinear blend with clamped
corners) — only the data movement differs. Run: python benchmarks/bench_warp.py

Round-3 verdict (v5e, chained-in-one-jit measurement — single-call timings are
dispatch-dominated through the tunnel): the flat packed gather IS the floor.
TPU gather throughput is ~150M gathered rows/s for slice widths <= 16 f32
(74M at 24-128; bf16 no faster; batch serializes; near-sequential indices and
mode='promise_in_bounds' don't help), and an exact warp needs one row per
output pixel. packed_flat 2.05 ms / (4,240,320,3); barriers around the gather
change nothing; axis-split gathers and one-hot row matmuls are INEXACT (see
warp_two_pass); select-shift masked accumulation over (2R+2)^2 static shifts
loses already at R=7 (5.0 ms).
"""
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("VCT_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["VCT_PLATFORM"])

B, H, W, C = 4, 240, 320, 3


def corners(u, v, h, w):
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None] + v
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :] + u
    ys = jnp.clip(ys, 0.0, h - 1.0)
    xs = jnp.clip(xs, 0.0, w - 1.0)
    y0 = jnp.minimum(jnp.floor(ys).astype(jnp.int32), h - 2)
    x0 = jnp.minimum(jnp.floor(xs).astype(jnp.int32), w - 2)
    wy = (ys - y0)[..., None]
    wx = (xs - x0)[..., None]
    return y0, x0, wy, wx


def blend(v00, v01, v10, v11, wy, wx):
    return (v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx
            + v10 * wy * (1 - wx) + v11 * wy * wx)


def warp_packed_flat(im, u, v):
    """Current: pack 2x2 corners into channels, one flat H*W gather."""
    b, h, w, c = im.shape
    y0, x0, wy, wx = corners(u, v, h, w)
    right = jnp.concatenate([im[:, :, 1:], im[:, :, -1:]], axis=2)
    down = jnp.concatenate([im[:, 1:], im[:, -1:]], axis=1)
    down_right = jnp.concatenate([right[:, 1:], right[:, -1:]], axis=1)
    packed = jnp.concatenate([im, right, down, down_right], axis=-1)
    flat = (y0 * w + x0).reshape(b, h * w)
    g = jnp.take_along_axis(
        packed.reshape(b, h * w, 4 * c), flat[..., None], axis=1
    ).reshape(b, h, w, 4, c)
    return blend(g[..., 0, :], g[..., 1, :], g[..., 2, :], g[..., 3, :], wy, wx)


def warp_packed_flat_inbounds(im, u, v):
    """Same, with mode='promise_in_bounds' (skip XLA's index clamp)."""
    b, h, w, c = im.shape
    y0, x0, wy, wx = corners(u, v, h, w)
    right = jnp.concatenate([im[:, :, 1:], im[:, :, -1:]], axis=2)
    down = jnp.concatenate([im[:, 1:], im[:, -1:]], axis=1)
    down_right = jnp.concatenate([right[:, 1:], right[:, -1:]], axis=1)
    packed = jnp.concatenate([im, right, down, down_right], axis=-1)
    flat = (y0 * w + x0).reshape(b, h * w)
    g = jnp.take_along_axis(
        packed.reshape(b, h * w, 4 * c), flat[..., None], axis=1,
        mode="promise_in_bounds",
    ).reshape(b, h, w, 4, c)
    return blend(g[..., 0, :], g[..., 1, :], g[..., 2, :], g[..., 3, :], wy, wx)


def _quad(im):
    right = jnp.concatenate([im[:, :, 1:], im[:, :, -1:]], axis=2)
    down = jnp.concatenate([im[:, 1:], im[:, -1:]], axis=1)
    down_right = jnp.concatenate([right[:, 1:], right[:, -1:]], axis=1)
    return jnp.concatenate([im, right, down, down_right], axis=-1)


def warp_two_pass(im, u, v):
    """REFUTED — kept as documentation. Axis-split gathers are NOT equivalent
    to the 2-D gather: the column gather moves the row-gathered value from
    column x0, where the row index was y0[y, x0], not y0[y, x]. (Also slower:
    4.6 vs 2.1 ms/warp.) Same flaw applies to one-hot row matmuls
    (warp_onehot_rows) and any W_y @ im @ W_x^T factorization — per-pixel 2-D
    warps do not separate."""
    b, h, w, c = im.shape
    y0, x0, wy, wx = corners(u, v, h, w)
    quad = _quad(im)                                           # (B,H,W,4C)
    rows = jnp.take_along_axis(quad, y0[..., None], axis=1,
                               mode="promise_in_bounds")
    g = jnp.take_along_axis(rows, x0[..., None], axis=2,
                            mode="promise_in_bounds").reshape(b, h, w, 4, c)
    return blend(g[..., 0, :], g[..., 1, :], g[..., 2, :], g[..., 3, :], wy, wx)


def warp_onehot_rows(im, u, v):
    """REFUTED — see warp_two_pass: the trailing lane gather still fetches the
    row-selected value from column x0 where the one-hot used y0[y, x0]. Also
    slower (2.8 ms/warp) than the flat gather."""
    b, h, w, c = im.shape
    y0, x0, wy, wx = corners(u, v, h, w)
    quad = _quad(im)                                           # (B,H,W,4C)
    sel = (y0[..., None] == jnp.arange(h)[None, None, None, :]).astype(jnp.float32)
    rows = jnp.einsum("byxr,brxc->byxc", sel, quad)
    g = jnp.take_along_axis(rows, x0[..., None], axis=2,
                            mode="promise_in_bounds").reshape(b, h, w, 4, c)
    return blend(g[..., 0, :], g[..., 1, :], g[..., 2, :], g[..., 3, :], wy, wx)


def warp_packed_barrier(im, u, v):
    """packed_flat with optimization barriers isolating the gather: XLA's
    mega-fusion of concat+gather+blend runs the WHOLE warp at gather speed
    (~52 GB/s); barriers let the elementwise legs run at VPU rates and only
    the bare (B, HW, 4C) gather pays the gather penalty."""
    b, h, w, c = im.shape
    y0, x0, wy, wx = corners(u, v, h, w)
    packed = jax.lax.optimization_barrier(_quad(im))
    flat = (y0 * w + x0).reshape(b, h * w)
    g = jnp.take_along_axis(
        packed.reshape(b, h * w, 4 * c), flat[..., None], axis=1,
        mode="promise_in_bounds",
    )
    g = jax.lax.optimization_barrier(g).reshape(b, h, w, 4, c)
    return blend(g[..., 0, :], g[..., 1, :], g[..., 2, :], g[..., 3, :], wy, wx)


def bench(fn, im, u, v, iters=5, chain=20):
    """Chain `chain` dependent warps inside ONE jit — the ~3-5 ms fixed
    dispatch overhead of the axon tunnel otherwise swamps a single warp."""

    @jax.jit
    def chained(im, u, v):
        def body(carry, _):
            out = fn(carry, u, v)
            # Dependent chain (prevents parallel scheduling/DCE); keep values
            # in range so the chain doesn't diverge.
            return out, ()
        out, _ = jax.lax.scan(body, im, None, length=chain)
        return out

    out1 = jax.jit(fn)(im, u, v)
    float(jnp.sum(out1))
    out = chained(im, u, v)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = chained(im, u, v)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / iters / chain * 1e3, out1


def main():
    from video_classification_tpu.ops.pallas_flow import warp_select_shift_pallas

    key = jax.random.PRNGKey(0)
    im = jax.random.uniform(key, (B, H, W, C), jnp.float32)
    # |flow| <= 4.5 so the R=5 Pallas tier is exact too (gather timings are
    # magnitude-independent; the production default radius is 8).
    u = jax.random.uniform(jax.random.PRNGKey(1), (B, H, W), jnp.float32,
                           -4.5, 4.5)
    v = jax.random.uniform(jax.random.PRNGKey(2), (B, H, W), jnp.float32,
                           -4.5, 4.5)

    def pallas_r(radius, unroll):
        def fn(im, u, v):
            return warp_select_shift_pallas(im, u, v, radius, unroll=unroll)
        return fn

    base = None
    for name, fn in [("packed_flat", warp_packed_flat),
                     ("packed_flat_inbounds", warp_packed_flat_inbounds),
                     ("packed_barrier", warp_packed_barrier),
                     ("pallas_loop_r8", pallas_r(8, False)),
                     ("pallas_loop_r5", pallas_r(5, False)),
                     ("pallas_unroll_r5", pallas_r(5, True))]:
        try:
            ms, out = bench(fn, im, u, v)
            if base is None:
                base = out
                err = 0.0
            else:
                err = float(jnp.max(jnp.abs(out - base)))
            print(f"{name:24s} {ms:8.3f} ms  maxerr={err:.2e}")
        except Exception as e:
            print(f"{name:24s} FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
