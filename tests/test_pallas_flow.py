"""Pallas SOR kernel vs the XLA reference loop (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from video_classification_tpu.ops.flow import FlowParams, coarse2fine_flow
from video_classification_tpu.ops.pallas_flow import fits_vmem, sor_solve_pallas


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
