"""Schrödinger functional (SF): Wilson gauge action with Dirichlet-in-time
boundaries and the SF running-coupling observable.

Reference: sf_gauge_monomial.c, sf_calc_action.c, sf_observables.c (survey
§2.7 "Schrödinger functional"); physics per Lüscher–Narayanan–Weisz–Wolff
(Nucl.Phys. B384 (1992) 168) and Lüscher–Sommer–Weisz–Wolff SU(3) boundary
fields (Nucl.Phys. B413 (1994) 481), ν-extension per Sint–Sommer.

Setup (lattice units, time extent T = lat.dims[0], spatial extent
L = lat.dims[1] = LY = LZ):

- Spatial links at x0 = 0 are FROZEN to the abelian boundary field
  W_k = exp(i φ/L) (diagonal), and the x0 = T spatial boundary plane holds
  W'_k = exp(i φ'/L).  The stored gauge array keeps its usual periodic shape
  [3,3,4,T,X,Y*Z]; its spatial entries at t = 0 are ignored (replaced by W in
  the action, so `jax.grad` gives them exactly zero force), and the x0 = T
  plane lives outside the array entirely (regenerated from η each call).
- Dynamical: all temporal links U_0(x0), x0 = 0..T-1 (U_0(T-1) connects to
  the upper boundary), and spatial links U_k(x0), x0 = 1..T-1.
- Action: S = β Σ_p w(p) (1 - Re tr P/3) with NO wrap-around in time;
  temporal plaquettes touching a boundary (x0 = 0 and x0 = T-1 slabs) carry
  the improvement weight c_t (tree level c_t = 1), spatial plaquettes in the
  boundary planes x0 ∈ {0, T} carry weight 1/2 (they are constants of the
  abelian boundary field — kept for the weight bookkeeping).

The MD force is `jax.grad` of this action exactly as for the periodic gauge
monomial; freezing needs no mask because the frozen entries never enter the
computation.  Only the momenta must be masked (sf_momenta_mask), so the
kinetic drift does not rotate the frozen slots — see HMCConfig.momenta_mask.

The SF coupling is defined from the η-derivative of the effective action:
⟨∂S/∂η⟩ = k / ḡ², with k fixed by the classical limit ḡ² → g0² = 6/β.
Here ∂S/∂η is one `jax.grad` w.r.t. the boundary parameter — the TPU-native
replacement for the reference's hand-assembled boundary-staple derivative in
sf_observables.c.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from tmlqcd_tpu import su3
from tmlqcd_tpu.lattice import Lattice, shift_full

__all__ = [
    "sf_phases",
    "sf_boundary_links",
    "sf_classical_background",
    "sf_momenta_mask",
    "sf_gauge_action",
    "sf_dS_deta",
    "sf_coupling_normalization",
    "sf_observables",
]


def sf_phases(eta, nu=0.0):
    """SU(3) SF boundary angles (φ, φ') as length-3 arrays (traceless).

    LSWW "point A" with the Sint–Sommer ν parameter:
        φ  = (η - π/3,        η(ν - 1/2),        -η(ν + 1/2) + π/3)
        φ' = (-η - π,   η(ν + 1/2) + π/3,   -η(ν - 1/2) + 2π/3)
    Both sum to zero for all (η, ν); ν = 0 reproduces the one-parameter
    family used for the standard coupling definition.
    """
    pi = np.pi
    phi = jnp.stack(
        [eta - pi / 3.0, eta * (nu - 0.5), -eta * (nu + 0.5) + pi / 3.0]
    )
    phi_p = jnp.stack(
        [-eta - pi, eta * (nu + 0.5) + pi / 3.0, -eta * (nu - 0.5) + 2.0 * pi / 3.0]
    )
    return phi, phi_p


def _diag_u(angles, dtype):
    """exp(i·diag(angles)) as a [3,3] SU(3) matrix."""
    return jnp.diag(jnp.exp(1j * angles.astype(jnp.float64)).astype(dtype))


def sf_boundary_links(lat: Lattice, eta, nu=0.0, dtype=jnp.complex64):
    """(W, W'): the frozen spatial boundary links at x0=0 and x0=T as [3,3]
    diagonal SU(3) matrices, shared by all three spatial directions
    (C_k = iφ/L identical for k = 1,2,3)."""
    el = float(lat.dims[1])
    phi, phi_p = sf_phases(eta, nu)
    return _diag_u(phi / el, dtype), _diag_u(phi_p / el, dtype)


def sf_classical_background(lat: Lattice, eta=0.0, nu=0.0, dtype=jnp.complex64):
    """The induced abelian background field V (the classical minimum):
    V_0 = 1, V_k(x0) = exp(i [(T-x0) φ + x0 φ'] / (L T)) — interpolates W→W'.
    Returns a full periodic-layout gauge array [3,3,4,T,X,Y*Z] whose t=0
    spatial entries hold W (frozen slots)."""
    t_ext, x_ext = lat.dims[0], lat.dims[1]
    el = float(x_ext)
    phi, phi_p = sf_phases(eta, nu)
    x0 = jnp.arange(t_ext, dtype=jnp.float64)[:, None]  # [T,1]
    ang = ((t_ext - x0) * phi[None, :] + x0 * phi_p[None, :]) / (el * t_ext)  # [T,3]
    # diagonal per (t, color): [T,3] angles -> [3,3,T]
    diag = jnp.exp(1j * ang).astype(dtype)  # [T,3]
    vk = jnp.einsum("tc,cd->cdt", diag, jnp.eye(3, dtype=dtype))  # [3,3,T]
    u = jnp.zeros((3, 3, 4) + lat.site_shape, dtype)
    eye = jnp.eye(3, dtype=dtype)[:, :, None, None, None]
    u = u.at[:, :, 0].set(jnp.broadcast_to(eye, (3, 3) + lat.site_shape))
    vk_b = jnp.broadcast_to(vk[:, :, None, :, None, None], (3, 3, 1) + lat.site_shape)
    for k in (1, 2, 3):
        u = u.at[:, :, k : k + 1].set(vk_b)
    return u


def sf_momenta_mask(lat: Lattice) -> jax.Array:
    """[4,T,X,Y*Z] float32 mask: 0 on the frozen dofs (spatial links at
    t = 0), 1 elsewhere.  Multiplied into the momenta after the gaussian
    heatbath (HMCConfig.momenta_mask) so frozen links carry no kinetic term
    and never drift."""
    m = np.ones((4,) + lat.site_shape, np.float32)
    m[1:4, 0] = 0.0
    return jnp.asarray(m)


def _spatial_plaq_sum(uk_ext, k: int, l: int, lat: Lattice):
    """Σ_x Re tr P_{kl}(x) over all T+1 spatial planes of the extended
    spatial-link array uk_ext [3,3,3,T+1,X,Mf], per-slab [T+1] result."""
    v = su3.mul(uk_ext[:, :, k - 1], shift_full(uk_ext[:, :, l - 1], k, +1, lat))
    w = su3.mul(uk_ext[:, :, l - 1], shift_full(uk_ext[:, :, k - 1], l, +1, lat))
    tr = su3.re_trace(su3.mul(v, su3.adj(w)))  # [T+1, X, Mf]
    return jnp.sum(tr.astype(jnp.float64), axis=(1, 2))  # [T+1]


def _sf_action_impl(u, beta, lat: Lattice, eta, nu, ct):
    t_ext = lat.dims[0]
    dtype = u.dtype
    w, wp = sf_boundary_links(lat, eta, nu, dtype)
    vs = lat.dims[1] * lat.mf  # spatial volume X*Y*Z

    # extended spatial links over x0 = 0..T: frozen W | dynamical | frozen W'
    bshape = (3, 3, 3, 1) + lat.site_shape[1:]
    w_b = jnp.broadcast_to(w[:, :, None, None, None, None], bshape)
    wp_b = jnp.broadcast_to(wp[:, :, None, None, None, None], bshape)
    uk_ext = jnp.concatenate([w_b, u[:, :, 1:4, 1:], wp_b], axis=3)  # [3,3,3,T+1,X,Mf]
    u0 = u[:, :, 0]  # [3,3,T,X,Mf]

    # temporal plaquettes P_{0k}(x0), x0 = 0..T-1 (no time wrap):
    #   P = U_0(x) U_k(x+0) [U_k(x) U_0(x+k)]^+
    wt = jnp.asarray(
        np.concatenate([[ct], np.ones(max(t_ext - 2, 0)), [ct]])[:t_ext], jnp.float64
    )
    s_t = jnp.asarray(0.0, jnp.float64)
    for k in (1, 2, 3):
        uk_lo = uk_ext[:, :, k - 1, :t_ext]  # U_k at x0
        uk_hi = uk_ext[:, :, k - 1, 1:]  # U_k at x0+1
        a = su3.mul(u0, uk_hi)
        b = su3.mul(uk_lo, shift_full(u0, k, +1, lat))
        tr = su3.re_trace(su3.mul(a, su3.adj(b)))  # [T, X, Mf]
        per_slab = jnp.sum(tr.astype(jnp.float64), axis=(1, 2))  # [T]
        s_t = s_t + jnp.sum(wt * (vs - per_slab / 3.0))

    # spatial plaquettes, x0 = 0..T: boundary planes weight 1/2
    ws = jnp.asarray(np.concatenate([[0.5], np.ones(t_ext - 1), [0.5]]), jnp.float64)
    s_s = jnp.asarray(0.0, jnp.float64)
    for k, l in ((1, 2), (1, 3), (2, 3)):
        per_slab = _spatial_plaq_sum(uk_ext, k, l, lat)  # [T+1]
        s_s = s_s + jnp.sum(ws * (vs - per_slab / 3.0))

    return beta * (s_t + s_s)


def sf_gauge_action(u, beta, lat: Lattice, eta=0.0, nu=0.0, ct=1.0):
    """S_SF[U; η, ν] (f64 accumulation).  `jax.grad` w.r.t. u is the MD
    force's raw gradient — zero on frozen dofs by construction (reference:
    sf_gauge_monomial.c derivative)."""
    return _sf_action_impl(u, beta, lat, jnp.asarray(eta, jnp.float64), nu, ct)


def sf_dS_deta(u, beta, lat: Lattice, eta=0.0, nu=0.0, ct=1.0):
    """∂S_SF/∂η at fixed U — the SF coupling observable
    (reference: sf_observables.c).  One AD pass through the boundary links."""
    g = jax.grad(
        lambda e: _sf_action_impl(u, beta, lat, e, nu, ct)
    )(jnp.asarray(eta, jnp.float64))
    return g


def sf_coupling_normalization(lat: Lattice, ct: float = 1.0) -> float:
    """k in ḡ² = k / ⟨∂S/∂η⟩, fixed by the classical limit ḡ² → g0² = 6/β:
    k = g0² · ∂S_cl/∂η|_{η=0}.  Closed form (abelian classical solution,
    constant temporal-plaquette angles θ_j = (φ'_j - φ_j)/(L·T) with
    ∂θ/∂η = (-2, 1, 1)/(L·T)):

        k = 6 · Vs · (T-2+2c_t) · Σ_j sin(θ_j) ∂θ_j/∂η
          = 12 L² [sin(2γ) + sin(γ)] · (T-2+2c_t)/T,   γ = π/(3 L T)
    which for T = L, c_t = 1 is the published normalization
    k = 12 (L/a)² [sin(2γ) + sin(γ)]."""
    t_ext, el = lat.dims[0], lat.dims[1]
    vs = lat.dims[1] * lat.mf  # spatial volume (SF convention: LX=LY=LZ)
    theta = np.array([-2.0, 1.0, 1.0]) * np.pi / (3.0 * el * t_ext)
    dtheta = np.array([-2.0, 1.0, 1.0]) / (el * t_ext)
    wsum = t_ext - 2 + 2 * ct
    # dS/dη|cl = β · Vs · Σ_slabs w · Σ_j sinθ_j dθ_j/dη ;  k = (6/β)·dS/dη
    return float(6.0 * vs * wsum * np.sum(np.sin(theta) * dtheta))


def sf_observables(u, beta, lat: Lattice, eta=0.0, nu=0.0, ct=1.0):
    """dict(action, dS_deta, k) — per-configuration SF observables; the
    ensemble estimator of the running coupling is ḡ² = k / ⟨dS_deta⟩."""
    return {
        "action": sf_gauge_action(u, beta, lat, eta, nu, ct),
        "dS_deta": sf_dS_deta(u, beta, lat, eta, nu, ct),
        "k": sf_coupling_normalization(lat, ct),
    }
