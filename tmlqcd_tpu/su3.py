"""Batched SU(3) / su(3) linear algebra in structure-of-arrays layout.

TPU-native replacement for the reference's macro-generated SU(3) kernels
(reference: su3.h `_su3_times_su3`/`_su3_multiply`, su3adj.h, expo.c `exposu3`,
start.c gaussian momenta, `restoresu3` reunitarization).

LAYOUT: matrices live on the LEADING two axes — [3, 3, *site_dims] — so the
trailing (tiled) axes are large site dims and the 3x3 algebra compiles to 9
fused multiply-adds over full VPU lanes (see tmlqcd_tpu.lattice docstring for
why trailing (3,3) dims are catastrophic on TPU: 8x128 tile padding).

Conventions
-----------
* Gauge links U in SU(3): complex [3, 3, ...].
* Momenta P in su(3) as traceless ANTI-HERMITIAN matrices (P = iH, H
  hermitian traceless).  The reference stores 8 adjoint components (su3adj);
  dense SoA matrices are the TPU-friendly form.
* Kinetic energy per link tr(H^2); heatbath density exp(-sum tr H^2), i.e.
  p_a ~ N(0,1) in H = p_a T_a (reference: start.c gaussian su3adj fillers).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "adj",
    "mul",
    "re_trace",
    "trace",
    "ta_project",
    "expm_ta",
    "project_su3",
    "project_su3_polar",
    "random_momenta",
    "kinetic_energy",
    "random_su3",
    "unitarity_defect",
]


def adj(m: jax.Array) -> jax.Array:
    """Hermitian conjugate on the leading two axes (reference: `_su3_dagger`)."""
    return jnp.conj(jnp.swapaxes(m, 0, 1))


def _compact_algebra() -> bool:
    """Use compact broadcast+reduce contractions instead of unrolled
    multiply-adds.

    On TPU the unrolled form is mandatory for layout (see :func:`mul`); on
    CPU — where the virtual-mesh tests and the driver's multi-chip dryrun
    compile with a single-threaded XLA — the unrolled form multiplies HLO
    size ~10x and with it compile time (measured: the clover-term build
    sw_blocks_eo is 13k HLO lines unrolled vs ~1k compact, and a full
    GAUGE+CLOVERDETRATIO+NDRAT trajectory compile dropped from ~19 min to
    ~2.5 min).  The compact form is broadcast-multiply + jnp.sum over the
    tiny contraction axis, NOT einsum/dot_general: a batched dot lowers to a
    different accumulation than an unbatched one, which breaks the BITWISE
    vmap-chain == single-chain guarantee (tested in test_aux.py) that
    elementwise ops preserve.  Override with TMLQCD_TPU_COMPACT_SU3=0/1.
    """
    import os

    env = os.environ.get("TMLQCD_TPU_COMPACT_SU3")
    if env is not None:
        return env != "0"
    return jax.default_backend() == "cpu"


def mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """3x3 matrix product over leading axes (reference: `_su3_times_su3`).

    Explicitly unrolled on TPU: einsum/dot_general would make XLA:TPU choose
    a layout with the *contracting* (3,3) dims minor-most, padding every
    operand to (sublane, lane) = (8, 128) tiles — a measured 57x memory/
    bandwidth expansion.  Unrolled multiply-adds keep all arrays laid out
    with site dims minor and fuse into 9 VPU expressions (the TPU analog of
    the reference's SSE macro bodies).  On CPU a compact broadcast+reduce
    form is used instead (see :func:`_compact_algebra`).
    """
    if _compact_algebra():
        return jnp.sum(a[:, :, None] * b[None], axis=1)
    rows = []
    for i in range(3):
        row = []
        for k in range(3):
            row.append(a[i, 0] * b[0, k] + a[i, 1] * b[1, k] + a[i, 2] * b[2, k])
        rows.append(jnp.stack(row))
    return jnp.stack(rows)


def matvec(u: jax.Array, v: jax.Array) -> jax.Array:
    """U v for color vectors v [3, ...] (reference: `_su3_multiply`);
    unrolled on TPU for the same layout reason as :func:`mul`."""
    if _compact_algebra():
        return jnp.sum(u * v[None], axis=1)
    return jnp.stack(
        [u[i, 0] * v[0] + u[i, 1] * v[1] + u[i, 2] * v[2] for i in range(3)]
    )


def trace(m: jax.Array) -> jax.Array:
    return m[0, 0] + m[1, 1] + m[2, 2]


def re_trace(m: jax.Array) -> jax.Array:
    """Re tr(m) per site."""
    return trace(m).real


def _eye_like(m: jax.Array) -> jax.Array:
    return jnp.eye(3, dtype=m.dtype).reshape((3, 3) + (1,) * (m.ndim - 2))


def ta_project(m: jax.Array) -> jax.Array:
    """Traceless anti-hermitian projection
    TA(m) = (m - m^+)/2 - tr(m - m^+)/6 * I (reference: su3adj decomposition)."""
    ah = 0.5 * (m - adj(m))
    return ah - (trace(ah) / 3.0) * _eye_like(m)


def expm_ta(a: jax.Array, order: int = 8, squarings: int = 4) -> jax.Array:
    """exp(a) for (small-norm) su(3) matrices via scaling-squaring + Taylor.

    Reference: expo.c `exposu3` (Cayley-Hamilton closed form).  A fixed
    Taylor/squaring schedule is branch-free, batched, and differentiable (the
    MD drift U <- exp(dt P) U is inside jax.grad for the HMC force).  With
    squarings=4, |dt P| <~ 1 gives an order-8 remainder ~1e-25, far below f32
    roundoff.
    """
    eye = _eye_like(a)
    b = a / (2.0**squarings)
    acc = eye + b / order
    for k in range(order - 1, 0, -1):
        acc = eye + mul(b, acc) / k
    for _ in range(squarings):
        acc = mul(acc, acc)
    return acc


def project_su3(m: jax.Array) -> jax.Array:
    """Project a near-SU(3) matrix back onto SU(3) (reference: expo.c
    `restoresu3`): Gram-Schmidt on the first two rows, third row = conjugate
    cross product (det = +1 exactly).  Periodic reunitarization against f32
    drift during MD."""
    r0 = m[0]  # [3(col), ...]
    r1 = m[1]
    n0 = jnp.sqrt(jnp.sum(jnp.abs(r0) ** 2, axis=0, keepdims=True))
    u0 = r0 / n0
    proj = jnp.sum(jnp.conj(u0) * r1, axis=0, keepdims=True)
    v1 = r1 - proj * u0
    n1 = jnp.sqrt(jnp.sum(jnp.abs(v1) ** 2, axis=0, keepdims=True))
    u1 = v1 / n1
    u2 = jnp.conj(jnp.cross(u0, u1, axisa=0, axisb=0, axisc=0))
    return jnp.stack([u0, u1, u2], axis=0)


def _inv3(m: jax.Array) -> jax.Array:
    """Adjugate inverse of a 3x3 over leading axes (unrolled, layout-safe
    like `mul` — no linalg batching that would re-tile the site dims)."""
    c = [[None] * 3 for _ in range(3)]
    for i in range(3):
        i1, i2 = (i + 1) % 3, (i + 2) % 3
        for j in range(3):
            j1, j2 = (j + 1) % 3, (j + 2) % 3
            c[i][j] = m[i1, j1] * m[i2, j2] - m[i1, j2] * m[i2, j1]
    det = m[0, 0] * c[0][0] + m[0, 1] * c[0][1] + m[0, 2] * c[0][2]
    # adjugate = cofactor^T
    return jnp.stack([jnp.stack([c[j][i] for j in range(3)]) for i in range(3)]) / det


def project_su3_polar(m: jax.Array, iters: int = 9) -> jax.Array:
    """Gauge-COVARIANT projection onto SU(3): the unitary polar factor
    W = m (m^+ m)^{-1/2} via the Newton iteration X <- (X + (X^+)^{-1})/2,
    then the determinant phase is rotated out (W / det(W)^{1/3}).

    Unlike `project_su3` (Gram-Schmidt — cheap, but NOT equivariant under
    U -> g U h^+), the polar factor satisfies P(g m h^+) = g P(m) h^+, which
    link-smearing (APE/stout-like algorithms, reference: smearing in
    measurement code) requires for gauge covariance of the smeared
    observables.  Newton converges quadratically for the near-unitary sums
    these produce; `iters` is a static safety margin."""
    # Frobenius pre-scaling keeps the first iterations contractive even for
    # badly scaled inputs (alpha-weighted staple sums).
    n = jnp.sqrt(jnp.sum(jnp.abs(m) ** 2, axis=(0, 1), keepdims=False) / 3.0)
    x = m / n
    for _ in range(iters):
        x = 0.5 * (x + _inv3(adj(x)))
    # det(x) is now a pure phase; rotate it away for det = +1 exactly.
    det = (
        x[0, 0] * (x[1, 1] * x[2, 2] - x[1, 2] * x[2, 1])
        - x[0, 1] * (x[1, 0] * x[2, 2] - x[1, 2] * x[2, 0])
        + x[0, 2] * (x[1, 0] * x[2, 1] - x[1, 1] * x[2, 0])
    )
    phase = jnp.angle(det) / 3.0
    rot = jax.lax.complex(jnp.cos(phase), -jnp.sin(phase)).astype(x.dtype)
    return x * rot


def random_momenta(key: jax.Array, batch_shape: tuple, dtype=jnp.complex64) -> jax.Array:
    """Gaussian su(3) momenta [3, 3, *batch_shape] with density
    exp(-sum tr H^2), H = -iP (HMC momentum heatbath; reference: start.c).

    Draw M iid complex (<|M_ij|^2> = 1); H = (M + M^+)/2 minus trace/3 has
    exactly the covariance of H = sum_a p_a T_a with p_a ~ N(0,1).

    Complex values are built with lax.complex, never `1j * x`: a bare Python
    1j stages a complex128 constant under x64, and C128 is unsupported on TPU.
    """
    rdtype = jnp.float32 if dtype == jnp.complex64 else jnp.float64
    kr, ki = jax.random.split(key)
    shape = (3, 3) + tuple(batch_shape)
    s = jnp.asarray(0.7071067811865476, rdtype)
    m = jax.lax.complex(
        jax.random.normal(kr, shape, rdtype) * s,
        jax.random.normal(ki, shape, rdtype) * s,
    ).astype(dtype)
    h = 0.5 * (m + adj(m))
    h = h - (trace(h) / 3.0) * _eye_like(h)
    # i*h = complex(-Im h, Re h)
    return jax.lax.complex(-jnp.imag(h), jnp.real(h)).astype(dtype)


def kinetic_energy(p: jax.Array) -> jax.Array:
    """sum_links tr(H^2) = sum |P_ij|^2 for anti-hermitian P, f64-accumulated
    (reference: moment_energy.c + MPI_Allreduce)."""
    return jnp.sum(p.real.astype(jnp.float64) ** 2 + p.imag.astype(jnp.float64) ** 2)


def random_su3(key: jax.Array, batch_shape: tuple, dtype=jnp.complex64) -> jax.Array:
    """Random SU(3) field [3, 3, *batch_shape] for hot starts
    (reference: start.c `random_gauge_field`)."""
    p = random_momenta(key, batch_shape, dtype)
    return project_su3(expm_ta(1.5 * p))


def unitarity_defect(u: jax.Array) -> jax.Array:
    """max_sites ||U^+U - 1||_F — f32 drift monitor (survey §7 hard parts)."""
    d = mul(adj(u), u) - _eye_like(u)
    return jnp.sqrt(jnp.max(jnp.sum(jnp.abs(d) ** 2, axis=(0, 1))))
