"""Multi-shift conjugate gradient: solve (A + sigma_k) x_k = b for all shifts
from a single Krylov space.

Reference: solver/cg_mms_tm.c / cg_mms_tm_nd.c `cg_mms_tm` — required by the
rational (RHMC) monomials, where the partial-fraction poles of the Zolotarev
approximation are the shifts (survey §2.6, §2.7).

TPU-native shape: the shifted iterates/search directions carry an extra
leading "shift" axis and update as one batched fused expression — the
reference's per-shift zeta recursions become a vectorized recurrence (the
"task parallelism across shifts" row of survey §2.11).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["cg_multishift", "MultishiftResult"]


class MultishiftResult(NamedTuple):
    x: jax.Array  # [n_shifts, ...field]
    iterations: jax.Array
    residual_sq: jax.Array  # base-system |r|^2


def _norm_sq(v):
    return jnp.sum(v.real.astype(jnp.float64) ** 2 + v.imag.astype(jnp.float64) ** 2)


def _dot_re(a, b):
    return jnp.sum(
        a.real.astype(jnp.float64) * b.real.astype(jnp.float64)
        + a.imag.astype(jnp.float64) * b.imag.astype(jnp.float64)
    )


def cg_multishift(
    matvec: Callable[[jax.Array], jax.Array],
    b: jax.Array,
    shifts: jax.Array,
    tol: float = 1e-9,
    maxiter: int = 1000,
    rel_prec: bool = True,
) -> MultishiftResult:
    """Shifted CG (Jegerlehner's algorithm). `shifts` must be >= 0 with the
    base system sigma=0 implied NOT included — pass all sigmas explicitly;
    the smallest shift governs convergence.

    Convergence is monitored on the base (sigma = min shift... we use sigma=0
    internally) residual, which bounds all shifted residuals for sigma >= 0.
    """
    shifts = jnp.asarray(shifts, jnp.float64)
    ns = shifts.shape[0]
    fdt = b.real.dtype

    b_sq = _norm_sq(b)
    target = jnp.asarray(tol, jnp.float64) ** 2 * (b_sq if rel_prec else 1.0)

    # Base system: A x = b (sigma = 0). Shifted systems tracked via zeta.
    x = jnp.zeros((ns,) + b.shape, b.dtype)
    p_s = jnp.broadcast_to(b, (ns,) + b.shape).astype(b.dtype)
    r = b
    p = b
    rs = _norm_sq(b)
    zeta = jnp.ones((ns,), jnp.float64)
    zeta_prev = jnp.ones((ns,), jnp.float64)
    alpha_prev = jnp.ones((), jnp.float64)
    beta_prev = jnp.zeros((), jnp.float64)

    def cond(st):
        return jnp.logical_and(st["rs"] > target, st["k"] < maxiter)

    def body(st):
        ap = matvec(st["p"])
        pap = _dot_re(st["p"], ap)
        alpha = st["rs"] / pap  # base-system alpha (x += alpha p)
        # shifted coefficient recurrences (Jegerlehner, hep-lat/9612014):
        #   zeta_{n+1} = zeta_n zeta_{n-1} alpha_{n-1} /
        #       ( alpha_n beta_{n-1} (zeta_{n-1} - zeta_n)
        #         + alpha_{n-1} zeta_{n-1} (1 + sigma alpha_n) )
        zp, z, a_prev, b_prev = st["zeta_prev"], st["zeta"], st["alpha_prev"], st["beta_prev"]
        denom = alpha * b_prev * (zp - z) + a_prev * zp * (1.0 + shifts * alpha)
        safe = jnp.abs(denom) > 0
        zeta_next = jnp.where(safe, z * zp * a_prev / jnp.where(safe, denom, 1.0), 0.0)
        z_safe = jnp.where(z == 0, 1.0, z)
        alpha_s = alpha * zeta_next / z_safe

        bshape = (ns,) + (1,) * st["p"].ndim
        x = st["x"] + alpha_s.reshape(bshape).astype(fdt) * st["p_s"]
        r = st["r"] - alpha.astype(fdt) * ap
        rs_new = _norm_sq(r)
        beta = rs_new / st["rs"]
        p = r + beta.astype(fdt) * st["p"]
        beta_s = beta * (zeta_next / z_safe) ** 2
        p_s = (
            zeta_next.reshape(bshape).astype(fdt) * r[None]
            + beta_s.reshape(bshape).astype(fdt) * st["p_s"]
        )
        return dict(
            x=x, r=r, p=p, p_s=p_s, rs=rs_new, k=st["k"] + 1,
            zeta=zeta_next, zeta_prev=z, alpha_prev=alpha, beta_prev=beta,
        )

    st = dict(
        x=x, r=r, p=p, p_s=p_s, rs=rs, k=jnp.asarray(0, jnp.int32),
        zeta=zeta, zeta_prev=zeta_prev, alpha_prev=alpha_prev, beta_prev=beta_prev,
    )
    st = jax.lax.while_loop(cond, body, st)
    return MultishiftResult(x=st["x"], iterations=st["k"], residual_sq=st["rs"])
