"""Inexact deflation / 2-level multigrid preconditioner (Luscher-style).

Reference: block.c (block decomposition), generate_dfl_subspace.c (smoothed
near-kernel vectors), little_D.c (the coarse "little" operator), and
solver/dfl_projector.c (the projector used inside DFLGCR/DFLFGMRES) —
survey §2.6 "Inexact deflation / DD (Luscher-style 2-level MG)"; also the
internal stand-in for the external DDalphaAMG (survey §2.11).

Scheme:
  * Setup: Ns near-kernel vectors from smoothed inverse iteration
    (solve D x ~ v with a few MR iterations, renormalize, repeat), chopped
    over a (bt, bx, bm) block grid of the site dims -> subspace dimension
    n = Ns * n_blocks.  The coarse (little) operator A[(i,b),(j,b')] =
    <chi_b v_i, D chi_b' v_j> is formed densely (n is O(100)) and inverted
    once per gauge on-device in c64 (see _coarse_inverse — keeps c128 and
    host callbacks off the device so the whole stack runs on TPU).
  * Apply (one V-cycle): coarse correction c = V A^{-1} V^+ r, then an MR
    smoother on the remaining residual: M(r) = c + MR_k(D, r - D c).
  * Use as the flexible preconditioner of solvers.krylov.fgmres/gcr — the
    DFLFGMRES/DFLGCR stack of the reference.

Block algebra is pure reshapes: site dims (T, X, M) -> (nbt, bt, nbx, bx,
nbm, bm); restriction/prolongation are einsums over the block-interior axes
— no gather/scatter indices anywhere (TPU-friendly by construction).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from tmlqcd_tpu import rng
from tmlqcd_tpu.solvers.krylov import mr

__all__ = ["DeflationSetup", "setup_deflation", "vcycle", "deflated_fgmres"]


@dataclasses.dataclass
class DeflationSetup:
    v: jax.Array  # [Ns, 4, 3, T, X, M] orthonormalized subspace vectors
    blocks: tuple[int, int, int]  # (nbt, nbx, nbm) block counts
    a_inv: jax.Array  # dense inverse of the little operator [n, n], c64
    a: jax.Array | None = None  # the little operator itself (iterative
    # refinement of the coarse solve; None in setups built before round 5)
    smooth_iters: int = 4


jax.tree_util.register_dataclass(
    DeflationSetup, data_fields=["v", "a_inv", "a"], meta_fields=["blocks", "smooth_iters"]
)


def _coarse_inverse(a: jax.Array) -> jax.Array:
    """Dense inverse of the little operator, complex64 ON DEVICE.

    The coarse system is tiny (n = Ns * n_blocks, O(100)), so a dense c64
    inverse is cheap and fully jittable on every backend — no complex128
    (unsupported on TPU) and no host callback (unsupported by the axon PJRT
    transport).  TPU matmuls default to bf16 inputs; force f32 ("highest")
    for the factorization — measured identity residual ~6e-6 at n=64 vs
    ~6e-2 at the bf16 default.  f32 accuracy is far more than a
    preconditioner needs.
    """
    with jax.default_matmul_precision("highest"):
        return jnp.linalg.inv(a.astype(jnp.complex64))


def _block_view(x: jax.Array, blocks):
    """[.., T, X, M] -> [.., nbt, bt, nbx, bx, nbm, bm]."""
    nbt, nbx, nbm = blocks
    t, xx, m = x.shape[-3:]
    return x.reshape(x.shape[:-3] + (nbt, t // nbt, nbx, xx // nbx, nbm, m // nbm))


def _restrict(v: jax.Array, x: jax.Array, blocks) -> jax.Array:
    """w[i, b] = <chi_b v_i, x>: [Ns, nb] complex (nb = prod blocks)."""
    vb = _block_view(v, blocks)  # [Ns,4,3,nbt,bt,nbx,bx,nbm,bm]
    xb = _block_view(x, blocks)  # [4,3,nbt,bt,nbx,bx,nbm,bm]
    # sum over spin, color, and the block-interior axes
    w = jnp.sum(jnp.conj(vb) * xb[None], axis=(1, 2, 4, 6, 8))  # [Ns,nbt,nbx,nbm]
    return w.reshape(v.shape[0], -1)


def _prolong(v: jax.Array, w: jax.Array, blocks) -> jax.Array:
    """x = sum_{i,b} w[i,b] chi_b v_i."""
    ns = v.shape[0]
    nbt, nbx, nbm = blocks
    vb = _block_view(v, blocks)
    wf = w.reshape(ns, 1, 1, nbt, 1, nbx, 1, nbm, 1).astype(v.dtype)
    out = jnp.sum(vb * wf, axis=0)
    return out.reshape(v.shape[1:])


def _block_orthonormalize(v: jax.Array, blocks) -> jax.Array:
    """Gram-Schmidt the Ns vectors within every block (reference:
    block_orthonormalize) so the chopped basis is orthonormal."""
    ns = v.shape[0]
    vb = _block_view(v, blocks)  # [Ns,4,3,nbt,bt,nbx,bx,nbm,bm]
    outs = []
    for i in range(ns):
        cur = vb[i]
        for j, prev in enumerate(outs):
            ip = jnp.sum(jnp.conj(prev) * cur, axis=(0, 1, 3, 5, 7), keepdims=True)
            cur = cur - ip * prev
        nrm = jnp.sqrt(
            jnp.sum(jnp.abs(cur) ** 2, axis=(0, 1, 3, 5, 7), keepdims=True)
        )
        cur = cur / jnp.maximum(nrm, 1e-30).astype(cur.real.dtype)
        outs.append(cur)
    return jnp.stack(outs).reshape(v.shape)


def _mr_batch(matvec_batch: Callable, b: jax.Array, iters: int) -> jax.Array:
    """Fixed-iteration minimal-residual smoother over a leading batch axis:
    one shared batched matvec per iteration, per-vector step sizes.  The
    batch analog of `mr(..., maxiter=iters)` for the subspace-setup smooth
    (each vector's own alpha = <Ar, r>/|Ar|^2)."""
    axes = tuple(range(1, b.ndim))

    def dot(p, q):
        return jnp.sum(jnp.conj(p) * q, axis=axes, keepdims=True)

    x = jnp.zeros_like(b)
    r = b
    for _ in range(iters):
        ar = matvec_batch(r)
        den = dot(ar, ar).real
        alpha = dot(ar, r) / jnp.maximum(den, 1e-30).astype(den.dtype)
        x = x + alpha * r
        r = r - alpha * ar
    return x


def _block_masks(blocks, rdtype) -> jax.Array:
    """[nb, nbt, 1, nbx, 1, nbm, 1] one-hot block selectors, b-index ordered
    (t-major, m-minor) to match the little-operator column convention."""
    nbt, nbx, nbm = blocks
    nb = nbt * nbx * nbm
    return jnp.eye(nb, dtype=rdtype).reshape(nb, nbt, 1, nbx, 1, nbm, 1)


def setup_deflation(
    matvec: Callable,
    shape: tuple,
    key: jax.Array,
    n_vectors: int = 8,
    blocks: tuple[int, int, int] = (2, 2, 2),
    inv_iters: int = 3,
    smooth_iters: int = 4,
    dtype=jnp.complex64,
    matvec_batch: Callable | None = None,
) -> DeflationSetup:
    """Build the subspace + little operator for operator `matvec` (the
    e/o-preconditioned Mhat; reference: generate_dfl_subspace + little_D).

    matvec_batch (optional): operator over a LEADING batch axis; defaults to
    jax.vmap(matvec).  The whole setup runs on batched matvecs — the
    smoothed inverse iteration as ns-wide batches, the ns*nb little-operator
    columns in ns-wide chunks — so a multi-RHS operator (one gauge stream
    shared by the batch, see ops/dslash_pallas) or XLA's vmap batching
    amortizes the dominant gauge traffic instead of ns*(10*inv_iters)+ns*nb
    full-bandwidth single applications (reference: generate_dfl_subspace.c
    loops vectors one by one)."""
    if matvec_batch is None:
        matvec_batch = jax.vmap(matvec)
    ns = n_vectors
    vs = rng.normal_spinor(key, (ns,) + tuple(shape), dtype)
    # smoothed inverse iteration toward the near-kernel (batched over ns)
    for _ in range(inv_iters):
        vs = _mr_batch(matvec_batch, vs, 10)
        nrm = jnp.sqrt(
            jnp.sum(jnp.abs(vs) ** 2, axis=tuple(range(1, vs.ndim)), keepdims=True)
        )
        vs = vs / jnp.maximum(nrm, 1e-30).astype(vs.real.dtype)
    vs = _block_orthonormalize(vs, blocks)

    nb = blocks[0] * blocks[1] * blocks[2]
    # little operator: column (j, b') = restriction of D (chi_b' v_j);
    # all nb columns of one subspace vector as ONE batched matvec (chunked
    # by j to bound the [nb, spinor] working set)
    masks = _block_masks(blocks, vs.real.dtype)  # [nb, bt,1,bx,1,bm,1]
    restrict_b = jax.vmap(lambda y: _restrict(vs, y, blocks))
    col_chunks = []
    for j in range(ns):
        vjb = _block_view(vs[j], blocks)  # [4,3,nbt,bt,nbx,bx,nbm,bm]
        chopped = (vjb[None] * masks[:, None, None]).reshape((nb,) + vs.shape[1:])
        col_chunks.append(restrict_b(matvec_batch(chopped)).reshape(nb, -1))
    # rows of col_chunks are (j, b)-ordered columns -> stack then transpose
    a = jnp.concatenate(col_chunks, axis=0).T  # [n, n]
    return DeflationSetup(
        v=vs, blocks=blocks, a_inv=_coarse_inverse(a), a=a.astype(jnp.complex64),
        smooth_iters=smooth_iters,
    )


def vcycle(setup: DeflationSetup, matvec: Callable, r: jax.Array) -> jax.Array:
    """One 2-level cycle: coarse correction + MR smoothing
    (reference: dfl_projector.c used as the DFLFGMRES preconditioner)."""
    w = _restrict(setup.v, r, setup.blocks).reshape(-1).astype(setup.a_inv.dtype)
    cw = jnp.matmul(setup.a_inv, w, precision="highest")
    if setup.a is not None:
        # one step of iterative refinement: the little operator is built
        # from near-kernel vectors, so cond(A) grows toward light masses and
        # a one-shot f32 dense inverse loses exactly where deflation is
        # needed most; the refinement restores the coarse solve to f32
        # residual-level accuracy at the cost of one tiny matmul pair
        cw = cw + jnp.matmul(
            setup.a_inv, w - jnp.matmul(setup.a, cw, precision="highest"),
            precision="highest",
        )
    c = _prolong(setup.v, cw.reshape(setup.v.shape[0], -1).astype(r.dtype), setup.blocks)
    if setup.smooth_iters > 0:
        rs = r - matvec(c)
        s = mr(matvec, rs, tol=1e-6, maxiter=setup.smooth_iters).x
        c = c + s
    return c


def deflated_fgmres(matvec: Callable, b: jax.Array, setup: DeflationSetup, **kw):
    """FGMRES preconditioned by the deflation V-cycle — the reference's
    DFLFGMRES solver type."""
    from tmlqcd_tpu.solvers.krylov import fgmres

    return fgmres(matvec, b, precond=lambda r: vcycle(setup, matvec, r), **kw)
