"""Krylov solvers, eigenestimators, and rational approximations
(reference: solver/ — cg_her.c, cg_mms_tm.c, mixed_cg_her.c,
bicgstab_complex.c, gmres.c/fgmres.c/gcr.c/mr.c, eigenvalues.c,
rational/rational.c, monomial_solve.c dispatch)."""

from tmlqcd_tpu.solvers.cg import cg, cg_info  # noqa: F401
from tmlqcd_tpu.solvers.multishift import cg_multishift  # noqa: F401
from tmlqcd_tpu.solvers.bicgstab import bicgstab  # noqa: F401
from tmlqcd_tpu.solvers.cgs import cgs  # noqa: F401
from tmlqcd_tpu.solvers.mixed_cg import mixed_cg  # noqa: F401
from tmlqcd_tpu.solvers.krylov import fgmres, gcr, mr  # noqa: F401
from tmlqcd_tpu.solvers.eigen import lambda_max, lambda_min, spectral_bounds  # noqa: F401
from tmlqcd_tpu.solvers.rational import rational_invsqrt  # noqa: F401
from tmlqcd_tpu.solvers.chrono import chrono_guess, chrono_init, chrono_push  # noqa: F401
from tmlqcd_tpu.solvers.chebyshev import chebyshev_apply, chebyshev_coeffs  # noqa: F401
from tmlqcd_tpu.solvers.deflation import deflated_fgmres, setup_deflation, vcycle  # noqa: F401
from tmlqcd_tpu.solvers.dispatch import register_solver, solve_degenerate, solve_mms  # noqa: F401
from tmlqcd_tpu.solvers.sumr import sumr  # noqa: F401
from tmlqcd_tpu.solvers.lanczos import lanczos_herm, lowest_eigenpairs  # noqa: F401
from tmlqcd_tpu.solvers.eigcg import eigcg, incr_eigcg_solve  # noqa: F401
