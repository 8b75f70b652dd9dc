"""Krylov solvers (reference: solver/ — cg_her.c, cg_mms_tm.c, mixed_cg_her.c,
bicgstab_complex.c, monomial_solve.c dispatch)."""

from tmlqcd_tpu.solvers.cg import cg, cg_info  # noqa: F401
from tmlqcd_tpu.solvers.multishift import cg_multishift  # noqa: F401
from tmlqcd_tpu.solvers.bicgstab import bicgstab  # noqa: F401
