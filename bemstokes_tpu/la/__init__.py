from .gmres import gmres
from .direct import LUPreconditioner, lu_factor_dense, lu_solve_dense

__all__ = ["gmres", "LUPreconditioner", "lu_factor_dense", "lu_solve_dense"]
