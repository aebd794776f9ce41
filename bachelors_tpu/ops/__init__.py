from .reductions import Stats, field_stats, stats_delta, dot, L1_norm, L2_norm, Lmax_norm
from .rhs import eval_rhs, euler_eval
from .stencil import AnisotropyMatrix, CrossMatrix, anisotropy_matvec, cross_matvec, laplacian
