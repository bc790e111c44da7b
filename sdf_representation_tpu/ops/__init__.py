from .diffops import (
    compute_normal,
    compute_gradient,
    compute_hessian,
    compute_gaussian_curvature,
    sdf_and_normal,
)
