from .np_oracle import (
    np_project_gaussians,
    np_rasterize_forward,
    np_rasterize_backward,
    np_sh_forward,
)
