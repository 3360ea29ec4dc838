from .tensor_math import (
    quat_to_rotmat,
    random_quat,
    auto_scale_and_center_poses,
    rodrigues_to_rotation,
)
from .sh import (
    num_sh_bases,
    deg_from_sh,
    rgb_to_sh,
    sh_to_rgb,
    eval_sh_basis,
    spherical_harmonics,
)
from .projection import project_gaussians, ProjectedGaussians
