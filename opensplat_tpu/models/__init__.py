from .gaussians import GaussianParams, DensifyStats, TrainState, init_model, knn_mean_scale
from .splat_model import render_forward, RenderOutputs
