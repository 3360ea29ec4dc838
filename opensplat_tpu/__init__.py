"""opensplat_tpu — a TPU-native 3D Gaussian Splatting framework in JAX.

A from-scratch re-design of the capabilities of pierotofy/OpenSplat
(C++/libtorch/CUDA) for TPU hardware: the gsplat-style differentiable
rasterization pipeline is implemented with XLA-friendly static shapes and
Pallas kernels, the training loop runs fully under `jax.jit`, and scaling
goes through `jax.sharding` meshes rather than a single device.

Layer map (mirrors SURVEY.md §1 of the reference, re-architected):

  L5  CLI / apps ........ opensplat_tpu.cli, opensplat_tpu.simple_trainer
  L4  Model & training .. opensplat_tpu.models, opensplat_tpu.optim,
                          opensplat_tpu.train
  L3  Differentiable ops  opensplat_tpu.ops (project/sh/rasterize custom_vjp)
  L2  Kernels ........... opensplat_tpu.ops.pallas (TPU), pure-jnp reference
  L1  Data & geometry ... opensplat_tpu.data, opensplat_tpu.io
"""

__version__ = "0.1.0"

# Make JAX_PLATFORMS=cpu actually stick: some accelerator plugins
# (e.g. tunneled TPU pools registered from sitecustomize) register
# their backend regardless of the env var, and a CLI run intended for
# CPU then silently claims the accelerator. Mirroring the env var into
# jax.config before any entry point touches jax closes that hole; when
# the env var is unset or names the plugin platform this is a no-op.
import os as _os

if "cpu" in _os.environ.get("JAX_PLATFORMS", "").lower():
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")
del _os


def __getattr__(name):
    # lazy top-level conveniences without import-time jax cost
    if name in ("ops", "models", "train", "data", "io", "parallel", "optim",
                "utils", "gsplat_compat"):
        import importlib

        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
