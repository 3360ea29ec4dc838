"""Worker process for tests/test_distributed.py: joins a 2-process CPU
fleet through opensplat_tpu.parallel.distributed and runs one global
computation over a host-spanning mesh."""
import os
import sys

pid, port = int(sys.argv[1]), sys.argv[2]
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["OPENSPLAT_COORDINATOR"] = f"localhost:{port}"
os.environ["OPENSPLAT_NUM_PROCESSES"] = "2"
os.environ["OPENSPLAT_PROCESS_ID"] = str(pid)

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from opensplat_tpu.parallel.distributed import (  # noqa: E402
    global_dp_mesh,
    initialize_from_env,
    make_global_batch,
    process_camera_slice,
)

multi = initialize_from_env()
assert multi, "initialize_from_env did not report multi-process"
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())  # 4 per host
assert len(jax.local_devices()) == 4

mesh = global_dp_mesh()
assert mesh.shape["data"] == 8 and mesh.shape["model"] == 1, dict(mesh.shape)
# host-major data axis: first 4 rows on process 0, next 4 on process 1
procs = [d.process_index for d in mesh.devices.reshape(-1)]
assert procs == sorted(procs), procs

from jax.sharding import PartitionSpec as P  # noqa: E402

start, count = process_camera_slice(8)
assert count == 4 and start == pid * 4, (start, count)
local_rows = np.arange(start, start + count, dtype=np.float32)
x = make_global_batch(mesh, P("data"), local_rows)
assert x.shape == (8,)

# one global all-reduce across the process boundary (rides the
# coordinator-backed CPU collective here, DCN on real fleets)
total = float(jax.jit(lambda a: a.sum())(x))
assert total == sum(range(8)), total
print(f"DIST_OK {pid} {total}")
