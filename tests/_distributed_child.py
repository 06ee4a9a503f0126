"""Child process for the 2-process ``jax.distributed`` CPU test.

Launched by ``tests/test_parallel.py::test_two_process_distributed_bootstrap``
with ``argv = [coordinator_address, num_processes, process_id, out_path]``.
Exercises the REAL multi-host bootstrap path
(``parallel.distributed.initialize`` → GRPC coordinator → global device
view → cross-process psum) that a pod run depends on, with no hardware:
each process brings one CPU device and the collective rides the
distributed runtime.
"""

import json
import sys

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")


def main(coordinator: str, num_processes: int, process_id: int, out_path: str):
    from pwclonet_pylidarslam_tpu.parallel.distributed import (
        initialize,
        local_batch_slice,
    )

    initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )

    assert jax.process_count() == num_processes
    assert jax.process_index() == process_id
    sl = local_batch_slice(8)

    # one psum across processes: a global mesh over every process's devices
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    devices = jax.devices()  # global view: one CPU device per process
    mesh = Mesh(devices, ("data",))
    contrib = jnp.asarray([float(process_id + 1)])  # this host's summand

    def psum_fn(x):
        return jax.lax.psum(x, "data")

    fn = shard_map(psum_fn, mesh=mesh, in_specs=P("data"), out_specs=P())
    arr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), contrib, (num_processes,)
    )
    total = float(jax.jit(fn)(arr)[0])

    with open(out_path, "w") as f:
        json.dump(
            {
                "process_id": process_id,
                "process_count": jax.process_count(),
                "global_devices": len(devices),
                "local_slice": [sl.start, sl.stop],
                "psum": total,
            },
            f,
        )


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
