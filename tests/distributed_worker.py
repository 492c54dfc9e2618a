"""Worker process for tests/test_distributed.py: one of two CPU processes
(4 virtual devices each) that form a single 8-device mesh via
jax.distributed (parallel/mesh.py::init_distributed) and run the shared
DP-step case on it. Prints one JSON line of scalar evidence.

Run: python tests/distributed_worker.py <process_id> <coordinator host:port>
"""
import json
import sys

import jax

# Must precede any backend initialization (the environment's sitecustomize
# imports jax at startup; jax.config still works, env vars would not).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
jax.config.update("jax_default_matmul_precision", "highest")


def main() -> None:
    pid = int(sys.argv[1])
    coordinator = sys.argv[2]

    from bilinear_tpu.parallel import mesh as mesh_lib

    mesh_lib.init_distributed(
        coordinator_address=coordinator, num_processes=2, process_id=pid
    )
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, jax.devices()
    assert len(jax.local_devices()) == 4, jax.local_devices()

    import distributed_case as case

    mesh = mesh_lib.make_mesh()  # (8, 1) spanning both processes

    def to_global(tree):
        return mesh_lib.global_batch(
            mesh, case.local_slice(tree, pid, jax.process_count())
        )

    result = case.run_steps(mesh, to_global)
    result["process_id"] = pid

    # Preemption agreement (utils/preempt.py::global_requested): only
    # process 0 "received" the signal; BOTH processes must agree to stop
    # (and to continue when nobody was signaled). Collective — every
    # process calls in the same order.
    from bilinear_tpu.utils.preempt import global_requested

    assert global_requested(pid == 0) is True
    assert global_requested(False) is False
    result["preempt_agree"] = True

    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
