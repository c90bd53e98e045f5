"""Subprocess entry for test_multiprocess.py: one REAL jax.distributed
process of a 2-process CPU training run.

Usage: python tests/_mp_train_worker.py <process_id> <num_processes>
           <port> <local_devices> <run.py args...>

Mirrors one torchrun rank of the reference's launch
(scripts/pretrain_streamformer.sh:7 -> utils.py:372-447): the platform is
forced to CPU with <local_devices> virtual devices, gloo collectives are
enabled, and train/run.py's own --distributed path does the coordinator
handshake. Everything after the bootstrap is the production code path.
"""

import os
import sys


def main() -> None:
    pid, nproc, port, ndev = sys.argv[1:5]
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={ndev}"
    )
    os.environ.setdefault("STREAMFORMER_ALLOW_HASH_TOKENIZER", "1")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    sys.argv = [
        "run",
        "--distributed",
        "--coordinator_address", f"127.0.0.1:{port}",
        "--num_processes", nproc,
        "--process_id", pid,
    ] + sys.argv[5:]
    from streamformer_tpu.train import run as run_mod

    run_mod.main()


if __name__ == "__main__":
    main()
