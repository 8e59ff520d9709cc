"""Test config.

Preferred: a virtual 8-device CPU mesh (``scripts/test_cpu.sh``) — the
standard JAX pattern for validating pjit/shard_map layouts without hardware.

Note: this container's sitecustomize (PYTHONPATH=/root/.axon_site) registers
a remote-TPU PJRT plugin at interpreter start and pins JAX to it; in that
case tests run on the single tunneled TPU chip (slower compiles, same
numerics).  Tests therefore never require more than one device; multi-device
sharding is exercised by ``__graft_entry__.dryrun_multichip`` under a
scrubbed environment.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
