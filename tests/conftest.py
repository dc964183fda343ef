"""Test configuration: run all tests on a virtual 8-device CPU mesh so
multi-chip sharding logic is exercised without TPU hardware (the bench
path runs on the real chip instead).

Note: this environment's sitecustomize registers an 'axon' TPU backend
and forces jax_platforms='axon,cpu' via jax.config, so the env var
alone is not enough — we must update the config after import."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
