"""Test configuration: force an 8-device virtual CPU mesh before JAX is used.

All tests run on CPU (the TPU chip is reserved for benchmarking — and the
remote-compile tunnel adds minutes of latency per executable); multi-chip
sharding tests use the 8 virtual host devices. Note the TPU plugin overrides
the JAX_PLATFORMS env var at interpreter startup, so we must force the
platform back through jax.config, not the environment.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


# Keep test runs out of the working tree: the CLI's JSONL logger defaults to
# ./runs, which pytest invocations would otherwise dirty on every run.
import tempfile  # noqa: E402

os.environ.setdefault("XVR_LOG_DIR", tempfile.mkdtemp(prefix="xvr_test_logs_"))
