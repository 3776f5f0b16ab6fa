"""Test configuration.

Forces JAX onto a virtual 8-device CPU mesh so multi-chip sharding paths are
exercised without TPU hardware. The environment's sitecustomize may import
jax (pinning platform 'axon') before this file runs, so the platform is also
overridden programmatically via jax.config.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class ForwardPipe:
    """Forward-only byte source (simulates a pipe) for streaming-reader
    tests; shared across test modules."""

    def __init__(self, b):
        self.b = b
        self.i = 0

    def readable(self):
        return True

    def seekable(self):
        return False

    def read(self, n=-1):
        if n is None or n < 0:
            n = len(self.b) - self.i
        out = self.b[self.i : self.i + n]
        self.i += len(out)
        return out
