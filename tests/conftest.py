"""Test configuration: force an 8-device virtual CPU mesh with fp64.

The reference runs its distributed tests as real 6-rank MPI jobs over several
grid shapes (``test/include/dlaf_test/comm_grids/grids_6_ranks.h:26-60``); the
TPU-native analogue is shard_map over a virtual 8-device CPU mesh, exercised
in 2x4, 4x2, 1x8 and 2x2 shapes.  Must run before any jax backend init.
"""

import os

os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")
if "host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402

from dlaf_tpu.parallel.grid import Grid  # noqa: E402


def _grids():
    """Grid shapes exercised by every distributed test (6-rank analogue)."""
    return [None,  # local (single-process) backend
            Grid((1, 1)),
            Grid((2, 4)),
            Grid((4, 2)),
            Grid((1, 8)),
            Grid((2, 2))]


@pytest.fixture(params=["local", "1x1", "2x4", "4x2", "1x8", "2x2"])
def grid(request):
    return dict(zip(["local", "1x1", "2x4", "4x2", "1x8", "2x2"],
                    _grids()))[request.param]


@pytest.fixture(params=["2x4", "4x2", "2x2"])
def dist_grid(request):
    """Strictly-distributed grids (for tests that need P, Q > 1 coverage)."""
    return dict(zip(["2x4", "4x2", "2x2"], _grids()[2:4] + [_grids()[5]]))[
        request.param]
