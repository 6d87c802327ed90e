"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Real-TPU benchmarking happens via bench.py; unit/integration tests run on CPU
so that multi-chip sharding logic is exercised with
``--xla_force_host_platform_device_count=8``.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The axon TPU plugin ignores JAX_PLATFORMS; force the platform via config so
# tests always run on the virtual 8-device CPU mesh.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

# Persistent compilation cache: the suite's wall time is dominated by
# re-compiling the same train-step/eval graphs every run (single-core host,
# ~100 min cold). Warm runs reuse the on-disk cache. The dir is keyed by a
# machine fingerprint — XLA:CPU AOT entries from another host poison lookups.
from yolov6_tpu.utils.compile_cache import enable_persistent_cache  # noqa: E402

_CACHE_DIR = enable_persistent_cache(REPO_ROOT)

REFERENCE_ROOT = "/root/reference"


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run minute-scale compile tests (full train-step/CLI graphs)",
    )


def pytest_collection_modifyitems(config, items):
    """Cold-host tier: tests marked `slow` compile full train graphs and take
    minutes each on this 1-core host with a cold XLA cache; they only run
    with --runslow so a fresh machine sees green in <15 min. Warm hosts run
    `pytest tests/ --runslow -q` for the complete suite."""
    if config.getoption("--runslow"):
        return
    import pytest as _pytest

    skip = _pytest.mark.skip(reason="needs --runslow (minute-scale cold compile)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


def add_reference_to_path():
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    # The reference imports pkg_resources (absent in this image); shim the one
    # symbol it uses (parse_version) so reference modules import cleanly.
    if "pkg_resources" not in sys.modules:
        import types

        shim = types.ModuleType("pkg_resources")

        def parse_version(v):
            parts = []
            for piece in str(v).split("+")[0].split("."):
                num = "".join(ch for ch in piece if ch.isdigit())
                parts.append(int(num) if num else 0)
            return tuple(parts)

        shim.parse_version = parse_version
        sys.modules["pkg_resources"] = shim
