"""Test harness: force JAX onto CPU with 8 virtual devices so mesh/sharding
paths are exercised without TPU hardware (SURVEY.md §4 implication (d))."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import pathlib
import sys

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

# Every test file that imports torch (directly or via transformers). These
# run in ONE child pytest process (tests/test_torch_subprocess.py) so the
# main suite process never holds torch and jax together — which lets the
# main process keep persistent-cache WRITES enabled (see below).
TORCH_TEST_FILES = [
    "test_aux_components.py",
    "test_bert.py",
    "test_layers.py",
    "test_parity_gate.py",
    "test_reference_parity.py",
    "test_rnn.py",
    "test_sdnet_convert.py",
    "test_train.py",
]
# Compile-heavy files that run in their OWN child pytest process when the
# whole suite runs. Two full-suite runs (with and without the persistent
# compile cache) segfaulted inside XLA:CPU at exactly test_serve's warmup
# cross-product — the ~260th test and the heaviest compile burst of the
# suite — while the same file passes standalone every time: accumulated
# process state (hundreds of compiled programs on the 8-virtual-device
# CPU backend) is the trigger, so give the burst a fresh process.
ISOLATED_TEST_FILES = [
    "test_serve.py",
]
_IN_TORCH_SUBPROCESS = bool(os.environ.get("RUART_TORCH_SUBPROCESS"))
if not _IN_TORCH_SUBPROCESS:
    collect_ignore = list(TORCH_TEST_FILES) + list(ISOLATED_TEST_FILES)

# The JAX_PLATFORMS env var is ignored in this environment (the experimental
# 'axon' TPU plugin wins platform selection), so pin the platform via the
# config API before any computation runs.
import jax

jax.config.update("jax_platforms", "cpu")

# NO persistent compile cache in the test suite. Two distinct segfault
# classes were traced to it on this host:
#  * round 3: a cache WRITE (put_executable_and_time) in a process holding
#    torch and jax together — torch's bundled zstd clashes with the
#    cache's compressor (the torch tests now run in a child pytest
#    process regardless, see TORCH_TEST_FILES);
#  * round 5: a cache READ (get_executable_and_time) of an XLA:CPU AOT
#    executable crashed a torch-FREE suite run at 264/~280 tests — the
#    CPU AOT loader logs "machine feature mismatch ... could lead to
#    execution errors" on every such load, and entry bytes decompress
#    cleanly standalone, so deserialization itself is the hazard.
# CPU compiles of the tiny test models are seconds each; a determinist
# green run is worth more than the warm-cache minutes. bench/tools/CLI
# subprocesses keep their own cache (TPU executables load fine).

import pytest


@pytest.fixture(scope="session")
def shipped_conf_opt():
    """Option dict equivalent to the reference's shipped ST-VQA conf."""
    from ruart_tpu.core.config import read_conf_lines
    from ruart_tpu.core.presets import STVQA_CONF

    return read_conf_lines(STVQA_CONF.splitlines())


from ruart_tpu.core.presets import STVQA_CONF as SHIPPED_CONF  # noqa: E402
