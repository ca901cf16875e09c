"""Run the torch-importing test files in one child pytest process.

torch and jax sharing one process has caused hard crashes around the
persistent compile cache (see the history in conftest.py — the cache is
now fully disabled for the suite, and this split still keeps torch's
allocator/zstd symbols out of the long-lived main process). This wrapper
runs every file in conftest.TORCH_TEST_FILES in a single child process
with `RUART_TORCH_SUBPROCESS=1`, so one `python -m pytest tests/`
invocation covers the whole suite (VERDICT r3 next #7).
"""

import os
import pathlib
import subprocess
import sys

from conftest import TORCH_TEST_FILES

TESTS_DIR = pathlib.Path(__file__).resolve().parent


def test_torch_files_pass_in_subprocess():
    files = [str(TESTS_DIR / f) for f in TORCH_TEST_FILES]
    for f in files:
        assert os.path.exists(f), f"torch test file missing: {f}"
    env = dict(os.environ, RUART_TORCH_SUBPROCESS="1")
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "-q", *files],
        env=env,
        capture_output=True,
        text=True,
        cwd=str(TESTS_DIR.parent),
        timeout=3600,
    )
    if proc.returncode != 0:
        sys.stdout.write(proc.stdout[-20000:])
        sys.stderr.write(proc.stderr[-20000:])
    assert proc.returncode == 0, (
        f"torch test subprocess failed (exit {proc.returncode}); "
        "inner pytest output above"
    )
    # Exit code 0 with zero collected tests would be silent coverage loss.
    assert " passed" in proc.stdout, proc.stdout[-2000:]
