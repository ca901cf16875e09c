"""Run the compile-heavy isolated test files in a child pytest process.

Two full-suite runs segfaulted inside XLA:CPU (once in a persistent-cache
read, once in a fresh compile) at exactly the same point: test_serve's
warmup cross-product, ~260 tests in — the heaviest compile burst of the
suite — while the same file passes standalone every time. Accumulated
process state on the 8-virtual-device CPU backend is the trigger, so the
burst gets a fresh process (same pattern as the torch split,
test_torch_subprocess.py). One `python -m pytest tests/` invocation still
covers the whole suite.
"""

import os
import pathlib
import subprocess
import sys

from conftest import ISOLATED_TEST_FILES

TESTS_DIR = pathlib.Path(__file__).resolve().parent


def test_isolated_files_pass_in_subprocess():
    files = [str(TESTS_DIR / f) for f in ISOLATED_TEST_FILES]
    for f in files:
        assert os.path.exists(f), f"isolated test file missing: {f}"
    # RUART_TORCH_SUBPROCESS lifts conftest's collect_ignore in the child;
    # the explicit file list keeps collection scoped
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
        f"isolated test subprocess failed (exit {proc.returncode}); "
        "inner pytest output above"
    )
    assert " passed" in proc.stdout, proc.stdout[-2000:]
