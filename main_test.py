#!/usr/bin/env python
"""Test-inference entry point (API parity with the reference's main_test.py)."""
from ruart_tpu.cli.main_test import main

if __name__ == "__main__":
    main()
