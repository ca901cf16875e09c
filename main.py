#!/usr/bin/env python
"""Train entry point (API parity with the reference's main.py)."""
from ruart_tpu.cli.main import main

if __name__ == "__main__":
    main()
