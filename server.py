#!/usr/bin/env python
"""Server entry shim (reference server.py is the same 4-line shim)."""
from gyre_tpu.server import main

if __name__ == "__main__":
    main()
