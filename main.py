#!/usr/bin/env python
"""Entry shim mirroring the reference's ``python main.py`` CLI."""

from vqwild_tpu.apps.cli import main

if __name__ == "__main__":
    main()
