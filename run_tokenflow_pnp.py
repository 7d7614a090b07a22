#!/usr/bin/env python
"""Stage 2: TokenFlow-PnP video editing.

Thin wrapper over tokenflow_tpu.cli.run_pnp (CLI/config parity with the
reference run_tokenflow_pnp.py entry point).
"""
from tokenflow_tpu.cli.run_pnp import main

if __name__ == "__main__":
    main()
