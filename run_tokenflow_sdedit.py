#!/usr/bin/env python
"""Stage 2: TokenFlow-SDEdit video editing.

Thin wrapper over tokenflow_tpu.cli.run_sdedit (CLI/config parity with the
reference run_tokenflow_sdedit.py entry point).
"""
from tokenflow_tpu.cli.run_sdedit import main

if __name__ == "__main__":
    main()
