#!/usr/bin/env python
"""Stage 2: TokenFlow-ControlNet video editing.

Thin wrapper over tokenflow_tpu.cli.run_controlnet (the runner the
reference README advertises but does not ship).
"""
from tokenflow_tpu.cli.run_controlnet import main

if __name__ == "__main__":
    main()
