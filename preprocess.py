#!/usr/bin/env python
"""Stage 1: DDIM-invert a video and store its latent trajectory.

Thin wrapper over tokenflow_tpu.cli.preprocess (CLI parity with the
reference preprocess.py entry point).
"""
from tokenflow_tpu.cli.preprocess import main

if __name__ == "__main__":
    main()
