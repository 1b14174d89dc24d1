#!/usr/bin/env python
"""Sideface trainer CLI (reference: `trainer_sideface.py`)."""
from plankassembly_tpu.cli import main
from plankassembly_tpu.train import SidefaceTrainer

if __name__ == "__main__":
    main(SidefaceTrainer)
