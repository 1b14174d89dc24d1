#!/usr/bin/env python
"""Visible-lines trainer CLI (reference: `trainer_visible.py`)."""
from plankassembly_tpu.cli import main
from plankassembly_tpu.train import VisibleTrainer

if __name__ == "__main__":
    main(VisibleTrainer)
