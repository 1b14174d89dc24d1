#!/usr/bin/env python
"""Complete-lines trainer CLI (reference: `trainer_complete.py`).

Usage:
    python trainer_complete.py fit  --config configs/train_complete.yaml
    python trainer_complete.py test --config ... --ckpt_path <checkpoint dir>
"""
from plankassembly_tpu.cli import main
from plankassembly_tpu.train import Trainer

if __name__ == "__main__":
    main(Trainer)
