#!/usr/bin/env python
"""Raster-image/ViT trainer CLI (raster-input modality, see
`plankassembly_tpu/models/vit.py`)."""
from plankassembly_tpu.cli import main
from plankassembly_tpu.train.raster_loop import RasterTrainer

if __name__ == "__main__":
    main(RasterTrainer)
