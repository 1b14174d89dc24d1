"""Offline data factory: shape programs -> three-view line drawings -> info
JSONs (the filesystem contract consumed by the datasets).

Replaces the reference's OCCT hidden-line-removal pipeline
(`dataset/data_utils.py:49-101`) with an exact numpy HLR for axis-aligned
box compounds — the only geometry this dataset contains — plus a procedural
cabinet generator for synthetic data.
"""
from plankassembly_tpu.factory.projection import (
    project_boxes, postprocess_complete, postprocess_visible,
)
from plankassembly_tpu.factory.synthetic import generate_cabinet

__all__ = ["project_boxes", "postprocess_complete", "postprocess_visible",
           "generate_cabinet"]
