"""Input-corruption augmentation (the paper's robustness story).

Behavioral match of `add_noise` in the reference
(`plankassembly/datasets/data_utils.py:24-68`): pick 1..ceil(K*noise_ratio)
lines, each either deleted or shortened by up to `noise_length` from a random
end. Operates on numpy polylines (see `geometry.py`).
"""
from __future__ import annotations

import numpy as np

from plankassembly_tpu.data import geometry as geo


def add_noise(lines, views, types, noise_ratio, noise_length, rng=None):
    """Corrupt a random subset of lines. Returns (lines, views, types) lists.

    `rng` defaults to the global numpy RNG to match reference seeding
    behavior; pass a `np.random.Generator` for isolated reproducibility.
    """
    rng = rng or np.random
    lines = list(lines)
    num_select = rng.randint(1, int(np.ceil(len(lines) * noise_ratio)) + 1) \
        if hasattr(rng, "randint") else int(rng.integers(1, int(np.ceil(len(lines) * noise_ratio)) + 1))

    indices = rng.choice(len(lines), num_select, replace=False)

    for index in indices:
        if rng.random() > 0.5:
            lines[index] = None  # delete
        else:
            line = lines[index]
            length = geo.length(line)

            noise = rng.random() * noise_length
            noise = float(np.round(noise, 3))

            if length <= noise:
                lines[index] = None  # too short after shortening: delete
            else:
                if rng.random() > 0.5:
                    # keep [0, length - noise]
                    pts = np.stack([geo.interpolate(line, 0.0),
                                    geo.interpolate(line, -noise)])
                else:
                    # keep [noise, length]
                    pts = np.stack([geo.interpolate(line, noise),
                                    geo.interpolate(line, length)])
                lines[index] = geo.linestring(pts)

    noisy_lines, noisy_views, noisy_types = [], [], []
    for line, view, line_type in zip(lines, views, types):
        if line is None:
            continue
        noisy_lines.append(line)
        noisy_views.append(view)
        noisy_types.append(line_type)

    return noisy_lines, noisy_views, noisy_types
