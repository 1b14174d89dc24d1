"""DataLoader: threaded sample packing (NUM_WORKERS) semantics + overlap.

Reference anchor: `trainer_complete.py:39-42` uses 4 dataloader worker
processes; our loader uses threads (GIL-releasing IO/numpy/ctypes hot path)
so one JAX process keeps owning the TPU client.
"""
import time

import numpy as np

from plankassembly_tpu.data.loader import DataLoader


class _ArrayDataset:
    def __init__(self, n=32, delay=0.0):
        self.n = n
        self.delay = delay

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        if self.delay:
            time.sleep(self.delay)
        return {"x": np.full((3,), i, dtype=np.int64), "name": f"s{i}"}


def _collect(loader):
    return [np.asarray(b["x"]).copy() for b in loader]


def test_workers_preserve_batches():
    ds = _ArrayDataset(32)
    serial = _collect(DataLoader(ds, batch_size=8, num_workers=0,
                                 prefetch=False))
    threaded = _collect(DataLoader(ds, batch_size=8, num_workers=4,
                                   prefetch=False))
    assert len(serial) == len(threaded) == 4
    for a, b in zip(serial, threaded):
        np.testing.assert_array_equal(a, b)


def test_workers_overlap_slow_getitem():
    """4 workers on a sleep-bound __getitem__ must cut wall time ~4x —
    the single-core stand-in for 'packing no longer bounds steps/s'."""
    ds = _ArrayDataset(32, delay=0.02)

    t0 = time.perf_counter()
    _collect(DataLoader(ds, batch_size=8, num_workers=0, prefetch=False))
    serial = time.perf_counter() - t0

    t0 = time.perf_counter()
    _collect(DataLoader(ds, batch_size=8, num_workers=4, prefetch=False))
    threaded = time.perf_counter() - t0

    assert threaded < serial / 2, (serial, threaded)


def _write_infos(tmp_path, n=3):
    import json
    import os

    from plankassembly_tpu.data import geometry as geo
    from plankassembly_tpu.factory.projection import (
        VIEWS, postprocess_complete, project_boxes,
    )
    from plankassembly_tpu.factory.synthetic import generate_cabinet

    os.makedirs(tmp_path / "infos", exist_ok=True)
    names = []
    for seed in range(n):
        planks, attach = generate_cabinet(seed, max_planks=5)
        boxes = planks[1:] / 1280.0
        svgs, views, types_all = [], [], []
        for v_i, view in enumerate(VIEWS):
            lines, types = project_boxes(boxes, view)
            lines, types = postprocess_complete(lines, types)
            svgs.extend(geo.to_geojson(line) for line in lines)
            types_all.extend(types)
            views.extend([v_i] * len(lines))
        name = f"c{seed}"
        info = {"name": name, "views": views, "types": types_all,
                "svgs": svgs,
                "lines": [geo.bounds(geo.from_geojson(s)).tolist()
                          for s in svgs],
                "coords": np.round(planks / 1280.0, 3).tolist(),
                "attach": attach.tolist()}
        with open(tmp_path / "infos" / f"{name}.json", "w") as f:
            json.dump(info, f)
        names.append(f"{name}.json")
    return names


def test_packed_sample_cache_matches_uncached(tmp_path):
    """cache_dir datasets must return byte-identical samples, and cached
    reads must not touch the JSON/packing path again."""
    from plankassembly_tpu.config import Config
    from plankassembly_tpu.data import LineDataset

    names = _write_infos(tmp_path)
    cfg = Config()
    plain = LineDataset(str(tmp_path / "infos"), names, cfg)
    cached = LineDataset(str(tmp_path / "infos"), names, cfg,
                         cache_dir=str(tmp_path / "cache"))
    for i in range(len(names)):
        a, b = plain[i], cached[i]
        assert a["name"] == b["name"]
        for key in a:
            if key != "name":
                np.testing.assert_array_equal(a[key], b[key])

    # reopen: must hit the existing cache and never re-pack
    reopened = LineDataset(str(tmp_path / "infos"), names, cfg,
                           cache_dir=str(tmp_path / "cache"))
    reopened._pack = None  # any packing attempt would now raise
    sample = reopened[1]
    np.testing.assert_array_equal(sample["input_value"],
                                  plain[1]["input_value"])


def test_packed_sample_cache_augmented_reads_bypass(tmp_path):
    """With AUG_RATIO=1.0 every augmented read packs fresh (noise differs
    from the cached clean sample with overwhelming probability)."""
    import dataclasses

    from plankassembly_tpu.config import Config
    from plankassembly_tpu.data import LineDataset

    names = _write_infos(tmp_path)
    cfg = Config()
    cfg = dataclasses.replace(
        cfg, DATA=dataclasses.replace(cfg.DATA, AUG_RATIO=1.0,
                                      NOISE_RATIO=0.5))
    rng = np.random.default_rng(0)
    ds = LineDataset(str(tmp_path / "infos"), names, cfg, augmentation=True,
                     rng=rng, cache_dir=str(tmp_path / "cache"))
    clean = LineDataset(str(tmp_path / "infos"), names, cfg)
    aug = ds[0]
    assert not np.array_equal(aug["input_value"], clean[0]["input_value"])


def test_sideface_packed_cache_matches_uncached(tmp_path):
    from plankassembly_tpu.config import Config
    from plankassembly_tpu.data import SidefaceDataset

    names = _write_infos(tmp_path)
    cfg = Config()
    plain = SidefaceDataset(str(tmp_path / "infos"), names, cfg)
    cached = SidefaceDataset(str(tmp_path / "infos"), names, cfg,
                             cache_dir=str(tmp_path / "cache"))
    for i in range(len(names)):
        a, b = plain[i], cached[i]
        assert a["name"] == b["name"]
        for key in a:
            if key != "name":
                np.testing.assert_array_equal(a[key], b[key])


def test_raster_packed_cache_matches_uncached(tmp_path):
    from plankassembly_tpu.config import Config
    from plankassembly_tpu.data.raster import RasterDataset

    names = _write_infos(tmp_path)
    cfg = Config()
    plain = RasterDataset(str(tmp_path / "infos"), names, cfg)
    cached = RasterDataset(str(tmp_path / "infos"), names, cfg,
                           cache_dir=str(tmp_path / "cache"))
    for i in range(len(names)):
        a, b = plain[i], cached[i]
        assert a["name"] == b["name"]
        for key in a:
            if key != "name":
                np.testing.assert_array_equal(a[key], b[key])


def test_device_loader_matches_host_rows(tmp_path):
    """Device-assembled batches (HBM-resident split + index gather) must
    contain exactly the cached host rows for the drawn indices."""
    from plankassembly_tpu.config import Config
    from plankassembly_tpu.data import LineDataset
    from plankassembly_tpu.data.device_loader import DeviceDataLoader

    names = _write_infos(tmp_path)
    cfg = Config()
    ds = LineDataset(str(tmp_path / "infos"), names, cfg,
                     cache_dir=str(tmp_path / "cache"))
    loader = DeviceDataLoader(ds, ds._cache, batch_size=2, seed=7)
    batch = loader.materialize(next(iter(loader)))
    assert len(batch["name"]) == 2
    name_to_i = {n.split(".")[0]: i for i, n in enumerate(names)}
    for row, name in enumerate(batch["name"]):
        ref = ds[name_to_i[name]]
        for key, val in batch.items():
            if key == "name":
                continue
            np.testing.assert_array_equal(np.asarray(val[row]), ref[key])


def test_device_loader_augments_rows(tmp_path):
    """AUG_RATIO=1.0: every row in the batch is an augmented repack, not the
    cached clean row."""
    import dataclasses

    from plankassembly_tpu.config import Config
    from plankassembly_tpu.data import LineDataset
    from plankassembly_tpu.data.device_loader import DeviceDataLoader

    names = _write_infos(tmp_path)
    cfg = Config()
    cfg = dataclasses.replace(
        cfg, DATA=dataclasses.replace(cfg.DATA, AUG_RATIO=1.0,
                                      NOISE_RATIO=0.5))
    ds = LineDataset(str(tmp_path / "infos"), names, cfg, augmentation=True,
                     rng=np.random.default_rng(0),
                     cache_dir=str(tmp_path / "cache"))
    clean = LineDataset(str(tmp_path / "infos"), names, cfg)
    loader = DeviceDataLoader(ds, ds._cache, batch_size=2, seed=7)
    batch = loader.materialize(next(iter(loader)))
    name_to_i = {n.split(".")[0]: i for i, n in enumerate(names)}
    for row, name in enumerate(batch["name"]):
        ref = clean[name_to_i[name]]
        assert not np.array_equal(np.asarray(batch["input_value"][row]),
                                  ref["input_value"])


def test_device_loader_trainer_e2e(tmp_path):
    """fit with trainer.device_data: loss finite, steps advance, epochs
    re-shuffle."""
    import dataclasses

    import jax.numpy as jnp

    from plankassembly_tpu.config import Config
    from plankassembly_tpu.train.loop import Trainer
    from tests.tiny import tiny_config

    names = _write_infos(tmp_path, n=4)
    with open(tmp_path / "split.txt", "w") as f:
        f.write("".join(f"{n}\n" for n in names))
    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, ROOT=str(tmp_path / "infos"),
        DATASETS_TRAIN=str(tmp_path / "split.txt"),
        DATASETS_VALID=str(tmp_path / "split.txt"),
        DATASETS_TEST=str(tmp_path / "split.txt"),
        BATCH_SIZE=2,
        DATA=dataclasses.replace(cfg.DATA, MAX_INPUT_LENGTH=1200,
                                 MAX_OUTPUT_LENGTH=48, AUG_RATIO=0.5),
        trainer=dataclasses.replace(cfg.trainer, devices=1, max_epochs=2,
                                    check_val_every_n_epoch=100,
                                    device_data=True, log_every_n_steps=1,
                                    default_root_dir=str(tmp_path / "logs")))
    trainer = Trainer(cfg, compute_dtype=jnp.float32)
    state = trainer.fit()
    assert int(state.step) == 4  # 2 epochs x 2 steps (drop_last)


def test_flat_buffer_roundtrip_all_dtypes():
    """`_flat` / `unpack_flat` invert each other for every supported field
    dtype (int16 direct, bool widened, int32/float32 as int16 pairs)."""
    import jax.numpy as jnp

    from plankassembly_tpu.data.device_loader import (
        DeviceDataLoader, unpack_flat)

    rng = np.random.default_rng(3)
    B, K = 4, 3
    aug = {
        "tok": rng.integers(-500, 640, (K, 7)).astype(np.int16),
        "mask": rng.random((K, 5)) < 0.5,
        "wide": rng.integers(-(2**30), 2**30, (K, 2)).astype(np.int32),
        "flt": rng.standard_normal((K, 3)).astype(np.float32),
    }
    idx = np.array([70000, 0, 25999, 3], np.int64)
    pos = np.array([2, 0, B], np.int32)  # B == unused slot

    loader = DeviceDataLoader.__new__(DeviceDataLoader)
    loader.batch_size = B
    loader.max_aug_rows = K
    loader.layout = tuple(
        (k, v.shape[1:], str(v.dtype)) for k, v in aug.items())
    from plankassembly_tpu.data.device_loader import _field_i16_elems
    loader._buf_elems = 2 * B + K + K * sum(
        _field_i16_elems(s, d) for _, s, d in loader.layout)

    buf = loader._flat(idx, aug, pos)
    idx2, pos2, aug2 = unpack_flat(jnp.asarray(buf), loader.layout, B, K)
    np.testing.assert_array_equal(np.asarray(idx2), idx)
    np.testing.assert_array_equal(np.asarray(pos2), pos)
    for k, v in aug.items():
        got = np.asarray(aug2[k])
        assert got.dtype == v.dtype
        np.testing.assert_array_equal(got, v)
