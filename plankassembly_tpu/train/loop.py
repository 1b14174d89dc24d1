"""Training / validation / test orchestration for the three modalities.

Mirrors the reference Lightning trainers:
- `Trainer`  <-> `trainer_complete.py:19-129` (LineDataset, train-time noise
  augmentation ON)
- `VisibleTrainer` <-> `trainer_visible.py:10-23` (LineDataset; the
  reference passes cfg positionally so augmentation stays OFF — quirk kept)
- `SidefaceTrainer` <-> `trainer_sideface.py:20-84` (SidefaceDataset;
  empty-sideface test samples score 0, skip the criterion, and their pred
  JSON has no planks)

TPU-native differences: one process drives a ('data','model') mesh; the
eval loop is a single jitted KV-cached decode + on-device matching per
batch instead of per-sample Python; checkpoints are orbax; metrics stream
to JSONL + stdout. Prediction JSONs stay bit-compatible with
`trainer_complete.py:110-118`.
"""
from __future__ import annotations

import dataclasses
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from plankassembly_tpu.config import Config
from plankassembly_tpu.data import LineDataset, SidefaceDataset
from plankassembly_tpu.data.loader import DataLoader, pad_batch_to, parse_splits_list
from plankassembly_tpu.decode import greedy_decode, parse_sequence, pick_kv_bucket
from plankassembly_tpu.metrics import batch_scores, build_criterion, metric_sums
from plankassembly_tpu.models.model import ModelDims, init_params
from plankassembly_tpu.parallel import multihost
from plankassembly_tpu.parallel.mesh import (
    batch_sharding, make_mesh, shard_params,
)
from plankassembly_tpu.train.state import (
    TrainState, init_state, make_optimizer, make_train_step,
)


def _rss_mb() -> int:
    """Host resident set size — logged every log step so host-memory
    behavior over a long run is visible in the metrics stream (this
    container's remote-TPU transfer path leaks ~the transferred bytes per
    device_put; the loader ships int16 to halve it — CLAUDE.md)."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    return int(line.split()[1]) // 1024
    except OSError:
        pass
    return -1


class MetricsLogger:
    """JSONL + stdout + TensorBoard logger. The tfevents stream matches the
    reference's Lightning TensorBoard logger surface
    (`trainer_complete.py:69-70,87-89`); JSONL is the greppable primary.
    Rank-0 only in multi-host runs (Lightning rank-zero-only IO analog)."""

    def __init__(self, log_dir: str):
        self.enabled = multihost.is_main()
        self.path = os.path.join(log_dir, "metrics.jsonl")
        if not self.enabled:
            self._f = None
            self._tb = None
            return
        os.makedirs(log_dir, exist_ok=True)
        self._f = open(self.path, "a")
        from plankassembly_tpu.utils.tb_writer import TensorBoardWriter
        self._tb = TensorBoardWriter(log_dir)

    def log(self, step: int, payload: dict):
        if not self.enabled:
            return
        rec = {"step": step, "time": time.time(), **payload}
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        for key, value in payload.items():
            if isinstance(value, (int, float)) and key != "epoch":
                self._tb.add_scalar(key, float(value), step,
                                    wall_time=rec["time"])
        self._tb.flush()
        pretty = " ".join(f"{k}={v:.4f}" if isinstance(v, float) else f"{k}={v}"
                          for k, v in payload.items())
        print(f"[step {step}] {pretty}", flush=True)


class Trainer:
    """Complete-lines modality trainer."""

    dataset_cls = LineDataset
    train_augmentation = True  # `trainer_complete.py:38` passes True

    def __init__(self, cfg: Config, log_dir: str | None = None,
                 compute_dtype=jnp.bfloat16):
        self.cfg = cfg
        self.dims = ModelDims.from_config(cfg)
        self.compute_dtype = compute_dtype

        # hardware RBG PRNG: dropout masks over (B, H, L, L) attention
        # weights are a large share of the train step; threefry bit
        # generation is ~25% slower end-to-end on this workload
        jax.config.update("jax_default_prng_impl", "rbg")

        tc = cfg.trainer
        tp = max(1, tc.tensor_parallel) if tc.strategy == "dp+tp" else 1
        num_data = max(1, min(tc.devices, len(jax.devices()) // tp))
        self.mesh = make_mesh(num_data=num_data, num_model=tp)
        self.tensor_parallel = tp > 1
        self.global_batch = cfg.BATCH_SIZE * num_data

        # `detect_anomaly: True` (reference `configs/train_complete.yaml:16`)
        # maps to a per-log-step finite-loss assertion (see `fit`): torch's
        # detect_anomaly instruments only backward, but jax_debug_nans
        # forces synchronous dispatch on TPU, which is unacceptable as an
        # always-on default. Set PLANK_DEBUG_NANS=1 to additionally enable
        # jax_debug_nans for NaN localization (DEVIATIONS.md).
        self.detect_anomaly = tc.detect_anomaly
        if tc.detect_anomaly and os.environ.get("PLANK_DEBUG_NANS") == "1":
            jax.config.update("jax_debug_nans", True)

        self.log_dir = log_dir or os.path.join(
            tc.default_root_dir, f"version_{int(time.time())}")
        os.makedirs(self.log_dir, exist_ok=True)
        self.logger = MetricsLogger(self.log_dir)
        self._save_hyperparameters()

        self.optimizer = make_optimizer(cfg.LR)
        use_flash = (tc.fused_attention
                     and jax.default_backend() == "tpu")
        # shared step construction args — the fused device-data step
        # (make_device_train_step) is built from the same set in fit()
        self._step_kwargs = dict(compute_dtype=compute_dtype,
                                 flash=use_flash)
        self.train_step_fn = make_train_step(
            self.optimizer, self.dims, **self._step_kwargs)
        self.criterion = build_criterion()
        self._rng = jax.random.PRNGKey(cfg.seed_everything)

    def _save_hyperparameters(self):
        """Persist the full config into the run dir (the reference's
        Lightning `save_hyperparameters`, `trainer_complete.py:24`)."""
        if not multihost.is_main():
            return
        import yaml
        with open(os.path.join(self.log_dir, "hparams.yaml"), "w") as f:
            yaml.safe_dump(dataclasses.asdict(self.cfg), f,
                           default_flow_style=False)

    # ------------------------------------------------------------------
    # data
    # ------------------------------------------------------------------
    def _dataset(self, split_files: str, augmentation: bool):
        info_files = parse_splits_list(split_files)
        kwargs = {}
        tc = self.cfg.trainer
        if (tc.sample_cache or tc.device_data) and self.dataset_cls in (
                LineDataset, SidefaceDataset):
            kwargs["cache_dir"] = os.path.join(
                tc.default_root_dir, ".sample_cache")
        return self.dataset_cls(self.cfg.ROOT, info_files, self.cfg,
                                augmentation=augmentation, **kwargs)

    def train_dataloader(self) -> DataLoader:
        ds = self._dataset(self.cfg.DATASETS_TRAIN, self.train_augmentation)
        if (self.cfg.trainer.device_data and jax.process_count() == 1
                and getattr(ds, "_cache", None) is not None):
            from plankassembly_tpu.data.device_loader import DeviceDataLoader
            return DeviceDataLoader(ds, ds._cache, self.global_batch,
                                    seed=self.cfg.seed_everything,
                                    sharding=batch_sharding(self.mesh))
        return DataLoader(ds,
                          batch_size=self.global_batch, shuffle=True,
                          drop_last=True, seed=self.cfg.seed_everything,
                          sharding=batch_sharding(self.mesh),
                          num_workers=self.cfg.NUM_WORKERS)

    _eval_order_cache: dict = {}

    def _eval_order(self, dataset):
        """Length-sorted eval order: batches of similar program/input length
        early-exit together and hit smaller kv buckets, instead of every
        batch being gated by its single longest member. Metrics are
        order-invariant (macro average per sample). Cached per dataset —
        val/test dataloaders are rebuilt every validation and the sort
        needs one JSON read per sample."""
        cache_key = (dataset.root, tuple(dataset.info_files))
        hit = self._eval_order_cache.get(cache_key)
        if hit is not None:
            return hit
        import json as _json
        keys = []
        for name in dataset.info_files:
            try:
                with open(os.path.join(dataset.root, name)) as f:
                    info = _json.load(f)
                keys.append((len(info.get("coords", [])),
                             len(info.get("lines", []))))
            except Exception:
                keys.append((1 << 30, 1 << 30))
        order = np.lexsort(([k[1] for k in keys], [k[0] for k in keys]))
        self._eval_order_cache[cache_key] = order
        return order

    def val_dataloader(self) -> DataLoader:
        ds = self._dataset(self.cfg.DATASETS_VALID, False)
        return DataLoader(ds, batch_size=self.global_batch,
                          order=self._eval_order(ds),
                          num_workers=self.cfg.NUM_WORKERS,
                          sharding=batch_sharding(self.mesh),
                          pad_to_batch=True)

    def test_dataloader(self) -> DataLoader:
        ds = self._dataset(self.cfg.DATASETS_TEST, False)
        return DataLoader(ds, batch_size=self.global_batch,
                          order=self._eval_order(ds),
                          num_workers=self.cfg.NUM_WORKERS,
                          sharding=batch_sharding(self.mesh),
                          pad_to_batch=True)

    # ------------------------------------------------------------------
    # fit
    # ------------------------------------------------------------------
    def init_state(self, seed: int | None = None) -> TrainState:
        params = init_params(
            jax.random.PRNGKey(seed if seed is not None
                               else self.cfg.seed_everything), self.dims)
        params = shard_params(params, self.mesh, self.tensor_parallel)
        return init_state(params, self.optimizer)

    def fit(self, state: TrainState | None = None,
            max_epochs: int | None = None) -> TrainState:
        cfg = self.cfg
        state = state if state is not None else self.init_state()
        max_epochs = max_epochs or cfg.trainer.max_epochs
        best_f1 = -1.0
        loader = self.train_dataloader()
        from plankassembly_tpu.utils.profiling import StepTimer
        timer = StepTimer()

        device_step = None
        with self.mesh:
            for epoch in range(max_epochs):
                for batch in loader:
                    self._rng, sub = jax.random.split(self._rng)
                    if "_buf" in batch:
                        # device-resident data: the step unpacks the single
                        # flat transfer buffer and fuses batch assembly
                        if device_step is None:
                            from plankassembly_tpu.train.state import (
                                make_packed_device_train_step,
                            )
                            device_step = make_packed_device_train_step(
                                self.optimizer, self.dims, loader.layout,
                                loader.batch_size, loader.max_aug_rows,
                                batch_sharding=batch_sharding(self.mesh),
                                **self._step_kwargs)
                        state, mets = device_step(
                            state, loader.fields, batch["_buf"], sub)
                    else:
                        arrays = {k: v for k, v in batch.items()
                                  if hasattr(v, "shape")}
                        state, mets = self.train_step_fn(state, arrays, sub)
                    timer.tick(mets["loss"])
                    step = int(state.step)
                    if step % cfg.trainer.log_every_n_steps == 0:
                        loss_host = float(mets["loss"])
                        if self.detect_anomaly and not np.isfinite(loss_host):
                            raise FloatingPointError(
                                f"non-finite train loss {loss_host} at step "
                                f"{step} (epoch {epoch}); rerun with "
                                "PLANK_DEBUG_NANS=1 to localize")
                        payload = {
                            "epoch": epoch,
                            "train/loss": loss_host,
                            "train/accuracy": float(mets["accuracy"]),
                        }
                        if timer.steps_per_sec:
                            payload["train/steps_per_sec"] = round(
                                timer.steps_per_sec, 3)
                        payload["host_rss_mb"] = _rss_mb()
                        self.logger.log(step, payload)

                if (epoch + 1) % cfg.trainer.check_val_every_n_epoch == 0:
                    prec, rec, f1 = self.validate(state)
                    self.logger.log(int(state.step), {
                        "epoch": epoch, "val/precision": prec,
                        "val/recall": rec, "val/fmeasure": f1,
                    })
                    if f1 > best_f1:
                        best_f1 = f1
                        self.save_checkpoint(state, "best", epoch=epoch,
                                             metrics={"val/precision": prec,
                                                      "val/recall": rec,
                                                      "val/fmeasure": f1})
                    if cfg.trainer.save_last:
                        self.save_checkpoint(state, "last", epoch=epoch)
            if cfg.trainer.save_last:
                self.save_checkpoint(state, "last", epoch=max_epochs - 1)
        return state

    # ------------------------------------------------------------------
    # eval
    # ------------------------------------------------------------------
    def _decode_batch(self, state: TrainState, batch: dict):
        arrays = {k: jnp.asarray(v) for k, v in batch.items()
                  if hasattr(v, "shape") and not k.startswith("_")}
        inputs = {k: v for k, v in arrays.items() if k.startswith("input")}
        # each distinct bucket compiles the decode graph once (persistent
        # compile cache); finer quanta cut cross-attention HBM reads on
        # short length-sorted batches (re-measured in round 2 — see
        # CLAUDE.md perf ledger)
        bucket = pick_kv_bucket(inputs["input_mask"],
                                quantum=self.cfg.trainer.kv_quantum)
        impl = self.cfg.trainer.decode_impl
        if impl.startswith("beam") and impl[4:].isdigit():
            # beyond-reference: beam-search eval (plankassembly_tpu/beam.py)
            from plankassembly_tpu.beam import beam_decode
            out = beam_decode(state.params, inputs, self.dims,
                              num_beams=int(impl[4:]),
                              compute_dtype=self.compute_dtype,
                              kv_bucket=bucket)
            return arrays, out
        # kv_quant False is the config DEFAULT, not an explicit request —
        # map it to None so decode_impl='persistent' (whose int8-cross
        # semantics are built in) doesn't warn on every eval trace
        out = greedy_decode(state.params, inputs, self.dims,
                            compute_dtype=self.compute_dtype,
                            kv_bucket=bucket,
                            kv_quant=self.cfg.trainer.kv_quant or None,
                            cross_impl=impl)
        return arrays, out

    def validate(self, state: TrainState) -> tuple[float, float, float]:
        criterion = build_criterion()
        with self.mesh:
            for batch in self.val_dataloader():
                arrays, out = self._decode_batch(state, batch)
                p, r, f, n = metric_sums(
                    out["samples"], arrays["output_value"],
                    arrays["sample_valid"],
                    end=self.cfg.TOKEN.END, dof=self.dims.num_output_dof,
                    threshold=self.cfg.THRESHOLD)
                criterion.update(float(p), float(r), float(f),
                                 count=int(float(n)))
        return criterion.compute()

    def test(self, state: TrainState) -> tuple[float, float, float]:
        """Decode the test split and dump bit-compatible prediction JSONs
        (`trainer_complete.py:91-118`). Multi-host: every process writes the
        JSONs for its own batch rows; the criterion totals are summed across
        processes (torchmetrics sync analog)."""
        pred_dir = os.path.join(self.log_dir, "pred_jsons")
        os.makedirs(pred_dir, exist_ok=True)
        criterion = build_criterion()

        with self.mesh:
            for batch in self.test_dataloader():
                arrays, out = self._decode_batch(state, batch)
                lo, hi = batch["_rows"]
                samples = multihost.local_rows(out["samples"], lo, hi)
                attach = multihost.local_rows(out["attach"], lo, hi)
                gts = multihost.local_rows(arrays["output_value"], lo, hi)
                if "input_mask" in arrays:
                    in_masks = multihost.local_rows(arrays["input_mask"],
                                                    lo, hi)
                else:  # raster modality has no token mask
                    in_masks = np.zeros((len(samples), 1), bool)
                local_valid = batch["_local_valid"]

                for i, name in enumerate(batch["name"]):
                    if not local_valid[i]:
                        continue
                    scores = self._write_prediction(
                        pred_dir, name, samples[i], attach[i], gts[i],
                        in_masks[i])
                    if scores is not None:
                        criterion.update(*scores)

        totals = multihost.host_allsum([criterion.precision, criterion.recall,
                                        criterion.fmeasure, criterion.total])
        criterion.precision, criterion.recall, criterion.fmeasure = (
            float(totals[0]), float(totals[1]), float(totals[2]))
        criterion.total = int(totals[3])
        prec, rec, f1 = criterion.compute()
        if multihost.is_main():
            self.logger.log(int(state.step), {
                "test/precision": prec, "test/recall": rec,
                "test/fmeasure": f1})
        return prec, rec, f1

    def _write_prediction(self, pred_dir, name, sample, attach, gt, in_mask):
        from plankassembly_tpu.metrics import hungarian_match_host
        pred = parse_sequence(sample, self.dims)
        gt_parsed = parse_sequence(gt, self.dims)

        # filter zero-extent planks, keep bbox row (`trainer_complete.py:100-101`)
        if len(pred) > 0:
            body = pred[1:]
            keep = np.all(np.abs(body[:, 3:] - body[:, :3]) != 0, axis=1)
            valid_pred = np.concatenate([pred[:1], body[keep]])
        else:
            valid_pred = pred

        prec, rec, f1 = hungarian_match_host(
            valid_pred[1:], gt_parsed[1:], self.cfg.THRESHOLD)

        atta = attach[: valid_pred.size].reshape(-1, 6).tolist()
        payload = {
            "prediction": valid_pred.tolist(),
            "attach": atta,
            "groundtruth": gt_parsed.tolist(),
            "precision": prec,
            "recall": rec,
            "fmeasure": f1,
        }
        with open(os.path.join(pred_dir, f"{name}.json"), "w") as f:
            json.dump(payload, f, indent=4, separators=(", ", ": "))
        return prec, rec, f1

    # ------------------------------------------------------------------
    # checkpointing (orbax; policy from `configs/train_complete.yaml:6-14`)
    # ------------------------------------------------------------------
    def save_checkpoint(self, state: TrainState, tag: str, epoch: int = -1,
                        metrics: dict | None = None):
        import orbax.checkpoint as ocp
        path = os.path.abspath(os.path.join(self.log_dir, "checkpoints", tag))
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(path, {"params": state.params,
                              "opt_state": state.opt_state,
                              "step": state.step}, force=True)
        meta = {"epoch": epoch, "step": int(state.step),
                "metrics": metrics or {}}
        if multihost.is_main():
            with open(path + ".meta.json", "w") as f:
                json.dump(meta, f)

    def load_checkpoint(self, path: str) -> TrainState:
        import orbax.checkpoint as ocp
        template = self.init_state()
        with ocp.StandardCheckpointer() as ckptr:
            restored = ckptr.restore(
                os.path.abspath(path),
                {"params": template.params,
                 "opt_state": template.opt_state,
                 "step": template.step})
        return TrainState(restored["params"], restored["opt_state"],
                          restored["step"])


class VisibleTrainer(Trainer):
    """Visible-lines modality. The reference's positional-arg slip leaves
    augmentation False for training (`trainer_visible.py:17-18`) — the
    published visible checkpoint was trained that way, so we keep it."""

    train_augmentation = False


class SidefaceTrainer(Trainer):
    """Sideface modality (`trainer_sideface.py:20-84`)."""

    dataset_cls = SidefaceDataset
    train_augmentation = True

    def _write_prediction(self, pred_dir, name, sample, attach, gt, in_mask):
        pred = parse_sequence(sample, self.dims)
        gt_parsed = parse_sequence(gt, self.dims)

        if in_mask[1:].all():
            # no detected sidefaces: zero score, no criterion update
            # (`trainer_sideface.py:61-65`)
            payload = {
                "prediction": [],
                "groundtruth": gt_parsed.tolist(),
                "precision": 0.0, "recall": 0.0, "fmeasure": 0.0,
            }
            with open(os.path.join(pred_dir, f"{name}.json"), "w") as f:
                json.dump(payload, f, indent=4, separators=(", ", ": "))
            return None

        from plankassembly_tpu.metrics import hungarian_match_host
        if len(pred) > 0:
            body = pred[1:]
            keep = np.all(np.abs(body[:, 3:] - body[:, :3]) != 0, axis=1)
            valid_pred = np.concatenate([pred[:1], body[keep]])
        else:
            valid_pred = pred
        prec, rec, f1 = hungarian_match_host(
            valid_pred[1:], gt_parsed[1:], self.cfg.THRESHOLD)
        # sideface pred JSONs carry no 'attach' key (`trainer_sideface.py:77-84`)
        payload = {
            "prediction": valid_pred.tolist(),
            "groundtruth": gt_parsed.tolist(),
            "precision": prec, "recall": rec, "fmeasure": f1,
        }
        with open(os.path.join(pred_dir, f"{name}.json"), "w") as f:
            json.dump(payload, f, indent=4, separators=(", ", ": "))
        return prec, rec, f1
