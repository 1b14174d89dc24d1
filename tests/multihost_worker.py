"""Worker process for tests/test_multihost.py.

Runs a deterministic fit(6 steps) + validate + test under jax.distributed
with gloo CPU collectives and dumps results as JSON. Launched with
PLANK_TEST_{NUM_PROCS,PROC_ID,PORT,OUT,LOGDIR} set; 8 global devices are
split evenly across processes.
"""
import json
import os
import sys

NUM_PROCS = int(os.environ["PLANK_TEST_NUM_PROCS"])
PROC_ID = int(os.environ["PLANK_TEST_PROC_ID"])
PORT = os.environ["PLANK_TEST_PORT"]
OUT = os.environ["PLANK_TEST_OUT"]
LOGDIR = os.environ["PLANK_TEST_LOGDIR"]

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={8 // NUM_PROCS}").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
if NUM_PROCS > 1:
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator_address=f"localhost:{PORT}",
                               num_processes=NUM_PROCS, process_id=PROC_ID)
    # Establish the Gloo context NOW, while the workers are within
    # milliseconds of each other (both just finished `import jax`; the
    # parent Popen'ed them in one loop). Gloo's full-mesh rendezvous has a
    # fixed ~30 s window; without this, the first collective fires only
    # after each worker's train-step compile — and a persistent-cache hit
    # on one side but not the other (or a busy sibling job on this 1-core
    # host) skews them past the window (GetKeyValue DEADLINE_EXCEEDED).
    # Later collectives reuse the context created here, so compile skew
    # no longer matters.
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices("plank_multihost_gloo_warmup")

sys.path.insert(0, "/root/repo")

import dataclasses  # noqa: E402
import numpy as np  # noqa: E402

from plankassembly_tpu.data import geometry as geo  # noqa: E402
from plankassembly_tpu.factory.projection import (  # noqa: E402
    VIEWS, postprocess_complete, project_boxes,
)
from plankassembly_tpu.factory.synthetic import generate_cabinet  # noqa: E402
from plankassembly_tpu.io.svg import parse_svg, render_svg  # noqa: E402
from plankassembly_tpu.train.loop import VisibleTrainer  # noqa: E402
from tests.tiny import tiny_config  # noqa: E402


def build_dataset(root: str, n: int = 12) -> None:
    os.makedirs(os.path.join(root, "infos"), exist_ok=True)
    names = []
    for seed in range(n):
        planks, attach = generate_cabinet(seed, max_planks=5)
        boxes = planks[1:] / 1280.0
        svgs, views, types_all = [], [], []
        for v_i, view in enumerate(VIEWS):
            lines, types = project_boxes(boxes, view)
            lines, types = postprocess_complete(lines, types)
            path = os.path.join(root, f"tmp_{view}.svg")
            render_svg(path, lines, types)
            plines, ptypes = parse_svg(path)
            svgs.extend(geo.to_geojson(l) for l in plines)
            types_all.extend(ptypes)
            views.extend([v_i] * len(plines))
        name = f"syn{seed:03d}"
        info = {
            "name": name,
            "lines": [geo.bounds(geo.from_geojson(s)).tolist() for s in svgs],
            "views": views, "types": types_all, "svgs": svgs,
            "coords": np.round(planks / 1280.0, 3).tolist(),
            "attach": attach.tolist(),
        }
        with open(os.path.join(root, "infos", f"{name}.json"), "w") as f:
            json.dump(info, f)
        names.append(name)
    for split in ("train", "valid", "test"):
        with open(os.path.join(root, f"{split}.txt"), "w") as f:
            f.write("".join(f"{m}.json\n" for m in names))


def main():
    # per-process private dataset dir (identical deterministic content)
    data_root = os.path.join(os.path.dirname(OUT), f"data_p{PROC_ID}")
    build_dataset(data_root)

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg,
        ROOT=os.path.join(data_root, "infos"),
        DATASETS_TRAIN=os.path.join(data_root, "train.txt"),
        DATASETS_VALID=os.path.join(data_root, "valid.txt"),
        DATASETS_TEST=os.path.join(data_root, "test.txt"),
        BATCH_SIZE=1,  # x8 devices -> global batch 8
        LR=3e-3,
        DATA=dataclasses.replace(cfg.DATA, MAX_INPUT_LENGTH=320,
                                 MAX_OUTPUT_LENGTH=48, AUG_RATIO=0.0),
        trainer=dataclasses.replace(
            cfg.trainer, devices=8, max_epochs=6, log_every_n_steps=1,
            default_root_dir=os.path.dirname(LOGDIR)),
    )

    import jax.numpy as jnp
    trainer = VisibleTrainer(cfg, log_dir=LOGDIR,
                             compute_dtype=jnp.float32)
    state = trainer.init_state()

    # 6 deterministic steps (augmentation off, fixed seeds)
    losses = []
    loader = trainer.train_dataloader()
    with trainer.mesh:
        for epoch in range(6):
            for batch in loader:
                arrays = {k: v for k, v in batch.items()
                          if hasattr(v, "shape") and not k.startswith("_")}
                trainer._rng, sub = jax.random.split(trainer._rng)
                state, mets = trainer.train_step_fn(state, arrays, sub)
                losses.append(float(mets["loss"]))

    val = trainer.validate(state)

    written = []
    orig = trainer._write_prediction

    def recording(pred_dir, name, *a, **kw):
        written.append(f"{name}.json")
        return orig(pred_dir, name, *a, **kw)

    trainer._write_prediction = recording
    test = trainer.test(state)

    result = {
        "losses": losses,
        "val": [float(x) for x in val],
        "test": [float(x) for x in test],
        "pred_files": written,
        "wrote_metrics_jsonl": os.path.exists(
            os.path.join(LOGDIR, "metrics.jsonl"))
        and trainer.logger.enabled,
    }
    with open(OUT, "w") as f:
        json.dump(result, f)
    print("worker", PROC_ID, "done", flush=True)


if __name__ == "__main__":
    main()
