from plankassembly_tpu.train.loop import Trainer, SidefaceTrainer, VisibleTrainer

__all__ = ["Trainer", "VisibleTrainer", "SidefaceTrainer"]
