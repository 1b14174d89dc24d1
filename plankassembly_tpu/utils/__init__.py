from plankassembly_tpu.utils.profiling import StepTimer, trace_context

__all__ = ["StepTimer", "trace_context"]
