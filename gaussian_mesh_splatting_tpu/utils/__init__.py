from .profiling import MetricsLogger, StepTimer, xprof_trace
