from .profiling import MetricsLogger, StepTimer, xprof_trace
from .general import safe_state
