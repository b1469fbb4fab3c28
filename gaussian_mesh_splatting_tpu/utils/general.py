"""General utilities: reproducibility + stdout decoration
(reference utils/general_utils.py:192-213 safe_state)."""
from __future__ import annotations

import random
import sys
from datetime import datetime

import numpy as np


def safe_state(silent: bool = False, seed: int = 0) -> None:
    """Seed python/numpy RNGs and timestamp stdout lines like the
    reference's safe_state (torch seeding becomes jax PRNG keys passed
    explicitly — there is no global jax seed by design)."""
    old_stdout = sys.stdout

    class _F:
        def __init__(self, silent):
            self.silent = silent

        def write(self, x):
            if not self.silent:
                if x.endswith("\n"):
                    ts = datetime.now().strftime("%d/%m %H:%M:%S")
                    old_stdout.write(x.replace("\n", f" [{ts}]\n"))
                else:
                    old_stdout.write(x)

        def flush(self):
            old_stdout.flush()

    sys.stdout = _F(silent)
    random.seed(seed)
    np.random.seed(seed)
