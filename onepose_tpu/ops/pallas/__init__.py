"""Pallas TPU kernels for the hot ops.

Each kernel has a pure-XLA reference implementation elsewhere in the
package; kernels are selected on TPU backends and fall back to interpreter
mode on CPU (used by the test suite for parity checks).
"""

from __future__ import annotations

import jax


def use_interpret_mode() -> bool:
    """Pallas kernels run in interpreter mode off-TPU (tests on CPU)."""
    return jax.default_backend() != "tpu"
