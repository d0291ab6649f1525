r"""Thread device arrays captured by operator objects into jit arguments.

The operator stack (forward operator, transform, measurement, prior) is
object-oriented for API parity with the reference, so the big precomputed
tables (SHT basis matrices, wavelet kernels, path matrices, thresholds) are
*attributes* read inside traced functions.  Left alone, jax embeds such
captured concrete arrays as HLO constants — hundreds of MB serialized into
every compile (and rejected outright by remote-compile services).

:class:`CaptureThreader` walks the object graph, finds every attribute whose
value contains jax arrays (arrays, registered-pytree dataclasses like
``SHTBasis``/``WaveletBasis``, tuples of arrays), and temporarily swaps the
attributes for tracers while a wrapped function is being traced — turning
all of them into ordinary runtime arguments of one jitted function.
"""
from __future__ import annotations

import dataclasses

import jax

__all__ = ["CaptureThreader"]


def _has_jax_leaves(v) -> bool:
    if isinstance(v, jax.Array):
        return True
    if dataclasses.is_dataclass(v) or isinstance(v, (tuple, list)):
        try:
            leaves = jax.tree_util.tree_leaves(v)
        except Exception:
            return False
        return any(isinstance(leaf, jax.Array) for leaf in leaves)
    return False


class CaptureThreader:
    """Collects (object, attribute) paths holding jax arrays under ``roots``."""

    def __init__(self, roots):
        self.paths: list[tuple[object, str]] = []
        seen = set()

        def visit(obj):
            if obj is None or id(obj) in seen:
                return
            seen.add(id(obj))
            d = getattr(obj, "__dict__", None)
            if not isinstance(d, dict):
                return
            for name, val in d.items():
                if name.startswith("__"):
                    continue
                if _has_jax_leaves(val):
                    self.paths.append((obj, name))
                elif callable(val) or isinstance(val, (str, bytes, int, float, complex, bool)):
                    continue
                elif hasattr(val, "__dict__") and not dataclasses.is_dataclass(val):
                    visit(val)

        for r in roots:
            visit(r)

    def get(self):
        """Current attribute values (a pytree suitable as a jit argument)."""
        return [getattr(obj, name) for obj, name in self.paths]

    def set(self, values):
        """Swap in new values; returns the previous ones."""
        old = self.get()
        for (obj, name), v in zip(self.paths, values):
            object.__setattr__(obj, name, v)
        return old

    def wrap(self, fn):
        """fn(*args) -> wrapped(captures, *args): attributes are swapped for
        ``captures`` while fn runs (i.e. while it is being traced)."""

        def wrapped(captures, *args):
            old = self.set(captures)
            try:
                return fn(*args)
            finally:
                self.set(old)

        return wrapped
