"""Shared generic-interpreter switch for the Pallas kernel modules.

When a switch is enabled, every pallas_call in its module runs under the
GENERIC Pallas interpreter instead of compiling for TPU.  This exists
for the shard_map composition tests on the CPU mesh: pltpu's
TPU-semantics interpreter (force_tpu_interpret_mode) synchronizes its
emulated cores through io_callback barriers, which deadlock when
shard_map fans the kernel out over virtual CPU devices; the generic
interpreter has no cross-device barrier.

Each kernel module owns one switch and exposes its ``mode`` as
``interpret_mode`` so tests write ``with module.interpret_mode(): ...``:

    _SWITCH = InterpretSwitch()
    interpret_mode = _SWITCH.mode
    ...
    pl.pallas_call(..., interpret=_SWITCH.enabled)
"""

from __future__ import annotations


class _Ctx:
    def __init__(self, switch: "InterpretSwitch"):
        self._switch = switch

    def __enter__(self):
        self._prev = self._switch.enabled
        self._switch.enabled = True
        return self

    def __exit__(self, *exc):
        self._switch.enabled = self._prev
        return False


class InterpretSwitch:
    """Per-module interpreted-execution flag with a context-manager
    toggle (see module docstring for the rationale)."""

    def __init__(self):
        self.enabled = False

    def mode(self) -> _Ctx:
        """Context manager: run the owning module's kernels interpreted."""
        return _Ctx(self)
