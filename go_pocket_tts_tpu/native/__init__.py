"""Native (C++) host-side helpers, loaded over ctypes with a NumPy fallback.

``audioio.load()`` returns a wrapper around ``libaudioio.so`` or ``None`` when
the shared library is missing and cannot be built. Callers must always keep a
pure-NumPy fallback (see ``utils/wav.py``).
"""

from go_pocket_tts_tpu.native import audioio

__all__ = ["audioio"]
