"""Machine-keyed compilation-cache directories.

XLA:CPU AOT cache entries are compiled for the writing host's CPU
features; loading one on a different machine type can SIGSEGV the whole
process (observed inside ``compilation_cache.get_executable_and_time``
after a VM migration).  Keying CPU-platform cache paths by a hash of the
host's cpuinfo flags keeps reuse within one machine type and isolates
across types.  (TPU executables are device binaries and unaffected; the
package default ``/tmp/nstpu_jax_cache`` stays un-keyed so remote-compile
results survive host changes.)
"""

from __future__ import annotations

import hashlib

__all__ = ["cpu_tagged_cache_dir"]


def cpu_tagged_cache_dir(basename: str, root: str = "/tmp") -> str:
    """``/tmp/<basename>_<cpu-flag-hash>`` for CPU-platform cache use."""
    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = line
                    break
    except OSError:  # pragma: no cover
        flags = "nocpuinfo"
    tag = hashlib.sha1(flags.encode()).hexdigest()[:12]
    return f"{root}/{basename}_{tag}"
