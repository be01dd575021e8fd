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
    """``/tmp/<basename>_<cpu-id-hash>`` for CPU-platform cache use.

    The key hashes the flags line AND the model-identity lines: XLA's
    AOT target features include model-derived tuning choices (e.g.
    ``+prefer-no-gather``) that differ between CPU models with identical
    feature flags -- a flags-only key let a migrated VM load a
    feature-mismatched entry and SIGSEGV (observed again 2026-08-17,
    round 3, inside get_executable_and_time at test-suite 66%).
    """
    keys = ("flags", "model name", "vendor_id", "cpu family", "model\t",
            "stepping")
    ident = []
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if any(line.startswith(k) for k in keys):
                    ident.append(line)
                if line.strip() == "" and ident:
                    break  # first core only; all cores identical
    except OSError:  # pragma: no cover
        ident = ["nocpuinfo"]
    tag = hashlib.sha1("".join(ident).encode()).hexdigest()[:12]
    return f"{root}/{basename}_{tag}"
