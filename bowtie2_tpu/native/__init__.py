"""Native (C) components, built lazily with the system compiler.

The hot alignment path runs on the TPU via JAX/Pallas; these are the
host-side native pieces where the reference also uses native code:
  * sais  — linear-time SA-IS suffix sorting for index construction
            (role of blockwise_sa.h / libsais in the reference).

Build happens on first import into a per-user cache dir; failures fall
back to the pure-NumPy implementations (callers catch ImportError).
"""

import ctypes
import os
import subprocess
import sysconfig

_CACHE = os.path.expanduser("~/.cache/bowtie2_tpu/native")


def _build(name: str, src: str) -> str:
    os.makedirs(_CACHE, exist_ok=True)
    so = os.path.join(_CACHE, f"{name}.so")
    csrc = os.path.join(os.path.dirname(__file__), src)
    if (not os.path.exists(so)
            or os.path.getmtime(so) < os.path.getmtime(csrc)):
        cc = os.environ.get("CC", "cc")
        cmd = [cc, "-O3", "-fPIC", "-shared", "-o", so + ".tmp", csrc]
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(so + ".tmp", so)
    return so
