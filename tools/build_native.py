"""Build the native C components (currently: CRC32C for TFRecord I/O).

  python tools/build_native.py

Compiles mtlx/data/_crc32c.c into mtlx/data/_crc32c_ext.*.so with the
system toolchain. All native components are optional accelerators — every
consumer has a pure-Python fallback so a fresh checkout works without a
compiler.
"""

import os
import subprocess
import sys
import sysconfig

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_crc32c() -> str:
    src = os.path.join(ROOT, "mtlx", "data", "_crc32c.c")
    suffix = sysconfig.get_config_var("EXT_SUFFIX")
    out = os.path.join(ROOT, "mtlx", "data", f"_crc32c_ext{suffix}")
    include = sysconfig.get_paths()["include"]
    cmd = [
        "g++" if False else "gcc",
        "-O3",
        "-shared",
        "-fPIC",
        f"-I{include}",
        src,
        "-o",
        out,
    ]
    subprocess.run(cmd, check=True)
    return out


if __name__ == "__main__":
    path = build_crc32c()
    sys.path.insert(0, ROOT)
    from mtlx.data import tfrecord

    # hot-verify the freshly built extension against the known vector
    import importlib

    importlib.reload(tfrecord)
    assert tfrecord._native_crc is not None, "extension did not load"
    assert tfrecord.crc32c(b"123456789") == 0xE3069283
    print(f"built + verified {path}")
