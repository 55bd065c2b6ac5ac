"""Build the native components.

  python tools/build_native.py

  * mtlx/data/_crc32c.c    -> _crc32c_ext.*.so   (TFRecord CRC32C)
  * mtlx/data/_imgcodec.cc -> _imgcodec_ext.*.so (fused JPEG decode +
    resize, libjpeg, GIL-free thread pool — the loader's native path)

All native components are optional accelerators — every consumer has a
pure-Python/PIL fallback so a fresh checkout works without a compiler.
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


def build_imgcodec() -> str:
    src = os.path.join(ROOT, "mtlx", "data", "_imgcodec.cc")
    suffix = sysconfig.get_config_var("EXT_SUFFIX")
    out = os.path.join(ROOT, "mtlx", "data", f"_imgcodec_ext{suffix}")
    include = sysconfig.get_paths()["include"]
    cmd = [
        "g++",
        "-O3",
        "-std=c++17",
        "-shared",
        "-fPIC",
        f"-I{include}",
        src,
        "-ljpeg",
        "-lpthread",
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

    path2 = build_imgcodec()
    import io

    import numpy as np
    from PIL import Image

    sys.path.insert(0, os.path.join(ROOT, "mtlx", "data"))
    import _imgcodec_ext  # noqa: E402

    arr = (np.arange(40 * 60 * 3) % 251).astype(np.uint8).reshape(40, 60, 3)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=95)
    pixels, sh, sw, oh, ow = _imgcodec_ext.decode(buf.getvalue())
    assert (sh, sw, oh, ow) == (40, 60, 40, 60), (sh, sw, oh, ow)
    dec = np.frombuffer(pixels, np.uint8).reshape(40, 60, 3)
    ref = np.asarray(Image.open(io.BytesIO(buf.getvalue())).convert("RGB"))
    assert float(np.abs(dec.astype(int) - ref.astype(int)).mean()) < 2.0
    print(f"built + verified {path2}")
