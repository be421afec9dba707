"""Micro-benchmark: native C++ host data kernels vs the PIL/numpy path.

The loader's per-item hot path is decode → augment → resize → normalize;
the native kernels fuse resize (bilinear, PIL-parity) and u8→f32 normalize
into single passes (native/limuc_io.cpp). Run:

    python scripts/bench_native.py

Prints per-op throughput for both paths; records go to docs/perf_notes.md.
"""

import time

import numpy as np
from PIL import Image

from psd_tpu.data import native


def bench(fn, iters=40):
    fn()  # warm
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    rng = np.random.default_rng(0)
    src = rng.integers(0, 255, (768, 1024, 3), dtype=np.uint8)
    mean, std = [0.5] * 3, [0.5] * 3

    print(f"HAVE_NATIVE={native.HAVE_NATIVE}")

    # resize 1024x768 -> 256x256
    t_pil = bench(lambda: np.asarray(
        Image.fromarray(src).resize((256, 256), Image.BILINEAR)))
    t_nat = bench(lambda: native.resize_bilinear(src, 256, 256))
    print(f"resize     : PIL {t_pil:6.2f} ms | native {t_nat:6.2f} ms "
          f"({t_pil / t_nat:.2f}x)")

    u8 = native.resize_bilinear(src, 256, 256)
    t_np = bench(lambda: (u8.astype(np.float32) / 255.0 - np.float32(0.5))
                 / np.float32(0.5))
    t_natn = bench(lambda: native.normalize(u8, mean, std))
    print(f"normalize  : np  {t_np:6.2f} ms | native {t_natn:6.2f} ms "
          f"({t_np / t_natn:.2f}x)")

    f32 = rng.random((512, 512, 3), dtype=np.float32)
    t_npq = bench(lambda: (np.clip(f32, 0, 1) * 255.0 + 0.5).astype(np.uint8))
    t_natq = bench(lambda: native.to_uint8(f32))
    print(f"to_uint8   : np  {t_npq:6.2f} ms | native {t_natq:6.2f} ms "
          f"({t_npq / t_natq:.2f}x)")

    import tempfile
    from pathlib import Path

    img = native.to_uint8(f32)
    with tempfile.TemporaryDirectory() as d:
        t_png = bench(lambda: Image.fromarray(img).save(Path(d) / "x.png"), 10)
        t_bmp = bench(lambda: native.write_bmp(Path(d) / "x.bmp", img), 10)
        print(f"write 512px: PNG {t_png:6.2f} ms | native BMP {t_bmp:6.2f} ms "
              f"({t_png / t_bmp:.2f}x)")


if __name__ == "__main__":
    main()
