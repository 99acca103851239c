"""Image loading/saving + CLI argument parsing (the reference "reader" layer).

Behavioral parity with the reference's only shared library,
src/reader/reader.cpp:14-82 / reader.hpp:8-15:

  * flags: ``--dir <D>`` (load every regular file in D), ``--out <F>``
    (default ``result.jpg``), everything else is a positional image path;
  * ``--dir`` takes precedence over positionals (reader.cpp:53-79);
  * unreadable files print a warning to stderr and are skipped
    (reader.cpp:62-65, 73-76);
  * missing args → usage on stderr + exit(-1) (reader.cpp:22-27).

One deliberate fix over the reference: ``fs::directory_iterator`` yields files
in unspecified OS order (reader.cpp:58), making directory stitches
non-reproducible across filesystems. We sort lexicographically.

Images are returned as HxWx3 uint8 numpy arrays in **BGR** channel order
(cv::imread convention) so downstream gray conversion and SSD semantics match
the reference exactly.
"""

from __future__ import annotations

import dataclasses
import os
import sys
from typing import List, Optional, Sequence

import numpy as np

try:  # cv2 for imread/imwrite parity; PIL fallback keeps the library usable.
    import cv2  # type: ignore

    _HAVE_CV2 = True
except Exception:  # pragma: no cover
    cv2 = None
    _HAVE_CV2 = False
    from PIL import Image


def _load_native():
    """Native host runtime (native/pano_host.cpp): the C++ equivalent of the
    reference's reader static library (src/reader/reader.cpp), loaded via
    ctypes. Disable with PANO_TPU_NATIVE=0; silently falls back to cv2/PIL
    when the shared library hasn't been built (`pano.sh build`)."""
    if os.environ.get("PANO_TPU_NATIVE", "1") == "0":
        return None
    import ctypes

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for cand in (
        os.environ.get("PANO_HOST_LIB", ""),  # pano.sh --build-dir=
        os.path.join(here, "native", "build", "libpano_host.so"),
        os.path.join(here, "libpano_host.so"),
    ):
        if not cand:
            continue
        if os.path.exists(cand):
            try:
                lib = ctypes.CDLL(cand)
                lib.ph_version.restype = ctypes.c_int
                if lib.ph_version() != 2:
                    continue  # stale ABI: try the next candidate
                lib.ph_imread_dims.argtypes = [
                    ctypes.c_char_p,
                    ctypes.POINTER(ctypes.c_int),
                    ctypes.POINTER(ctypes.c_int),
                ]
                lib.ph_imread_fill.argtypes = [
                    ctypes.c_char_p,
                    ctypes.POINTER(ctypes.c_ubyte),
                    ctypes.c_int,
                    ctypes.c_int,
                ]
                lib.ph_imwrite.argtypes = [
                    ctypes.c_char_p,
                    ctypes.POINTER(ctypes.c_ubyte),
                    ctypes.c_int,
                    ctypes.c_int,
                ]
                return lib
            except (OSError, AttributeError):
                # Unloadable .so, or a foreign library without the ph_*
                # exports (AttributeError from the ctypes symbol lookup):
                # keep scanning the remaining candidates rather than
                # aborting, and never let import pano_tpu.io crash.
                continue
    return None


_NATIVE = _load_native()


@dataclasses.dataclass
class ImageReaderResult:
    """Mirror of reference ImageReaderResult (src/reader/reader.hpp:8-11)."""

    images: List[np.ndarray]
    output_file: str = "result.jpg"
    # Retained for diagnostics; not in the reference struct.
    paths: List[str] = dataclasses.field(default_factory=list)


def imread_bgr(path: str) -> Optional[np.ndarray]:
    """Load an image as HxWx3 uint8 BGR; None if unreadable (cv::imread)."""
    if _NATIVE is not None:
        import ctypes

        h = ctypes.c_int()
        w = ctypes.c_int()
        if _NATIVE.ph_imread_dims(path.encode(), ctypes.byref(h), ctypes.byref(w)) != 0:
            return None
        buf = np.empty((h.value, w.value, 3), np.uint8)
        if (
            _NATIVE.ph_imread_fill(
                path.encode(),
                buf.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
                h.value,
                w.value,
            )
            != 0
        ):
            return None
        return buf
    if _HAVE_CV2:
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        return img
    try:  # pragma: no cover - PIL fallback
        with Image.open(path) as im:
            rgb = np.asarray(im.convert("RGB"), dtype=np.uint8)
        return rgb[..., ::-1].copy()
    except Exception:
        return None


def imwrite_bgr(path: str, img: np.ndarray) -> bool:
    """Save an HxWx3 uint8 BGR image (cv::imwrite equivalent)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if _NATIVE is not None:
        import ctypes

        return (
            _NATIVE.ph_imwrite(
                path.encode(),
                img.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
                img.shape[0],
                img.shape[1],
            )
            == 0
        )
    if _HAVE_CV2:
        return bool(cv2.imwrite(path, img))
    Image.fromarray(img[..., ::-1]).save(path)  # pragma: no cover
    return True


def read_images_from_args(
    argv: Sequence[str],
    preloaded: Optional[dict] = None,
) -> ImageReaderResult:
    """Parse argv (excluding program name) exactly like readImagesFromArgs.

    `preloaded` maps path -> decoded BGR array (or None for unreadable):
    the serve loop's decode-ahead worker fills it so a job's JPEG decode
    overlaps the previous job's device work; paths not in the dict decode
    here as usual. Semantics (warnings, skip-on-unreadable, ordering) are
    identical either way."""
    result = ImageReaderResult(images=[], output_file="result.jpg")

    def _read(path):
        if preloaded is not None and path in preloaded:
            return preloaded[path]
        return imread_bgr(path)

    file_names: List[str] = []
    dir_name = ""

    if len(argv) < 1:
        print(
            "Usage: pano [--dir directory_name] [--out output_file_name] "
            "[image1 image2 ...]",
            file=sys.stderr,
        )
        sys.exit(-1)

    i = 0
    while i < len(argv):
        arg = argv[i]
        if arg == "--dir":
            if i + 1 < len(argv):
                i += 1
                dir_name = argv[i]
            else:
                print("Error: --dir requires a directory name", file=sys.stderr)
                sys.exit(-1)
        elif arg == "--out":
            if i + 1 < len(argv):
                i += 1
                result.output_file = argv[i]
            else:
                print("Error: --out requires an output file name", file=sys.stderr)
                sys.exit(-1)
        else:
            file_names.append(arg)
        i += 1

    if dir_name:
        if not os.path.isdir(dir_name):
            print(f"Error: {dir_name} is not a valid directory.", file=sys.stderr)
            sys.exit(-1)
        entries = sorted(
            os.path.join(dir_name, e)
            for e in os.listdir(dir_name)
            if os.path.isfile(os.path.join(dir_name, e))
        )
        for file_path in entries:
            img = _read(file_path)
            if img is None:
                print(
                    f"Warning: Unable to open image file: {file_path}",
                    file=sys.stderr,
                )
                continue
            result.images.append(img)
            result.paths.append(file_path)
    else:
        for file_name in file_names:
            img = _read(file_name)
            if img is None:
                print(
                    f"Warning: Unable to open image file: {file_name}",
                    file=sys.stderr,
                )
                continue
            result.images.append(img)
            result.paths.append(file_name)

    return result
