"""COLMAP preprocessing wrapper: raw images -> posed 3DGS input layout.

TPU-native equivalent of the reference's converter
(/root/reference/gaussiansplatting/convert.py:1-124, itself a subprocess
pipeline around the external `colmap` binary from the MipNeRF-360
recipe). Structure-from-motion is COLMAP's job on both sides; this
script drives the same stages and leaves `<source>/sparse/0` +
`<source>/images` in exactly the layout `data/photo.py::load_colmap`
(and the reference's dataset_readers) consume:

  1. colmap feature_extractor   (single camera, OPENCV model)
  2. colmap exhaustive_matcher
  3. colmap mapper              -> <source>/distorted/sparse/*
  4. colmap image_undistorter   -> <source>/{images, sparse}
  5. move sparse/* into sparse/0 (the loader's expected shape)
  6. optional downscaled copies images_2/4/8 (PIL, no ImageMagick)

Usage:
  python scripts/convert_colmap.py -s /path/to/scene [--camera OPENCV]
      [--skip_matching] [--resize] [--colmap_executable /path/colmap]

Input layout: <source>/input/*.jpg (the reference's convention).
Requires the `colmap` binary on PATH (or --colmap_executable) — the
reference has the identical external dependency.
"""
from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys


def run(cmd: list[str]) -> None:
    print("+", " ".join(cmd), flush=True)
    r = subprocess.call(cmd)
    if r != 0:
        sys.exit(f"command failed with exit code {r}: {cmd[0]}")


def main(argv=None) -> None:
    ap = argparse.ArgumentParser("colmap converter")
    ap.add_argument("--source_path", "-s", required=True)
    ap.add_argument("--camera", default="OPENCV")
    ap.add_argument("--colmap_executable", default="colmap")
    ap.add_argument("--skip_matching", action="store_true")
    ap.add_argument("--resize", action="store_true",
                    help="write images_2/4/8 downscaled copies")
    ap.add_argument("--no_gpu", action="store_true")
    args = ap.parse_args(argv)

    src = args.source_path.rstrip("/")
    colmap = args.colmap_executable
    if shutil.which(colmap) is None:
        sys.exit(
            f"`{colmap}` not found. COLMAP is an external dependency here "
            "exactly as in the reference (gaussiansplatting/convert.py); "
            "install it or pass --colmap_executable. If you already have "
            "a sparse model, arrange <scene>/sparse/0/{cameras,images,"
            "points3D}.bin + <scene>/images/ and skip this script."
        )
    gpu = "0" if args.no_gpu else "1"

    if not args.skip_matching:
        os.makedirs(f"{src}/distorted/sparse", exist_ok=True)
        run([
            colmap, "feature_extractor",
            "--database_path", f"{src}/distorted/database.db",
            "--image_path", f"{src}/input",
            "--ImageReader.single_camera", "1",
            "--ImageReader.camera_model", args.camera,
            "--SiftExtraction.use_gpu", gpu,
        ])
        run([
            colmap, "exhaustive_matcher",
            "--database_path", f"{src}/distorted/database.db",
            "--SiftMatching.use_gpu", gpu,
        ])
        run([
            colmap, "mapper",
            "--database_path", f"{src}/distorted/database.db",
            "--image_path", f"{src}/input",
            "--output_path", f"{src}/distorted/sparse",
            "--Mapper.ba_global_function_tolerance=0.000001",
        ])

    run([
        colmap, "image_undistorter",
        "--image_path", f"{src}/input",
        "--input_path", f"{src}/distorted/sparse/0",
        "--output_path", src,
        "--output_type", "COLMAP",
    ])

    # loader expects sparse/0/*
    sparse = f"{src}/sparse"
    os.makedirs(f"{sparse}/0", exist_ok=True)
    for name in os.listdir(sparse):
        if name != "0":
            shutil.move(f"{sparse}/{name}", f"{sparse}/0/{name}")

    if args.resize:
        from PIL import Image

        for factor in (2, 4, 8):
            out_dir = f"{src}/images_{factor}"
            os.makedirs(out_dir, exist_ok=True)
            for name in os.listdir(f"{src}/images"):
                im = Image.open(f"{src}/images/{name}")
                im.resize(
                    (im.width // factor, im.height // factor),
                    Image.LANCZOS,
                ).save(f"{out_dir}/{name}")

    print(f"done -> {src}/sparse/0 + {src}/images", flush=True)


if __name__ == "__main__":
    main()
