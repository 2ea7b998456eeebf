"""Host-side preprocessing: video decode + folder batch processing.

Mirrors the reference CLIs (preprocess_video2frame.py:5-56,
preprocess_crop.py:4-69, preprocess_brightness.py:104-173) but routes the
pixel math through the fused device pipeline in batches instead of
per-image OpenCV calls.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

import jax.numpy as jnp

# dataset crop presets from the reference (preprocess_crop.py:24-36)
CROP_PRESETS = {
    "uka1": {"ratio": 0.8, "x_offset": 20},
    "c3vd2": {"ratio": 0.65, "x_offset": -30},
}

IMAGE_EXTS = {".jpg", ".jpeg", ".png", ".bmp", ".tiff", ".tif"}


def video_to_frames(
    video_path: str | Path,
    output_dir: str | Path,
    stride: int = 1,
    quality: int = 95,
) -> int:
    """Decode a video to ``%06d.jpg`` frames at a sample stride
    (reference preprocess_video2frame.py:5-56).  Needs imageio's ffmpeg
    plugin; raises a clear error when unavailable."""
    from PIL import Image

    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    n = 0
    try:
        import imageio.v3 as iio

        # imiter is lazy — decode errors surface on iteration, keep it inside
        for i, frame in enumerate(iio.imiter(str(video_path))):
            if i % stride:
                continue
            Image.fromarray(np.asarray(frame)).save(
                out / f"{n:06d}.jpg", quality=quality
            )
            n += 1
    except Exception as e:
        raise RuntimeError(
            "video decoding failed — it needs imageio's ffmpeg backend "
            "(pip install imageio[ffmpeg]); alternatively extract frames "
            f"externally and start from an image directory. Underlying error: {e}"
        ) from e
    print(f"extracted {n} frames to {out}")
    return n


def _list_images(folder: str | Path) -> list[Path]:
    return sorted(
        p for p in Path(folder).iterdir() if p.suffix.lower() in IMAGE_EXTS
    )


def crop_images_in_folder(
    input_folder: str | Path,
    output_folder: str | Path,
    dataset: str = "uka1",
    ratio: float | None = None,
    x_offset: int | None = None,
) -> int:
    """Ratio-square crop every image (reference preprocess_crop.py:4-69;
    output files keep the reference's ``cropped_`` prefix)."""
    from PIL import Image

    preset = CROP_PRESETS.get(dataset, CROP_PRESETS["uka1"])
    ratio = preset["ratio"] if ratio is None else ratio
    x_offset = preset["x_offset"] if x_offset is None else x_offset

    out = Path(output_folder)
    out.mkdir(parents=True, exist_ok=True)
    files = _list_images(input_folder)
    from da3slam_tpu.preprocess.device import crop_square

    n = 0
    for p in files:
        img = np.asarray(Image.open(p).convert("RGB"))
        cropped = np.asarray(crop_square(jnp.asarray(img[None]), ratio, x_offset))[0]
        Image.fromarray(cropped).save(out / f"cropped_{p.name}")
        n += 1
    print(f"cropped {n} images → {out}")
    return n


def adjust_brightness_in_folder(
    input_folder: str | Path,
    output_folder: str | Path,
    batch_size: int = 16,
    **brightness_kwargs,
) -> int:
    """Brightness-normalise a folder (reference
    preprocess_brightness.py:104-173) in device batches."""
    import jax
    from PIL import Image

    from da3slam_tpu.preprocess.device import adjust_brightness

    out = Path(output_folder)
    out.mkdir(parents=True, exist_ok=True)
    files = _list_images(input_folder)
    fn = jax.jit(jax.vmap(lambda f: adjust_brightness(f, **brightness_kwargs)))

    n = 0
    for start in range(0, len(files), batch_size):
        chunk = files[start : start + batch_size]
        imgs = np.stack([np.asarray(Image.open(p).convert("RGB")) for p in chunk])
        adjusted = np.asarray(fn(jnp.asarray(imgs)))
        for p, a in zip(chunk, adjusted):
            Image.fromarray(a).save(out / p.name)
            n += 1
    print(f"brightness-normalised {n} images → {out}")
    return n
