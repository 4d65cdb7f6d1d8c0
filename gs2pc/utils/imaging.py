"""Image output helper (parity: gauss_to_pc.py:67-71 imwrite)."""

from __future__ import annotations

import numpy as np


def imwrite(path: str, image) -> None:
    """Clip [0,1] float image to uint8 and save (PNG/JPEG by extension)."""
    arr = (255.0 * np.clip(np.asarray(image), 0.0, 1.0)).astype(np.uint8)
    try:
        import imageio

        imageio.imwrite(path, arr)
    except ImportError:
        from PIL import Image

        Image.fromarray(arr).save(path)
