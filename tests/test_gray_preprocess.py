import numpy as np
import jax.numpy as jnp

from vision_compression_project_tpu.ops.preprocess import (
    preprocess_pages,
    preprocess_pages_reference,
)
from vision_compression_project_tpu.pipeline.extract import (
    _is_grayscale,
    _stack_rasters,
)


def test_gray_matches_rgb_path():
    rng = np.random.default_rng(0)
    gray = rng.integers(0, 256, size=(2, 96, 64), dtype=np.uint8)
    rgb = np.repeat(gray[..., None], 3, axis=-1)
    got = preprocess_pages(jnp.asarray(gray), target_h=64, target_w=64, patch=16)
    want = preprocess_pages_reference(
        jnp.asarray(rgb), target_h=64, target_w=64, patch=16
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=2e-2
    )


def test_stack_rasters_gray_detection():
    gray_img = np.repeat(
        np.random.default_rng(1).integers(0, 256, (40, 30, 1), np.uint8), 3, -1
    )
    color_img = gray_img.copy()
    color_img[5, 5] = [255, 0, 0]
    assert _is_grayscale(gray_img)
    assert not _is_grayscale(color_img)
    stacked = _stack_rasters({1: gray_img, 2: gray_img}, [1, 2])
    assert stacked.shape == (2, 40, 30)  # single channel
    stacked_c = _stack_rasters({1: gray_img, 2: color_img}, [1, 2])
    assert stacked_c.shape == (2, 40, 30, 3)
