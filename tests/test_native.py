"""Native (C++) image-output runtime vs the Python reference path."""

import numpy as np
import jax.numpy as jnp
import pytest

from raytrace_tpu import color as colorlib
from raytrace_tpu.io import native
from raytrace_tpu.io.bmp import read_bmp, write_bmp

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no native toolchain")


def test_encoder_bit_identical_to_python():
    rng = np.random.RandomState(0)
    vals = np.concatenate([
        rng.rand(4096).astype(np.float32) * 1.2 - 0.1,
        colorlib.SRGB_AVERAGE.astype(np.float32),
        np.array([0.0, 1.0, -1.0, 2.0, np.nan, np.inf, -np.inf],
                 np.float32),
    ])
    want = np.asarray(colorlib.to_srgb(jnp.asarray(vals, jnp.float32)))
    got = native.encode_srgb_native(vals)
    np.testing.assert_array_equal(got, want)


def test_native_bmp_matches_python_writer(tmp_path):
    rng = np.random.RandomState(1)
    img = (rng.rand(13, 7, 3) * 1.4).astype(np.float32)  # odd width: stride
    srgb = np.asarray(colorlib.to_srgb(jnp.asarray(img, jnp.float32)))

    py_path = tmp_path / "py.bmp"
    nat_path = tmp_path / "nat.bmp"
    write_bmp(str(py_path), srgb)
    assert native.write_bmp_native(str(nat_path), img)

    assert py_path.read_bytes() == nat_path.read_bytes()
    np.testing.assert_array_equal(read_bmp(str(nat_path)), srgb)


def test_native_write_error():
    img = np.zeros((2, 2, 3), np.float32)
    with pytest.raises(OSError):
        native.write_bmp_native("/nonexistent_dir_xyz/out.bmp", img)
