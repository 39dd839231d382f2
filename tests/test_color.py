"""Color / sRGB tests (color.rs parity; SURVEY.md §2 #6)."""

import os
import re

import numpy as np
import jax.numpy as jnp
import pytest

from raytrace_tpu import color as colorlib

from conftest import REFERENCE_DIR

REF_COLOR_RS = str(REFERENCE_DIR / "src" / "color.rs")


def _extract_table(name: str, count: int) -> np.ndarray:
    """Pull a const f64 table out of the reference source (parity check
    against color.rs:75-591 without shipping the constants)."""
    src = open(REF_COLOR_RS).read()
    m = re.search(rf"const {name}[^=]*=\s*\[(.*?)\];", src, re.S)
    assert m, f"table {name} not found"
    vals = [float(v) for v in re.findall(r"[-0-9.eE+]+(?:f64)?",
                                         m.group(1).replace("f64", ""))]
    assert len(vals) == count
    return np.array(vals)


@pytest.mark.skipif(not os.path.exists(REF_COLOR_RS), reason="no reference")
def test_srgb_values_match_reference_table():
    ref = _extract_table("SRGB_VALUES", 256)
    np.testing.assert_allclose(colorlib.SRGB_VALUES, ref, rtol=0, atol=5e-7)


@pytest.mark.skipif(not os.path.exists(REF_COLOR_RS), reason="no reference")
def test_srgb_average_match_reference_table():
    ref = _extract_table("SRGB_AVERAGE", 255)
    np.testing.assert_allclose(colorlib.SRGB_AVERAGE, ref, rtol=0, atol=5e-7)


def test_to_srgb_matches_linear_scan():
    """searchsorted encoder == the reference's linear scan (color.rs:593-600)."""
    vals = np.concatenate([
        np.linspace(-0.1, 1.1, 4001),
        colorlib.SRGB_AVERAGE,                      # exact threshold ties
        np.nextafter(colorlib.SRGB_AVERAGE, -1),    # just below
        np.nextafter(colorlib.SRGB_AVERAGE, 2),     # just above
    ])

    def reference_scan(v):
        for i, avg in enumerate(colorlib.SRGB_AVERAGE):
            if v < avg:
                return i
        return 255

    expected = np.array([reference_scan(v) for v in vals], np.uint8)
    got = np.asarray(colorlib.to_srgb(jnp.asarray(vals, jnp.float64)))
    np.testing.assert_array_equal(got, expected)


def test_to_srgb_nan_encodes_255():
    assert int(colorlib.to_srgb(jnp.asarray([float("nan")], jnp.float64))[0]) == 255


def test_roundtrip():
    b = jnp.arange(256, dtype=jnp.int32).astype(jnp.uint8)
    lin = colorlib.from_srgb(b, dtype=jnp.float64)
    back = colorlib.to_srgb(lin)
    np.testing.assert_array_equal(np.asarray(back), np.arange(256, dtype=np.uint8))


def test_significance():
    c = jnp.asarray([[0.25, 0.5, 0.125]])
    assert float(colorlib.significance(c)[0]) == pytest.approx(0.875)


def test_linear_rgb_bytes():
    v = jnp.asarray([-1.0, 0.0, 0.5, 1.0, 2.0], jnp.float64)
    np.testing.assert_array_equal(
        np.asarray(colorlib.linear_rgb_bytes(v)),
        np.array([0, 0, 127, 255, 255], np.uint8))
