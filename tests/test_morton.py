"""Morton code unit tests vs an independent bit-by-bit numpy oracle."""
import numpy as np

from raytracers_tpu.bvh.morton import (expand_bits, morton3d, morton_codes,
                                       normalise_centres)


def _expand_ref(v: int) -> int:
    out = 0
    for bit in range(10):
        out |= ((v >> bit) & 1) << (3 * bit)
    return out


def test_expand_bits_oracle():
    vals = [0, 1, 2, 3, 0x155, 0x2AA, 1023, 512, 683]
    got = np.asarray(expand_bits(np.array(vals, np.uint32)))
    want = np.array([_expand_ref(v) for v in vals], np.uint32)
    np.testing.assert_array_equal(got, want)


def test_morton3d_oracle():
    rng = np.random.default_rng(1)
    pts = rng.uniform(0, 1, size=(64, 3)).astype(np.float32)
    got = np.asarray(morton3d(pts))
    q = np.clip(pts * 1024, 0, 1023).astype(np.uint32)
    want = np.array([_expand_ref(int(x)) * 4 + _expand_ref(int(y)) * 2 +
                     _expand_ref(int(z)) for x, y, z in q], np.uint32)
    np.testing.assert_array_equal(got, want)


def test_morton_ordering_locality():
    # corner points of the unit cube map to distinct codes in z-order
    corners = np.array([[x, y, z] for x in (0.0, 0.999)
                        for y in (0.0, 0.999) for z in (0.0, 0.999)],
                       np.float32)
    codes = np.asarray(morton3d(corners))
    assert len(set(codes.tolist())) == 8
    # x is the highest-weight axis (code = xx*4 + yy*2 + zz)
    assert codes[4] > codes[3]  # (1,0,0) > (0,1,1)


def test_normalise_centres_degenerate_axis():
    # constant y (the irreg scene): must map to 0, not NaN
    pts = np.array([[0., 5., 1.], [2., 5., 3.]], np.float32)
    out = np.asarray(normalise_centres(pts))
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out[:, 1], 0.0)
    np.testing.assert_allclose(out[0], [0., 0., 0.])
    np.testing.assert_allclose(out[1], [1., 0., 1.])


def test_morton_codes_end_to_end():
    rng = np.random.default_rng(2)
    pts = rng.uniform(-50, 50, size=(100, 3)).astype(np.float32)
    codes = np.asarray(morton_codes(pts))
    assert codes.dtype == np.uint32
    assert len(np.unique(codes)) > 90  # essentially all distinct
