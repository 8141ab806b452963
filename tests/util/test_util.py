"""Direct tests of util.util helpers (reference tests/util/test_util.py:
oric, endless_iter, get_first_iter_element, parse_path, split_in_half,
safe_to_numpy, make_seeds)."""

import pathlib

import numpy as np
import pytest

import jax.numpy as jnp

from imitation_tpu.util import util


class TestOric:
    def test_sum_preserved(self):
        x = np.array([0.3, 0.3, 0.4])
        r = util.oric(x)
        assert r.sum() == round(x.sum())

    def test_integer_constrained_rounding(self):
        """Reference test_integer_constrained_rounding: bump largest
        fractional parts first."""
        x = np.array([1.6, 2.2, 3.7])  # sum 7.5 -> 8 (banker's round of .5)
        r = util.oric(x)
        assert r.sum() == round(x.sum())
        # 3.7 and 1.6 have the largest fractional parts
        assert r[2] == 4
        x = np.array([0.9, 0.9, 0.9, 0.3])  # sum 3.0
        r = util.oric(x)
        assert r.sum() == 3
        np.testing.assert_array_equal(r, [1, 1, 1, 0])

    def test_already_integral(self):
        np.testing.assert_array_equal(util.oric(np.array([1.0, 2.0])), [1, 2])


class TestEndlessIter:
    def test_cycles(self):
        it = util.endless_iter([1, 2])
        assert [next(it) for _ in range(5)] == [1, 2, 1, 2, 1]

    def test_empty_raises(self):
        with pytest.raises(ValueError, match="no element"):
            util.endless_iter([])


class TestGetFirstIterElement:
    def test_list_unchanged(self):
        first, rest = util.get_first_iter_element([3, 4, 5])
        assert first == 3
        assert list(rest) == [3, 4, 5]

    def test_generator_reconstructed(self):
        gen = (i for i in range(3))
        first, rest = util.get_first_iter_element(gen)
        assert first == 0
        assert list(rest) == [0, 1, 2]

    def test_empty_raises(self):
        with pytest.raises(ValueError, match="no element"):
            util.get_first_iter_element(iter([]))


def test_split_in_half():
    assert util.split_in_half(4) == (2, 2)
    assert util.split_in_half(5) == (3, 2)
    assert util.split_in_half(0) == (0, 0)
    assert util.split_in_half(1) == (1, 0)


class TestParsePath:
    def test_absolute_passthrough(self):
        assert util.parse_path("/tmp/x") == pathlib.Path("/tmp/x")

    def test_relative_resolves_to_cwd(self):
        assert util.parse_path("x") == pathlib.Path.cwd() / "x"

    def test_relative_with_base(self):
        base = pathlib.Path("/base")
        assert util.parse_path("x", base_directory=base) == base / "x"

    def test_relative_disallowed_raises(self):
        with pytest.raises(ValueError, match="not absolute"):
            util.parse_path("x", allow_relative=False)

    def test_base_requires_allow_relative(self):
        with pytest.raises(ValueError, match="allow_relative"):
            util.parse_path("x", allow_relative=False,
                            base_directory=pathlib.Path("/b"))

    def test_bytes_input(self):
        assert util.parse_path(b"/tmp/y") == pathlib.Path("/tmp/y")

    def test_optional_none(self):
        assert util.parse_optional_path(None) is None


def test_make_seeds_scalar_and_list():
    rng = np.random.default_rng(0)
    s = util.make_seeds(rng)
    assert isinstance(s, int)
    seeds = util.make_seeds(np.random.default_rng(0), 5)
    assert len(seeds) == 5
    assert len(set(seeds)) == 5  # non-sequential, distinct
    assert seeds[0] == s


def test_safe_to_numpy():
    assert util.safe_to_numpy(None) is None
    x = np.ones(3)
    assert util.safe_to_numpy(x) is x
    j = jnp.ones(3)
    out = util.safe_to_numpy(j)
    assert isinstance(out, np.ndarray)
    np.testing.assert_array_equal(out, np.ones(3))


def test_make_unique_timestamp_unique():
    a, b = util.make_unique_timestamp(), util.make_unique_timestamp()
    assert a != b
