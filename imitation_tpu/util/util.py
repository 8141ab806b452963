"""Miscellaneous utilities (counterpart of reference ``util/util.py``)."""

from __future__ import annotations

import itertools
import os
import pathlib
import uuid
from typing import Any, Iterable, Iterator, Optional, Sequence, Tuple, TypeVar, Union

import numpy as np

T = TypeVar("T")


def make_unique_timestamp() -> str:
    """Timestamp + uuid suffix (reference util.py:29-41)."""
    import datetime

    ISO_TIMESTAMP = "%Y%m%d_%H%M%S"
    timestamp = datetime.datetime.now().strftime(ISO_TIMESTAMP)
    random_uuid = uuid.uuid4().hex[:6]
    return f"{timestamp}_{random_uuid}"


def oric(x: np.ndarray) -> np.ndarray:
    """Optimal rounding under integer constraints (reference util.py:44-77).

    Rounds each element so the sum equals round(sum(x)) while minimizing the
    total rounding error.
    """
    rounded = np.floor(x)
    shortfall = x - rounded
    # Sum deficit after flooring.
    deficit = int(np.round(np.sum(x) - np.sum(rounded)))
    # Bump the entries with the largest fractional parts.
    indices = np.argsort(-shortfall)[:deficit]
    rounded[indices] += 1
    return rounded.astype(int)


def endless_iter(iterable: Iterable[T]) -> Iterator[T]:
    """Endless cycling iterator; raises on empty input (reference util.py:215-241)."""
    try:
        next(iter(iterable))
    except StopIteration:
        raise ValueError(f"iterable {iterable} had no elements to iterate over.")
    return itertools.chain.from_iterable(itertools.repeat(iterable))


def get_first_iter_element(iterable: Iterable[T]) -> Tuple[T, Iterable[T]]:
    """Returns (first element, iterable with all elements) (reference :336-372)."""
    iterator = iter(iterable)
    try:
        first_element = next(iterator)
    except StopIteration:
        raise ValueError(f"iterable {iterable} had no elements to iterate over.")
    return_iterable: Iterable[T]
    if iterator == iterable:
        return_iterable = itertools.chain([first_element], iterator)
    else:
        return_iterable = iterable
    return first_element, return_iterable


def split_in_half(x: int) -> Tuple[int, int]:
    """Splits an integer in half, rounding up first (reference util.py:458-467)."""
    half = x // 2
    return half + (x % 2), half


def parse_path(
    path: Union[str, bytes, os.PathLike],
    allow_relative: bool = True,
    base_directory: Optional[pathlib.Path] = None,
) -> pathlib.Path:
    """Parse a path-like to pathlib.Path (reference util.py:375-428)."""
    if base_directory is not None and not allow_relative:
        raise ValueError(
            "If `base_directory` is specified, then `allow_relative` must be True.",
        )
    parsed_path = pathlib.Path(os.fsdecode(path) if isinstance(path, bytes) else path)
    if parsed_path.is_absolute():
        return parsed_path
    if allow_relative:
        if base_directory is not None:
            return base_directory / parsed_path
        return pathlib.Path.cwd() / parsed_path
    raise ValueError(f"Path {str(parsed_path)} is not absolute")


def parse_optional_path(
    path, allow_relative: bool = True, base_directory=None
) -> Optional[pathlib.Path]:
    if path is None:
        return None
    return parse_path(path, allow_relative, base_directory)


def make_seeds(rng: np.random.Generator, n: Optional[int] = None):
    """Generate non-sequential seed(s) (reference util.py:181-199)."""
    seeds = rng.integers(0, (1 << 31) - 1, (n if n is not None else 1,))
    seeds_list = seeds.tolist()
    if n is None:
        return seeds_list[0]
    return seeds_list


def safe_to_numpy(obj, warn: bool = False) -> Optional[np.ndarray]:
    """Convert device array/tensor to numpy (reference util.py:274-296)."""
    if obj is None:
        return None
    if isinstance(obj, np.ndarray):
        return obj
    return np.asarray(obj)
