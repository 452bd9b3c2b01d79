"""typecheck_hook.typechecked — the --typecheck decorator (launch.py).

Must catch genuine mismatches, pass NamedTuple arguments/returns (the
typeguard-2.x + py3.12 crash it works around), and walk unions itself."""

import sys
from typing import NamedTuple, Optional

import pytest

sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])

from typecheck_hook import typechecked


class Bundle(NamedTuple):
    a: int
    b: str = "x"


def test_catches_real_mismatch():
    @typechecked
    def f(x: int) -> int:
        return x

    assert f(3) == 3
    with pytest.raises(TypeError):
        f("nope")


def test_namedtuple_return_passes():
    @typechecked
    def make(n: int) -> Bundle:
        return Bundle(n)

    assert make(1) == Bundle(1)

    @typechecked
    def bad(n: int) -> Bundle:
        return n  # wrong type

    with pytest.raises(TypeError):
        bad(1)


def test_optional_namedtuple_union():
    @typechecked
    def f(b: Optional[Bundle] = None) -> Optional[Bundle]:
        return b

    assert f(None) is None
    assert f(Bundle(2)) == Bundle(2)
    with pytest.raises(TypeError):
        f(7)


def test_return_mismatch_detected():
    @typechecked
    def f(x: int) -> str:
        return x  # lies about its return

    with pytest.raises(TypeError):
        f(1)


def test_unannotated_passthrough():
    def f(x):
        return x

    assert typechecked(f) is f
