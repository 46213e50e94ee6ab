"""Argument-parsing guard for tools/gen_sf.py.

Regression test for the round-7 slip where a misplaced replica count
(`gen_sf.py SRC 10`) was accepted as a destination and created a stray
``10/`` directory at the repo root (VERDICT r7, "What's wrong" #4).
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from gen_sf import parse_args  # noqa: E402


def test_numeric_dst_rejected():
    with pytest.raises(SystemExit):
        parse_args(["/root/testdata/sf0.1", "10"])


@pytest.mark.parametrize("dst", ["./10", "testdata_gen/10", "/tmp/x/7/"])
def test_path_prefixed_numeric_dst_rejected(dst):
    """ADVICE r8: the same slip with a path prefix must not slip
    through the bare-digit check."""
    with pytest.raises(SystemExit):
        parse_args(["/root/testdata/sf0.1", dst, "2"])


def test_missing_src_rejected(tmp_path):
    with pytest.raises(SystemExit):
        parse_args([str(tmp_path / "nope"), str(tmp_path / "out"), "2"])


def test_valid_args_parse(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    a = parse_args([str(src), str(tmp_path / "out"), "3"])
    assert a.replicas == 3 and a.src == str(src)


def test_defaults_parse():
    a = parse_args([])
    assert a.replicas == 10
