"""Property-based differential tests (hypothesis): the engine's scalar
kernels vs the reference implementation on generated inputs — beyond
the fixed fuzz grammar."""

from __future__ import annotations

import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st

from tests.conftest import reference_available

from kml2geojson_spark.convert_core import (
    color_and_opacity,
    disambiguate_names,
    parse_coord_seq,
    parse_coord_tuple,
    sanitize_filename,
)


def _ref():
    if not reference_available():
        pytest.skip("reference repo not available")
    import sys
    sys.path.insert(0, "/root/reference")
    import kml2geojson as ref
    return ref


finite = st.floats(allow_nan=False, allow_infinity=False,
                   min_value=-1e6, max_value=1e6)
ws = st.sampled_from([" ", "\t", "\n", "  ", "\n\t "])


@settings(max_examples=300, deadline=None)
@given(st.lists(finite, min_size=2, max_size=3), ws, ws)
def test_coord_tuple_matches_reference(vals, pre, post):
    ref = _ref()
    s = pre + ",".join(repr(v) for v in vals) + post
    assert parse_coord_tuple(s) == ref.coords1(s)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.lists(finite, min_size=2, max_size=3),
                min_size=0, max_size=6), ws)
def test_coord_seq_matches_reference(tuples, sep)  :
    ref = _ref()
    s = sep.join(",".join(repr(v) for v in t) for t in tuples)
    assert parse_coord_seq(s) == ref.coords(s)


@settings(max_examples=500, deadline=None)
@given(st.text(alphabet="0123456789abcdefABCDEF#", min_size=0, max_size=10))
def test_color_matches_reference(s):
    ref = _ref()
    try:
        expect = ref.build_rgb_and_opacity(s)
    except Exception:
        return  # reference crashes → engine behavior unspecified
    assert color_and_opacity(s) == expect


@settings(max_examples=300, deadline=None)
@given(st.lists(st.text(alphabet="ab1", max_size=5), max_size=8))
def test_disambiguate_matches_reference(names):
    ref = _ref()
    assert disambiguate_names(names) == ref.disambiguate(names)


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=30))
def test_filename_matches_reference(s):
    ref = _ref()
    assert sanitize_filename(s) == ref.to_filename(s)
