"""CLI parity: tools/k2g.py output directory must match the reference
``k2g`` console script file-for-file (including the no-style-type
unpacking quirk, cli.py:41)."""

from __future__ import annotations

import json
import pathlib
import subprocess
import sys

import pytest

from tests.conftest import REFERENCE_DATA, REPO_ROOT, reference_available


def _run_ours(kml, out, *extra):
    r = subprocess.run(
        [sys.executable, str(REPO_ROOT / "tools" / "k2g.py"),
         str(kml), str(out), *extra],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    return out


def _run_reference(kml, out, *extra):
    if not reference_available():
        pytest.skip("reference repo not available")
    click = pytest.importorskip("click")
    from click.testing import CliRunner
    sys.path.insert(0, "/root/reference")
    from kml2geojson.cli import k2g
    res = CliRunner().invoke(k2g, [str(kml), str(out), *extra])
    assert res.exit_code == 0, res.output
    return out


def _dir_as_dict(d: pathlib.Path) -> dict:
    return {p.name: json.loads(p.read_text())
            for p in sorted(d.iterdir()) if p.is_file()}


@pytest.mark.parametrize("stem,extra", [
    ("two_layers/two_layers", ["-st", "svg", "-f"]),
    ("style", ["-st", "leaflet"]),
    ("point", []),                       # no-style-type quirk path
    ("gx_track", ["-fcn", "custom", "-st", "svg", "-sf", "s2.json"]),
])
def test_k2g_cli_matches_reference(tmp_path, stem, extra):
    kml = REFERENCE_DATA / f"{stem}.kml"
    if not kml.is_file():
        pytest.skip(f"fixture {stem} missing")
    ours = _run_ours(kml, tmp_path / "ours", *extra)
    ref = _run_reference(kml, tmp_path / "ref", *extra)
    assert _dir_as_dict(ours) == _dir_as_dict(ref)


# Full flag matrix: every -st choice (incl. absent → the unpacking
# quirk) × -f on/off, plus the -fcn/-sf value flags and the long-form
# spellings the reference's click options also accept. Each combination
# must be file-for-file identical to the reference console script.
_FLAG_MATRIX = [st + f for st in ([], ["-st", "svg"], ["-st", "leaflet"])
                for f in ([], ["-f"])]


@pytest.mark.parametrize("extra", _FLAG_MATRIX,
                         ids=lambda e: "_".join(e) or "bare")
def test_k2g_cli_flag_matrix(tmp_path, extra):
    kml = REFERENCE_DATA / "two_layers" / "two_layers.kml"
    if not kml.is_file():
        pytest.skip("fixture two_layers missing")
    ours = _run_ours(kml, tmp_path / "ours", *extra)
    ref = _run_reference(kml, tmp_path / "ref", *extra)
    assert _dir_as_dict(ours) == _dir_as_dict(ref)


@pytest.mark.parametrize("extra", [
    ["--feature-collection-name", "renamed", "--style-type", "svg"],
    ["--style-type", "leaflet", "--style-filename", "catalog.json",
     "--separate-folders"],
    ["-fcn", "x", "-st", "leaflet", "-sf", "leaf.json", "-f"],
])
def test_k2g_cli_value_flags_and_long_forms(tmp_path, extra):
    kml = REFERENCE_DATA / "two_layers" / "two_layers.kml"
    if not kml.is_file():
        pytest.skip("fixture two_layers missing")
    ours = _run_ours(kml, tmp_path / "ours", *extra)
    ref = _run_reference(kml, tmp_path / "ref", *extra)
    assert _dir_as_dict(ours) == _dir_as_dict(ref)
