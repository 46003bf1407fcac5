"""Native bulk float parser (native/fast_parse.cpp via ctypes).

Replaces the tokenizing Python loop of the original BVH motion parse
(~10 s per 60 s BEAT recording -> ~0.3 s measured); the reference's pymo
parser builds per-frame Python tuples through a regex scanner
(``/root/reference/datasets/pymo/parsers.py:207-260``)."""

import numpy as np
import pytest

from gesture_diffusion_tpu import native


def test_parse_floats_matches_numpy():
    rng = np.random.default_rng(0)
    vals = rng.normal(size=513) * 10.0 ** rng.integers(-8, 8, size=513)
    text = " ".join(repr(float(v)) for v in vals) + "\n"
    got = native.parse_floats(text)
    np.testing.assert_array_equal(got, vals)          # strtod is exact
    got_b = native.parse_floats(text.encode(), 513)
    np.testing.assert_array_equal(got_b, vals)


def test_parse_floats_formats_and_bounds():
    text = "  1.5\n-2e3\t+.25 1e-300 Xrot 9 "
    got = native.parse_floats(text, 99)
    # stops at the first non-numeric token (BVH grammar: floats only)
    np.testing.assert_array_equal(got, [1.5, -2000.0, 0.25, 1e-300])
    assert native.parse_floats("", 10).size == 0
    assert native.parse_floats("1 2 3 4 5", 3).size == 3   # expected bounds


def test_numpy_fallback_agrees(monkeypatch):
    text = "3.25 -1.5 0.125 7e2"
    want = native.parse_floats(text)
    monkeypatch.setattr(native, "_LIB", None)
    monkeypatch.setattr(native, "_LIB_FAILED", True)
    got = native.parse_floats(text)
    np.testing.assert_array_equal(got, want)


def test_bvh_roundtrip_uses_native_parse(tmp_path):
    from gesture_diffusion_tpu.data.bvh import parse_bvh, write_bvh

    src = parse_bvh("tests/golden/synth_fullbody.bvh")
    p = str(tmp_path / "rt.bvh")
    write_bvh(src, p)
    back = parse_bvh(p)
    np.testing.assert_allclose(back.values, src.values, atol=1e-5)
    assert back.framerate == pytest.approx(src.framerate)


def test_bvh_motion_header_edge_cases():
    """Colon-attached 'Frames:2' (the old tokenizer dropped colons) and a
    joint NAME containing 'MOTION' must both still parse."""
    from gesture_diffusion_tpu.data.bvh import parse_bvh

    text = ("HIERARCHY\nROOT MOTIONBUILDER_Hips\n{\n\tOFFSET 0 0 0\n"
            "\tCHANNELS 3 Zrotation Xrotation Yrotation\n"
            "\tEnd Site\n\t{\n\t\tOFFSET 0 1 0\n\t}\n}\n"
            "MOTION\nFrames:2\nFrame Time:0.05\n1 2 3\n4 5 6\n")
    d = parse_bvh(text, is_text=True)
    assert d.root_name == "MOTIONBUILDER_Hips"
    assert d.values.shape == (2, 3)
    np.testing.assert_allclose(d.values, [[1, 2, 3], [4, 5, 6]])
    assert d.framerate == 0.05


def test_bvh_indented_motion_line():
    """An indented MOTION keyword line must still anchor the header regex
    (review finding: the standalone-line match included the indentation)."""
    from gesture_diffusion_tpu.data.bvh import parse_bvh

    text = ("HIERARCHY\nROOT Hips\n{\n\tOFFSET 0 0 0\n"
            "\tCHANNELS 3 Zrotation Xrotation Yrotation\n"
            "\tEnd Site\n\t{\n\t\tOFFSET 0 1 0\n\t}\n}\n"
            "  MOTION\nFrames: 2\nFrame Time: 0.05\n1 2 3\n4 5 6\n")
    d = parse_bvh(text, is_text=True)
    assert d.values.shape == (2, 3)


def test_bvh_malformed_motion_raises():
    """A line-initial MOTION keyword with no Frames header anywhere must
    raise, not silently degrade to a 0-frame hierarchy-only parse (review
    finding on the Frames-validating fallback)."""
    from gesture_diffusion_tpu.data.bvh import parse_bvh

    text = ("HIERARCHY\nROOT Hips\n{\n\tOFFSET 0 0 0\n"
            "\tCHANNELS 3 Zrotation Xrotation Yrotation\n"
            "\tEnd Site\n\t{\n\t\tOFFSET 0 1 0\n\t}\n}\n"
            "MOTION FrameCount: 2\nFrame Time: 0.05\n1 2 3\n4 5 6\n")
    with pytest.raises(ValueError, match="malformed MOTION header"):
        parse_bvh(text, is_text=True)


def test_bvh_hierarchy_only_still_parses():
    """No MOTION section at all (template/hierarchy-only file) stays a
    valid 0-frame parse."""
    from gesture_diffusion_tpu.data.bvh import parse_bvh

    text = ("HIERARCHY\nROOT Hips\n{\n\tOFFSET 0 0 0\n"
            "\tCHANNELS 3 Zrotation Xrotation Yrotation\n"
            "\tEnd Site\n\t{\n\t\tOFFSET 0 1 0\n\t}\n}\n")
    d = parse_bvh(text, is_text=True)
    assert d.values.shape[0] == 0


def test_bvh_truncated_hierarchy_named_error():
    """An empty file or a hierarchy cut off mid-stream raises a NAMED parse
    error, not a bare IndexError from token exhaustion (fuzz finding)."""
    from gesture_diffusion_tpu.data.bvh import parse_bvh

    full = ("HIERARCHY\nROOT Hips\n{\n\tOFFSET 0 0 0\n"
            "\tCHANNELS 3 Zrotation Xrotation Yrotation\n"
            "\tEnd Site\n\t{\n\t\tOFFSET 0 1 0\n\t}\n}\n")
    for text in ("", "HIERARCHY", "HIERARCHY\nROOT",
                 full.replace("\t}\n}\n", "\t}\n")):   # missing final brace
        with pytest.raises(ValueError, match="BVH parse error"):
            parse_bvh(text, is_text=True)
