"""Beat metrics, onset detection, and BVH export tests."""

import os
import pickle

import numpy as np
import pytest

from gesture_diffusion_tpu.generation import eval_utils as ev
from gesture_diffusion_tpu.export import pose2bvh, sample2bvh_batch
from gesture_diffusion_tpu.export.pose2bvh import smooth_pose_euler
from gesture_diffusion_tpu.data import parse_bvh

REF_HIER = "/root/reference/datasets/hierarchy_upper.txt"


class TestOnsetDetection:
    def test_detects_click_train(self):
        """Clicks every 0.5 s must produce onsets near 0.5 s multiples."""
        sr = 16000
        wav = np.random.default_rng(0).normal(0, 0.001, sr * 4).astype(np.float32)
        click_times = np.arange(0.5, 3.6, 0.5)
        for ct in click_times:
            i = int(ct * sr)
            wav[i:i + 400] += np.sin(2 * np.pi * 1000 * np.arange(400) / sr) * \
                np.hanning(400) * 0.8
        onsets = ev.onset_detect(wav, sr)
        assert len(onsets) >= 5
        for ct in click_times:
            assert np.abs(onsets - ct).min() < 0.08

    def test_silence_has_no_onsets(self):
        sr = 16000
        wav = np.zeros(sr * 2, np.float32)
        assert len(ev.onset_detect(wav, sr)) == 0

    def test_peak_pick_spacing(self):
        x = np.zeros(100)
        x[[10, 12, 50]] = [1.0, 0.9, 1.0]
        peaks = ev.peak_pick(x, 3, 3, 10, 10, 0.05, wait=5)
        assert 10 in peaks and 50 in peaks and 12 not in peaks


class TestMotionBeats:
    def _oscillating_dir_vecs(self, beat_period_frames=10, t=80, n=2):
        """Arm swinging: angle between two bones oscillates; direction
        reversals (speed minima) are the motion beats."""
        frames = np.arange(t)
        angle = 0.5 * np.cos(2 * np.pi * frames / beat_period_frames)
        v1 = np.stack([np.cos(angle), np.sin(angle), np.zeros(t)], -1)
        v2 = np.tile([1.0, 0, 0], (t, 1))
        dv = np.stack([v1, v2], axis=1)          # (T, 2 joints, 3)
        return np.tile(dv[None], (n, 1, 1, 1))

    def test_angle_change_rate_shape_and_zeros(self):
        dv = self._oscillating_dir_vecs()
        rate = ev.compute_angle_change_rate(dv, [[0, 1]])
        assert rate.shape == (2, 80)
        np.testing.assert_allclose(rate[:, 0], 0.0)
        assert rate.max() > 0

    def test_extract_motion_beats_finds_reversals(self):
        dv = self._oscillating_dir_vecs(beat_period_frames=20)
        rate = ev.compute_angle_change_rate(dv, [[0, 1]])
        beats = ev.extract_motion_beat_times(rate[0], motion_fps=20, thres=0.03)
        assert len(beats) >= 5  # reversal every half period = 0.5 s over 4 s

    def test_beat_recall_self_is_one(self):
        dv = self._oscillating_dir_vecs()
        score = ev.beat_recall_score(dv, dv, 20, [[0, 1]])
        assert score == pytest.approx(1.0, abs=1e-6)

    def test_beat_recall_mismatch_is_lower(self):
        a = self._oscillating_dir_vecs(beat_period_frames=10)
        b = self._oscillating_dir_vecs(beat_period_frames=14)
        self_score = ev.beat_recall_score(b, b, 20, [[0, 1]])
        cross = ev.beat_recall_score(a, b, 20, [[0, 1]])
        assert cross < self_score + 1e-9

    def test_beat_consistency_runs(self):
        sr = 16000
        dv = self._oscillating_dir_vecs(t=80)
        wav = np.random.default_rng(1).normal(0, 0.01, (2, 4 * sr)).astype(np.float32)
        for i in range(2):
            for ct in np.arange(0.5, 3.6, 0.5):
                j = int(ct * sr)
                wav[i, j:j + 400] += 0.8 * np.hanning(400)
        score = ev.beat_consistency_score(dv, 20, [[0, 1]], wav, sr)
        assert np.isfinite(score) and 0.0 <= score <= 1.0


BEAT_JOINTS_41 = [
    "Spine1", "Spine2", "Spine3",
    "RightShoulder", "RightArm", "RightForeArm", "RightHand",
    "RightHandMiddle1", "RightHandMiddle2", "RightHandMiddle3",
    "RightHandRing1", "RightHandRing2", "RightHandRing3",
    "RightHandPinky1", "RightHandPinky2", "RightHandPinky3",
    "RightHandIndex1", "RightHandIndex2", "RightHandIndex3",
    "RightHandThumb1", "RightHandThumb2", "RightHandThumb3",
    "LeftShoulder", "LeftArm", "LeftForeArm", "LeftHand",
    "LeftHandMiddle1", "LeftHandMiddle2", "LeftHandMiddle3",
    "LeftHandRing1", "LeftHandRing2", "LeftHandRing3",
    "LeftHandPinky1", "LeftHandPinky2", "LeftHandPinky3",
    "LeftHandIndex1", "LeftHandIndex2", "LeftHandIndex3",
    "LeftHandThumb1", "LeftHandThumb2", "LeftHandThumb3",
]


class TestExport:
    def test_pose2bvh_verbatim_reference_mode(self, tmp_path):
        """The reference's mode: pose columns under the template header
        verbatim (structurally inconsistent — 126 values vs 156 declared —
        kept for artifact parity)."""
        hier = open(REF_HIER).read()
        pose = np.random.default_rng(0).uniform(-20, 20, (10, 123))
        p = str(tmp_path / "out.bvh")
        pose2bvh(p, pose, hier, fps=20, root_translation=[1, 2, 3])
        lines = open(p).read().splitlines()
        assert "MOTION" in open(p).read()
        assert len(lines[-1].split()) == 126

    def test_pose2bvh_consistent_roundtrip(self, tmp_path):
        from gesture_diffusion_tpu.export import pose2bvh_consistent

        pose = np.random.default_rng(0).uniform(-20, 20, (10, 123))
        p = str(tmp_path / "out.bvh")
        pose2bvh_consistent(p, pose, REF_HIER, BEAT_JOINTS_41, fps=20,
                            root_translation=[1, 2, 3])
        data = parse_bvh(p)
        assert data.framerate == pytest.approx(0.05)
        assert data.n_frames == 10
        np.testing.assert_allclose(data.values[0, :3], [1, 2, 3])
        # predicted joint columns round-trip
        cols = data.joint_columns(["Spine1"])
        np.testing.assert_allclose(data.values[:, cols], pose[:, :3], atol=1e-5)
        # non-predicted joints are zero
        neck = data.joint_columns(["Neck"])
        np.testing.assert_allclose(data.values[:, neck], 0.0)

    def test_filter_smooths(self):
        rng = np.random.default_rng(2)
        t = np.linspace(0, 4, 80)
        pose = 20 * np.sin(2 * np.pi * t)[:, None] + rng.normal(0, 5, (80, 6))
        smoothed = smooth_pose_euler(pose)
        assert smoothed.shape == pose.shape
        rough = np.abs(np.diff(pose, axis=0)).mean()
        smooth = np.abs(np.diff(smoothed, axis=0)).mean()
        assert smooth < rough * 0.7

    def test_sample2bvh_batch(self, tmp_path):
        sample_dir = tmp_path / "samples"
        os.makedirs(sample_dir)
        rng = np.random.default_rng(3)
        for i in range(2):
            with open(sample_dir / f"sample_{i}.pkl", "wb") as f:
                pickle.dump({
                    "pose": rng.uniform(-10, 10, (8, 123)),
                    "out": rng.uniform(-10, 10, (8, 123)),
                    "wav": rng.normal(0, 0.1, 16000).astype(np.float32),
                }, f)
        out_dir = str(tmp_path / "bvh")
        written = sample2bvh_batch(str(sample_dir), out_dir, REF_HIER,
                                   joint_names=BEAT_JOINTS_41)
        assert len(written) == 6
        assert all(os.path.exists(p) for p in written)
        parsed = parse_bvh(os.path.join(out_dir, "sample_0-out.bvh"))
        assert parsed.n_frames == 8


class TestAviMuxer:
    """Native RIFF/AVI writer (export/avi.py) — the reference's
    moviepy/ffmpeg mux (utils/vis_skeleton.py:283-339) equivalent."""

    def _frames(self, n=6, h=32, w=48):
        rng = np.random.default_rng(0)
        return [rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
                for _ in range(n)]

    @pytest.mark.parametrize("codec", ["mjpeg", "raw"])
    def test_structure_and_interleave(self, tmp_path, codec):
        from gesture_diffusion_tpu.export.avi import (read_avi_structure,
                                                      write_avi)
        wav = np.sin(np.linspace(0, 550.0, 4800)).astype(np.float32)
        p = write_avi(str(tmp_path / f"clip_{codec}.avi"), self._frames(),
                      fps=20, audio=wav, sample_rate=16000, codec=codec)
        info = read_avi_structure(p)
        assert info["video_frames"] == 6
        assert info["frames"] == 6
        assert info["streams"] == 2
        assert (info["width"], info["height"]) == (48, 32)
        assert info["usec_per_frame"] == 50000
        # all samples land in the file: 4800 x int16 mono
        assert info["audio_bytes"] == 4800 * 2
        assert info["index_entries"] == info["video_frames"] + info["audio_chunks"]
        assert info["flags"] & 0x10                       # AVIF_HASINDEX

    def test_mjpeg_frames_decode_back(self, tmp_path):
        import io
        import struct
        from PIL import Image
        from gesture_diffusion_tpu.export.avi import write_avi
        # smooth content (JPEG obliterates pure noise)
        yy, xx = np.mgrid[0:32, 0:48]
        base = ((yy * 4 + xx * 2) % 256).astype(np.uint8)
        frames = [np.stack([base, base[::-1], np.roll(base, 7, axis=1)], -1)
                  for _ in range(2)]
        p = write_avi(str(tmp_path / "c.avi"), frames, fps=10, codec="mjpeg",
                      quality=95)
        blob = open(p, "rb").read()
        at = blob.find(b"00dc")
        size = struct.unpack("<I", blob[at + 4:at + 8])[0]
        img = np.asarray(Image.open(io.BytesIO(blob[at + 8:at + 8 + size])))
        assert img.shape == frames[0].shape
        # JPEG is lossy; just require correlation with the source
        a = img.astype(np.float64).ravel()
        b = frames[0].astype(np.float64).ravel()
        corr = np.corrcoef(a, b)[0, 1]
        assert corr > 0.8

    def test_skeleton_video_avi_with_audio(self, tmp_path):
        from gesture_diffusion_tpu.data import Skeleton, parse_bvh
        from gesture_diffusion_tpu.export.avi import read_avi_structure
        from gesture_diffusion_tpu.export.vis_skeleton import (
            make_skeleton_video, pose_to_positions)
        from tests.test_data import TOY_BVH

        sk = Skeleton.from_bvh(parse_bvh(TOY_BVH, is_text=True))
        pose = np.random.default_rng(1).uniform(-20, 20, (4, 3 * 3))
        pos = pose_to_positions(sk, pose, ["Spine", "Head", "LeftArm"])
        out = make_skeleton_video(pos, sk, str(tmp_path / "skel.avi"), fps=4,
                                  wav=np.zeros(16000, np.float32), lim=5)
        info = read_avi_structure(out)
        assert info["video_frames"] == 4 and info["streams"] == 2
        assert info["audio_bytes"] == 16000 * 2


def test_skeleton_video_frames_are_distinct(tmp_path):
    """Regression: the Agg canvas buffer is reused across draws — the frame
    generator must copy it, or every frame in the file aliases the LAST
    rendered pose (found in review; chunk-count checks could not see it)."""
    import struct

    from gesture_diffusion_tpu.data import Skeleton, parse_bvh
    from gesture_diffusion_tpu.export.vis_skeleton import (
        make_skeleton_video, pose_to_positions)
    from tests.test_data import TOY_BVH

    sk = Skeleton.from_bvh(parse_bvh(TOY_BVH, is_text=True))
    pose = np.random.default_rng(2).uniform(-40, 40, (3, 3 * 3))
    pos = pose_to_positions(sk, pose, ["Spine", "Head", "LeftArm"])
    out = make_skeleton_video(pos, sk, str(tmp_path / "m.avi"), fps=4, lim=5)
    blob = open(out, "rb").read()
    payloads = set()
    at = blob.find(b"00dc", 12)
    while at != -1:
        size = struct.unpack("<I", blob[at + 4:at + 8])[0]
        payloads.add(blob[at + 8:at + 8 + size])
        at = blob.find(b"00dc", at + 8 + size)
    assert len(payloads) >= 2, "all video frames identical (buffer aliasing)"


class TestStickFigures:
    """Notebook-style stick-figure helpers (pymo/viz_tools.py:13-87)."""

    def test_draw_stickfigure_2d_and_3d(self, tmp_path):
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        from gesture_diffusion_tpu.data import mocap_transforms as mt
        from gesture_diffusion_tpu.data.bvh import parse_bvh
        from gesture_diffusion_tpu.export.vis_skeleton import (
            draw_stickfigure,
            draw_stickfigure3d,
        )

        gold = os.path.join(os.path.dirname(__file__), "golden",
                            "synth_fullbody.bvh")
        track = parse_bvh(gold)
        pos = mt.MocapParameterizer("position").fit(0).transform([track])[0]

        ax = draw_stickfigure(pos, frame=0, draw_names=True)
        # one scatter per joint; at least one bone line drawn
        assert len(ax.collections) == len(pos.joints)
        assert len(ax.lines) > 0
        plt.close(ax.figure)

        ax3 = draw_stickfigure3d(pos, frame=1)
        assert len(ax3.collections) == len(pos.joints)
        plt.close(ax3.figure)

        # joint subset draws only those joints and only internal bones
        subset = [pos.root_name] + pos.joints[pos.root_name].children[:1]
        ax = draw_stickfigure(pos, frame=0, joints=subset)
        assert len(ax.collections) == len(subset)
        plt.close(ax.figure)

    def test_nb_play_mocap(self, tmp_path):
        """Self-contained HTML player (pymo/viz_tools.py:192-235): data,
        edges, and per-frame meta all inlined; mf='bvh' raises (the
        reference branch is a NameError defect)."""
        import numpy as np

        from gesture_diffusion_tpu.data import mocap_transforms as mt
        from gesture_diffusion_tpu.data.bvh import parse_bvh
        from gesture_diffusion_tpu.export import nb_play_mocap

        gold = os.path.join(os.path.dirname(__file__), "golden",
                            "synth_fullbody.bvh")
        track = parse_bvh(gold)
        pos = mt.MocapParameterizer("position").fit(0).transform([track])[0]

        meta = np.stack([np.arange(track.n_frames),
                         np.arange(track.n_frames) * 2], axis=1)
        out = nb_play_mocap(pos, "pos", meta=meta, frame_time=1 / 24,
                            scale=2.0)
        page = out._repr_html_() if hasattr(out, "_repr_html_") else str(out)
        assert "<iframe" in page and "srcdoc=" in page
        # all joints and a plausible edge list are embedded
        for j in list(pos.joints)[:5]:
            assert j in page
        assert "var edges" in page and "frameTime" in page

        # file-output mode writes a standalone document
        f = tmp_path / "player.html"
        out2 = nb_play_mocap(pos, "pos", base_url=str(f))
        body = f.read_text()
        assert body.startswith("<!DOCTYPE html>")
        assert "var frames" in body
        page2 = (out2._repr_html_() if hasattr(out2, "_repr_html_")
                 else str(out2))
        assert "New Window" in page2
        # review fix: the iframe src must be RELATIVE (the Jupyter server
        # resolves it against the notebook origin; an absolute filesystem
        # path 404s and file:// is blocked from http pages), and the file
        # must be UTF-8 regardless of locale (the document declares it)
        import re
        src = re.search(r'src="([^"]+)"', page2).group(1)
        assert not src.startswith("/")
        f.read_text(encoding="utf-8")

        with pytest.raises(ValueError, match="bvh"):
            nb_play_mocap(pos, "bvh")
        # a raw euler track still renders: the root's 3 position channels
        # are positions (reference behaviour — it filters rotations only)
        nb_play_mocap(track, "pos", base_url=str(tmp_path / "root_only.html"))
        assert '"Hips"' in (tmp_path / "root_only.html").read_text()


class TestOnsetLibrosaSemantics:
    def test_onset_strength_center_compensation(self):
        """librosa pads the envelope front by lag + n_fft//(2*hop) = 3
        frames (center compensation) and truncates back to the frame
        count — the first 3 values are exactly 0 and the length equals
        the mel frame count."""
        sr, n_fft, hop = 16000, 2048, 512
        wav = np.random.default_rng(0).normal(0, 0.3, sr).astype(np.float32)
        env = ev.onset_strength(wav, sr)
        n_frames = 1 + len(wav) // hop
        assert len(env) == n_frames
        assert np.all(env[:3] == 0.0)
        assert env[3:].max() > 0.0

    def test_slaney_mel_scale_constants(self):
        """Slaney scale: 1 kHz maps to mel 15, linear 200/3 Hz-per-mel
        below, log(6.4)/27 step above; roundtrip exact."""
        from gesture_diffusion_tpu.ops.audio import (
            _hz_to_mel_slaney,
            _mel_to_hz_slaney,
            mel_filterbank,
        )

        assert np.isclose(float(_hz_to_mel_slaney(1000.0)), 15.0)
        assert np.isclose(float(_hz_to_mel_slaney(500.0)), 7.5)
        f = np.linspace(0, 8000, 101)
        np.testing.assert_allclose(_mel_to_hz_slaney(_hz_to_mel_slaney(f)),
                                   f, atol=1e-6)
        # slaney norm: triangle i scaled by 2/(f[i+2]-f[i]) -> peak of each
        # filter equals that factor times the unnormalised peak
        fb_raw = mel_filterbank(1025, 16, 16000, htk=False)
        fb_nrm = mel_filterbank(1025, 16, 16000, htk=False, norm="slaney")
        ratio = fb_nrm.max(axis=0) / fb_raw.max(axis=0)
        m = np.linspace(_hz_to_mel_slaney(0.0), _hz_to_mel_slaney(8000.0), 18)
        f_pts = _mel_to_hz_slaney(m)
        np.testing.assert_allclose(ratio, 2.0 / (f_pts[2:] - f_pts[:-2]),
                                   rtol=1e-4)

    def test_htk_default_unchanged(self):
        """The speech-encoder basis (htk=True, norm=None) is untouched by
        the slaney addition — same values as before."""
        from gesture_diffusion_tpu.ops.audio import mel_filterbank

        fb = mel_filterbank(513, 128, 16000)
        fb2 = mel_filterbank(513, 128, 16000, htk=True, norm=None)
        np.testing.assert_array_equal(fb, fb2)


class TestMp4Muxer:
    """Native ISO-BMFF writer (export/mp4.py) — the reference's actual
    container (moviepy/ffmpeg mp4, utils/vis_skeleton.py:283-338), written
    without ffmpeg: mp4v/esds(JPEG) video + sowt PCM audio.  No external
    demuxer exists in this environment, so the oracle is the structural
    reader: box sizes must tile exactly, sample tables must address real
    JPEG/PCM bytes inside mdat."""

    def _frames(self, n=6, h=32, w=48):
        yy, xx = np.mgrid[0:h, 0:w]
        base = ((yy * 4 + xx * 2) % 256).astype(np.uint8)
        return [np.stack([np.roll(base, i, 1), base[::-1], base], -1)
                for i in range(n)]

    def test_structure_and_sample_tables(self, tmp_path):
        from gesture_diffusion_tpu.export.mp4 import (read_mp4_structure,
                                                      write_mp4)

        wav = np.sin(np.linspace(0, 550.0, 4800)).astype(np.float32)
        p = write_mp4(str(tmp_path / "clip.mp4"), self._frames(), fps=20,
                      audio=wav, sample_rate=16000)
        info = read_mp4_structure(p)
        assert info["top_types"] == ["ftyp", "mdat", "moov"]
        assert info["n_traks"] == 2
        vid, aud = info["traks"]
        assert (vid["handler"], vid["sample_entry"]) == ("vide", "mp4v")
        assert (aud["handler"], aud["sample_entry"]) == ("soun", "sowt")
        assert vid["n_samples"] == 6 and vid["timescale"] == 20
        assert vid["stts"] == (6, 1)          # 6 frames, 1 tick @ fps
        assert aud["n_samples"] == 4800 and aud["timescale"] == 16000
        assert aud["sizes"][0] == 2           # mono int16
        lo, hi = info["mdat_range"]
        # every video sample is a JPEG (SOI marker) inside mdat
        data = open(p, "rb").read()
        off = vid["chunk_offset"]
        for s in vid["sizes"]:
            assert lo <= off and off + s <= hi
            assert data[off:off + 2] == b"\xff\xd8"
            off += s
        # the PCM spans the rest of mdat exactly
        assert aud["chunk_offset"] == off
        assert off + sum(aud["sizes"]) == hi
        # int16 roundtrip of the first samples
        got = np.frombuffer(data[off:off + 20], "<i2").astype(np.float64)
        np.testing.assert_allclose(got / 32767.0, wav[:10], atol=2e-4)

    def test_first_frame_decodes_back(self, tmp_path):
        import io
        from PIL import Image
        from gesture_diffusion_tpu.export.mp4 import (read_mp4_structure,
                                                      write_mp4)

        frames = self._frames(2)
        p = write_mp4(str(tmp_path / "c.mp4"), frames, fps=10, quality=95)
        info = read_mp4_structure(p)
        vid = info["traks"][0]
        data = open(p, "rb").read()
        off, size = vid["chunk_offset"], vid["sizes"][0]
        img = np.asarray(Image.open(io.BytesIO(data[off:off + size])))
        assert img.shape == frames[0].shape
        corr = np.corrcoef(img.astype(np.float64).ravel(),
                           frames[0].astype(np.float64).ravel())[0, 1]
        assert corr > 0.8

    def test_skeleton_video_mp4_with_audio(self, tmp_path):
        from gesture_diffusion_tpu.data import Skeleton, parse_bvh
        from gesture_diffusion_tpu.export.mp4 import read_mp4_structure
        from gesture_diffusion_tpu.export.vis_skeleton import (
            make_skeleton_video, pose_to_positions)
        from tests.test_data import TOY_BVH

        sk = Skeleton.from_bvh(parse_bvh(TOY_BVH, is_text=True))
        pose = np.random.default_rng(1).uniform(-20, 20, (4, 3 * 3))
        pos = pose_to_positions(sk, pose, ["Spine", "Head", "LeftArm"])
        out = make_skeleton_video(pos, sk, str(tmp_path / "skel.mp4"), fps=4,
                                  wav=np.zeros(16000, np.float32), lim=5)
        info = read_mp4_structure(out)
        assert info["n_traks"] == 2
        assert info["traks"][0]["n_samples"] == 4
        assert info["traks"][1]["n_samples"] == 16000

    def test_no_frames_raises(self, tmp_path):
        from gesture_diffusion_tpu.export.mp4 import write_mp4

        with pytest.raises(ValueError, match="no frames"):
            write_mp4(str(tmp_path / "x.mp4"), [], fps=10)

    def test_fractional_fps(self, tmp_path):
        """Advisor fix: a non-integer rate (NTSC 29.97) must not crash in
        struct.pack — the video track switches to a 90 kHz media timescale
        with the standard rounded per-frame delta (3003); integer rates
        keep the exact 1-tick-per-frame tables."""
        from gesture_diffusion_tpu.export.mp4 import (read_mp4_structure,
                                                      write_mp4)

        p = write_mp4(str(tmp_path / "ntsc.mp4"), self._frames(3),
                      fps=29.97)
        vid = read_mp4_structure(p)["traks"][0]
        assert vid["timescale"] == 90000
        assert vid["stts"] == (3, 3003)
        assert vid["n_samples"] == 3

    def test_invalid_fps_raises(self, tmp_path):
        from gesture_diffusion_tpu.export.mp4 import write_mp4

        for bad in (0, -5, float("nan"), float("inf")):
            with pytest.raises(ValueError, match="fps"):
                write_mp4(str(tmp_path / "bad.mp4"), self._frames(1),
                          fps=bad)


def test_esds_buffer_holds_largest_frame():
    """Review fix: bufferSizeDB must cover the largest JPEG access unit
    (strict MPEG-4-systems demuxers size the elementary-stream buffer from
    it) — it was hardcoded to 64 KB while skeleton frames at quality 95
    routinely exceed that."""
    import struct
    from gesture_diffusion_tpu.export.mp4 import _esds_jpeg

    box = _esds_jpeg(200_000, 2_000_000, 1_000_000)
    # DecoderConfigDescriptor: OTI 0x6C, streamType byte, bufferSizeDB(24b)
    want = bytes([0x6C, (4 << 2) | 1]) + (200_000).to_bytes(3, "big") \
        + struct.pack(">II", 2_000_000, 1_000_000)
    assert want in box
    # small frames keep the 64 KB floor
    box2 = _esds_jpeg(1000, 500, 500)
    assert bytes([0x6C, (4 << 2) | 1, 0x00, 0xFF, 0xFF]) in box2


def test_mp4_stereo_audio_sample_tables():
    """Stereo PCM: sowt channelcount 2, 4-byte samples, full mdat span."""
    import tempfile

    import numpy as np

    from gesture_diffusion_tpu.export.mp4 import (read_mp4_structure,
                                                  write_mp4)

    rng = np.random.default_rng(5)
    frames = [(rng.random((16, 16, 3)) * 255).astype(np.uint8)
              for _ in range(3)]
    stereo = rng.normal(0, 0.2, (1600, 2)).astype(np.float32)
    with tempfile.TemporaryDirectory() as d:
        p = write_mp4(d + "/s.mp4", frames, fps=10, audio=stereo,
                      sample_rate=8000)
        info = read_mp4_structure(p)
        aud = info["traks"][1]
        assert aud["n_samples"] == 1600
        assert aud["sizes"][0] == 4                   # 2ch x int16
        assert aud["timescale"] == 8000
        lo, hi = info["mdat_range"]
        assert aud["chunk_offset"] + 1600 * 4 == hi


class TestMuxerValidation:
    """Shared frame/fps validation (fuzz findings): float frames silently
    truncated to near-black JPEGs, a mid-stream size change wrote a
    container promising the first frame's geometry, and write_avi divided
    by zero on fps=0."""

    @pytest.mark.parametrize("writer_ext", ["avi", "mp4"])
    def test_rejects_bad_frames_and_fps(self, tmp_path, writer_ext):
        from gesture_diffusion_tpu.export import write_avi, write_mp4

        writer = {"avi": write_avi, "mp4": write_mp4}[writer_ext]
        p = str(tmp_path / f"t.{writer_ext}")
        ok = np.zeros((32, 32, 3), np.uint8)

        with pytest.raises(ValueError, match="expected uint8"):
            writer(p, [ok.astype(np.float32)], fps=10)
        with pytest.raises(ValueError, match="expected \\(H, W, 3\\)"):
            writer(p, [np.zeros((32, 32), np.uint8)], fps=10)
        with pytest.raises(ValueError, match="size .* != first frame"):
            writer(p, [ok, np.zeros((16, 16, 3), np.uint8)], fps=10)
        with pytest.raises(ValueError, match="fps must be positive"):
            writer(p, [ok], fps=0)
        # non-coercible fps stays a NAMED error, not a bare float() TypeError
        with pytest.raises(ValueError, match="fps must be a positive"):
            writer(p, [ok], fps=None)
        with pytest.raises(ValueError, match="fps must be a positive"):
            writer(p, [ok], fps="30fps")
        # healthy write unchanged
        writer(p, [ok, ok], fps=10)
        assert os.path.getsize(p) > 0
