"""Prep-phase tests: synthetic BEAT-format corpus -> sample pickles."""

import json
import os
import pickle

import numpy as np
import pytest

from gesture_diffusion_tpu.data.beat import load_wav, split_dataset
from gesture_diffusion_tpu.data.textgrid import read_textgrid

SAMPLE_TEXTGRID = """File type = "ooTextFile"
Object class = "TextGrid"

xmin = 0
xmax = 30.0
tiers? <exists>
size = 1
item []:
    item [1]:
        class = "IntervalTier"
        name = "words"
        xmin = 0
        xmax = 30.0
        intervals: size = 3
        intervals [1]:
            xmin = 0.0
            xmax = 6.0
            text = ""
        intervals [2]:
            xmin = 6.0
            xmax = 7.5
            text = "hello"
        intervals [3]:
            xmin = 7.5
            xmax = 30.0
            text = "world"
"""


def _write_toy_bvh(path, seconds=30, fps=120, seed=0):
    rng = np.random.default_rng(seed)
    n = seconds * fps
    header = (
        "HIERARCHY\nROOT Hips\n{\n"
        "\tOFFSET 0 0 0\n"
        "\tCHANNELS 6 Xposition Yposition Zposition Xrotation Yrotation Zrotation\n"
        "\tJOINT Spine\n\t{\n\t\tOFFSET 0 2 0\n"
        "\t\tCHANNELS 3 Xrotation Yrotation Zrotation\n"
        "\t\tEnd Site\n\t\t{\n\t\t\tOFFSET 0 1 0\n\t\t}\n\t}\n}\n"
        f"MOTION\nFrames: {n}\nFrame Time: 0.008333\n"
    )
    vals = rng.uniform(-30, 30, (n, 9))
    with open(path, "w") as f:
        f.write(header)
        for row in vals:
            f.write(" ".join(f"{v:.4f}" for v in row) + "\n")


def _write_toy_wav(path, seconds=30, sr=8000, seed=0):
    from scipy.io import wavfile

    rng = np.random.default_rng(seed)
    data = (rng.normal(0, 0.1, seconds * sr) * 32767 * 0.2).astype(np.int16)
    wavfile.write(path, sr, data)


def test_read_textgrid(tmp_path):
    p = str(tmp_path / "a.TextGrid")
    with open(p, "w") as f:
        f.write(SAMPLE_TEXTGRID)
    tiers = read_textgrid(p)
    assert len(tiers) == 1
    assert [iv.mark for iv in tiers[0]] == ["", "hello", "world"]
    assert tiers[0][1].min_time == pytest.approx(6.0)
    assert tiers[0][2].max_time == pytest.approx(30.0)


def test_read_textgrid_utf16_bom(tmp_path):
    """Praat writes UTF-16 with a BOM whenever a mark is non-ASCII; the
    reader must BOM-sniff (decoding as utf-8 NUL-interleaves the text and
    used to parse to zero tiers)."""
    tg = SAMPLE_TEXTGRID.replace('text = "hello"', 'text = "héllo"')
    for enc in ("utf-16-le", "utf-16-be", "utf-8-sig"):
        p = str(tmp_path / f"{enc}.TextGrid")
        bom = {"utf-16-le": b"\xff\xfe", "utf-16-be": b"\xfe\xff",
               "utf-8-sig": b""}[enc]
        with open(p, "wb") as f:
            f.write(bom + tg.encode(enc))
        tiers = read_textgrid(p)
        assert len(tiers) == 1, enc
        assert [iv.mark for iv in tiers[0]] == ["", "héllo", "world"], enc


def test_read_textgrid_corrupt_and_utf32(tmp_path):
    """The reader never raises on malformed bytes: a truncated UTF-16 file
    (odd byte count) degrades via errors='replace', and UTF-32 BOMs are
    sniffed before UTF-16 (UTF-32-LE starts ff fe 00 00 — a 2-byte check
    would NUL-ridden-decode it as UTF-16-LE and parse zero tiers)."""
    tg = SAMPLE_TEXTGRID.replace('text = "hello"', 'text = "héllo"')

    # truncated UTF-16-LE: chop the final byte -> odd length
    p = str(tmp_path / "trunc.TextGrid")
    with open(p, "wb") as f:
        f.write((b"\xff\xfe" + tg.encode("utf-16-le"))[:-1])
    tiers = read_textgrid(p)  # must not raise
    assert len(tiers) == 1
    assert tiers[0][1].mark == "héllo"

    for enc, bom in (("utf-32-le", b"\xff\xfe\x00\x00"),
                     ("utf-32-be", b"\x00\x00\xfe\xff")):
        p = str(tmp_path / f"{enc}.TextGrid")
        with open(p, "wb") as f:
            f.write(bom + tg.encode(enc))
        tiers = read_textgrid(p)
        assert [iv.mark for iv in tiers[0]] == ["", "héllo", "world"], enc


def test_vocab_plain_array_npy_clear_error(tmp_path):
    """A word-vector path holding a plain (V, dim) array (not a dict dump)
    must fail with a clear format error, not an opaque z.item() ValueError."""
    from gesture_diffusion_tpu.data.vocab import Vocab

    p = str(tmp_path / "plain.npy")
    np.save(p, np.zeros((5, 4), np.float32))
    v = Vocab("words")
    v.index_word("hi")
    v.load_word_vectors(p, dim=4)
    with pytest.raises(ValueError, match="expected an .npz"):
        v.build_embedding_table(np.random.default_rng(0))


def test_vocab_embeddings_without_pretrained_and_from_npy(tmp_path):
    """build_embedding_table works without load_word_vectors ever being
    called (random embeddings, default dim), and accepts both an .npz
    word->vec dump and a pickled-dict .npy."""
    from gesture_diffusion_tpu.data.vocab import Vocab

    v = Vocab("words")
    v.index_word("hi")
    table = v.build_embedding_table(np.random.default_rng(0))
    assert table.shape == (v.n_words, 300)

    vec = np.full(4, 7.0, np.float32)
    npz = str(tmp_path / "v.npz")
    np.savez(npz, hi=vec)
    npy = str(tmp_path / "v.npy")
    np.save(npy, {"hi": vec}, allow_pickle=True)
    for path in (npz, npy):
        v2 = Vocab("words")
        idx = v2.index_word("hi")
        v2.load_word_vectors(path, dim=4)
        t2 = v2.build_embedding_table(np.random.default_rng(0))
        np.testing.assert_array_equal(t2[idx], vec)


def test_load_wav_resamples_and_scales(tmp_path):
    p = str(tmp_path / "a.wav")
    _write_toy_wav(p, seconds=2, sr=8000)
    wav = load_wav(p, 16000)
    assert wav.shape == (32000,)
    assert wav.dtype == np.float32
    assert np.abs(wav).max() <= 1.0


def test_load_wav_librosa_scaling(tmp_path):
    """int16 PCM scales by 2**15 = 32768 (librosa util.buf_to_float), NOT
    iinfo.max = 32767: int16 min maps to exactly -1.0 and +32767 to just
    under +1.0."""
    from scipy.io import wavfile

    p = str(tmp_path / "edge.wav")
    wavfile.write(p, 16000, np.array([-32768, 32767, 0, 16384], np.int16))
    wav = load_wav(p, 16000)
    np.testing.assert_allclose(
        wav, [-1.0, 32767 / 32768, 0.0, 0.5], atol=1e-7)


def test_single_speaker_split_is_stratified_like_reference(tmp_path):
    """The reference ALWAYS passes stratify=hids (data_utils.py:441-449);
    StratifiedShuffleSplit draws a different permutation than a plain
    shuffle at the same seed, so a single-speaker config must still
    stratify for split-membership parity."""
    from sklearn.model_selection import train_test_split

    from gesture_diffusion_tpu.data.beat import _stratified_split_and_save

    n = 20
    data = {"hid": np.ones(n), "pose": np.arange(n)}
    _stratified_split_and_save(data, str(tmp_path), seed=0)
    splits = {}
    for split in ("train", "val", "test"):
        with open(os.path.join(str(tmp_path), f"{split}_samples.pkl"), "rb") as f:
            splits[split] = pickle.load(f)["pose"]
    # reference-style oracle: split the arrays directly, always stratified
    hids = np.ones(n)
    _, rest_h, train_p, rest_p = train_test_split(
        hids, np.arange(n), test_size=0.2, shuffle=True, stratify=hids,
        random_state=0)
    _, _, test_p, val_p = train_test_split(
        rest_h, rest_p, test_size=0.5, shuffle=True, stratify=rest_h,
        random_state=0)
    np.testing.assert_array_equal(np.sort(splits["train"]), np.sort(train_p))
    np.testing.assert_array_equal(np.sort(splits["val"]), np.sort(val_p))
    np.testing.assert_array_equal(np.sort(splits["test"]), np.sort(test_p))


def test_split_dataset_empty_corpus_clear_error(tmp_path):
    """Every recording failing must end in a clear 'no samples collected'
    error, not np.concatenate's 'need at least one array'."""
    src = tmp_path / "BEAT" / "1"
    os.makedirs(src)
    _write_toy_bvh(str(src / "only.bvh"))   # wav + TextGrid missing
    with pytest.raises(ValueError, match="no samples collected"):
        split_dataset(str(tmp_path / "BEAT"), [1], 16000, 10.0,
                      str(tmp_path / "spt"), pose_fps=20, joints=["Spine"])


def test_split_dataset_end_to_end(tmp_path):
    src = tmp_path / "BEAT" / "1"
    os.makedirs(src)
    # 12 recordings of 30 s -> after 5 s base-time sync, 25 s each
    # -> 2 chunks of 10 s each = 24 samples, split 8:1:1
    for i in range(12):
        base = str(src / f"1_speaker_0_{i}_{i}")
        _write_toy_bvh(base + ".bvh", seed=i)
        _write_toy_wav(base + ".wav", seed=i)
        with open(base + ".TextGrid", "w") as f:
            f.write(SAMPLE_TEXTGRID)
    spt = str(tmp_path / "spt")
    split_dataset(
        src_dir_path=str(tmp_path / "BEAT"), human_ids=[1], wav_sr=16000,
        sample_duration=10.0, spt_dir_path=spt,
        pose_fps=20, joints=["Spine"])

    with open(os.path.join(spt, "train_samples.pkl"), "rb") as f:
        train = pickle.load(f)
    with open(os.path.join(spt, "val_samples.pkl"), "rb") as f:
        val = pickle.load(f)
    with open(os.path.join(spt, "test_samples.pkl"), "rb") as f:
        test = pickle.load(f)
    n_total = len(train["pose"]) + len(val["pose"]) + len(test["pose"])
    assert n_total == 24
    assert len(train["pose"]) == 19  # 80% of 24 (sklearn rounds test up)
    assert sorted([len(val["pose"]), len(test["pose"])]) == [2, 3]
    assert train["pose"].shape[1:] == (200, 3)     # 10 s @ 20 fps, 1 joint
    assert train["wav"].shape[1:] == (160000,)     # 10 s @ 16 kHz
    assert train["word_id"].shape[1:] == (200,)
    # words got indexed
    with open(os.path.join(spt, "vocab.pkl"), "rb") as f:
        vocab = pickle.load(f)
    assert vocab.get_word_index("hello") >= 4
    assert (train["word_id"] > 0).any()


def _write_toy_face_json(path, seconds=30, src_fps=60, n_weights=5, seed=0):
    rng = np.random.default_rng(seed)
    frames = [{"weights": rng.uniform(0, 1, n_weights).round(4).tolist()}
              for _ in range(int(seconds * src_fps))]
    with open(path, "w") as f:
        json.dump({"frames": frames}, f)


def test_load_from_face(tmp_path):
    """BEAT facial JSON -> (T, n_weights) at tgt_fps: every
    (src_fps/tgt_fps)-th frame is kept (data_utils.py:206-221) and the
    duration is the reduced length over tgt_fps."""
    from gesture_diffusion_tpu.data.beat import load_from_face

    p = str(tmp_path / "a.json")
    _write_toy_face_json(p, seconds=2, src_fps=60, n_weights=3)
    arr, dur = load_from_face(p, src_fps=60, tgt_fps=15)
    assert arr.shape == (30, 3)          # 2 s * 60 fps / 4
    assert dur == pytest.approx(2.0)
    with open(p) as f:
        raw = np.array([fr["weights"] for fr in json.load(f)["frames"]])
    np.testing.assert_array_equal(arr, raw[::4])


def test_split_dataset_with_face(tmp_path):
    """use_face=True threads the facial track through sync/truncate/window:
    every split gains a 'face' key windowed at face_fps alongside
    pose/wav/word_id (data_utils.py's expressive-BEAT branch)."""
    src = tmp_path / "BEAT" / "1"
    os.makedirs(src)
    for i in range(12):
        base = str(src / f"1_speaker_0_{i}_{i}")
        _write_toy_bvh(base + ".bvh", seed=i)
        _write_toy_wav(base + ".wav", seed=i)
        _write_toy_face_json(base + ".json", seed=i)
        with open(base + ".TextGrid", "w") as f:
            f.write(SAMPLE_TEXTGRID)
    spt = str(tmp_path / "spt")
    split_dataset(
        src_dir_path=str(tmp_path / "BEAT"), human_ids=[1], wav_sr=16000,
        sample_duration=10.0, spt_dir_path=spt,
        pose_fps=20, joints=["Spine"], use_face=True, face_fps=15)
    for split in ("train", "val", "test"):
        with open(os.path.join(spt, f"{split}_samples.pkl"), "rb") as f:
            data = pickle.load(f)
        assert data["face"].shape[1:] == (150, 5)   # 10 s @ 15 fps
        assert len(data["face"]) == len(data["pose"])
        assert np.isfinite(data["face"]).all()


def test_split_dataset_skips_broken_recordings(tmp_path):
    src = tmp_path / "BEAT" / "1"
    os.makedirs(src)
    for i in range(12):
        base = str(src / f"rec_{i}")
        _write_toy_bvh(base + ".bvh", seed=i)
        _write_toy_wav(base + ".wav", seed=i)
        with open(base + ".TextGrid", "w") as f:
            f.write(SAMPLE_TEXTGRID)
    # recording with missing wav: logged and skipped
    _write_toy_bvh(str(src / "rec_broken.bvh"))
    with open(str(src / "rec_broken.TextGrid"), "w") as f:
        f.write(SAMPLE_TEXTGRID)
    spt = str(tmp_path / "spt")
    split_dataset(str(tmp_path / "BEAT"), [1], 16000, 10.0, spt,
                  pose_fps=20, joints=["Spine"])
    log = open(os.path.join(spt, "split_dataset.log")).read()
    assert "rec_broken" in log and "[Error]" in log
    with open(os.path.join(spt, "train_samples.pkl"), "rb") as f:
        train = pickle.load(f)
    assert len(train["pose"]) == 19
