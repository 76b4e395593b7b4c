"""Text/data-selection parity rules pinned against the LITERAL
reference utilities (round-2 review found all three had drifted)."""
import importlib
import sys

import numpy as np
import pytest

from gesture2vec_tpu.text.vocab import normalize_string

REF_UTILS = "/root/reference/scripts"


def _ref_data_utils():
    import os
    if not os.path.isdir(REF_UTILS):
        pytest.skip("reference tree not present")
    added = REF_UTILS not in sys.path
    if added:
        sys.path.insert(0, REF_UTILS)
    try:
        return importlib.import_module("utils.data_utils")
    finally:
        if added:
            sys.path.remove(REF_UTILS)


def test_normalize_string_matches_reference():
    """(ref: utils/data_utils.py:12-33): apostrophes removed, digits
    KEPT, ,.!? isolated."""
    ref = _ref_data_utils()
    cases = ["Shouldn't we go?", "I have 100 things, really!",
             "  WEIRD   spacing\there ", "don't-stop", "a.b,c!d?e",
             "émigré café 42", "it's 3:30pm..."]
    for s in cases:
        assert normalize_string(s) == ref.normalize_string(s), s


def test_window_word_selection_uses_overlap_rule():
    """A word overlapping a window's edge belongs to that window
    (ref: data_preprocessor.get_words_in_time_range :335-363), not only
    when its midpoint falls inside."""
    from gesture2vec_tpu.data.datasets import sentence_windows

    class _Store:
        clips = [{"n_frames": 240,
                  "words": [["early", 5.5, 6.3],   # center 5.9 < 6.0
                            ["in1", 6.5, 6.9], ["in2", 7.0, 7.4],
                            ["in3", 8.0, 8.4],
                            ["late", 11.8, 12.5]]}]  # center 12.15 >= 12

    wins = sentence_windows(_Store(), frame_length=120, stride=120,
                            fps=20, min_words=4)
    # window [6.0, 12.0): overlap keeps "early" AND "late" -> 5 words
    w0 = [w for w in wins if w["t0"] == 6.0]
    assert w0 and [x[0] for x in w0[0]["words"]] == [
        "early", "in1", "in2", "in3", "late"]


def test_twh_split_rule_every_100th_to_val(tmp_path, monkeypatch):
    """File 0 (and every 100th) goes to validation
    (ref: twh_dataset_to_lmdb.py:209 `save_idx % 100 == 0`)."""
    import os

    from gesture2vec_tpu.data.ingest import ingest_twh
    from gesture2vec_tpu.data.store import ClipStore
    from tests.fixtures import make_synthetic_twh_bvh

    base = tmp_path / "twh"
    os.makedirs(base / "bvh")
    for i in range(3):
        with open(base / "bvh" / f"rec_{i}.bvh", "w") as f:
            f.write(make_synthetic_twh_bvh(n_frames=90))
    out = str(tmp_path / "store")
    ingest_twh(str(base), out, variant="test1", with_audio=False)
    train = ClipStore(os.path.join(out, "train"))
    val = ClipStore(os.path.join(out, "val"))
    assert len(val.clips) == 1 and val.clips[0]["vid"] == "rec_0"
    assert len(train.clips) == 2


def test_window_text_context_extends_word_range_backwards():
    """text_context_s (beyond reference): the word range extends back
    by context_s seconds; the min_words filter and the window
    population stay exactly the reference's (window-local)."""
    from gesture2vec_tpu.data.datasets import sentence_windows

    class _Store:
        clips = [{"n_frames": 240,
                  "words": [["way_before", 0.1, 0.6],
                            ["before", 4.0, 4.6],      # in [t0-3, t0)
                            ["in1", 6.5, 6.9], ["in2", 7.0, 7.4],
                            ["in3", 8.0, 8.4], ["in4", 9.0, 9.4],
                            ["late", 11.8, 12.5]]}]

    plain = sentence_windows(_Store(), frame_length=120, stride=120,
                             fps=20, min_words=4)
    ctx = sentence_windows(_Store(), frame_length=120, stride=120,
                           fps=20, min_words=4, context_s=3.0)
    assert [w["t0"] for w in plain] == [w["t0"] for w in ctx]
    p0 = [w for w in plain if w["t0"] == 6.0][0]
    c0 = [w for w in ctx if w["t0"] == 6.0][0]
    assert [x[0] for x in p0["words"]] == ["in1", "in2", "in3", "in4",
                                           "late"]
    assert [x[0] for x in c0["words"]] == ["before", "in1", "in2",
                                           "in3", "in4", "late"]

    # a window with >= min_words only WITH context must still be
    # dropped (population parity with the reference)
    class _Sparse:
        clips = [{"n_frames": 240,
                  "words": [["a", 0.1, 0.5], ["b", 1.0, 1.4],
                            ["c", 2.0, 2.4],
                            ["d", 6.5, 6.9], ["e", 7.0, 7.4],
                            ["f", 8.0, 8.4], ["g", 9.0, 9.4]]}]
    for kw in ({}, {"context_s": 10.0}):
        wins = sentence_windows(_Sparse(), frame_length=120, stride=120,
                                fps=20, min_words=4, **kw)
        assert [w["t0"] for w in wins] == [6.0]
