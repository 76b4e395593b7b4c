"""Parity tests for the extended transformer surface against the LITERAL
reference pymo library (/root/reference/scripts/pymo/preprocessing.py),
imported directly with a one-line transforms3d stub (the stubbed module is
only needed by code paths these transformers never touch).

Covers the reference transformers that no ingest pipeline uses but that
belong to the library surface: MocapParameterizer('position') (:86-168),
Slicer (:425-477), RootTransformer('abdolute_translation_deltas')
(:478-615), RootCentricPositionNormalizer (:675-755), ListStandardScaler
(:799-846), ListMinMaxScaler (:849-897), ReverseTime (:936-961).
"""
from __future__ import annotations

import os
import sys
import types

import numpy as np
import pytest

from gesture2vec_tpu.io.bvh import parse_bvh
from gesture2vec_tpu.mocap.pipeline import (
    Flattener, ListMinMaxScaler, ListStandardScaler, MotionPipeline,
    Numpyfy, ReverseTime, RootCentricPositionNormalizer, RootDeltas,
    Slicer, ToPositions, Track)
from tests.fixtures import make_synthetic_bvh

REF_SCRIPTS = "/root/reference/scripts"
N_FRAMES = 120


def _load_reference_pymo():
    if "transforms3d" not in sys.modules:
        stub = types.ModuleType("transforms3d")
        stub.euler = types.SimpleNamespace()
        sys.modules["transforms3d"] = stub
    sys.path.insert(0, REF_SCRIPTS)
    try:
        import pymo.parsers as ref_parsers
        import pymo.preprocessing as ref_pre
    finally:
        sys.path.remove(REF_SCRIPTS)
    return ref_parsers, ref_pre


if not os.path.isdir(REF_SCRIPTS):
    pytest.skip("reference tree not present", allow_module_level=True)
ref_parsers, ref_pre = _load_reference_pymo()


@pytest.fixture(scope="module")
def bvh_pair(tmp_path_factory):
    """(our Track, reference MocapData) parsed from the same BVH text."""
    text = make_synthetic_bvh(n_frames=N_FRAMES, fps=60, seed=11)
    path = tmp_path_factory.mktemp("bvh") / "clip.bvh"
    path.write_text(text)
    ours = Track.from_bvh(parse_bvh(text, from_text=True))
    ref = ref_parsers.BVHParser().parse(str(path))
    # The reference's RootTransformer does `dx[0] = dx[1]` — positional
    # Series indexing that modern pandas rejects on the parser's
    # timedelta index. An integer index keeps the semantics and lets the
    # literal reference code run.
    ref.values = ref.values.reset_index(drop=True)
    return ours, ref


def _compare_columns(track: Track, ref_df, atol=1e-8, order=True):
    if order:
        assert list(track.columns) == list(ref_df.columns)
    else:
        assert set(track.columns) == set(ref_df.columns)
    for i, c in enumerate(track.columns):
        np.testing.assert_allclose(
            track.values[:, i], ref_df[c].to_numpy(), atol=atol,
            err_msg=c)


def test_to_positions_matches_reference(bvh_pair):
    ours, ref = bvh_pair
    ref_out = ref_pre.MocapParameterizer("position").fit_transform([ref])[0]
    out = ToPositions().transform([ours])[0]
    # same joints, same FK result incl. the root-offset exclusion quirk
    _compare_columns(out, ref_out.values, atol=1e-6, order=False)
    with pytest.raises(NotImplementedError):
        ToPositions().inverse_transform([out])


def test_slicer_matches_reference(bvh_pair):
    ours, ref = bvh_pair
    ref_sl = ref_pre.Slicer(window_size=32, overlap=0.5)
    ref_wins = ref_sl.fit_transform([ref])
    sl = Slicer(window_size=32, overlap=0.5).fit([ours])
    wins = sl.transform([ours])
    assert wins.shape == ref_wins.shape
    np.testing.assert_allclose(wins, ref_wins, atol=1e-12)
    # inverse rebuilds Tracks with the fitted column template
    rebuilt = sl.inverse_transform(wins[:3])
    assert len(rebuilt) == 3
    assert rebuilt[0].columns == ours.columns
    np.testing.assert_allclose(rebuilt[0].values, wins[0])


@pytest.mark.parametrize("smoothing", [0.0, 2.5])
def test_root_deltas_matches_reference(bvh_pair, smoothing):
    ours, ref = bvh_pair
    ref_tr = ref_pre.RootTransformer("abdolute_translation_deltas",
                                     position_smoothing=smoothing)
    ref_out = ref_tr.fit_transform([ref])[0]
    rd = RootDeltas(position_smoothing=smoothing)
    out = rd.transform([ours])[0]
    _compare_columns(out, ref_out.values, atol=1e-8, order=True)

    ref_inv = ref_tr.inverse_transform([ref_out])[0]
    inv = rd.inverse_transform([out])[0]
    _compare_columns(inv, ref_inv.values, atol=1e-8, order=True)
    if smoothing == 0.0:
        # delta[0] never contributes, so X/Z are recovered only up to
        # the first frame's position: frame 0 maps to start_pos (0,0)
        np.testing.assert_allclose(inv.col("Hips_Xposition")[0], 0.0,
                                   atol=1e-12)


def test_root_deltas_start_pos_restores_track(bvh_pair):
    ours, _ = bvh_pair
    rd = RootDeltas()
    out = rd.transform([ours])[0]
    x0 = ours.col("Hips_Xposition")[0]
    z0 = ours.col("Hips_Zposition")[0]
    inv = rd.inverse_transform([out], start_pos=(x0, z0))[0]
    # delta[0] is the duplicated value and is skipped by the inverse, so
    # seeding with the true frame-0 position restores the track exactly
    np.testing.assert_allclose(inv.col("Hips_Xposition"),
                               ours.col("Hips_Xposition"), atol=1e-9)
    np.testing.assert_allclose(inv.col("Hips_Zposition"),
                               ours.col("Hips_Zposition"), atol=1e-9)


def test_root_centric_position_normalizer_matches_reference(bvh_pair):
    ours, ref = bvh_pair
    ref_pos = ref_pre.MocapParameterizer("position").fit_transform([ref])[0]
    pos = ToPositions().transform([ours])[0]
    norm = RootCentricPositionNormalizer()
    ref_norm = ref_pre.RootCentricPositionNormalizer()
    ref_out = ref_norm.fit_transform([ref_pos])[0]
    out = norm.transform([pos])[0]
    _compare_columns(out, ref_out.values, atol=1e-6, order=True)

    # reference inverse doubles the root's X/Z (quirk preserved)
    ref_inv = ref_norm.inverse_transform([ref_out])[0]
    inv = norm.inverse_transform([out])[0]
    _compare_columns(inv, ref_inv.values, atol=1e-6, order=False)
    # repaired mode restores the original positions exactly
    fixed = RootCentricPositionNormalizer(parity_root_double=False)
    rt = fixed.inverse_transform([fixed.transform([pos])[0]])[0]
    for i, c in enumerate(rt.columns):
        np.testing.assert_allclose(rt.values[:, i], pos.col(c), atol=1e-9,
                                   err_msg=c)


def test_list_standard_scaler_matches_reference():
    rng = np.random.default_rng(0)
    # equal shapes: the reference returns np.array(list-of-tracks), which
    # modern numpy rejects for ragged frame counts
    arrays = [rng.normal(3.0, 2.0, size=(50, 7)),
              rng.normal(-1.0, 0.5, size=(50, 7))]
    ref_sc = ref_pre.ListStandardScaler()
    ref_out = ref_sc.fit_transform(arrays)
    sc = ListStandardScaler().fit(arrays)
    out = sc.transform(arrays)
    np.testing.assert_allclose(out[0], ref_out[0], atol=1e-12)
    np.testing.assert_allclose(out[1], ref_out[1], atol=1e-12)
    back = sc.inverse_transform(out)
    np.testing.assert_allclose(back[0], arrays[0], atol=1e-9)


def test_list_minmax_scaler_matches_reference():
    rng = np.random.default_rng(1)
    arrays = [rng.uniform(-5, 5, size=(40, 4)),
              rng.uniform(0, 10, size=(40, 4))]
    ref_sc = ref_pre.ListMinMaxScaler()
    ref_out = ref_sc.fit_transform(arrays)
    sc = ListMinMaxScaler().fit(arrays)
    out = sc.transform(arrays)
    np.testing.assert_allclose(out[0], ref_out[0], atol=1e-12)
    np.testing.assert_allclose(out[1], ref_out[1], atol=1e-12)
    back = sc.inverse_transform(out)
    np.testing.assert_allclose(back[1], arrays[1], atol=1e-9)


def test_scalers_accept_tracks(bvh_pair):
    ours, _ = bvh_pair
    sc = ListStandardScaler().fit([ours])
    out = sc.transform([ours])[0]
    assert isinstance(out, Track)
    nonconst = ours.values.std(axis=0) > 0
    np.testing.assert_allclose(out.values[:, nonconst].mean(axis=0), 0.0,
                               atol=1e-9)
    back = sc.inverse_transform([out])[0]
    np.testing.assert_allclose(back.values, ours.values, atol=1e-9)


def test_reverse_time_matches_reference(bvh_pair):
    ours, ref = bvh_pair
    ref_out = ref_pre.ReverseTime(append=True).fit_transform([ref])
    out = ReverseTime(append=True).transform([ours])
    assert len(out) == len(ref_out) == 2
    np.testing.assert_allclose(out[1].values,
                               ref_out[1].values.to_numpy(), atol=1e-12)
    only = ReverseTime(append=False).transform([ours])
    assert len(only) == 1
    np.testing.assert_allclose(only[0].values, ours.values[::-1])


def test_flattener():
    a, b = np.ones((3, 2)), np.zeros((2, 2))
    out = Flattener().transform([a, b])
    assert out.shape == (5, 2)


def test_pipeline_persistence_with_new_transforms(bvh_pair, tmp_path):
    ours, _ = bvh_pair
    data = ours.source.clone()
    data.values = ours.values  # columns == channel layout for fixture
    pipe = MotionPipeline([
        ("deltas", RootDeltas()),
        ("slice", Slicer(window_size=16, overlap=0.25)),
    ])
    wins = pipe.fit_transform([data])
    path = tmp_path / "pipe.json"
    pipe.save(str(path))
    loaded = MotionPipeline.load(str(path))
    wins2 = loaded.transform([data])
    np.testing.assert_allclose(wins, wins2, atol=1e-12)
    # inverse through the loaded pipeline rebuilds BVHData
    back = loaded.inverse_transform(wins2[:2])
    assert len(back) == 2
    assert back[0].values.shape[0] == 16
