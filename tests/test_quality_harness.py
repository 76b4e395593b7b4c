"""Units for the quality-harness helpers (benchmarks/quality_*.py).

The harnesses themselves are corpus-scale TPU runs (results committed
in QUALITY.md); these tests pin the host-side data plumbing they rely
on so a refactor can't silently skew the committed metrics' meaning.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "benchmarks"))


def _fake_clip(n_frames, words, dim=6):
    rng = np.random.default_rng(0)
    return {"poses": rng.normal(2.0, 3.0, size=(n_frames, dim))
            .astype(np.float32),
            "words": words}


class _Vocab:
    def words_to_ids(self, words, add_sos_eos=True):
        ids = [10 + len(w) for w in words]
        return [1] + ids + [2] if add_sos_eos else ids


def test_word_windows_shapes_and_alignment():
    from quality_misc import word_windows

    fps = 10
    # words cover [0.0, 2.0) and [3.0, 4.0): the middle second is silent
    clip = _fake_clip(60, [["aa", 0.0, 2.0], ["bbb", 3.0, 4.0]])
    mean = np.zeros(6, np.float32)
    std = np.ones(6, np.float32)
    out = word_windows([clip], _Vocab(), n_frames=10, stride=10,
                       max_words=5, fps=fps, mean=mean, std=std)
    # 6 candidate 1s windows; the wordless ones at seconds [2,3),
    # [4,5), [5,6) are dropped (the reference's >=1-word filter),
    # keeping [0,1) and [1,2) ("aa") and [3,4) ("bbb")
    assert out["word_ids"].shape == (3, 5)
    assert out["poses"].shape == (3, 10, 6)
    # first window overlaps only "aa": SOS + id + EOS, padded to 5
    assert out["word_ids"][0].tolist() == [1, 12, 2, 0, 0]
    assert out["word_ids"][2].tolist() == [1, 13, 2, 0, 0]
    assert out["lengths"].tolist() == [3, 3, 3]


def test_word_windows_keeps_alignment_when_not_dropping():
    from quality_misc import word_windows

    clip = _fake_clip(60, [["aa", 0.0, 2.0], ["bbb", 3.0, 4.0]])
    out = word_windows([clip], _Vocab(), n_frames=10, stride=10,
                       max_words=5, fps=10, mean=np.zeros(6),
                       std=np.ones(6), drop_wordless=False)
    # all 6 windows kept: position i covers second [i, i+1) exactly,
    # so generated chunks stay time-aligned with the ground truth
    assert out["word_ids"].shape == (6, 5)
    # wordless windows carry SOS+EOS only
    assert out["word_ids"][2].tolist() == [1, 2, 0, 0, 0]
    np.testing.assert_array_equal(
        out["poses"].reshape(-1, 6), clip["poses"])


def test_word_windows_normalizes_with_given_stats():
    from quality_misc import word_windows

    clip = _fake_clip(20, [["w", 0.0, 2.0]])
    mean = clip["poses"].mean(0)
    std = clip["poses"].std(0) + 0.1
    out = word_windows([clip], _Vocab(), n_frames=20, stride=20,
                       max_words=4, fps=10, mean=mean, std=std)
    expect = (clip["poses"] - mean) / np.maximum(std, 0.01)
    np.testing.assert_allclose(out["poses"][0], expect, rtol=1e-5)


def test_word_windows_truncates_long_sentences():
    from quality_misc import word_windows

    words = [[f"w{i}", 0.1 * i, 0.1 * i + 0.05] for i in range(30)]
    clip = _fake_clip(40, words)
    out = word_windows([clip], _Vocab(), n_frames=40, stride=40,
                       max_words=8, fps=10, mean=np.zeros(6),
                       std=np.ones(6))
    assert out["word_ids"].shape == (1, 8)
    assert out["lengths"][0] == 8


def test_token_latent_battery_matches_direct_metrics():
    """The pooled battery (quality_run.token_latent_battery) is the one
    metric path shared by quality_run/quality_audio/quality_misc/
    quality_genea; pin its outputs against the underlying metric
    functions so a battery refactor can't silently change what the
    committed QUALITY.md numbers mean."""
    from quality_run import token_latent_battery

    from gesture2vec_tpu.cluster.metrics import (corpus_bleu,
                                                 frechet_distance,
                                                 hellinger,
                                                 token_histogram,
                                                 token_perplexity,
                                                 wasserstein_distance)

    rng = np.random.default_rng(3)
    codes = 8
    pairs = [(rng.integers(0, codes, size=n),
              rng.integers(0, codes, size=n)) for n in (5, 7, 11)]
    gen_lat = rng.normal(size=(23, 6))
    bank_train = {"seq_latents": rng.normal(size=(40, 6))}
    bank_val = {"seq_latents": rng.normal(size=(30, 6))}

    out = token_latent_battery(pairs, gen_lat, bank_train, bank_val,
                               codes)

    g = np.concatenate([p[0] for p in pairs])
    r = np.concatenate([p[1] for p in pairs])
    assert out["n_tokens_compared"] == len(g) == 23
    assert out["token_accuracy"] == float((g == r).mean())
    assert out["hellinger"] == float(hellinger(
        token_histogram(g, codes), token_histogram(r, codes)))
    assert out["wasserstein"] == float(wasserstein_distance(g, r))
    assert out["bleu"] == float(corpus_bleu(
        [p[0].tolist() for p in pairs],
        [p[1].tolist() for p in pairs], max_n=4))
    assert out["token_perplexity_generated"] == float(
        token_perplexity(g, codes))
    assert out["frechet_seq_latents"] == float(
        frechet_distance(gen_lat, bank_val["seq_latents"]))
    assert out["frechet_floor_train_vs_val"] == float(frechet_distance(
        bank_train["seq_latents"], bank_val["seq_latents"]))
    # histograms ride along (underscore keys) for downstream plots and
    # are dropped before metrics files are written
    np.testing.assert_allclose(np.asarray(out["_hist_gen"]),
                               token_histogram(g, codes))
    assert set(k for k in out if not k.startswith("_")) == {
        "hellinger", "frechet_seq_latents", "frechet_floor_train_vs_val",
        "token_perplexity_generated", "token_perplexity_ground_truth",
        "wasserstein", "bleu", "token_accuracy", "n_tokens_compared"}


def test_twh_hierarchy_matches_fixture_bvh():
    from tests.fixtures import make_synthetic_twh_bvh, twh_hierarchy

    hierarchy, joints = twh_hierarchy()
    assert len(joints) == 24 and joints[0] == "body_world"
    # the fixture BVH is built from the same hierarchy text
    assert make_synthetic_twh_bvh(n_frames=5).startswith(hierarchy)
    # column count: 6 channels per joint
    from gesture2vec_tpu.io.bvh import parse_bvh
    bvh = parse_bvh(make_synthetic_twh_bvh(n_frames=5), from_text=True)
    assert bvh.values.shape == (5, 6 * len(joints))
