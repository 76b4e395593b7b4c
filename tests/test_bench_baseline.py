"""Pin the bench.py torch-CPU baseline to the reference call graph.

The real reference cannot run in this image (lmdb / pyarrow.serialize /
fasttext are absent), so bench.py reconstructs its e2e inference loop.
These tests freeze the reconstruction's per-stage structure so future
edits cannot quietly batch or shorten the torch loop and inflate
vs_baseline: the reference steps its decoder GRUs ONE timestep at a
time from Python (ref: text2embedding_model.py:701-744 for tokens,
Autoencoder_VQVAE_model.py:1038-1054 for frames).
"""
import os
import sys

import numpy as np
import torch

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import bench  # noqa: E402


def _count_gru_steps(module):
    calls = []

    def hook(_m, inputs, _out):
        calls.append(tuple(inputs[0].shape))
    return calls, module.register_forward_hook(hook)


def test_torch_token_decoder_steps_one_at_a_time():
    t2t, _ = bench.make_torch_baseline_models()
    calls, handle = _count_gru_steps(t2t.dec)
    ids = torch.from_numpy(np.random.default_rng(0).integers(
        0, bench.N_WORDS, size=(1, bench.MAXW)))
    with torch.no_grad():
        toks = t2t(ids)
    handle.remove()
    n_steps = bench.SENT_LEN // bench.N_FRAMES
    assert len(toks) == n_steps
    # one decoder GRU call per token, each a length-1 sequence
    # (ref: text2embedding_model.py:701-744)
    assert len(calls) == n_steps
    assert all(shape[0] == 1 for shape in calls)


def test_torch_chunk_decoder_steps_one_at_a_time():
    _, dec = bench.make_torch_baseline_models()
    calls, handle = _count_gru_steps(dec.gru)
    with torch.no_grad():
        frames = dec(torch.tensor(3), torch.zeros(1, bench.REP))
    handle.remove()
    # n_frames-1 single-step GRU calls per token, then the DAE decode
    # over all frames (ref: Autoencoder_VQVAE_model.py:1038-1054;
    # inference_text2embedding.py:544-547)
    assert frames.shape == (bench.N_FRAMES, bench.DIM)
    assert len(calls) == bench.N_FRAMES - 1
    assert all(shape[0] == 1 for shape in calls)


def test_torch_baseline_workload_shape():
    """The measured torch workload covers every window of the shortened
    duration and every token's chunk rollout - frames accounting must
    equal windows x n_steps x n_frames."""
    n_windows = int(np.ceil(bench.TORCH_DURATION_S
                            / (bench.SENT_LEN / bench.FPS)))
    n_steps = bench.SENT_LEN // bench.N_FRAMES
    expected = n_windows * n_steps * bench.N_FRAMES
    t2t, dec = bench.make_torch_baseline_models()
    total = 0
    with torch.no_grad():
        ids = torch.zeros((1, bench.MAXW), dtype=torch.long)
        toks = t2t(ids)
        total = n_windows * sum(
            dec(torch.tensor(t), torch.zeros(1, bench.REP)).shape[0]
            for t in toks)
    assert total == expected
