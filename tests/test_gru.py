"""Parity of the scan-based GRU against torch.nn.GRU with shared weights."""
import numpy as np
import torch

from gesture2vec_tpu.models.gru import GRU, BiGRU, GRUCellStack


def _copy_params(tg, n_layers, bidirectional):
    params = {}
    for layer in range(n_layers):
        sufs = ["", "_reverse"] if bidirectional else [""]
        for suf in sufs:
            params[f"l{layer}_w_ih{suf}"] = np.asarray(
                getattr(tg, f"weight_ih_l{layer}{suf}").detach())
            params[f"l{layer}_w_hh{suf}"] = np.asarray(
                getattr(tg, f"weight_hh_l{layer}{suf}").detach())
            params[f"l{layer}_b_ih{suf}"] = np.asarray(
                getattr(tg, f"bias_ih_l{layer}{suf}").detach())
            params[f"l{layer}_b_hh{suf}"] = np.asarray(
                getattr(tg, f"bias_hh_l{layer}{suf}").detach())
    return {"params": params}


def test_unidirectional_matches_torch(rng):
    T, B, D, H, L = 19, 8, 12, 16, 2
    x = rng.normal(size=(T, B, D)).astype(np.float32)
    tg = torch.nn.GRU(D, H, L)
    with torch.no_grad():
        ref_out, ref_h = tg(torch.from_numpy(x))
    ours_out, ours_h = GRU(hidden_size=H, n_layers=L).apply(
        _copy_params(tg, L, False), x)
    np.testing.assert_allclose(np.asarray(ours_out), ref_out.numpy(),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(ours_h), ref_h.numpy(), atol=2e-5)


def test_bidirectional_matches_torch(rng):
    T, B, D, H, L = 20, 4, 10, 24, 2
    x = rng.normal(size=(T, B, D)).astype(np.float32)
    tg = torch.nn.GRU(D, H, L, bidirectional=True)
    with torch.no_grad():
        ref_out, ref_h = tg(torch.from_numpy(x))
    ours_out, ours_h = BiGRU(hidden_size=H, n_layers=L).apply(
        _copy_params(tg, L, True), x)
    np.testing.assert_allclose(np.asarray(ours_out), ref_out.numpy(),
                               atol=2e-5)
    # torch hidden layout: (L*2, B, H) ordered [l0f, l0b, l1f, l1b]
    np.testing.assert_allclose(np.asarray(ours_h), ref_h.numpy(), atol=2e-5)


def test_cell_stack_matches_torch_single_step(rng):
    B, D, H, L = 8, 12, 16, 2
    x = rng.normal(size=(B, D)).astype(np.float32)
    h = rng.normal(size=(L, B, H)).astype(np.float32)
    tg = torch.nn.GRU(D, H, L)
    with torch.no_grad():
        ref_out, ref_h = tg(torch.from_numpy(x[None]),
                            torch.from_numpy(h))
    out, new_h = GRUCellStack(hidden_size=H, n_layers=L).apply(
        _copy_params(tg, L, False), x, h)
    np.testing.assert_allclose(np.asarray(out), ref_out[0].numpy(),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(new_h), ref_h.numpy(), atol=2e-5)


def test_gru_initial_hidden(rng):
    T, B, D, H = 7, 3, 5, 6
    x = rng.normal(size=(T, B, D)).astype(np.float32)
    h0 = rng.normal(size=(1, B, H)).astype(np.float32)
    tg = torch.nn.GRU(D, H, 1)
    with torch.no_grad():
        ref_out, _ = tg(torch.from_numpy(x), torch.from_numpy(h0))
    ours_out, _ = GRU(hidden_size=H, n_layers=1).apply(
        _copy_params(tg, 1, False), x, h0)
    np.testing.assert_allclose(np.asarray(ours_out), ref_out.numpy(),
                               atol=2e-5)
