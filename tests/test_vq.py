"""VQ layer math vs an independent torch implementation of the standard
VQ-VAE formulas (van den Oord et al.), which is what the reference's
layers compute."""
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from gesture2vec_tpu.models.vq import (VQEmaState, VQGSSoft, codebook_distances,
                                       gssoft_probs, init_ema_state, vq_ema,
                                       vq_st)


def _torch_vq_st(x, codebook, beta):
    xt = torch.from_numpy(x)
    et = torch.from_numpy(codebook)
    d = (xt.pow(2).sum(1, keepdim=True) + et.pow(2).sum(1)
         - 2 * xt @ et.t())
    idx = d.argmin(1)
    onehot = F.one_hot(idx, codebook.shape[0]).float()
    q = onehot @ et
    e_loss = F.mse_loss(q.detach(), xt)
    q_loss = F.mse_loss(q, xt.detach())
    loss = q_loss + beta * e_loss
    avg = onehot.mean(0)
    perp = torch.exp(-(avg * torch.log(avg + 1e-10)).sum())
    return loss.item(), q.numpy(), perp.item(), idx.numpy()


def test_vq_st_matches_torch(rng):
    x = rng.normal(size=(64, 20)).astype(np.float32)
    codebook = rng.normal(size=(32, 20)).astype(np.float32)
    ref_loss, ref_q, ref_perp, ref_idx = _torch_vq_st(x, codebook, 0.25)
    out = vq_st(jnp.asarray(x), jnp.asarray(codebook), 0.25)
    np.testing.assert_allclose(float(out.loss), ref_loss, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out.quantized), ref_q, atol=1e-6)
    np.testing.assert_allclose(float(out.perplexity), ref_perp, rtol=1e-5)
    np.testing.assert_array_equal(np.argmax(np.asarray(out.encodings), 1),
                                  ref_idx)


def test_vq_ema_update_matches_reference_math(rng):
    """EMA update equations from the reference
    (ref: DAE_model.py:450-476), recomputed independently in numpy."""
    K, D, N = 16, 8, 128
    decay, eps = 0.99, 1e-5
    x = rng.normal(size=(N, D)).astype(np.float32)
    state = init_ema_state(jax.random.PRNGKey(0), K, D)
    cb0 = np.asarray(state.codebook)

    out, new_state = vq_ema(jnp.asarray(x), state, decay=decay, epsilon=eps,
                            train=True)
    # independent recomputation
    d = ((x ** 2).sum(1, keepdims=True) + (cb0 ** 2).sum(1)
         - 2 * x @ cb0.T)
    idx = d.argmin(1)
    onehot = np.eye(K, dtype=np.float32)[idx]
    cs = np.asarray(state.cluster_size) * decay + (1 - decay) * onehot.sum(0)
    n = cs.sum()
    cs = (cs + eps) / (n + K * eps) * n
    ema_w = np.asarray(state.ema_w) * decay + (1 - decay) * (onehot.T @ x)
    cb1 = ema_w / cs[:, None]

    np.testing.assert_allclose(np.asarray(new_state.cluster_size), cs,
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(new_state.codebook), cb1,
                               rtol=2e-4)
    # quantization this step uses the pre-update codebook
    np.testing.assert_allclose(np.asarray(out.quantized), onehot @ cb0,
                               atol=1e-6)
    # loss = commitment * e_latent only
    e_latent = np.mean((onehot @ cb0 - x) ** 2)
    np.testing.assert_allclose(float(out.loss), 0.25 * e_latent, rtol=1e-5)


def test_vq_ema_eval_is_pure(rng):
    x = rng.normal(size=(32, 8)).astype(np.float32)
    state = init_ema_state(jax.random.PRNGKey(1), 16, 8)
    _, new_state = vq_ema(jnp.asarray(x), state, train=False)
    np.testing.assert_array_equal(np.asarray(new_state.codebook),
                                  np.asarray(state.codebook))


def test_vq_ema_dp_psum_equivalence(rng):
    """Data-parallel EMA must equal the single-device update on the same
    global batch: run via shard_map over 8 virtual devices vs locally."""
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    K, D, N = 8, 4, 64
    x = rng.normal(size=(N, D)).astype(np.float32)
    state = init_ema_state(jax.random.PRNGKey(2), K, D)

    _, ref_state = vq_ema(jnp.asarray(x), state, train=True)

    mesh = Mesh(np.array(jax.devices()[:8]), ("dp",))

    def shard_fn(xs, st):
        out, new_st = vq_ema(xs, st, train=True, axis_name="dp")
        return new_st

    f = shard_map(shard_fn, mesh=mesh,
                  in_specs=(P("dp"), P()), out_specs=P())
    dp_state = f(jnp.asarray(x), state)
    np.testing.assert_allclose(np.asarray(dp_state.codebook),
                               np.asarray(ref_state.codebook), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dp_state.cluster_size),
                               np.asarray(ref_state.cluster_size), rtol=1e-5)


def test_gssoft_probs_match_reference_math(rng):
    """soft_prob math (ref: Autoencoder_VQVAE_model.py:1349-1372)."""
    d = np.abs(rng.normal(size=(16, 12))).astype(np.float32) * 100
    logvar = rng.normal(size=(16, 12)).astype(np.float32)
    ours = np.asarray(gssoft_probs(jnp.asarray(d), jnp.asarray(logvar)))

    dt = torch.from_numpy(d)
    lv = torch.from_numpy(logvar)
    smooth = 1.0 / torch.exp(lv) ** 2
    dd = dt / 400
    prob = torch.exp(-dd * 0.5 * smooth) / torch.sqrt(smooth)
    ref = (prob / prob.sum(1, keepdim=True)).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)
    np.testing.assert_allclose(ours.sum(1), 1.0, atol=1e-5)


def test_vqgssoft_module_shapes(rng):
    x = rng.normal(size=(10, 24)).astype(np.float32)
    m = VQGSSoft(num_codes=50, dim=24)
    vars_ = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = m.apply(vars_, jnp.asarray(x))
    assert out.quantized.shape == x.shape
    assert out.encodings.shape == (10, 50)
    assert float(out.perplexity) > 1.0
    tokens = np.argmax(np.asarray(out.encodings), axis=1)
    assert tokens.shape == (10,)


def test_rvq_refines_reconstruction():
    """Residual stages must tighten the bottleneck: after identical
    training, a 2-stage RVQ reconstructs the same inputs with lower
    error than a single stage."""
    import optax

    from gesture2vec_tpu.models.vq import VQResidual

    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(256, 16)).astype(np.float32))

    def fit(stages):
        model = VQResidual(num_codes=8, dim=16, stages=stages)
        params = model.init(jax.random.PRNGKey(0), x)
        opt = optax.adam(3e-2)
        opt_state = opt.init(params)

        @jax.jit
        def step(params, opt_state):
            def loss_fn(p):
                return model.apply(p, x).loss
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        for _ in range(200):
            params, opt_state, _ = step(params, opt_state)
        out = model.apply(params, x)
        return float(jnp.mean((out.quantized - x) ** 2)), out, params

    err1, _, _ = fit(1)
    err2, out2, params2 = fit(2)
    assert err2 < err1 * 0.9, (err1, err2)
    # stage-0 API surface: one-hot encodings over num_codes, the shared
    # "codebook" param name every consumer reads
    assert out2.encodings.shape == (256, 8)
    assert "codebook" in params2["params"]
    assert "codebook_r1" in params2["params"]


# ---------------------------------------------------------------- literal
def _ref_dae_model():
    from tests.reference_loader import (load_reference_models,
                                        reference_available)
    if not reference_available():
        import pytest as _pytest
        _pytest.skip("reference tree not present")
    return load_reference_models()["DAE_model"]


def test_vq_payam_parity_literal(rng):
    """vq_st vs the LITERAL VQ_Payam (ref: DAE_model.py:277-348):
    identical loss, quantized output, perplexity, and assignments."""
    from gesture2vec_tpu.models.vq import vq_st

    mod = _ref_dae_model()
    torch.manual_seed(3)
    K, D = 32, 20
    ref = mod.VQ_Payam(K, D, 0.25)
    x = rng.normal(size=(64, D)).astype(np.float32)
    with torch.no_grad():
        ref_loss, ref_q, ref_perp, ref_enc = ref(torch.from_numpy(x))

    codebook = ref._embedding.weight.detach().numpy()
    out = vq_st(jnp.asarray(x), jnp.asarray(codebook), 0.25)
    np.testing.assert_allclose(float(out.loss), float(ref_loss), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out.quantized), ref_q.numpy(),
                               atol=1e-6)
    np.testing.assert_allclose(float(out.perplexity), float(ref_perp),
                               rtol=1e-5)
    np.testing.assert_array_equal(np.argmax(np.asarray(out.encodings), 1),
                                  ref_enc.argmax(1).numpy())


def test_vq_payam_ema_parity_literal(rng):
    """vq_ema vs the LITERAL VQ_Payam_EMA (ref: DAE_model.py:351-482) over
    two chained TRAIN steps: identical losses, quantized outputs, and
    identical post-update codebook / cluster sizes / EMA accumulators."""
    from gesture2vec_tpu.models.vq import VQEmaState, vq_ema

    mod = _ref_dae_model()
    torch.manual_seed(5)
    K, D, decay = 16, 12, 0.85
    ref = mod.VQ_Payam_EMA(K, D, 0.25, decay).train()

    state = VQEmaState(
        codebook=jnp.asarray(ref._embedding.weight.detach().numpy()),
        cluster_size=jnp.asarray(ref._ema_cluster_size.numpy()),
        ema_w=jnp.asarray(ref._ema_w.detach().numpy()))

    for step in range(2):
        x = rng.normal(size=(48, D)).astype(np.float32)
        with torch.no_grad():
            ref_loss, ref_q, ref_perp, _ = ref(torch.from_numpy(x))
        out, state = vq_ema(jnp.asarray(x), state, commitment_cost=0.25,
                            decay=decay, train=True)
        np.testing.assert_allclose(float(out.loss), float(ref_loss),
                                   rtol=1e-5, err_msg=f"step {step}")
        np.testing.assert_allclose(np.asarray(out.quantized),
                                   ref_q.numpy(), atol=1e-5)
        np.testing.assert_allclose(float(out.perplexity), float(ref_perp),
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(state.codebook),
                                   ref._embedding.weight.detach().numpy(),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(state.cluster_size),
                                   ref._ema_cluster_size.numpy(),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(state.ema_w),
                                   ref._ema_w.detach().numpy(), atol=1e-5)
