"""Config loading: reference YAMLs load unmodified."""
import os

import numpy as np
import pytest

from gesture2vec_tpu.train.config import load_config

REF = "/root/reference/config"


def test_boolean_normalization():
    cfg = load_config(dict(autoencoder_vq="True", autoencoder_vae="False",
                           sentence_level="true", use_derivative=False))
    assert cfg.autoencoder_vq is True
    assert cfg.autoencoder_vae is False
    assert cfg.sentence_level is True
    assert cfg.use_derivative is False


def test_extras_roundtrip(tmp_path):
    from gesture2vec_tpu.train import checkpoints

    cfg = load_config(dict(name="x", text_encoder="gru", custom_flag=7))
    assert cfg.extras["text_encoder"] == "gru"
    p = str(tmp_path / "c.bin")
    checkpoints.save_checkpoint(p, config=cfg, epoch=1, params={})
    payload = checkpoints.load_checkpoint(p)
    assert payload["config"].extras["text_encoder"] == "gru"
    assert payload["config"].extras["custom_flag"] == 7


@pytest.mark.skipif(not os.path.isdir(REF),
                    reason="reference configs not mounted")
@pytest.mark.parametrize("name", ["DAE.yml", "VQ-VAE.yml",
                                  "seq2seqtxt.yml", "VQ-VAE_GENEA.yml"])
def test_reference_yaml_loads(name):
    """The reference's own YAML files load without modification - the
    config surface is drop-in compatible."""
    cfg = load_config(os.path.join(REF, name))
    assert cfg.hidden_size > 0
    assert isinstance(cfg.autoencoder_vq, bool)
    assert isinstance(cfg.autoencoder_vq_components, int)
    if cfg.data_mean is not None:
        # note: the reference's own seq2seqtxt.yml ships a 162-dim
        # (TWH "Taras") mean with input_motion_dim=135, so only
        # well-formedness is asserted here
        assert cfg.data_mean.ndim >= 1
        assert np.isfinite(cfg.data_mean).all()
